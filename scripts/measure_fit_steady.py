"""End-to-end fit() steady-state step time at the product shapes
(256x256 images, K=1181 IIW-sized comparison blobs, batch 20) on the
real TPU — measures the WHOLE training loop (device-resident scan
chunks + host fan-out + metric stream), not just the jitted step.

PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_fit_steady.py
"""
import time
import numpy as np

from reflectance_filtering_tpu.models.networks import NetworkConfig
from reflectance_filtering_tpu.train.loop import (
    TRAIN_CHUNK_STEPS, LossConfig, fit)

N, H, W, K, B = 120, 256, 256, 1181, 20
CHUNKS = 10
rng = np.random.RandomState(0)
images = rng.rand(N, H, W, 3).astype(np.float32)
# packed layout (losses/whdr.py): rows [x1, y1, x2, y2, darker, weight]
# with NORMALIZED coords, LAST row = metadata [num_comparisons, file, 0]
comps = np.zeros((N, K + 1, 6), np.float32)
comps[:, :-1, :4] = rng.rand(N, K, 4)            # normalized coords
comps[:, :-1, 4] = rng.randint(0, 3, (N, K))     # darker in {0,1,2}
comps[:, :-1, 5] = rng.rand(N, K)                # weight
comps[:, -1, 0] = K                              # count row
X = {"images": images, "comparisons": comps}

stamps = []


def progress(step, samples, metrics):
    stamps.append((time.time(), step))


steps = TRAIN_CHUNK_STEPS * CHUNKS
t0 = time.time()
fit(NetworkConfig(), LossConfig(), X, iterations=steps * B,
    batch_size=B, random_seed=7, progress=progress)
total = time.time() - t0
# progress fires once per drained chunk; skip the first two stamps
# (compile + pipeline warm) and slope over the rest
if len(stamps) >= 4:
    (t_a, s_a), (t_b, s_b) = stamps[2], stamps[-1]
    per = (t_b - t_a) / (s_b - s_a)
    print("fit steady state: %.2f ms/step  %.0f imgs/s  "
          "(%d steps measured; total wall %.1f s incl. compile)"
          % (per * 1e3, B / per, s_b - s_a, total), flush=True)
else:
    print("too few chunks measured", len(stamps), flush=True)
