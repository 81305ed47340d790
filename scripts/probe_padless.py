"""Quick on-chip compile probe of the padless GF configs (one call each)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from reflectance_filtering_tpu.ops.guided_pallas import (
    guided_filter_fused_iterated)

H, W = 2160, 3840
rng = np.random.RandomState(0)
g = jax.device_put(np.floor(rng.rand(1, 3, H, W) * 256).astype(np.float32))
s = jax.device_put(np.floor(rng.rand(1, 1, H, W) * 256).astype(np.float32))
ref = None
for tr, tl, mode in [(None, None, "slots"), (240, 768, "slots"),
                     (240, 768, "recompute"), (240, 768, "cached-d"),
                     (240, 768, "merged")]:
    try:
        out = np.asarray(guided_filter_fused_iterated(
            g, s, 45, 3.0, 3, guide_u8=True,
            tile_rows=tr, tile_lanes=tl, stats_mode=mode))
        if ref is None:
            ref = out
            print("probe", (tr, tl), mode, "OK (reference)", flush=True)
        else:
            d = float(np.abs(out - ref).max())
            print("probe", (tr, tl), mode, "maxdiff %.4f %s"
                  % (d, "OK" if d < 0.05 else "FAIL"), flush=True)
    except Exception as e:
        print("probe", (tr, tl), mode, "FAILED:", repr(e)[:300], flush=True)
