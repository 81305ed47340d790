"""Slope-timed 4K 3x-GF chain across fused tilings (run on the TPU).

PYTHONPATH=/root/.axon_site:/root/repo python /tmp/measure_4k_tilings.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.ops.guided_pallas import (
    guided_filter_fused_iterated)

H, W = 2160, 3840
rng = np.random.RandomState(0)
g4k = jax.device_put(np.floor(rng.rand(1, 3, H, W) * 256).astype(np.float32))
s4k = jax.device_put(np.floor(rng.rand(1, 1, H, W) * 256).astype(np.float32))
reps = 8
MP = H * W * 3 / 1e6  # 3 filter applications per chain


def time_tiling(tr, tl, mode="slots"):
    @jax.jit
    def chain_many(g, s, n):
        def body(i, carry):
            g, acc = carry
            g = g.at[0, 0, 0, 0].mul(1.0 + 1e-12 * acc)
            out = guided_filter_fused_iterated(
                g, s, 45, 3.0, 3, guide_u8=True,
                tile_rows=tr, tile_lanes=tl, stats_mode=mode)
            return g, acc + out[0, 0, 0, 0] * 1e-9
        return jax.lax.fori_loop(0, n, body, (g, jnp.float32(0.0)))[1]

    float(chain_many(g4k, s4k, reps))  # compile+warm
    lo = hi = None
    for _ in range(2):
        t0 = time.time(); float(chain_many(g4k, s4k, reps))
        t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(chain_many(g4k, s4k, 3 * reps))
        t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    per = (hi - lo) / (2 * reps)
    print("tiling %-12s %-9s: %.2f ms/chain  %.0f MP/s" %
          (str((tr, tl)), mode, per * 1e3, MP / per), flush=True)
    return per


# on-chip CORRECTNESS first: padless (both modes) vs the default path
# on the real frame — interpret-mode tests can't validate real-Mosaic
# semantics (e.g. zero-store vs DMA ordering into the same scratch)
# NOTE: experimental single-call "merged" configs run LAST everywhere
# (parity + timing at the end) — if an unattended run hits a kernel
# hang there, the known-good numbers are already flushed to the log.
ref = None
for tr, tl, mode in [(None, None, "slots"), (240, 768, "slots"),
                     (240, 768, "recompute"), (240, 768, "cached-d"),
                     (None, None, "cached-d")]:
    out = np.asarray(guided_filter_fused_iterated(
        g4k, s4k, 45, 3.0, 3, guide_u8=True,
        tile_rows=tr, tile_lanes=tl, stats_mode=mode))
    if ref is None:
        ref = out
    else:
        d = float(np.abs(out - ref).max())
        print("parity %s %s vs default: max abs diff %.4f %s" %
              ((tr, tl), mode, d, "OK" if d < 0.05 else "FAIL"),
              flush=True)

base = time_tiling(None, None)          # current default 256x1024
# high-value first: exact-divide pairs take the PADLESS path
for tr, tl, mode in [(240, 1280, "slots"), (240, 1280, "recompute"),
                     (240, 768, "slots"), (240, 768, "recompute"),
                     (216, 1280, "slots"), (240, 640, "slots"),
                     (216, 768, "recompute"), (144, 1280, "slots"),
                     (240, None, "slots"), (216, None, "slots"),
                     (240, 640, "recompute"), (240, 768, "cached-d"),
                     (240, 1280, "cached-d"), (None, None, "cached-d")]:
    try:
        time_tiling(tr, tl, mode)
    except Exception as e:
        print("tiling", (tr, tl), mode, "FAILED:", repr(e)[:200],
              flush=True)

# 8K scaling check on the winning-ish configs
H8, W8 = 4320, 7680
g8k = jax.device_put(np.floor(rng.rand(1, 3, H8, W8) * 256)
                     .astype(np.float32))
s8k = jax.device_put(np.floor(rng.rand(1, 1, H8, W8) * 256)
                     .astype(np.float32))
MP8 = H8 * W8 * 3 / 1e6


def time_8k(tr, tl, mode="slots"):
    @jax.jit
    def chain_many(g, s, n):
        def body(i, carry):
            g, acc = carry
            g = g.at[0, 0, 0, 0].mul(1.0 + 1e-12 * acc)
            out = guided_filter_fused_iterated(
                g, s, 45, 3.0, 3, guide_u8=True,
                tile_rows=tr, tile_lanes=tl, stats_mode=mode)
            return g, acc + out[0, 0, 0, 0] * 1e-9
        return jax.lax.fori_loop(0, n, body, (g, jnp.float32(0.0)))[1]

    float(chain_many(g8k, s8k, 2))
    t0 = time.time(); float(chain_many(g8k, s8k, 2)); lo = time.time() - t0
    t0 = time.time(); float(chain_many(g8k, s8k, 6)); hi = time.time() - t0
    per = (hi - lo) / 4
    print("8K %-12s %-9s: %.2f ms/chain  %.0f MP/s" %
          (str((tr, tl)), mode, per * 1e3, MP8 / per), flush=True)


for tr, tl, mode in [(None, None, "slots"), (240, 768, "slots"),
                     (240, 768, "recompute")]:
    try:
        time_8k(tr, tl, mode)
    except Exception as e:
        print("8K", (tr, tl), mode, "FAILED:", repr(e)[:200], flush=True)

# --- experimental MERGED configs last (see NOTE at the top) ---
try:
    out = np.asarray(guided_filter_fused_iterated(
        g4k, s4k, 45, 3.0, 3, guide_u8=True,
        tile_rows=240, tile_lanes=768, stats_mode="merged"))
    d = float(np.abs(out - ref).max())
    print("parity (240, 768) merged vs default: max abs diff %.4f %s" %
          (d, "OK" if d < 0.05 else "FAIL"), flush=True)
except Exception as e:
    print("parity merged FAILED:", repr(e)[:200], flush=True)
for tr, tl, mode in [(240, 768, "merged"), (240, 1280, "merged"),
                     (216, 768, "merged")]:
    try:
        time_tiling(tr, tl, mode)
    except Exception as e:
        print("tiling", (tr, tl), mode, "FAILED:", repr(e)[:200],
              flush=True)
try:
    time_8k(240, 768, "merged")
except Exception as e:
    print("8K merged FAILED:", repr(e)[:200], flush=True)
