"""Slope-timed 4K/8K 3x-GF chain across fused tile schedules (run on
the TPU, on a QUIET machine — concurrent work skews the slope).

The 2026-08-19 sweep that settled the current defaults also measured
(and rejected) a padless exact-divide mode, recompute/cached-d stats
and a whole-chain merged kernel — all slower than the padded slots
path; see CLAUDE.md measured-rejection notes.  What remains sweepable
is the padded path's tile schedule (tile_rows / tile_lanes).

PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_4k_tilings.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.ops.guided_pallas import (
    guided_filter_fused_iterated)

rng = np.random.RandomState(0)


def make_loop(tr, tl):
    @jax.jit
    def chain_many(g, s, n):
        def body(i, carry):
            g, acc = carry
            g = g.at[0, 0, 0, 0].mul(1.0 + 1e-12 * acc)
            out = guided_filter_fused_iterated(
                g, s, 45, 3.0, 3, guide_u8=True,
                tile_rows=tr, tile_lanes=tl)
            return g, acc + out[0, 0, 0, 0] * 1e-9
        return jax.lax.fori_loop(0, n, body, (g, jnp.float32(0.0)))[1]
    return chain_many


def sweep(tag, H, W, reps, configs, rounds=3):
    g = jax.device_put(np.floor(rng.rand(1, 3, H, W) * 256)
                       .astype(np.float32))
    s = jax.device_put(np.floor(rng.rand(1, 1, H, W) * 256)
                       .astype(np.float32))
    MP = H * W * 3 / 1e6
    loops = {}
    for tr, tl in configs:
        try:
            loop = make_loop(tr, tl)
            float(loop(g, s, reps))  # compile + warm
            loops[(tr, tl)] = loop   # register only a WORKING config
            print("compiled", tag, (tr, tl), flush=True)
        except Exception as e:
            print(tag, (tr, tl), "FAILED:", repr(e)[:200], flush=True)
    best = {k: None for k in loops}
    for rnd in range(rounds):
        for k, loop in loops.items():
            try:
                t0 = time.time(); float(loop(g, s, reps))
                lo = time.time() - t0
                t0 = time.time(); float(loop(g, s, 3 * reps))
                hi = time.time() - t0
            except Exception as e:  # keep the other configs' numbers
                print(tag, k, "round", rnd, "FAILED:", repr(e)[:200],
                      flush=True)
                continue
            per = (hi - lo) / (2 * reps)
            best[k] = per if best[k] is None else min(best[k], per)
    best = {k: v for k, v in best.items() if v is not None}
    print("== %s best-of-%d ==" % (tag, rounds), flush=True)
    for k, per in sorted(best.items(), key=lambda kv: kv[1]):
        print("%s %-12s slots    : %.2f ms/chain  %.0f MP/s"
              % (tag, str(k), per * 1e3, MP / per), flush=True)
    g.delete(); s.delete()


# parity first: every swept schedule must agree with the default
gp = jax.device_put(np.floor(rng.rand(1, 3, 2160, 3840) * 256)
                    .astype(np.float32))
sp = jax.device_put(np.floor(rng.rand(1, 1, 2160, 3840) * 256)
                    .astype(np.float32))
ref = np.asarray(guided_filter_fused_iterated(
    gp, sp, 45, 3.0, 3, guide_u8=True))
for tr, tl in [(256, None), (240, 768)]:
    out = np.asarray(guided_filter_fused_iterated(
        gp, sp, 45, 3.0, 3, guide_u8=True, tile_rows=tr, tile_lanes=tl))
    d = float(np.abs(out - ref).max())
    print("parity %s vs default: max abs diff %.4f %s"
          % ((tr, tl), d, "OK" if d < 0.05 else "FAIL"), flush=True)
del ref, out
gp.delete(); sp.delete()

sweep("tiling", 2160, 3840, 8,
      [(None, None), (240, 768), (240, 640), (240, 896)])
sweep("8K", 4320, 7680, 2, [(None, None), (256, 768), (256, 640)])
