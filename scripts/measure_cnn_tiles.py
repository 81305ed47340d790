"""Sweep the grid tile width of the fused CNN kernels on the real TPU.

Both the inference kernel (ops/cnn_pallas.py — default tile 4096 since
the round-5 sweep) and the training trunk (ops/cnn_train_pallas.py,
default 8192; its sweep was flat) grid over the flattened pixel axis in
`tile`-lane steps.  Larger tiles amortize per-grid-
step overhead; smaller tiles pipeline DMA better under VMEM pressure.
Slope-timed (two trip counts, one compile) per CLAUDE.md's tunnel rules.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_cnn_tiles.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe)
from reflectance_filtering_tpu.ops import cnn_pallas
from reflectance_filtering_tpu.ops import cnn_train_pallas

B, H, W = 32, 256, 256
P = B * H * W
MP = P / 1e6


def slope_time(fn, *args, iters=24):
    """Slope-timed per-iteration cost (two trip counts, one compile).

    The LAST positional arg is the data array and is threaded through the
    fori_loop carry — the body must DEPEND on the carry or XLA hoists the
    work out of the loop and the sweep measures ~nothing (bench.py's
    _timed_loop note; confirmed: a loop-invariant body slope-times ~0)."""
    *closed, x0 = args

    @jax.jit
    def loop(n, x):
        def body(i, y):
            out = fn(*closed, y)
            return y + 1e-12 * out
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    float(loop(iters, x0))
    lo = hi = None
    for _ in range(3):
        t0 = time.time(); float(loop(iters, x0)); t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(loop(3 * iters, x0)); t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    return (hi - lo) / (2 * iters)


def main():
    rng = np.random.RandomState(0)
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v)
              for k, v in cnn_pallas.pack_weights(params).items()}
    imgs = jax.device_put(rng.rand(B, H, W, 3).astype(np.float32))

    print("== inference kernel (reflectance_cnn_pallas) ==", flush=True)
    # 65536 exceeds the 16 MB scoped-VMEM stack limit (the [96, T] K-concat
    # stack alone is 25 MB) — measured-rejected 2026-08-19, not swept
    for tile in (4096, 8192, 16384, 32768):
        if P % tile:
            continue
        def fn(x, _tile=tile):
            out = cnn_pallas.reflectance_cnn_pallas(
                packed, x, srgb_input=True, tile=_tile)
            return jnp.sum(out[::4097])
        try:
            dt = slope_time(fn, imgs)
        except Exception as err:  # noqa: BLE001 — sweep must not die
            print("tile %6d: FAILED %r" % (tile, err), flush=True)
            continue
        print("tile %6d: %.3f ms  %.0f MP/s" % (tile, dt * 1e3, MP / dt),
              flush=True)

    print("== training trunk fwd+bwd (skip_trunk_pre grad) ==", flush=True)
    n, ci, f, cout = 5, 3, 32, 1
    tparams = {}
    for i in range(n):
        cin = ci if i == 0 else f
        tparams["conv%d" % i] = {
            "kernel": jnp.asarray(
                rng.randn(1, 1, cin, f) * .1, jnp.float32),
            "bias": jnp.asarray(rng.randn(f) * .01, jnp.float32)}
    tparams["fuse_skip_layers"] = {
        "kernel": jnp.asarray(rng.randn(1, 1, n * f, cout) * .1,
                              jnp.float32),
        "bias": jnp.asarray(rng.randn(cout) * .01, jnp.float32)}
    x = jax.device_put(rng.rand(B, H, W, ci).astype(np.float32))
    flat, tree = jax.tree.flatten(tparams)

    for tile in (4096, 8192, 16384, 32768):
        if P % tile:
            continue
        def loss(fl, xx, _tile=tile):
            pre = cnn_train_pallas.skip_trunk_pre(
                jax.tree.unflatten(tree, fl), xx, num_layers=n,
                tile=_tile, input_grad=False)
            return jnp.sum(pre * pre)
        g = jax.grad(loss)

        def fn(fl, xx, _g=g):
            return sum(jnp.sum(a) for a in _g(fl, xx))
        try:
            dt = slope_time(fn, flat, x)
        except Exception as err:  # noqa: BLE001 — sweep must not die
            print("tile %6d: FAILED %r" % (tile, err), flush=True)
            continue
        print("tile %6d: %.3f ms  %.0f imgs/s" % (tile, dt * 1e3, B / dt),
              flush=True)


if __name__ == "__main__":
    main()
