"""Attribute the training backward kernel's time stage by stage (VERDICT
r4 item 4: "bwd ~1.9 ms" was a single opaque number).

Builds TIMING-ONLY variants of ops/cnn_train_pallas.py::_bwd_kernel with
stages removed in dependency order and reports the deltas:

  full              remat + dcat/dz chain + packed dW dots + head + stores
  -dw               drop the packed dW A@B^T dots (keep db sums)
  -dw-chain         also drop the wmT dz-chain dots (dz = masked dcat)
  -dw-chain-head    also drop the VPU fuse-head dWf broadcast+reduce
                    (what remains: fwd remat dots + dcat/mask + db sums
                    + accumulator stores — reported as one bundle)
  empty(DMA floor)  no compute: touch one element of each input and
                    accumulate it into one output ref, zeroing the rest
                    (bounds the per-grid-step DMA + overhead floor)

The variants write the same output refs (garbage values) so HBM traffic
stays comparable; the delta between consecutive rows attributes one
stage.  Measured 2026-08-19 (B=20, tile 8192): full 1.534 ms = dW 0.773
+ chain 0.245 + head 0.063 + remat-bundle 0.446 + floor 0.008.
Slope-timed (two trip counts, one compile) per CLAUDE.md tunnel rules.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/measure_train_bwd_split.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reflectance_filtering_tpu.ops.cnn_train_pallas import (
    _dw_groups, _dot3, _dotT3, _fwd_tile, _pack_bwd, _pack_convs,
    _pack_head)

F32 = jnp.float32
B, H, W = 20, 256, 256
TILE = 8192
N, CI, F, COUT = 5, 3, 32, 1


def _bwd_variant(x_ref, g_ref, w0, b0, wm, bm, wfv, wmT, w0T,
                 dw0_ref, dwm_ref, dwfT_ref, dbf_ref, *,
                 n, ci, f, cout, do_dw, do_chain, do_head, do_remat):
    x = x_ref[...]
    g = g_ref[...]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw0_ref, dwm_ref, dwfT_ref, dbf_ref):
            ref[...] = jnp.zeros_like(ref)

    if not do_remat:   # floor: touch the inputs, one cheap store
        dbf_ref[...] += jnp.sum(x[:1, :1]) + jnp.sum(g[:1, :1])
        return
    hs = _fwd_tile(x, w0[...], b0[...], wm, bm, n, ci)

    dbf = jnp.sum(g, axis=1, keepdims=True)
    if do_head:
        cols = []
        for c in range(cout):
            grow = jnp.broadcast_to(g[c:c + 1, :], (f, g.shape[1]))
            cols.append(jnp.concatenate(
                [jnp.sum(hs[i] * grow, axis=1, keepdims=True)
                 for i in range(n)], axis=0))
        dwfT = jnp.concatenate(cols, axis=1)
        dwfT_ref[...] += jnp.pad(
            dwfT, ((0, 0), (0, dwfT_ref.shape[1] - dwfT.shape[1])))
    dbf_ref[...] += jnp.pad(dbf, ((0, 0), (0, dbf_ref.shape[1] - 1)))

    def dcat_i(i):
        grow = jnp.broadcast_to(g[0:1, :], (f, g.shape[1]))
        return wfv[i, :, 0:1] * grow

    dz = None
    dzs = [None] * n
    for i in range(n - 1, -1, -1):
        dh = dcat_i(i)
        if do_chain and i < n - 1:
            dh = dh + _dot3(wmT[i], dz)
        dz = jnp.where(hs[i] > 0.0, dh, 0.0)
        dzs[i] = dz

    aprevs = [x] + hs[:n - 1]
    groups, arows = _dw_groups(n, f, ci)
    if do_dw:
        dws = [None] * n
        for grp in groups:
            if len(grp) == 1:
                i = grp[0]
                dws[i] = _dotT3(dzs[i], aprevs[i])
            else:
                packed = _dotT3(
                    jnp.concatenate([dzs[i] for i in grp], axis=0),
                    jnp.concatenate([aprevs[i] for i in grp], axis=0))
                ro = co = 0
                for i in grp:
                    dws[i] = packed[ro:ro + f, co:co + arows[i]]
                    ro += f
                    co += arows[i]
    else:
        dws = [jnp.zeros((f, arows[i]), F32) for i in range(n)]
    dbs = [jnp.sum(dzs[i], axis=1, keepdims=True) for i in range(n)]

    def lanepad(a, width):
        return jnp.pad(a, ((0, 0), (0, width - a.shape[1])))

    dw0_ref[...] += lanepad(jnp.concatenate([dws[0], dbs[0]], axis=1),
                            dw0_ref.shape[1])
    for i in range(1, n):
        dwm_ref[i - 1] += lanepad(
            jnp.concatenate([dws[i], dbs[i]], axis=1), dwm_ref.shape[2])


def make_runner(do_dw, do_chain, do_head, do_remat):
    n, ci, f, cout, tile = N, CI, F, COUT, TILE
    nf = n * f
    fpad = -(-(f + 1) // 128) * 128

    def bwd(kernels, biases, x8, g):
        p = x8.shape[1]
        w0, b0, wm, bm = _pack_convs(kernels, biases, n, f)
        wfv, _ = _pack_head(kernels, biases, n, f, cout)
        wmT, w0T = _pack_bwd(kernels, n, f)
        outs = pl.pallas_call(
            functools.partial(_bwd_variant, n=n, ci=ci, f=f, cout=cout,
                              do_dw=do_dw, do_chain=do_chain,
                              do_head=do_head, do_remat=do_remat),
            out_shape=[jax.ShapeDtypeStruct((f, 128), F32),
                       jax.ShapeDtypeStruct((n - 1, f, fpad), F32),
                       jax.ShapeDtypeStruct((nf, 128), F32),
                       jax.ShapeDtypeStruct((cout, 128), F32)],
            grid=(p // tile,),
            in_specs=[
                pl.BlockSpec((ci, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=[
                pl.BlockSpec((f, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n - 1, f, fpad), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nf, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x8, g, w0, b0, wm, bm, wfv, wmT, w0T)
        return outs

    return bwd


def slope_time(fn, x, g, iters=40):
    @jax.jit
    def loop(x0, g0, n):
        def body(i, carry):
            y, gg = carry
            outs = fn(y, gg)
            s = 1e-12 * jnp.sum(outs[0][:1, :1])
            return y * (1.0 + s), gg
        return jnp.sum(jax.lax.fori_loop(0, n, body, (x0, g0))[0][:1, :8])

    float(loop(x, g, iters))
    lo = hi = None
    for _ in range(2):
        t0 = time.time(); float(loop(x, g, iters)); t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(loop(x, g, 3 * iters)); t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    return (hi - lo) / (2 * iters)


def main():
    rng = np.random.RandomState(0)
    kernels = []
    biases = []
    for i in range(N):
        cin = CI if i == 0 else F
        kernels.append(jnp.asarray(rng.randn(cin, F) * .1, F32))
        biases.append(jnp.asarray(rng.randn(F) * .01, F32))
    kernels.append(jnp.asarray(rng.randn(N * F, COUT) * .1, F32))
    biases.append(jnp.asarray(rng.randn(COUT) * .01, F32))
    kernels = tuple(kernels)
    biases = tuple(biases)

    p = B * H * W
    ppad = -(-p // TILE) * TILE
    x8 = jax.device_put(rng.rand(CI, ppad).astype(np.float32))
    g = jax.device_put(rng.rand(COUT, ppad).astype(np.float32))

    rows = [
        ("full", dict(do_dw=True, do_chain=True, do_head=True,
                      do_remat=True)),
        ("-dw", dict(do_dw=False, do_chain=True, do_head=True,
                     do_remat=True)),
        ("-dw-chain", dict(do_dw=False, do_chain=False, do_head=True,
                           do_remat=True)),
        ("-dw-chain-head", dict(do_dw=False, do_chain=False,
                                do_head=False, do_remat=True)),
        ("empty(DMA floor)", dict(do_dw=False, do_chain=False,
                                  do_head=False, do_remat=False)),
    ]
    prev = None
    for name, flags in rows:
        bwd = make_runner(**flags)
        dt = slope_time(lambda x, gg, _b=bwd: _b(kernels, biases, x, gg),
                        x8, g)
        delta = "" if prev is None else "  (stage: %.3f ms)" % (
            (prev - dt) * 1e3)
        print("%-18s %7.3f ms%s" % (name, dt * 1e3, delta), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
