"""Fused forward+backward Pallas kernels for TRAINING the skip-layers CNN.

The training step's cost is the trunk, not the losses: the XLA per-layer
formulation round-trips five [B,H,W,32] float32 activation tensors
(~170 MB each at batch 20 x 256x256) through HBM in both directions —
measured 12.0 of the 12.1 ms step on v5e.  The same trunk runs at
1200+ MP/s in the fused inference kernel (ops/cnn_pallas.py), so training
gets the same treatment:

  * forward: one kernel, all layers chained through VMEM, K-concat bf16x3
    dots (see cnn_pallas.py's scheme) with *dynamic* weights packed
    per-step by XLA (tiny [32,96] reshuffles).
  * backward: one kernel that REMATERIALIZES the forward activations
    tile-by-tile in VMEM (8.7 Kflop/pixel — far cheaper than storing
    them), then back-propagates through fuse/concat/ReLU chain and
    accumulates weight/bias gradients across grid steps with MXU
    A @ B^T dots (contraction over the pixel axis).

The pair is wired as a jax.custom_vjp around the pre-sigmoid head
(models/networks.py:_apply_skip_layers dispatches here on TPU), so the
sigmoid, losses and optimizer stay ordinary XLA.  Gradients match the
XLA HIGHEST-precision autodiff path to ~1e-5 relative (bf16x3 splits;
gate-tested in tests/test_cnn_train_pallas.py).

Replaces the reference's per-step Python<->C++ solver round trip
(SURVEY.md §3.3, train_with_barrista_helper.py:286-294) — here one
compiled program per step, with the trunk in VMEM end to end.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF = jnp.bfloat16


# ---------------------------------------------------------------------------
# dynamic weight packing (XLA-side, per step; all tiny)
# ---------------------------------------------------------------------------

from .cnn_pallas import _stack3  # [xhi; xlo; xhi] — shared with inference


def _kc3(w_io):
    """[in, out] f32 -> K-concat bf16x3 layout [out, 3*in] (f32 storage of
    exactly-bf16 values): W @ x ~= [Whi|Whi|Wlo] @ [xhi; xlo; xhi]."""
    hi = w_io.astype(BF).astype(F32)
    lo = (w_io - hi).astype(BF).astype(F32)
    return jnp.concatenate([hi.T, hi.T, lo.T], axis=1)


def _dot3(w, v):
    """K-concat bf16x3 dot: w [m, 3k] (exactly-bf16 f32), v [k, T] f32."""
    return jnp.dot(w.astype(BF), _stack3(v), preferred_element_type=F32)


def _dotT3(a, b):
    """bf16x3 A @ B^T with contraction over the lane (pixel) axis:
    a [m, T], b [k, T] f32 -> [m, k] f32."""
    ahi = a.astype(BF)
    alo = (a - ahi.astype(F32)).astype(BF)
    bhi = b.astype(BF)
    blo = (b - bhi.astype(F32)).astype(BF)
    dn = (((1,), (1,)), ((), ()))

    def d(x, y):
        return jax.lax.dot_general(x, y, dn, preferred_element_type=F32)

    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_tile(x, w0, b0, wm, bm, n: int, ci: int):
    """Shared fwd recompute: returns list of activations h_0..h_{n-1}."""
    h = jnp.maximum(_dot3(w0, x[:ci]) + b0, 0.0)
    hs = [h]
    for i in range(n - 1):
        h = jnp.maximum(_dot3(wm[i], h) + bm[i], 0.0)
        hs.append(h)
    return hs


def _fuse_vpu(hs, wfv, n: int, cout: int):
    """Skip-concat fuse as an f32 VPU accumulate (see cnn_pallas.py): as
    an MXU dot its K=3nf costs 4 of the fwd's 9 K-tile passes for cout
    (<=8) real output rows — MXU time scales with K-tiles, not M.  Exact
    f32, and the [nf, T] concat + 3nf-row bf16 stack build vanish."""
    rows = []
    for c in range(cout):
        acc = hs[0] * wfv[0, :, c:c + 1]
        for i in range(1, n):
            acc = acc + hs[i] * wfv[i, :, c:c + 1]
        rows.append(jnp.sum(acc, axis=0, keepdims=True))
    return rows[0] if cout == 1 else jnp.concatenate(rows, axis=0)


def _fwd_kernel(x_ref, w0, b0, wm, bm, wfv, bf, pre_ref, *,
                n: int, ci: int, cout: int):
    hs = _fwd_tile(x_ref[...], w0[...], b0[...], wm, bm, n, ci)
    pre_ref[...] = _fuse_vpu(hs, wfv[...], n, cout) + bf[...]


def _dw_groups(n: int, f: int, ci: int):
    """Greedy packing of the per-layer dW_i = dz_i @ a_{i-1}^T dots into
    [<=128, T] @ [T, <=128] stacks.  Each 32-channel layer alone uses
    32 of the MXU's 128 rows AND 32 of its columns; stacking four layers'
    dz (M side) and a_prev (N side) computes all four dW blocks — the
    diagonal 32x32 blocks of the packed product — in ONE pass per bf16x3
    term instead of four (the off-diagonal garbage is free: MXU pass cost
    scales with the contraction length, not M/N occupancy).  a_{-1} is
    the ci-row input block.  Returns a list of lists of layer indices.
    """
    arows = [ci] + [f] * (n - 1)
    groups, cur, curm, curn = [], [], 0, 0
    for i in range(n):
        if cur and (curm + f > 128 or curn + arows[i] > 128):
            groups.append(cur)
            cur, curm, curn = [], 0, 0
        cur.append(i)
        curm += f
        curn += arows[i]
    groups.append(cur)
    return groups, arows


def _bwd_kernel(x_ref, g_ref, w0, b0, wm, bm, wfv, wmT, w0T,
                *out_refs, n: int, ci: int, f: int, cout: int,
                input_grad: bool):
    """Recompute fwd, backprop, accumulate param grads across grid steps.

    Output layout (lane-padded to 128):
      dw0_ref [f, 128]        cols 0..ci-1 = dW0^T(io->oi), col ci = db0
      dwm_ref [n-1, f, 128]   cols 0..f-1  = dW_i,          col f  = db_i
      head: cout <= 2 (the flagship's scalar head) computes the fuse dW
        on the VPU — exact f32, and it deletes the 2-N-tile bf16x3 MXU
        A@B^T dot (6 K-tile passes) the generic path needs:
          dwfT_ref [nf, 128]  cols 0..cout-1 = dWf ([in, out] direct)
          dbf_ref  [cout, 128]  col 0 = dbf
        cout > 2 keeps the MXU form (VPU cost grows with cout, MXU
        cost does not):
          dwf_ref [cout, nfpad]  cols 0..nf-1 = dWf, col nf = dbf
      dx_ref  [ci, T]         input cotangent — REQUIRED
                              for cascadeSkipLayers, whose level-1 input
                              is level-0's recovered reflectance: the
                              final loss must reach level-0's params
                              through this path (networks.py:853-1146).
                              Omitted when the input is a leaf —
                              skips the w0T dot and a 32 B/px HBM write.
    """
    vpu_head = cout <= 2
    if vpu_head:
        dw0_ref, dwm_ref, dwfT_ref, dbf_ref = out_refs[:4]
        rest = out_refs[4:]
    else:
        dw0_ref, dwm_ref, dwf_ref = out_refs[:3]
        rest = out_refs[3:]
    dx_ref = rest[0] if input_grad else None

    x = x_ref[...]                       # [ci, T]
    g = g_ref[...]                       # [cout, T] cotangent wrt pre
    hs = _fwd_tile(x, w0[...], b0[...], wm, bm, n, ci)

    # fuse head.  dcat = Wf^T g is a rank-cout broadcast — VPU mults
    # instead of a 2-M-tile dot (and it overlaps the chain dots below).
    dbf = jnp.sum(g, axis=1, keepdims=True)
    if vpu_head:
        # dWf^T[(i,f), c] = sum_px hs[i] * g_c: per-layer broadcast
        # multiply + lane reduction, f32-exact
        cols = []
        for c in range(cout):
            grow = jnp.broadcast_to(g[c:c + 1, :], (f, g.shape[1]))
            cols.append(jnp.concatenate(
                [jnp.sum(hs[i] * grow, axis=1, keepdims=True)
                 for i in range(n)], axis=0))          # [nf, 1]
        dwfT = jnp.concatenate(cols, axis=1)           # [nf, cout]
    else:
        cat = hs[0] if n == 1 else jnp.concatenate(hs, axis=0)
        dwf = _dotT3(g, cat)             # [8, nf]

    def dcat_i(i):
        # one broadcast axis per op ([f,1]x[1,T] double-broadcast is
        # shaky under Mosaic lowering): expand g's row across sublanes
        # first, then the lane-broadcast multiply
        def term(c):
            grow = jnp.broadcast_to(g[c:c + 1, :], (f, g.shape[1]))
            return wfv[i, :, c:c + 1] * grow
        d = term(0)
        for c in range(1, cout):
            d = d + term(c)
        return d                         # [f, T]

    # conv chain, last to first
    dz = None
    dzs = [None] * n
    for i in range(n - 1, -1, -1):
        dh = dcat_i(i)
        if i < n - 1:
            dh = dh + _dot3(wmT[i], dz)
        dz = jnp.where(hs[i] > 0.0, dh, 0.0)
        dzs[i] = dz
    if dx_ref is not None:
        dx_ref[...] = _dot3(w0T[...], dz)    # [ci, T]

    # per-layer weight grads via packed A@B^T stacks (see _dw_groups)
    aprevs = [x] + hs[:n - 1]            # a_{-1} = the ci-row input
    groups, arows = _dw_groups(n, f, ci)
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
    dbs = [jnp.sum(dzs[i], axis=1, keepdims=True) for i in range(n)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in out_refs[:4 if vpu_head else 3]:
            ref[...] = jnp.zeros_like(ref)

    def lanepad(a, width):
        # full-lane accumulate: Mosaic dislikes sub-128-lane stores
        return jnp.pad(a, ((0, 0), (0, width - a.shape[1])))

    dw0_ref[...] += lanepad(jnp.concatenate([dws[0], dbs[0]], axis=1),
                            dw0_ref.shape[1])
    for i in range(1, n):
        dwm_ref[i - 1] += lanepad(
            jnp.concatenate([dws[i], dbs[i]], axis=1), dwm_ref.shape[2])
    if vpu_head:
        dwfT_ref[...] += lanepad(dwfT, dwfT_ref.shape[1])
        dbf_ref[...] += lanepad(dbf, dbf_ref.shape[1])
    else:
        dwf_ref[...] += lanepad(
            jnp.concatenate([dwf, dbf], axis=1), dwf_ref.shape[1])


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

def _pack_convs(kernels, biases, n, f):
    """Conv-chain operands shared by fwd and bwd recompute.
    kernels: list of [in, out] f32; biases: list of [out]."""
    w0 = _kc3(kernels[0])                              # [f, 3ci]
    b0 = biases[0].reshape(f, 1)
    if n > 1:
        wm = jnp.stack([_kc3(k) for k in kernels[1:n]])   # [n-1, f, 3f]
        bm = jnp.stack([b.reshape(f, 1) for b in biases[1:n]])
    else:  # dummy (unused) — keeps the pallas signature static
        wm = jnp.zeros((1, f, 3 * f), F32)
        bm = jnp.zeros((1, f, 1), F32)
    return w0, b0, wm, bm


def _pack_head(kernels, biases, n, f, cout):
    """Fuse columns [n, f, 8] (lanes 0..cout-1 real), full f32 — consumed
    by the VPU accumulate in fwd and the rank-cout dcat broadcast in bwd,
    never an MXU dot."""
    wfv = jnp.zeros((n, f, 8), F32).at[:, :, :cout].set(
        kernels[n].reshape(n, f, cout))
    bf = biases[n].reshape(cout, 1)
    return wfv, bf


def _pack_bwd(kernels, n, f):
    if n > 1:
        wmT = jnp.stack([_kc3(k.T) for k in kernels[1:n]])
    else:
        wmT = jnp.zeros((1, f, 3 * f), F32)
    w0T = _kc3(kernels[0].T)                           # [ci, 3f]
    return wmT, w0T


@functools.lru_cache(maxsize=16)
def _make_trunk(n: int, ci: int, f: int, cout: int, tile: int,
                input_grad: bool = True):
    """Returns trunk(kernels, biases, x8) -> pre [cout, P] with custom
    VJP.

    kernels: tuple of n+1 [in, out] f32 (conv0..conv_{n-1}, fuse);
    biases: tuple of n+1 [out]; x8: [ci, P] planar input.
    input_grad=False drops the dx output from the backward kernel (its
    w0T dot + a 32 B/px HBM write) and returns a zeros cotangent —
    correct whenever the input is a leaf (every non-cascade network).
    """

    def fwd_impl(kernels, biases, x8):
        # sub-8 sublane HBM boundary (see cnn_pallas.py::_run): the
        # input stays ci rows and pre cout rows in HBM — Mosaic pads
        # the VMEM tiles; rows of zero padding would be pure HBM
        # bandwidth AND a fully-materialized zero cotangent on the way
        # back through the custom VJP.
        p = x8.shape[1]
        w0, b0, wm, bm = _pack_convs(kernels, biases, n, f)
        wfv, bf = _pack_head(kernels, biases, n, f, cout)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, n=n, ci=ci, cout=cout),
            out_shape=jax.ShapeDtypeStruct((cout, p), F32),
            grid=(p // tile,),
            in_specs=[
                pl.BlockSpec((ci, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((cout, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x8, w0, b0, wm, bm, wfv, bf)

    @jax.custom_vjp
    def trunk(kernels, biases, x8):
        return fwd_impl(kernels, biases, x8)

    def trunk_fwd(kernels, biases, x8):
        return fwd_impl(kernels, biases, x8), (kernels, biases, x8)

    def trunk_bwd(res, g):
        kernels, biases, x8 = res
        p = x8.shape[1]
        w0, b0, wm, bm = _pack_convs(kernels, biases, n, f)
        wfv, _ = _pack_head(kernels, biases, n, f, cout)
        wmT, w0T = _pack_bwd(kernels, n, f)
        nf = n * f
        vpu_head = cout <= 2
        nfpad = -(-(nf + 1) // 128) * 128
        fpad = -(-(f + 1) // 128) * 128
        out_shape = [
            jax.ShapeDtypeStruct((f, 128), F32),
            jax.ShapeDtypeStruct((max(n - 1, 1), f, fpad), F32),
        ]
        out_specs = [
            pl.BlockSpec((f, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n - 1, 1), f, fpad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if vpu_head:   # see _bwd_kernel: dWf direct + dbf in its own ref
            out_shape += [jax.ShapeDtypeStruct((nf, 128), F32),
                          jax.ShapeDtypeStruct((cout, 128), F32)]
            out_specs += [pl.BlockSpec((nf, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((cout, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)]
        else:
            out_shape.append(jax.ShapeDtypeStruct((cout, nfpad), F32))
            out_specs.append(pl.BlockSpec((cout, nfpad), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
        if input_grad:
            out_shape.append(jax.ShapeDtypeStruct((ci, p), F32))
            out_specs.append(pl.BlockSpec((ci, tile), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, n=n, ci=ci, f=f, cout=cout,
                              input_grad=input_grad),
            out_shape=out_shape,
            grid=(p // tile,),
            in_specs=[
                pl.BlockSpec((ci, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x8, g, w0, b0, wm, bm, wfv, wmT, w0T)
        dw0, dwm = outs[:2]
        dx8 = outs[-1] if input_grad else jnp.zeros((ci, p), F32)

        dkernels = [dw0[:, :ci].T]                    # back to [in, out]
        dbiases = [dw0[:, ci]]
        for i in range(1, n):
            dkernels.append(dwm[i - 1, :, :f].T)
            dbiases.append(dwm[i - 1, :, f])
        if vpu_head:
            dwfT, dbf = outs[2], outs[3]
            dkernels.append(dwfT[:, :cout])           # already [nf, cout]
            dbiases.append(dbf[:cout, 0])
        else:
            dwf = outs[2]
            dkernels.append(dwf[:cout, :nf].T)        # [nf, cout]
            dbiases.append(dwf[:cout, nf])
        return (tuple(dkernels), tuple(dbiases), dx8)

    trunk.defvjp(trunk_fwd, trunk_bwd)
    return trunk


def skip_trunk_pre(params: Dict, images, *, num_layers: int,
                   suffix: str = "", tile: int = 8192,
                   input_grad: bool = True):
    """Fused pre-sigmoid forward of the skip-layers trunk, differentiable
    w.r.t. params AND images (cascadeSkipLayers feeds level-1 from
    level-0's output).  images [..., ci] f32 -> pre [..., cout] f32.
    input_grad=False skips the backward's input-cotangent work — pass it
    when images is a leaf (every non-cascade-level-1 call).

    Mirrors models/networks.py:_apply_skip_layers for kernel 1x1, no BN
    (reference factory: training/networks.py:722-850).
    """
    n = num_layers
    names = ["conv{}{}".format(i, suffix) for i in range(n)]
    names.append("fuse_skip_layers" + suffix)
    kernels = tuple(params[m]["kernel"][0, 0] for m in names)
    biases = tuple(params[m]["bias"] for m in names)
    ci = kernels[0].shape[0]
    f = kernels[0].shape[1]
    cout = kernels[-1].shape[1]

    lead = images.shape[:-1]
    p = int(np.prod(lead))
    ppad = -(-p // tile) * tile
    x8 = jnp.pad(jnp.moveaxis(images.reshape(p, ci), -1, 0),
                 ((0, 0), (0, ppad - p)))
    pre = _make_trunk(n, ci, f, cout, tile,
                      input_grad)(kernels, biases, x8)
    return jnp.moveaxis(pre[:, :p], 0, -1).reshape(lead + (cout,))


def fits_fused_trunk(cfg, in_channels: int) -> bool:
    """Eligibility: 1x1 kernels, no padding, no batch-norm, small channel
    counts (the whole flagship family)."""
    return (cfg.kernel == 1 and cfg.pad == 0
            and not cfg.use_batch_normalization
            and cfg.num_layers >= 1 and in_channels <= 8
            and cfg.num_filters % 8 == 0 and 8 <= cfg.num_filters <= 256
            and cfg.num_output_final <= 8)
