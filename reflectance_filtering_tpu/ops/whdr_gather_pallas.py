"""Pallas/MXU point-pair gather for the WHDR layers.

The WHDR metric and hinge loss (losses/whdr.py, SURVEY.md C8a/C8b —
reference whdr_layer.py:70-86, whdr_hinge_loss_layer.py:142-221) read
the reflectance at two pixels per human comparison: a [B, K] gather
from [B, H, W].  XLA's TPU gather scalarizes — measured 1.1 ms for
B=32, K=1181 on one v5e chip, 37% of the whole decompose+filter+WHDR
pipeline — so this kernel reformulates gather/scatter as one-hot
matmuls, which is where a TPU is fast:

  forward : l[k] = e_y(k)^T · IMG · e_x(k)
      one dot  [H, 3W]·[3W, 2K] on the MXU (both points of every
      comparison ride one contraction; the image is split bf16x3 and
      K-CONCATenated along W so full f32 precision costs the same
      single dot — one-hot columns are exact in bf16), then a VPU
      sublane reduce against the row one-hot.
  backward: dIMG = Σ_k g[k] · e_y(k) e_x(k)^T
      the scatter-add is the transposed one-hot product: one (1,1)
      contraction [H, 6K]·[W, 6K]^T accumulates every comparison,
      collisions summed by the matmul itself (g is bf16x3-split, the
      one-hot side exact).

Everything lives in VMEM for one grid step per image; HBM traffic is
the image + K indices, ~100x less than the intermediate a dense XLA
one-hot formulation would round-trip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _split3_cat(x, axis: int):
    """bf16x3 split of f32 ``x`` concatenated along ``axis``: the three
    addends reconstruct x to ~1 f32 ulp, and a dot against an exact
    (0/1) other side sums them back losslessly."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=axis)


def _fwd_kernel(img_ref, idx_ref, out_ref, *, wp: int, kp: int):
    img = img_ref[0]                                   # [Hp, Wp] f32
    hp = img.shape[0]
    imgcat = _split3_cat(img, axis=1)                  # [Hp, 3Wp] bf16

    y1 = idx_ref[0, 0:1, :]
    x1 = idx_ref[0, 1:2, :]
    y2 = idx_ref[0, 2:3, :]
    x2 = idx_ref[0, 3:4, :]                            # [1, Kp] i32
    xcat = jnp.concatenate([x1, x2], axis=1)           # [1, 2Kp]
    ycat = jnp.concatenate([y1, y2], axis=1)

    # column one-hot, replicated for the 3 bf16 pieces (row-concat of
    # one [Wp, 2Kp] compare — lax.rem on the full iota measured ~2x
    # slower: integer division is multi-cycle on the VPU)
    iw = jax.lax.broadcasted_iota(jnp.int32, (wp, 2 * kp), 0)
    oh1 = (iw == xcat).astype(jnp.bfloat16)
    ohx = jnp.concatenate([oh1, oh1, oh1], axis=0)
    t = jax.lax.dot_general(imgcat, ohx, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (hp, 2 * kp), 0)
    l = jnp.sum(jnp.where(ih == ycat, t, 0.0), axis=0, keepdims=True)
    # out rides an 8-row sublane pad (Mosaic block-shape rule); row 0
    # is the payload
    out_ref[0] = jnp.broadcast_to(l, (8, 2 * kp))


def _bwd_kernel(idx_ref, g_ref, out_ref, *, wp: int, hp: int, kp: int):
    g = g_ref[0, 0:1, :]                               # [1, 2Kp] f32
    y1 = idx_ref[0, 0:1, :]
    x1 = idx_ref[0, 1:2, :]
    y2 = idx_ref[0, 2:3, :]
    x2 = idx_ref[0, 3:4, :]
    xcat = jnp.concatenate([x1, x2], axis=1)           # [1, 2Kp]
    ycat = jnp.concatenate([y1, y2], axis=1)

    ih = jax.lax.broadcasted_iota(jnp.int32, (hp, 2 * kp), 0)
    a = jnp.where(ih == ycat, g, 0.0)                  # [Hp, 2Kp] f32
    acat = _split3_cat(a, axis=1)                      # [Hp, 6Kp] bf16
    iw = jax.lax.broadcasted_iota(jnp.int32, (wp, 6 * kp), 0)
    xcat3 = jnp.concatenate([xcat, xcat, xcat], axis=1)
    ohxw = (iw == xcat3).astype(jnp.bfloat16)          # [Wp, 6Kp]
    out_ref[0] = jax.lax.dot_general(
        acat, ohxw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [Hp, Wp]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lightness_pairs_mxu(img, idx):
    """l [B, 2, Kp] = img[b, idx[b,0,k], idx[b,1,k]] (point 1) and
    img[b, idx[b,2,k], idx[b,3,k]] (point 2).

    img [B, H, W] float32 (H mult of 8, W mult of 128 — caller pads);
    idx [B, 4, Kp] int32, entries pre-clipped into range (padded
    comparisons should carry index 0; their output is masked by the
    caller and their cotangent is zero).  Kp mult of 128.
    """
    return _fwd(img, idx)


def _fwd(img, idx):
    b, hp, wp = img.shape
    kp = idx.shape[2]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, wp=wp, kp=kp),
        out_shape=jax.ShapeDtypeStruct((b, 8, 2 * kp), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 4, kp), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 2 * kp), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img, idx)
    return out[:, 0, :].reshape(b, 2, kp)


def _fwd_rule(img, idx):
    return _fwd(img, idx), (idx, img.shape)


def _bwd_rule(res, gbar):
    idx, (b, hp, wp) = res
    kp = idx.shape[2]
    # sublane-pad the cotangent to 8 rows (Mosaic block-shape rule)
    g = jnp.pad(gbar.reshape(b, 1, 2 * kp), [(0, 0), (0, 7), (0, 0)])
    dimg = pl.pallas_call(
        functools.partial(_bwd_kernel, wp=wp, hp=hp, kp=kp),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, kp), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 8, 2 * kp), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, g)
    return dimg, None


lightness_pairs_mxu.defvjp(_fwd_rule, _bwd_rule)


def fits_mxu_gather(h: int, w: int, k: int) -> bool:
    """VMEM feasibility for one grid step (fwd and bwd) with headroom."""
    hp, wp, kp = _pad_to(h, 8), _pad_to(w, 128), _pad_to(k, 128)
    fwd = (hp * wp * 4 + hp * 3 * wp * 2 + 3 * wp * 2 * kp * 2
           + hp * 2 * kp * 4 * 2)
    bwd = hp * 2 * kp * 4 + hp * 6 * kp * 2 + wp * 6 * kp * 2 + hp * wp * 4
    return max(fwd, bwd) < 80 * 1024 * 1024


def gather_pairs(plane, y1, x1, y2, x2):
    """Padded-dispatch wrapper: plane [B, H, W] f32, indices [B, K] i32
    (already clipped to [0, H-1]/[0, W-1]) -> (l1, l2) each [B, K].

    Pads plane to (8, 128)-aligned and K to a 128 multiple, runs the
    MXU kernel, slices back.  Gradient flows to ``plane`` via the
    scatter-matmul backward."""
    b, h, w = plane.shape
    k = y1.shape[1]
    hp, wp, kp = _pad_to(h, 8), _pad_to(w, 128), _pad_to(k, 128)
    if (hp, wp) != (h, w):
        plane = jnp.pad(plane, [(0, 0), (0, hp - h), (0, wp - w)])
    idx = jnp.stack([y1, x1, y2, x2], axis=1)          # [B, 4, K]
    if kp != k:
        idx = jnp.pad(idx, [(0, 0), (0, 0), (0, kp - k)])
    l = lightness_pairs_mxu(plane, idx)
    return l[:, 0, :k], l[:, 1, :k]
