"""Fused Pallas guided filter (color guide, single src channel).

Replaces the multi-kernel guided-filter pipeline (ops/guided.py
_guided_filter_color_planar — itself the TPU rebuild of
cv2.ximgproc.guidedFilter, SURVEY.md N4) with TWO Pallas kernels per
batch:

  stage 1: DMA padded guide+src planes into VMEM, build all 13 moment
           planes (I, p, I*p, unique I⊗I), box-filter each with the fused
           in-VMEM window-sum (box_pallas._window_sum_tile), run the
           symmetric 3x3 cofactor solve, emit a0,a1,a2,b — one HBM read
           of 4 planes, one write of 4.
  stage 2: DMA padded a,b planes + the unpadded guide, box-filter a,b,
           emit q = mean_a . I + mean_b.

The unfused path writes/reads every moment and mean plane through HBM
(~35 MB/image vs ~9 here) and pays an XLA kernel per hop.  Border
semantics match OpenCV BORDER_REFLECT (np 'symmetric'), numerics are
plain f32 box sums — identical math to ops/guided.py, gated by the same
float64-oracle tests.

Whole padded planes must fit VMEM: this path handles images up to
~1000x1000 (4 MB/plane); callers fall back to ops/guided.py beyond that.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .box_pallas import _window_sum_tile, _PAD_MODE


def _mkbox(w: int, hout: int, wout: int):
    scale = 1.0 / (w * w)

    def box(t):
        s = _window_sum_tile(t, w, axis=1)
        s = _window_sum_tile(s[:, :wout], w, axis=0)
        return s[:hout, :] * scale

    return box


def _stage1_kernel(ipad, ppad, out_ab, *, w: int, eps: float,
                   hout: int, wout: int):
    box = _mkbox(w, hout, wout)
    I0, I1, I2 = ipad[0, 0], ipad[0, 1], ipad[0, 2]
    p = ppad[0, 0]

    m_i0, m_i1, m_i2, m_p = box(I0), box(I1), box(I2), box(p)
    cov0 = box(I0 * p) - m_i0 * m_p
    cov1 = box(I1 * p) - m_i1 * m_p
    cov2 = box(I2 * p) - m_i2 * m_p
    rr = box(I0 * I0) - m_i0 * m_i0 + eps
    rg = box(I0 * I1) - m_i0 * m_i1
    rb = box(I0 * I2) - m_i0 * m_i2
    gg = box(I1 * I1) - m_i1 * m_i1 + eps
    gb = box(I1 * I2) - m_i1 * m_i2
    bb = box(I2 * I2) - m_i2 * m_i2 + eps

    c00 = gg * bb - gb * gb
    c01 = gb * rb - rg * bb
    c02 = rg * gb - gg * rb
    c11 = rr * bb - rb * rb
    c12 = rb * rg - rr * gb
    c22 = rr * gg - rg * rg
    inv_det = 1.0 / (rr * c00 + rg * c01 + rb * c02)

    a0 = (c00 * cov0 + c01 * cov1 + c02 * cov2) * inv_det
    a1 = (c01 * cov0 + c11 * cov1 + c12 * cov2) * inv_det
    a2 = (c02 * cov0 + c12 * cov1 + c22 * cov2) * inv_det
    out_ab[0, 0] = a0
    out_ab[0, 1] = a1
    out_ab[0, 2] = a2
    out_ab[0, 3] = m_p - (a0 * m_i0 + a1 * m_i1 + a2 * m_i2)


def _stage2_kernel(abpad, iorig, out_q, *, w: int, hout: int, wout: int):
    box = _mkbox(w, hout, wout)
    out_q[0, 0] = (box(abpad[0, 0]) * iorig[0, 0] +
                   box(abpad[0, 1]) * iorig[0, 1] +
                   box(abpad[0, 2]) * iorig[0, 2] +
                   box(abpad[0, 3]))


_PLANE_LIMIT = 4 * 1024 * 1024


def fits_fused_guided(h: int, wid: int, radius: int) -> bool:
    hp8 = -(-(h + 2 * radius) // 8) * 8
    wp128 = -(-(wid + 2 * radius) // 128) * 128
    return (h % 8 == 0 and wid % 128 == 0
            and hp8 * wp128 * 4 <= _PLANE_LIMIT)


@functools.partial(jax.jit, static_argnames=("radius", "eps"))
def guided_filter_fused(guide, src, radius: int, eps: float):
    """guide [N,3,H,W], src [N,1,H,W] float32 -> [N,1,H,W].

    eps is static (it folds into the kernel); H % 8 == 0, W % 128 == 0,
    padded plane <= _PLANE_LIMIT (see fits_fused_guided).
    """
    n, _, h, wid = guide.shape
    w = 2 * radius + 1
    hp8 = -(-(h + 2 * radius) // 8) * 8
    wp128 = -(-(wid + 2 * radius) // 128) * 128

    def pad(x):
        xp = jnp.pad(x, [(0, 0), (0, 0), (radius, radius),
                         (radius, radius)], mode=_PAD_MODE["reflect"])
        return jnp.pad(xp, [(0, 0), (0, 0), (0, hp8 - h - 2 * radius),
                            (0, wp128 - wid - 2 * radius)])

    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    ab = pl.pallas_call(
        functools.partial(_stage1_kernel, w=w, eps=float(eps),
                          hout=h, wout=wid),
        out_shape=jax.ShapeDtypeStruct((n, 4, h, wid), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 3, hp8, wp128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, hp8, wp128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, h, wid), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=vmem,
    )(pad(guide), pad(src))

    q = pl.pallas_call(
        functools.partial(_stage2_kernel, w=w, hout=h, wout=wid),
        out_shape=jax.ShapeDtypeStruct((n, 1, h, wid), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 4, hp8, wp128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, h, wid), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, h, wid), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=vmem,
    )(pad(ab), guide)
    return q
