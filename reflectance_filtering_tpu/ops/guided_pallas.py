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


# ---------------------------------------------------------------------------
# Banded variants: big frames (4K) band the image over a (batch, band) grid
# with manual halo DMA, and the guide statistics (means + cofactors +
# 1/det — everything src-independent) are computed ONCE and cached, which
# the iterated Zoran-style chain (BASELINE.json config 4) reuses across
# iterations: 13 box filters for the first pass, 8 per iteration after.
# ---------------------------------------------------------------------------


def _stats_kernel(ipad_hbm, out_st, iscr, sem, *, w: int, eps: float,
                  th: int, rows: int, tw: int, lanes: int, wout: int):
    """Guide-only statistics tile kernel: mean_I (3), cofactors (6),
    inv_det (1) -> 10 planes."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        ipad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        iscr, sem)
    cp.start()
    cp.wait()
    box = _mkbox(w, th, wout)
    I0, I1, I2 = iscr[0], iscr[1], iscr[2]
    m0, m1, m2 = box(I0), box(I1), box(I2)
    rr = box(I0 * I0) - m0 * m0 + eps
    rg = box(I0 * I1) - m0 * m1
    rb = box(I0 * I2) - m0 * m2
    gg = box(I1 * I1) - m1 * m1 + eps
    gb = box(I1 * I2) - m1 * m2
    bb = box(I2 * I2) - m2 * m2 + eps
    c00 = gg * bb - gb * gb
    c01 = gb * rb - rg * bb
    c02 = rg * gb - gg * rb
    c11 = rr * bb - rb * rb
    c12 = rb * rg - rr * gb
    c22 = rr * gg - rg * rg
    inv_det = 1.0 / (rr * c00 + rg * c01 + rb * c02)
    for k, plane in enumerate((m0, m1, m2, c00, c01, c02, c11, c12, c22,
                               inv_det)):
        out_st[0, k] = plane


def _apply_kernel(ipad_hbm, ppad_hbm, st_ref, out_ab, iscr, pscr, sem,
                  *, w: int, th: int, rows: int, tw: int, lanes: int,
                  wout: int):
    """Src-dependent half: box(p), box(I*p) -> a0,a1,a2,b using cached
    guide stats."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        ipad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        iscr, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(
        ppad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        pscr, sem)
    cp.start()
    cp.wait()
    box = _mkbox(w, th, wout)
    I0, I1, I2, p = iscr[0], iscr[1], iscr[2], pscr[0]
    m0, m1, m2 = st_ref[0, 0], st_ref[0, 1], st_ref[0, 2]
    c00, c01, c02 = st_ref[0, 3], st_ref[0, 4], st_ref[0, 5]
    c11, c12, c22 = st_ref[0, 6], st_ref[0, 7], st_ref[0, 8]
    inv_det = st_ref[0, 9]
    m_p = box(p)
    cov0 = box(I0 * p) - m0 * m_p
    cov1 = box(I1 * p) - m1 * m_p
    cov2 = box(I2 * p) - m2 * m_p
    a0 = (c00 * cov0 + c01 * cov1 + c02 * cov2) * inv_det
    a1 = (c01 * cov0 + c11 * cov1 + c12 * cov2) * inv_det
    a2 = (c02 * cov0 + c12 * cov1 + c22 * cov2) * inv_det
    out_ab[0, 0] = a0
    out_ab[0, 1] = a1
    out_ab[0, 2] = a2
    out_ab[0, 3] = m_p - (a0 * m0 + a1 * m1 + a2 * m2)


def _stage2_banded_kernel(abpad_hbm, iorig_ref, out_q, abscr, sem,
                          *, w: int, th: int, rows: int, tw: int,
                          lanes: int, wout: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        abpad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        abscr, sem)
    cp.start()
    cp.wait()
    box = _mkbox(w, th, wout)
    out_q[0, 0] = (box(abscr[0]) * iorig_ref[0, 0] +
                   box(abscr[1]) * iorig_ref[0, 1] +
                   box(abscr[2]) * iorig_ref[0, 2] +
                   box(abscr[3]))


def _band_geometry(h: int, wid: int, radius: int, th: int = None):
    """2-D tile geometry (th, nh, rows, tw, nw, lanes): output tile
    (th x tw), band counts (nh x nw), haloed DMA window (rows x lanes).

    A haloed tile must stay under ~2.25 MB — the stats kernel keeps ~10
    such temporaries live on the Mosaic stack (measured: 224x3968 rows
    wants 113 MB).  2-D tiles keep the halo overlap (work amplification)
    near (1+2r/th)(1+2r/tw) ~ 1.5x instead of the ~3x of full-width
    bands at 4K."""
    budget = int(2.25 * 1024 * 1024) // 4
    w128 = -(-wid // 128) * 128
    tw = min(w128, 1280)
    while True:
        lanes = -(-(tw + 2 * radius) // 128) * 128
        th_max = budget // lanes - 2 * radius
        th_max = min(256, (th_max // 8) * 8)
        if th_max >= 8 or tw <= 128:
            break
        tw -= 128
    th_eff = min(th if th else max(8, th_max), -(-h // 8) * 8)
    nh = -(-h // th_eff)
    nw = -(-w128 // tw)
    rows = -(-(th_eff + 2 * radius) // 8) * 8
    return th_eff, nh, rows, tw, nw, lanes


def _pad_banded(x, radius: int, geo, h: int, wid: int):
    """Reflect-pad by radius, then zero-pad so every tile DMA window
    exists.  x: [N, C, H, W]."""
    th, nh, rows, tw, nw, lanes = geo
    xp = jnp.pad(x, [(0, 0), (0, 0), (radius, radius), (radius, radius)],
                 mode=_PAD_MODE["reflect"])
    hneed = (nh - 1) * th + rows
    wneed = (nw - 1) * tw + lanes
    return jnp.pad(xp, [(0, 0), (0, 0), (0, hneed - (h + 2 * radius)),
                        (0, wneed - (wid + 2 * radius))])


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("radius", "eps", "th"))
def gf_guide_stats(guide, radius: int, eps: float, th: int = None):
    """guide [N,3,H,W] -> cached stats [N,10,H,W] (see _stats_kernel)."""
    n, _, h, wid = guide.shape
    w = 2 * radius + 1
    geo = _band_geometry(h, wid, radius, th)
    th, nh, rows, tw, nw, lanes = geo
    ipad = _pad_banded(guide, radius, geo, h, wid)
    st = pl.pallas_call(
        functools.partial(_stats_kernel, w=w, eps=float(eps), th=th,
                          rows=rows, tw=tw, lanes=lanes, wout=tw),
        out_shape=jax.ShapeDtypeStruct((n, 10, nh * th, nw * tw),
                                       jnp.float32),
        grid=(n, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 10, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, rows, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(ipad)
    return st[:, :, :h, :wid]


@functools.partial(jax.jit, static_argnames=("radius", "th"))
def gf_apply_with_stats(guide, src, stats, radius: int, th: int = None):
    """One guided-filter application using cached guide stats.

    guide [N,3,H,W], src [N,1,H,W], stats [N,10,H,W] -> q [N,1,H,W].
    8 box filters (4 in the apply stage, 4 in the mean-a,b stage)."""
    n, _, h, wid = guide.shape
    w = 2 * radius + 1
    geo = _band_geometry(h, wid, radius, th)
    th, nh, rows, tw, nw, lanes = geo

    stp = jnp.pad(stats, [(0, 0), (0, 0), (0, nh * th - h),
                          (0, nw * tw - wid)])
    ipad = _pad_banded(guide, radius, geo, h, wid)
    ppad = _pad_banded(src, radius, geo, h, wid)
    ab = pl.pallas_call(
        functools.partial(_apply_kernel, w=w, th=th, rows=rows, tw=tw,
                          lanes=lanes, wout=tw),
        out_shape=jax.ShapeDtypeStruct((n, 4, nh * th, nw * tw),
                                       jnp.float32),
        grid=(n, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 10, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, rows, lanes), jnp.float32),
                        pltpu.VMEM((1, rows, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(ipad, ppad, stp)[:, :, :h, :wid]

    gpad = jnp.pad(guide, [(0, 0), (0, 0), (0, nh * th - h),
                           (0, nw * tw - wid)])
    abpad = _pad_banded(ab, radius, geo, h, wid)
    q = pl.pallas_call(
        functools.partial(_stage2_banded_kernel, w=w, th=th, rows=rows,
                          tw=tw, lanes=lanes, wout=tw),
        out_shape=jax.ShapeDtypeStruct((n, 1, nh * th, nw * tw),
                                       jnp.float32),
        grid=(n, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 3, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, rows, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(abpad, gpad)
    return q[:, :, :h, :wid]


def guided_filter_fused_banded(guide, src, radius: int, eps: float,
                               th: int = None):
    """Band-tiled fused guided filter for frames too big for the
    whole-plane path.  guide [N,3,H,W], src [N,1,H,W] -> [N,1,H,W]."""
    stats = gf_guide_stats(guide, radius, float(eps), th)
    return gf_apply_with_stats(guide, src, stats, radius, th)


def guided_filter_fused_iterated(guide, src, radius: int, eps: float,
                                 iterations: int = 3, th: int = None):
    """Zoran-style iterated chain with the guide statistics computed once
    and reused every iteration (they depend only on the guide)."""
    stats = gf_guide_stats(guide, radius, float(eps), th)
    out = src
    for _ in range(iterations):
        out = gf_apply_with_stats(guide, out, stats, radius, th)
    return out


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
