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

    box.multi = lambda planes: [box(t) for t in planes]
    return box


# ---------------------------------------------------------------------------
# MXU block-banded box: the length-w window sum along an axis is a matmul
# against a banded 0/1 matrix, tiled so each 128-wide output block only
# contracts the kb = 1 + ceil(2r/128) k-tiles its band touches — FLOPs per
# pixel are kb*128 MACs per axis pass regardless of image width (a dense
# band matrix would scale with W, which is why it lost at 4K).  The 0/1
# entries are exact in bf16, so only the data side splits (hi/lo, f32
# accumulation — ~2e-4 max err in 0-255 units vs a float64 oracle, the
# scheme gate-tested in ops/guided_mxu.py).  Every plane gets the split:
# the public planar APIs accept arbitrary float guides, so no path may
# assume u8-integer (bf16-exact) inputs.
# ---------------------------------------------------------------------------

_BF = jnp.bfloat16
F32 = jnp.float32


def _band_mat(r2: int, kb: int, g: int, transpose: bool, off: int = 0):
    """0/1 band block [(g+kb-1)*128, g*128] (or its transpose):
    S[k, c] = 1 iff c + off <= k <= c + off + 2r — one dot emits g output
    blocks.  Built from iotas in-kernel — no operand plumbing.  `off`
    shifts the whole band down the k axis: used when the haloed input
    window starts off-by-(alignment) above/left of the mathematically
    needed [-2r, ...) origin so DMA offsets and in-kernel interior
    slices stay (8, 128)-aligned.  off + r2 must stay <= (kb-1)*128
    (guaranteed for off = (-r2) % 128: they are equal)."""
    kk, cc = (g + kb - 1) * 128, g * 128
    shape = (cc, kk) if transpose else (kk, cc)
    kax, cax = (1, 0) if transpose else (0, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, shape, kax)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, cax)
    return jnp.where((c + off <= k) & (k <= c + off + r2),
                     1.0, 0.0).astype(_BF)


# Output blocks emitted per row-pass dot.  g > 1 trades extra MACs per
# value (K = (g+kb-1)*128 instead of kb*128) for g x fewer MXU dots —
# the per-dot issue overhead, not FLOPs, dominates these band matmuls.
_ROW_G = 2


def _mkbox_mxu(w: int, th: int, tw: int, rows: int,
               row_off: int = 0, lane_off: int = 0):
    """Box factory for haloed [rows, lanes] tiles -> [th, tw] means.

    Requires tw % 128 == 0 and th % 8 == 0 (see _band_geometry_mxu); a
    th off the 128 grid emits a partial final col-pass block (the dot
    runs at full 128 M anyway — MXU passes don't shrink with M — and
    the tail rows are sliced off in VMEM).  Exact-divide tilings of
    2160-row frames (th=240) need this: no 128-multiple divides 2160.
    box_multi filters a whole GROUP of planes with shared dots: planes
    ride the M dimension in the row pass and the N dimension in the col
    pass, so the dot count per tile is ~14 instead of ~28 per plane.
    row_off/lane_off shift the band start when the input window begins
    above/left of the [-2r, ...) origin (aligned-halo layouts).
    """
    r2 = w - 1
    kb = 1 + -(-r2 // 128)
    g = _ROW_G if tw % (_ROW_G * 128) == 0 else 1
    nblk = -(-th // 128)                        # col-pass blocks (last may
    rows_rs = (nblk - 1) * 128 + kb * 128       # be partial); rows read
    kw = (g + kb - 1) * 128
    S = [_band_mat(r2, kb, g, transpose=False, off=lane_off)] * (
        tw // (g * 128))                        # rows pass (lanes axis)
    M = [_band_mat(r2, kb, 1, transpose=True,
                   off=row_off)] * nblk         # cols pass (sublanes)
    scale = 1.0 / (w * w)

    def dot_split(a, b, lhs_split):
        x = a if lhs_split else b
        xhi = x.astype(_BF)
        xlo = (x - xhi.astype(F32)).astype(_BF)
        if lhs_split:
            return (jnp.dot(xhi, b, preferred_element_type=F32) +
                    jnp.dot(xlo, b, preferred_element_type=F32))
        return (jnp.dot(a, xhi, preferred_element_type=F32) +
                jnp.dot(a, xlo, preferred_element_type=F32))

    def box_multi(planes):
        p = len(planes)
        x = planes[0] if p == 1 else jnp.concatenate(planes, axis=0)
        blocks = []
        for j in range(tw // (g * 128)):
            sl = x[:, j * g * 128:j * g * 128 + kw]
            blocks.append(dot_split(sl, S[j], lhs_split=True))
        rs = jnp.concatenate(blocks, axis=1)        # [p*rows, tw]
        # restack planes along lanes so the col pass shares dots too
        if p > 1:
            rs = jnp.concatenate(
                [rs[i * rows:(i + 1) * rows] for i in range(p)], axis=1)
        if rows_rs > rows:
            rs = jnp.concatenate(
                [rs, jnp.zeros((rows_rs - rows, p * tw), F32)],
                axis=0)
        outs = []
        for i in range(nblk):
            sl = rs[i * 128:i * 128 + kb * 128, :]
            outs.append(dot_split(M[i], sl, lhs_split=False))
        out = jnp.concatenate(outs, axis=0)[:th] * scale  # [th, p*tw]
        if p == 1:
            return [out]
        return [out[:, i * tw:(i + 1) * tw] for i in range(p)]

    def box(x):
        return box_multi([x])[0]

    box.multi = box_multi
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
                  th: int, rows: int, tw: int, lanes: int, wout: int,
                  mxu: bool = False):
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
    box = _mkbox_mxu(w, th, wout, rows) if mxu else _mkbox(w, th, wout)
    I0, I1, I2 = iscr[0], iscr[1], iscr[2]
    m0, m1, m2 = box.multi([I0, I1, I2])
    b00, b01, b02, b11, b12, b22 = box.multi(
        [I0 * I0, I0 * I1, I0 * I2, I1 * I1, I1 * I2, I2 * I2])
    rr = b00 - m0 * m0 + eps
    rg = b01 - m0 * m1
    rb = b02 - m0 * m2
    gg = b11 - m1 * m1 + eps
    gb = b12 - m1 * m2
    bb = b22 - m2 * m2 + eps
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
                  psem, *, w: int, th: int, rows: int, tw: int,
                  lanes: int, wout: int, mxu: bool = False):
    """Src-dependent half: box(p), box(I*p) -> a0,a1,a2,b using cached
    guide stats."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cpi = pltpu.make_async_copy(
        ipad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        iscr, sem)
    cpi.start()
    cpp = pltpu.make_async_copy(
        ppad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        pscr, psem)
    cpp.start()
    cpi.wait()
    cpp.wait()
    box = _mkbox_mxu(w, th, wout, rows) if mxu else _mkbox(w, th, wout)
    I0, I1, I2, p = iscr[0], iscr[1], iscr[2], pscr[0]
    m0, m1, m2 = st_ref[0, 0], st_ref[0, 1], st_ref[0, 2]
    c00, c01, c02 = st_ref[0, 3], st_ref[0, 4], st_ref[0, 5]
    c11, c12, c22 = st_ref[0, 6], st_ref[0, 7], st_ref[0, 8]
    inv_det = st_ref[0, 9]
    m_p, bip0, bip1, bip2 = box.multi([p, I0 * p, I1 * p, I2 * p])
    cov0 = bip0 - m0 * m_p
    cov1 = bip1 - m1 * m_p
    cov2 = bip2 - m2 * m_p
    a0 = (c00 * cov0 + c01 * cov1 + c02 * cov2) * inv_det
    a1 = (c01 * cov0 + c11 * cov1 + c12 * cov2) * inv_det
    a2 = (c02 * cov0 + c12 * cov1 + c22 * cov2) * inv_det
    out_ab[0, 0] = a0
    out_ab[0, 1] = a1
    out_ab[0, 2] = a2
    out_ab[0, 3] = m_p - (a0 * m0 + a1 * m1 + a2 * m2)


def _stage2_banded_kernel(abpad_hbm, iorig_ref, out_q, abscr, sem,
                          *, w: int, th: int, rows: int, tw: int,
                          lanes: int, wout: int, mxu: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        abpad_hbm.at[b, :, pl.ds(i * th, rows), pl.ds(j * tw, lanes)],
        abscr, sem)
    cp.start()
    cp.wait()
    box = _mkbox_mxu(w, th, wout, rows) if mxu else _mkbox(w, th, wout)
    ma0, ma1, ma2, mb = box.multi(
        [abscr[0], abscr[1], abscr[2], abscr[3]])
    out_q[0, 0] = (ma0 * iorig_ref[0, 0] + ma1 * iorig_ref[0, 1] +
                   ma2 * iorig_ref[0, 2] + mb)


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


def _band_geometry_mxu(h: int, wid: int, radius: int):
    """Tile geometry for the MXU block-banded box path: th and tw are
    multiples of 128 so the per-128-block band dots line up with k-tiles.
    lanes = tw + (kb-1)*128 exactly fits the last row block's slice."""
    kb = 1 + -(-2 * radius // 128)
    w128 = -(-wid // 128) * 128
    budget = int(2.4 * 1024 * 1024) // 4
    th = 256 if -(-h // 8) * 8 >= 256 else 128
    tw = min(w128, 1280)
    while True:
        lanes = tw + (kb - 1) * 128
        rows = -(-(th + 2 * radius) // 8) * 8
        if rows * lanes <= budget or (tw <= 128 and th <= 128):
            break
        if tw > 128:
            tw -= 128
        else:
            th = 128
    nh = -(-h // th)
    nw = -(-w128 // tw)
    return th, nh, rows, tw, nw, lanes


def _use_mxu(h: int, radius: int, th) -> bool:
    """The band-dot path needs 128-aligned tiles and only pays off once
    the window is wide (small windows: the VPU doubling chain is ~log w
    shift+adds and cheaper than kb*128 MACs)."""
    return th is None and radius >= 8 and h >= 128


def _pad_banded(x, radius: int, geo, h: int, wid: int):
    """Reflect-pad by radius, extended so every tile DMA window exists.
    x: [N, C, H, W].

    Preferably ONE pad op (HBM copies dominate the 4K chain): the tail
    beyond row h+2r / col w+2r is only read into window sums of outputs
    that the caller slices away, so over-reflecting there (instead of
    zero-filling) is harmless — any finite values do."""
    th, nh, rows, tw, nw, lanes = geo
    bot = (nh - 1) * th + rows - h - radius
    right = (nw - 1) * tw + lanes - wid - radius
    if radius <= h and radius <= wid and bot <= h and right <= wid:
        return jnp.pad(x, [(0, 0), (0, 0), (radius, bot), (radius, right)],
                       mode=_PAD_MODE["reflect"])
    xp = jnp.pad(x, [(0, 0), (0, 0), (radius, radius), (radius, radius)],
                 mode=_PAD_MODE["reflect"])
    return jnp.pad(xp, [(0, 0), (0, 0), (0, bot - radius),
                        (0, right - radius)])


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _geometry(h: int, wid: int, radius: int, th):
    mxu = _use_mxu(h, radius, th)
    geo = (_band_geometry_mxu(h, wid, radius) if mxu
           else _band_geometry(h, wid, radius, th))
    return mxu, geo


def _stats_call(ipad, n, geo, w, eps, mxu):
    """ipad (haloed guide) -> stats in PADDED tile layout
    [N,10,nh*th,nw*tw] (mean_I x3, cofactors x6, inv_det)."""
    th, nh, rows, tw, nw, lanes = geo
    return pl.pallas_call(
        functools.partial(_stats_kernel, w=w, eps=float(eps), th=th,
                          rows=rows, tw=tw, lanes=lanes, wout=tw, mxu=mxu),
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


def _apply_call(ipad, ppad, stp, n, geo, w, mxu):
    """Haloed guide+src + padded stats -> a0,a1,a2,b in PADDED layout."""
    th, nh, rows, tw, nw, lanes = geo
    return pl.pallas_call(
        functools.partial(_apply_kernel, w=w, th=th, rows=rows, tw=tw,
                          lanes=lanes, wout=tw, mxu=mxu),
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
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
    )(ipad, ppad, stp)


def _stage2_call(abpad, gpad, n, geo, w, mxu):
    """Haloed a,b + padded guide -> q in PADDED layout."""
    th, nh, rows, tw, nw, lanes = geo
    return pl.pallas_call(
        functools.partial(_stage2_banded_kernel, w=w, th=th, rows=rows,
                          tw=tw, lanes=lanes, wout=tw, mxu=mxu),
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


def guided_filter_fused_banded(guide, src, radius: int, eps: float,
                               th: int = None, guide_u8: bool = False):
    """Band-tiled fused guided filter for frames too big for the
    whole-plane path.  guide [N,3,H,W], src [N,1,H,W] -> [N,1,H,W]."""
    return guided_filter_fused_iterated(guide, src, radius, float(eps),
                                        1, th, guide_u8=guide_u8)


# ---------------------------------------------------------------------------
# Single-kernel-per-iteration fused path: the per-pallas_call floor (DMA
# stalls + per-tile launch overhead, ~1.5 ms at 4K) dominates once the
# boxes are MXU band dots, so one kernel computes a,b on an r-haloed
# region AND box-filters them down to q.  Guide statistics are emitted by
# a stats kernel in a REDUNDANT per-tile haloed layout (each tile's slot
# stores the stats for its own halo region), so the fused kernel fetches
# them with a plain pipelined BlockSpec — no XLA pad of 9 planes per
# iteration.  Halo DMAs are double-buffered (prefetch tile t+1's windows
# before computing tile t).
# ---------------------------------------------------------------------------


def _use_fused_mxu(h: int, radius: int, th) -> bool:
    return th is None and 8 <= radius <= 64 and h >= 256


def _fused_geometry(h: int, wid: int, radius: int,
                    tile_rows: int = None, tile_lanes: int = None):
    """th, tw: output tile; thA, twA: stage-A (a,b field) region, covering
    [-r, th+r) x [-r, tw+r); rowsA, lanesA: haloed DMA window (2r).

    tile_rows/tile_lanes override the defaults (mult of 8 / 128), which
    adapt to the frame (all numbers: best-of-3 slope-timed 3x GF chains
    on a quiet v5e, 2026-08-19):

    - rows drop from 256 to 240 when that does NOT add a tile row: at
      2160 rows (4K) both need 9 tiles but 240 pads zero rows vs 144
      dead rows for 256 — 3% faster (7.00 vs 7.14 ms).  When 240 would
      add a tile (4320 rows: 18 vs 17), the extra per-tile cost
      outweighs the small waste — 256 wins by 5% at 8K (26.4 vs 27.8).
    - lanes drop from 1024 to 768 when 1024 tiles leave dead lanes and
      768 divides exactly: 3% at 4K (6.76 vs 6.87) AND at 8K (25.56 vs
      26.35) — the extra tile column costs less than 6.7% dead lanes.
      Narrower exact tiles lose (640: 7.55/28.64), and a non-exact 896
      loses badly (8.49): lane waste is the dominant term."""
    def up(v, m):
        return -(-v // m) * m
    kb = 1 + -(-2 * radius // 128)
    th = tile_rows or (240 if -(-h // 240) == -(-h // 256) else 256)
    w128 = up(wid, 128)
    tw = tile_lanes or min(w128, 1024)
    if tile_lanes is None and w128 % tw and w128 % 768 == 0:
        tw = 768
    thA = up(th + 2 * radius, 128)
    twA = up(tw + 2 * radius, 128)
    rowsA = up(thA + 2 * radius, 8)
    lanesA = twA + (kb - 1) * 128
    nh = -(-h // th)
    nw = -(-up(wid, 128) // tw)
    return th, tw, thA, twA, rowsA, lanesA, nh, nw


def _fused_offsets(radius: int):
    """Aligned-halo geometry: the DMA window for tile (i, j) starts at
    padded-buffer offset (i*th, j*tw) and the buffer's top/left pads are
    TP = r2 + row_off rows and LP = r2 + lane_off lanes, so the tile's
    own [0, th) x [0, tw) interior sits at the (8, 128)-aligned scratch
    offset (TP, LP) — the kernels read the interior guide straight out
    of the already-fetched window instead of a separate unpadded-guide
    operand (at 4K that operand was 113 MB of pure extra HBM traffic per
    kernel call).  The band matrices shift by (row_off, lane_off); the
    existing rowsA/lanesA roundings absorb the shift exactly (both
    spares equal (-r2) % alignment)."""
    r2 = 2 * radius
    row_off = (-r2) % 8
    lane_off = (-r2) % 128
    return r2 + row_off, r2 + lane_off, row_off, lane_off


def _pad_fused(x, radius: int, geo, h: int, wid: int):
    """Reflect-pad by TP/LP >= 2r (see _fused_offsets), extended so every
    tile DMA window exists (the over-reflected tail is only read into
    outputs the caller slices away; over-reflect keeps values finite,
    which matters for the 1/det in the stats halo).  The extra
    [TP-2r, LP-2r) alignment rows/lanes are never selected by the
    shifted band matrices — they only need to exist and be finite."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    tp, lp, _, _ = _fused_offsets(radius)
    r2 = 2 * radius
    bot = (nh - 1) * th + rowsA - h - tp
    right = (nw - 1) * tw + lanesA - wid - lp
    if tp <= h - 1 and lp <= wid - 1 and bot <= h and right <= wid:
        return jnp.pad(x, [(0, 0), (0, 0), (tp, bot), (lp, right)],
                       mode=_PAD_MODE["reflect"])
    xp = jnp.pad(x, [(0, 0), (0, 0), (r2, r2), (r2, r2)],
                 mode=_PAD_MODE["reflect"])
    return jnp.pad(xp, [(0, 0), (0, 0), (tp - r2, bot - r2),
                        (lp - r2, right - r2)])


def _fits_single_pad(radius: int, geo, h: int, wid: int) -> bool:
    """True when _pad_fused's single-jnp.pad branch applies — also the
    condition for _fill_margins to reproduce it exactly."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    tp, lp, _, _ = _fused_offsets(radius)
    bot = (nh - 1) * th + rowsA - h - tp
    right = (nw - 1) * tw + lanesA - wid - lp
    return tp <= h - 1 and lp <= wid - 1 and bot <= h and right <= wid


def _fill_margins(buf, radius: int, geo, h: int, wid: int):
    """Rebuild the reflect margins of a PADDED-layout q buffer in place
    (thin strip updates, ~23 MB at 4K vs ~130 MB for the slice +
    full-frame reflect-pad it replaces).  Bitwise identical to
    _pad_fused's single-pad branch: rows first over interior lanes, then
    lanes over full rows — numpy's symmetric-pad axis order, so the
    corners match too.  Requires _fits_single_pad."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    tp, lp, _, _ = _fused_offsets(radius)
    ph, pw = buf.shape[2], buf.shape[3]
    bot, right = ph - tp - h, pw - lp - wid
    buf = buf.at[:, :, :tp, lp:lp + wid].set(
        jnp.flip(buf[:, :, tp:2 * tp, lp:lp + wid], 2))
    if bot:
        buf = buf.at[:, :, tp + h:, lp:lp + wid].set(
            jnp.flip(buf[:, :, tp + h - bot:tp + h, lp:lp + wid], 2))
    buf = buf.at[:, :, :, :lp].set(jnp.flip(buf[:, :, :, lp:2 * lp], 3))
    if right:
        buf = buf.at[:, :, :, lp + wid:].set(
            jnp.flip(buf[:, :, :, lp + wid - right:lp + wid], 3))
    return buf


def _prefetch_window(hbm, scr, sem, tt, sl, th, tw, rowsA, lanesA, nh, nw):
    """Start the async fetch of tile tt's haloed window: it starts at
    (i*th, j*tw) of the TP/LP-padded buffer (see _fused_offsets)."""
    b2 = tt // (nh * nw)
    rr = tt % (nh * nw)
    i2 = rr // nw
    j2 = rr % nw
    return pltpu.make_async_copy(
        hbm.at[b2, :, pl.ds(i2 * th, rowsA), pl.ds(j2 * tw, lanesA)],
        scr.at[sl], sem.at[sl])


def _q_copy(out_q, qscr, qsem, tt, geo, tp, lp):
    """Async copy of tile tt's q from its scratch slot into the PADDED
    output buffer at (TP + i*th, LP + j*tw) — all offsets (8, 128)-
    aligned by construction (_fused_offsets).  Emitting q pre-padded
    lets the iterated chain feed the next iteration directly: only thin
    reflect strips need rebuilding, instead of a full-frame XLA
    slice + reflect-pad round trip per iteration (~130 MB of glue
    traffic at 4K)."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    b2 = tt // (nh * nw)
    rr = tt % (nh * nw)
    i2 = rr // nw
    j2 = rr % nw
    sl = jax.lax.rem(tt, 2)
    return pltpu.make_async_copy(
        qscr.at[sl],
        out_q.at[b2, 0, pl.ds(tp + i2 * th, th), pl.ds(lp + j2 * tw, tw)],
        qsem.at[sl])


def _emit_q(out_q, qscr, qsem, t, nsteps, val, geo, tp, lp):
    """Write tile t's q value: double-buffered manual DMA (wait the
    copy that last used this slot, write, start, drain at the end)."""
    @pl.when(t >= 2)
    def _():
        _q_copy(out_q, qscr, qsem, t - 2, geo, tp, lp).wait()

    sl = jax.lax.rem(t, 2)
    qscr[sl] = val
    _q_copy(out_q, qscr, qsem, t, geo, tp, lp).start()

    @pl.when((t + 1 == nsteps) & (nsteps >= 2))
    def _():
        _q_copy(out_q, qscr, qsem, t - 1, geo, tp, lp).wait()

    @pl.when(t + 1 == nsteps)
    def _():
        _q_copy(out_q, qscr, qsem, t, geo, tp, lp).wait()


def _fused_gf_kernel(ipad_hbm, ppad_hbm, st_ref, out_q, iscr, pscr,
                     isem, psem, qscr=None, qsem=None, *, w: int, geo):
    """One guided-filter application: a,b on the [-r, th+r) halo region,
    then mean_a, mean_b boxed down to the [th, tw] output tile.  The
    final q = mean_a . I + mean_b reads the interior guide straight out
    of the haloed window already in VMEM (aligned at (TP, LP), see
    _fused_offsets) — no separate unpadded-guide operand.  With
    qscr/qsem present, out_q is the PADDED layout and q is emitted by
    manual DMA (see _q_copy)."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nsteps = pl.num_programs(0) * nh * nw
    t = (b * nh + i) * nw + j
    slot = jax.lax.rem(t, 2)
    tp, lp, r_off, l_off = _fused_offsets((w - 1) // 2)

    def fetch(tt, isl):
        return (_prefetch_window(ipad_hbm, iscr, isem, tt, isl,
                                 th, tw, rowsA, lanesA, nh, nw),
                _prefetch_window(ppad_hbm, pscr, psem, tt, isl,
                                 th, tw, rowsA, lanesA, nh, nw))

    @pl.when(t == 0)
    def _():
        for cp in fetch(t, slot):
            cp.start()

    @pl.when(t + 1 < nsteps)
    def _():
        for cp in fetch(t + 1, 1 - slot):
            cp.start()

    for cp in fetch(t, slot):
        cp.wait()

    # bf16 guide windows (u8-exact storage) convert to f32 here;
    # for f32 storage the astype is a no-op
    I0 = iscr[slot, 0].astype(jnp.float32)
    I1 = iscr[slot, 1].astype(jnp.float32)
    I2 = iscr[slot, 2].astype(jnp.float32)
    p = pscr[slot, 0]
    boxA = _mkbox_mxu(w, thA, twA, rowsA, row_off=r_off,
                      lane_off=l_off)
    ir, il = tp, lp                         # interior offset in window
    m_p, bip0, bip1, bip2 = boxA.multi([p, I0 * p, I1 * p, I2 * p])
    m0, m1, m2 = st_ref[0, 0], st_ref[0, 1], st_ref[0, 2]
    d00, d01, d02 = st_ref[0, 3], st_ref[0, 4], st_ref[0, 5]
    d11, d12, d22 = st_ref[0, 6], st_ref[0, 7], st_ref[0, 8]
    cov0 = bip0 - m0 * m_p
    cov1 = bip1 - m1 * m_p
    cov2 = bip2 - m2 * m_p
    a0 = d00 * cov0 + d01 * cov1 + d02 * cov2
    a1 = d01 * cov0 + d11 * cov1 + d12 * cov2
    a2 = d02 * cov0 + d12 * cov1 + d22 * cov2
    bf = m_p - a0 * m0 - a1 * m1 - a2 * m2
    boxB = _mkbox_mxu(w, th, tw, thA)
    ma0, ma1, ma2, mb = boxB.multi([a0, a1, a2, bf])

    def interior(v):
        return v[ir:ir + th, il:il + tw]

    val = (ma0 * interior(I0) + ma1 * interior(I1) +
           ma2 * interior(I2) + mb)
    if qscr is None:
        out_q[0, 0] = val
    else:
        _emit_q(out_q, qscr, qsem, t, nsteps, val, geo, tp, lp)


def _fused_gf_iter1_kernel(ipad_hbm, ppad_hbm, st_hbm, out_q,
                           iscr, pscr, stscr, isem, psem, stsem,
                           qscr=None, qsem=None,
                           *, w: int, eps: float, geo):
    """First GF iteration: guide stats computed in-kernel (into the
    per-tile haloed slot layout), DMA'd out for later iterations, and
    used immediately for a,b -> q — one kernel instead of stats+apply.
    The stats scratch doubles as the m/d working planes, and its HBM
    write drains while the apply-phase dots run."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nsteps = pl.num_programs(0) * nh * nw
    t = (b * nh + i) * nw + j
    slot = jax.lax.rem(t, 2)
    tp, lp, r_off, l_off = _fused_offsets((w - 1) // 2)

    def st_copy(tt):
        b2 = tt // (nh * nw)
        rr = tt % (nh * nw)
        i2 = rr // nw
        j2 = rr % nw
        return pltpu.make_async_copy(
            stscr,
            st_hbm.at[b2, :, pl.ds(i2 * thA, thA), pl.ds(j2 * twA, twA)],
            stsem)

    def fetch(tt, isl):
        return (_prefetch_window(ipad_hbm, iscr, isem, tt, isl,
                                 th, tw, rowsA, lanesA, nh, nw),
                _prefetch_window(ppad_hbm, pscr, psem, tt, isl,
                                 th, tw, rowsA, lanesA, nh, nw))

    @pl.when(t == 0)
    def _():
        for cp in fetch(t, slot):
            cp.start()

    @pl.when(t + 1 < nsteps)
    def _():
        for cp in fetch(t + 1, 1 - slot):
            cp.start()

    for cp in fetch(t, slot):
        cp.wait()
    # the previous tile's stats write must drain before we overwrite
    @pl.when(t > 0)
    def _():
        st_copy(t - 1).wait()

    # bf16 guide windows (u8-exact storage) convert to f32 here;
    # for f32 storage the astype is a no-op
    I0 = iscr[slot, 0].astype(jnp.float32)
    I1 = iscr[slot, 1].astype(jnp.float32)
    I2 = iscr[slot, 2].astype(jnp.float32)
    p = pscr[slot, 0]
    boxA = _mkbox_mxu(w, thA, twA, rowsA, row_off=r_off,
                      lane_off=l_off)
    ir, il = tp, lp
    m0, m1, m2 = boxA.multi([I0, I1, I2])
    b00, b01, b02 = boxA.multi([I0 * I0, I0 * I1, I0 * I2])
    b11, b12, b22 = boxA.multi([I1 * I1, I1 * I2, I2 * I2])
    rr = b00 - m0 * m0 + eps
    rg = b01 - m0 * m1
    rb = b02 - m0 * m2
    gg = b11 - m1 * m1 + eps
    gb = b12 - m1 * m2
    bb = b22 - m2 * m2 + eps
    c00 = gg * bb - gb * gb
    c01 = gb * rb - rg * bb
    c02 = rg * gb - gg * rb
    c11 = rr * bb - rb * rb
    c12 = rb * rg - rr * gb
    c22 = rr * gg - rg * rg
    inv_det = 1.0 / (rr * c00 + rg * c01 + rb * c02)
    for kk, plane in enumerate((m0, m1, m2, c00 * inv_det, c01 * inv_det,
                                c02 * inv_det, c11 * inv_det,
                                c12 * inv_det, c22 * inv_det)):
        stscr[kk] = plane
    st_copy(t).start()   # drains while the apply dots run

    m_p, bip0, bip1, bip2 = boxA.multi([p, I0 * p, I1 * p, I2 * p])
    d00, d01, d02 = stscr[3], stscr[4], stscr[5]
    d11, d12, d22 = stscr[6], stscr[7], stscr[8]
    cov0 = bip0 - stscr[0] * m_p
    cov1 = bip1 - stscr[1] * m_p
    cov2 = bip2 - stscr[2] * m_p
    a0 = d00 * cov0 + d01 * cov1 + d02 * cov2
    a1 = d01 * cov0 + d11 * cov1 + d12 * cov2
    a2 = d02 * cov0 + d12 * cov1 + d22 * cov2
    bf = m_p - a0 * stscr[0] - a1 * stscr[1] - a2 * stscr[2]
    boxB = _mkbox_mxu(w, th, tw, thA)
    ma0, ma1, ma2, mb = boxB.multi([a0, a1, a2, bf])

    def interior(v):
        return v[ir:ir + th, il:il + tw]

    val = (ma0 * interior(I0) + ma1 * interior(I1) +
           ma2 * interior(I2) + mb)
    if qscr is None:
        out_q[0, 0] = val
    else:
        _emit_q(out_q, qscr, qsem, t, nsteps, val, geo, tp, lp)

    # the stats DMA started above is waited on by the NEXT grid step;
    # the last step drains its own
    @pl.when(t + 1 == nsteps)
    def _():
        st_copy(t).wait()


_VMEM_FUSED = pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024)


def _q_out(n, geo, padded_shape):
    """(out_shape, out_spec, extra scratch) for the q output: padded
    manual-DMA layout when padded_shape is given, else the plain
    BlockSpec tile layout."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    if padded_shape is None:
        return (jax.ShapeDtypeStruct((n, 1, nh * th, nw * tw),
                                     jnp.float32),
                pl.BlockSpec((1, 1, th, tw), lambda b, i, j: (b, 0, i, j),
                             memory_space=pltpu.VMEM),
                [])
    ph, pw = padded_shape
    return (jax.ShapeDtypeStruct((n, 1, ph, pw), jnp.float32),
            pl.BlockSpec(memory_space=pl.ANY),
            [pltpu.VMEM((2, th, tw), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))])


def _fused_iter1_call(ipad, ppad, n, geo, w, eps, padded_shape=None):
    """One kernel: guide stats (emitted in the haloed slot layout for
    later iterations) + the first a,b -> q application."""
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    qshape, qspec, qscratch = _q_out(n, geo, padded_shape)
    return pl.pallas_call(
        functools.partial(_fused_gf_iter1_kernel, w=w, eps=float(eps),
                          geo=geo),
        out_shape=(jax.ShapeDtypeStruct((n, 9, nh * thA, nw * twA),
                                        jnp.float32),
                   qshape),
        grid=(n, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY), qspec],
        scratch_shapes=[pltpu.VMEM((2, 3, rowsA, lanesA), ipad.dtype),
                        pltpu.VMEM((2, 1, rowsA, lanesA), jnp.float32),
                        pltpu.VMEM((9, thA, twA), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA] + qscratch,
        compiler_params=_VMEM_FUSED,
    )(ipad, ppad)


def _fused_apply_call(ipad, ppad, st, n, geo, w, padded_shape=None):
    th, tw, thA, twA, rowsA, lanesA, nh, nw = geo
    qshape, qspec, qscratch = _q_out(n, geo, padded_shape)
    return pl.pallas_call(
        functools.partial(_fused_gf_kernel, w=w, geo=geo),
        out_shape=qshape,
        grid=(n, nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 9, thA, twA),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((2, 3, rowsA, lanesA), ipad.dtype),
                        pltpu.VMEM((2, 1, rowsA, lanesA), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))] + qscratch,
        compiler_params=_VMEM_FUSED,
    )(ipad, ppad, st)


@functools.partial(jax.jit,
                   static_argnames=("radius", "eps", "iterations", "th",
                                    "guide_u8", "tile_rows", "tile_lanes"))
def guided_filter_fused_iterated(guide, src, radius: int, eps: float,
                                 iterations: int = 3, th: int = None,
                                 guide_u8: bool = False,
                                 tile_rows: int = None,
                                 tile_lanes: int = None):
    """Zoran-style iterated chain: guide statistics computed once and
    reused every iteration AND every src channel (they depend only on
    the guide), and all intermediates kept in the PADDED tile layout —
    at 4K the HBM pad / slice copies otherwise cost as much as the box
    kernels themselves.  src [N,C,H,W]; channels filter independently.

    guide_u8=True asserts the guide holds u8-valued floats (integers
    0..255 — every decoded image) and stores the padded guide in bf16:
    integers < 256 are bf16-exact and the box dots' hi/lo data split
    yields lo == 0, so the result is BITWISE identical while the guide
    windows move half the HBM bytes per kernel call (~130 MB at 4K).

    tile_rows/tile_lanes override the default tile schedule (see
    _fused_geometry).  The guide-stat planes are cached in the per-tile
    haloed "slot" layout; alternatives (a padless exact-divide tiling
    with reflect-fold band matrices, recompute-stats, 6-plane cached-d,
    and a whole-chain merged kernel) were built, validated bitwise, and
    MEASURED SLOWER on the 4K/8K chains (2026-08-19 sweep: padless
    slots 7.66 ms vs padded 7.00 at 4K, recompute 13.4, merged 13.3,
    cached-d 8.8; 8K padless 30.9 vs padded 26.3) — deleted, see
    CLAUDE.md measured-rejection notes."""
    n, _, h, wid = guide.shape
    c_src = src.shape[1]
    w = 2 * radius + 1
    if _use_fused_mxu(h, radius, th):
        geo = _fused_geometry(h, wid, radius, tile_rows, tile_lanes)
        th_, tw_, _, _, rowsA, lanesA, nh, nw = geo
        tp, lp, _, _ = _fused_offsets(radius)
        ipad2 = _pad_fused(guide, radius, geo, h, wid)
        if guide_u8:
            ipad2 = ipad2.astype(jnp.bfloat16)
        # q emitted straight into the padded layout: iteration k+1 reads
        # iteration k's output after a thin margin rebuild — no
        # full-frame slice + reflect-pad between iterations
        pre = _fits_single_pad(radius, geo, h, wid)
        pshape = (ipad2.shape[2], ipad2.shape[3]) if pre else None
        # exact-divide tiling: the LAST iteration writes the plain
        # BlockSpec layout, which IS the frame — no output slice
        exact = nh * th_ == h and nw * tw_ == wid
        st = None
        chans = []
        for c in range(c_src):
            ppad2 = _pad_fused(src[:, c:c + 1], radius, geo, h, wid)
            for it in range(iterations):
                last = it + 1 == iterations
                shp = None if (last and exact) else pshape
                if st is None:
                    # first application computes the stats in-kernel and
                    # emits them for every later iteration/channel
                    st, qp = _fused_iter1_call(ipad2, ppad2, n, geo, w,
                                               float(eps), shp)
                else:
                    qp = _fused_apply_call(ipad2, ppad2, st, n, geo, w,
                                           shp)
                if not last:
                    ppad2 = (_fill_margins(qp, radius, geo, h, wid)
                             if pre else
                             _pad_fused(qp[:, :, :h, :wid], radius,
                                        geo, h, wid))
            if exact:
                p = qp
            else:
                p = (qp[:, :, tp:tp + h, lp:lp + wid] if pre
                     else qp[:, :, :h, :wid])
            chans.append(p)
        return chans[0] if c_src == 1 else jnp.concatenate(chans, axis=1)
    mxu, geo = _geometry(h, wid, radius, th)
    th_, nh, rows, tw, nw, lanes = geo
    ipad = _pad_banded(guide, radius, geo, h, wid)
    stp = _stats_call(ipad, n, geo, w, float(eps), mxu)
    gpad = jnp.pad(guide, [(0, 0), (0, 0), (0, nh * th_ - h),
                           (0, nw * tw - wid)])
    chans = []
    for c in range(c_src):
        p = src[:, c:c + 1]
        for _ in range(iterations):
            ppad = _pad_banded(p, radius, geo, h, wid)
            abp = _apply_call(ipad, ppad, stp, n, geo, w, mxu)
            abpad = _pad_banded(abp[:, :, :h, :wid], radius, geo, h, wid)
            qp = _stage2_call(abpad, gpad, n, geo, w, mxu)
            p = qp[:, :, :h, :wid]
        chans.append(p)
    return chans[0] if c_src == 1 else jnp.concatenate(chans, axis=1)


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
