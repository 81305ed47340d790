"""Pallas joint-bilateral kernel — VMEM-tiled, fused tap loop.

Same semantics as ops/bilateral.py (OpenCV jointBilateralFilter, SURVEY.md
N3): disk window of radius r, range weight on summed-abs channel
difference of the *joint* image, reflect-101 borders.

Kernel shape:
  * input padded host-side by r in H and W (reflect-101), channels planar:
    joint [3, Hp, Wp], src [3, Hp, Wp], lane dim padded to 128, sublane
    block dims to 8 (Mosaic dynamic-rotate alignment requirements);
  * grid over H-tiles; each step DMAs an overlapping row block per channel
    into VMEM scratch (overlapping blocks are not expressible with
    BlockSpec index maps, hence manual DMA);
  * nested dy/dx loops over the (2r+1)^2 taps.  The dy (sublane) shift is
    hoisted out of the inner loop: per dy, all six planes are rotated once;
    per dx only a lane rotate + the weight/accumulate math runs.  Range and
    spatial weights fuse into one exp:
        w = in_disk * exp(diff^2 * gcc + (dy^2+dx^2) * gsc)
  * accumulators are fori_loop carries in VMEM; one divide at the end.

The XLA scan formulation (ops/bilateral.py) re-materializes HBM-sized
intermediates per tap; this kernel touches HBM once per tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bilateral import opencv_bilateral_params


NBANDS = 7  # |fy| bands for the disk skip; more bands = fewer
            # statically-emitted out-of-disk taps but a longer compile
            # (results are bitwise identical at any value).  Measured v5e
            # r=33 gray-self: 5 -> 77.1 MP/s, 7 -> 79.4, 9 -> 79.1.


def _banded_dy_sweep(radius: int, make_dy_body, carry):
    """Run the dy loop in |fy| bands so columns statically outside the
    disk for the WHOLE band are never emitted (~17% of the square at
    r=33).  make_dy_body(dxmax) returns a fori_loop body restricted to
    |dx| <= dxmax; the per-tap -inf disk mask still zeroes the residual
    corners, so results stay bitwise identical to a full-square loop."""
    nbands = NBANDS if radius >= 10 else 1
    step = -(-(radius + 1) // nbands)
    for lo in range(0, radius + 1, step):
        hi = min(lo + step - 1, radius)
        dxmax = int(np.floor(np.sqrt(float(radius * radius - lo * lo))))
        body = make_dy_body(dxmax)
        if lo == 0:
            carry = jax.lax.fori_loop(radius - hi, radius + hi + 1,
                                      body, carry)
        else:
            carry = jax.lax.fori_loop(radius - hi, radius - lo + 1,
                                      body, carry)
            carry = jax.lax.fori_loop(radius + lo, radius + hi + 1,
                                      body, carry)
    return carry


def _tile_geometry(h: int, wid: int, radius: int, th: int):
    """(hp_tiles, hpad, rows, wpad): H-tile count, padded height, DMA'd
    rows per tile (8-aligned sublanes), padded lane width (128-aligned
    for Mosaic dynamic rotates)."""
    hp_tiles = -(-h // th)
    return (hp_tiles, hp_tiles * th,
            -(-(th + 2 * radius) // 8) * 8,
            -(-(wid + 2 * radius) // 128) * 128)


def _pad_tiles(x, radius: int, th: int, h: int, wid: int,
               hpad: int, rows: int, wpad: int):
    """Reflect-101 pad the last two axes by radius, then zero-pad so
    every tile's DMA window exists."""
    lead = [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, lead + [(radius, radius), (radius, radius)],
                 mode="reflect")
    extra_h = (hpad - h) + (rows - (th + 2 * radius))
    extra_w = wpad - (wid + 2 * radius)
    if extra_h or extra_w:
        xp = jnp.pad(xp, lead + [(0, extra_h), (0, extra_w)])
    return xp


def _kernel(joint_hbm, src_hbm, out_ref, jscr, sscr, sem,
            *, radius: int, th: int, wout: int, rows: int,
            gcc: float, gsc: float, cs: int = 3):
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        joint_hbm.at[b, :, pl.ds(i * th, rows), :], jscr, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(
        src_hbm.at[b, :, pl.ds(i * th, rows), :], sscr, sem)
    cp.start()
    cp.wait()

    wpad = jscr.shape[2]
    # centers at full padded width (aligned ops); the valid region is
    # lanes [radius, radius+wout) and gets cropped at the out write
    c0 = jscr[0, radius:radius + th, :]
    c1 = jscr[1, radius:radius + th, :]
    c2 = jscr[2, radius:radius + th, :]

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            # hoist the sublane rotate: planes shifted by dy, cropped to
            # th rows
            jy = [pltpu.roll(jscr[c], rows - dy, 0)[:th, :]
                  for c in range(3)]
            sy = [pltpu.roll(sscr[c], rows - dy, 0)[:th, :]
                  for c in range(cs)]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            acc = list(carry[:cs])
            wsum = carry[cs]

            # static dx unroll with incremental roll-by-1.  Tap dx reads
            # plane[l + dx - radius] at center lane l.  (Independent
            # per-tap rolls — a 1.76x win on the one-plane gray kernel —
            # measured SLOWER here: six planes of live shifted copies
            # overflow the VMEM stack and spill.)  The disk mask folds
            # into the scalar exp argument (-inf -> weight 0), saving a
            # full-width select per tap.
            start = radius - dxmax
            cur = [pltpu.roll(p, dxmax, 1) for p in jy + sy]
            for dx in range(start, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                diff = (jnp.abs(cur[0] - c0) + jnp.abs(cur[1] - c1) +
                        jnp.abs(cur[2] - c2))
                w = jnp.exp(diff * diff * gcc + cc)
                for c in range(cs):
                    acc[c] = acc[c] + w * cur[3 + c]
                wsum = wsum + w
                if dx + 1 < radius + dxmax + 1:
                    cur = [pltpu.roll(p, wpad - 1, 1) for p in cur]
            return (*acc, wsum)
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    out = _banded_dy_sweep(radius, make_dy_body, (zero,) * (cs + 1))
    inv = 1.0 / out[cs]
    for c in range(cs):
        out_ref[0, c] = (out[c] * inv)[:, radius:radius + wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "th"))
def joint_bilateral_planar_batched(joint, src, d: int = -1,
                                   sigma_color: float = 20.0,
                                   sigma_space: float = 22.0,
                                   th: int = 64):
    """Planar joint bilateral: joint [N, 3, H, W], src [N, cs, H, W]
    float32 (0-255 units) -> [N, cs, H, W], cs in {1, 3}.  Batch is a
    grid dimension (vmap of pallas_call trips a JAX lowering bug and
    would also re-pad per image).  A gray src rides ONE plane (1
    src-roll/tap instead of 3) — the weights come from the joint
    planes either way."""
    radius, gcc, gsc, _taps = opencv_bilateral_params(
        d, sigma_color, sigma_space)
    n, _, h, wid = joint.shape
    cs = src.shape[1]
    assert joint.shape[1] == 3 and cs in (1, 3), (joint.shape, src.shape)

    hp_tiles, hpad, rows, wpad = _tile_geometry(h, wid, radius, th)
    jp = _pad_tiles(joint, radius, th, h, wid, hpad, rows, wpad)
    sp = _pad_tiles(src, radius, th, h, wid, hpad, rows, wpad)

    out = pl.pallas_call(
        functools.partial(_kernel, radius=radius, th=th, wout=wid,
                          rows=rows, gcc=float(gcc), gsc=float(gsc),
                          cs=cs),
        out_shape=jax.ShapeDtypeStruct((n, cs, hpad, wid), jnp.float32),
        grid=(n, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, cs, th, wid), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows, wpad), jnp.float32),
            pltpu.VMEM((cs, rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jp, sp)
    return out[:, :, :h, :]


def joint_bilateral_planar(joint, src, d: int = -1,
                           sigma_color: float = 20.0,
                           sigma_space: float = 22.0,
                           th: int = 64):
    """Unbatched planar wrapper: [3, H, W] -> [3, H, W]."""
    return joint_bilateral_planar_batched(joint[None], src[None], d,
                                          sigma_color, sigma_space, th)[0]


def _kernel_gray_self(x_hbm, out_ref, xscr, sem,
                      *, radius: int, th: int, wout: int, rows: int,
                      gcc: float, gsc: float, reps: int = 3):
    """Specialized kernel: joint == src and all channels identical (the
    BF(CNN,CNN) headline config — the CNN's -r output is grayscale, and
    cv2.imread replicates it to 3 channels, so diff = reps*|dx| and all
    output channels are equal).  One plane instead of six.  reps=1 is a
    genuinely single-channel joint (diff = |dx|, cv2's 1-channel rule)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, rows), :], xscr, sem)
    cp.start()
    cp.wait()

    wpad = xscr.shape[1]
    center = xscr[radius:radius + th, :]
    # range weight on reps*|delta| (reps identical channels)
    g9 = gcc * float(reps * reps)

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            acc, wsum = carry
            plane = pltpu.roll(xscr[...], rows - dy, 0)[:th, :]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            # NOTE: a lax.cond skip of out-of-disk taps (24% of the
            # square) was tried and made things 2x *slower* — the
            # conditional forces accumulator copies that cost more than
            # the skipped math.  Each tap's shifted plane is an
            # INDEPENDENT static roll (not an incremental roll-by-1
            # chain): the serial chain made the ALUs wait on the permute
            # unit every tap; independent rolls let the scheduler overlap
            # tap k's math with tap k+1's permute (measured 1.76x on
            # v5e, bitwise-identical output).
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                # the disk mask folds into the (scalar) exp argument:
                # -inf outside the disk makes exp produce an exact 0
                # weight, saving a full-width select per tap
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                cur = pltpu.roll(plane, (radius - dx) % wpad, 1)
                diff = cur - center
                w = jnp.exp(diff * diff * g9 + cc)
                acc = acc + w * cur
                wsum = wsum + w
            return acc, wsum
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    acc, wsum = _banded_dy_sweep(radius, make_dy_body, (zero, zero))
    out_ref[0] = (acc / wsum)[:, radius:radius + wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "th", "reps",
                                             "auto_pack"))
def bilateral_gray_self_batched(x, d: int = -1,
                                sigma_color: float = 20.0,
                                sigma_space: float = 22.0,
                                th: int = 64, reps: int = 3,
                                auto_pack: bool = True):
    """Self-guided grayscale bilateral: x [N, H, W] float32 (0-255 units,
    interpreted as ``reps`` identical channels) -> [N, H, W].

    Bit-compatible with joint_bilateral_filter(joint=stack([x]*reps),
    src=same) up to f32 rounding (reps=1: a genuinely single-channel
    joint); ~3x the throughput of the color kernel."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    n, h, wid = x.shape
    # batches ride the lane-packed variant (bitwise identical,
    # test_pallas_ops; slope-measured v5e 97.2 vs 95.3 MP/s — packing
    # cuts the 384-vs-322 lane pad waste) when the batch-axis pad to a
    # multiple of 3 wastes <=5% (the ~2-11% kernel gain is otherwise
    # eaten by the dead pad images: measured batch 8 joint 38.7 packed
    # vs 39.2 unpacked).  auto_pack=False pins the single-image layout
    # (the packed test's reference path).
    if (auto_pack and n >= 3 and wid + 2 * radius <= 512
            and 20 * ((-n) % 3) <= n):
        return bilateral_gray_self_packed_batched(
            x, d, sigma_color, sigma_space, th=th, reps=reps, pack=3)
    hp_tiles, hpad, rows, wpad = _tile_geometry(h, wid, radius, th)
    xp = _pad_tiles(x, radius, th, h, wid, hpad, rows, wpad)

    out = pl.pallas_call(
        functools.partial(_kernel_gray_self, radius=radius, th=th,
                          wout=wid, rows=rows, gcc=float(gcc),
                          gsc=float(gsc), reps=reps),
        out_shape=jax.ShapeDtypeStruct((n, hpad, wid), jnp.float32),
        grid=(n, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, wid), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)
    return out[:, :h, :]


def _kernel_gray_self_packed(x_hbm, out_ref, xscr, sem,
                             *, radius: int, th: int, wout: int,
                             rows: int, wseg: int, pack: int,
                             gcc: float, gsc: float, reps: int):
    """Gray-self kernel with ``pack`` images lane-packed into one tile.

    Each image occupies a self-contained segment of wseg = wout + 2r
    lanes (its own reflect halo included), segments back to back from
    lane 0.  Taps for output lanes [seg+r, seg+r+wout) read only
    [seg, seg+wseg) — cyclic-roll contamination lands in other
    segments' halo lanes, which are re-rolled fresh from scratch every
    tap and never read.  Why: at W=256/r=33 a single image needs 322
    lanes but pads to 384 (16% of every roll AND every ALU op wasted);
    3x322 = 966 pads to 1024 (5.7% waste) — the ALU ceiling and the
    XLU roll volume both improve ~12%.  The round-2 single-image
    tight-packing attempt lost its gain to an XLA transpose; packing
    WHOLE images along lanes is a plain concat (no transpose), and the
    per-image output realignment is one in-kernel roll per tile."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, rows), :], xscr, sem)
    cp.start()
    cp.wait()

    wpad = xscr.shape[1]
    center = xscr[radius:radius + th, :]
    g9 = gcc * float(reps * reps)

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            acc, wsum = carry
            plane = pltpu.roll(xscr[...], rows - dy, 0)[:th, :]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                cur = pltpu.roll(plane, (radius - dx) % wpad, 1)
                diff = cur - center
                w = jnp.exp(diff * diff * g9 + cc)
                acc = acc + w * cur
                wsum = wsum + w
            return acc, wsum
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    acc, wsum = _banded_dy_sweep(radius, make_dy_body, (zero, zero))
    res = acc / wsum
    for k in range(pack):
        # realign segment k's valid region to lane 0 (one roll per
        # image per tile — ~1/1000 of the tap rolls), then a static
        # aligned crop
        shifted = pltpu.roll(res, (wpad - (k * wseg + radius)) % wpad, 1)
        out_ref[0, k] = shifted[:, :wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "th", "reps",
                                             "pack"))
def bilateral_gray_self_packed_batched(x, d: int = -1,
                                       sigma_color: float = 20.0,
                                       sigma_space: float = 22.0,
                                       th: int = 64, reps: int = 3,
                                       pack: int = 3):
    """Lane-packed variant of :func:`bilateral_gray_self_batched`
    (bitwise-identical results): ``pack`` images share one kernel tile.
    x [N, H, W] -> [N, H, W]; N is zero-padded up to a multiple of
    ``pack`` internally (the pad images cost one partially-wasted
    group)."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    n, h, wid = x.shape
    wseg = wid + 2 * radius
    g = -(-n // pack)
    if g * pack != n:
        x = jnp.concatenate(
            [x, jnp.zeros((g * pack - n, h, wid), x.dtype)], axis=0)

    hp_tiles, hpad, rows, _ = _tile_geometry(h, wid, radius, th)
    # per-image reflect pad to EXACTLY wseg lanes (no per-image 128
    # rounding), H padded for the tile DMA windows as usual
    lead = [(0, 0)]
    xp = jnp.pad(x, lead + [(radius, radius), (radius, radius)],
                 mode="reflect")
    extra_h = (hpad - h) + (rows - (th + 2 * radius))
    if extra_h:
        xp = jnp.pad(xp, lead + [(0, extra_h), (0, 0)])
    # lane-concat the pack group (plain copy, no transpose), pad to 128
    grp = xp.reshape(g, pack, xp.shape[1], wseg)
    packed = jnp.concatenate([grp[:, k] for k in range(pack)], axis=-1)
    wpad = -(-(pack * wseg) // 128) * 128
    if wpad != pack * wseg:
        packed = jnp.pad(packed,
                         [(0, 0), (0, 0), (0, wpad - pack * wseg)])

    out = pl.pallas_call(
        functools.partial(_kernel_gray_self_packed, radius=radius, th=th,
                          wout=wid, rows=rows, wseg=wseg, pack=pack,
                          gcc=float(gcc), gsc=float(gsc), reps=reps),
        out_shape=jax.ShapeDtypeStruct((g, pack, hpad, wid), jnp.float32),
        grid=(g, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, pack, th, wid),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(packed)
    return out.reshape(g * pack, hpad, wid)[:n, :h, :]


def _kernel_color_self(x_hbm, out_ref, pscr, cscr, sem,
                       *, radius: int, th: int, wout: int, rows: int,
                       gcc: float, gsc: float):
    """Specialized kernel: joint == src with distinct color channels (the
    CLI's 'filter the photo guided by itself' case, cv2.bilateralFilter
    semantics).

    Rolls are the bottleneck (XLU data volume), so two u8-valued channels
    ride ONE f32 mantissa: P = c0 + 512*c1 < 2^17, exact.  A tap is then
    2 rolls (P, c2) instead of the generic kernel's 6 (or a naive
    3-plane self variant's 3); the exact unpack (floor(P/512) and an
    fnmsub) runs on the otherwise-idle ALUs.  Measured v5e: 25.9 MP/s vs
    13.7 generic / 19.8 for 3 independent rolls — bitwise identical.
    (bf16 rolls would halve the data instead, but Mosaic's dynamic_rotate
    is 32-bit only.)"""
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, 0, pl.ds(i * th, rows), :], pscr, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(
        x_hbm.at[b, 1, pl.ds(i * th, rows), :], cscr, sem)
    cp.start()
    cp.wait()

    wpad = pscr.shape[1]
    inv512 = jnp.float32(1.0 / 512.0)
    Pc = pscr[radius:radius + th, :]
    cen1 = jnp.floor(Pc * inv512)
    cen0 = Pc - 512.0 * cen1
    cen2 = cscr[radius:radius + th, :]

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            P = pltpu.roll(pscr[...], rows - dy, 0)[:th, :]
            C = pltpu.roll(cscr[...], rows - dy, 0)[:th, :]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            a0, a1, a2, wsum = carry
            # independent static rolls per tap (ALU/XLU overlap — the
            # gray kernel's 1.76x trick; a roll-by-1 chain measured 4x
            # slower here)
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                Pr = pltpu.roll(P, (radius - dx) % wpad, 1)
                c2 = pltpu.roll(C, (radius - dx) % wpad, 1)
                u1 = jnp.floor(Pr * inv512)
                u0 = Pr - 512.0 * u1
                d = (jnp.abs(u0 - cen0) + jnp.abs(u1 - cen1) +
                     jnp.abs(c2 - cen2))
                w = jnp.exp(d * d * gcc + cc)
                a0 = a0 + w * u0
                a1 = a1 + w * u1
                a2 = a2 + w * c2
                wsum = wsum + w
            return a0, a1, a2, wsum
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    a0, a1, a2, wsum = _banded_dy_sweep(radius, make_dy_body,
                                        (zero, zero, zero, zero))
    inv = 1.0 / wsum
    out_ref[0, 0] = (a0 * inv)[:, radius:radius + wout]
    out_ref[0, 1] = (a1 * inv)[:, radius:radius + wout]
    out_ref[0, 2] = (a2 * inv)[:, radius:radius + wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "th"))
def bilateral_color_self_batched(x, d: int = -1,
                                 sigma_color: float = 20.0,
                                 sigma_space: float = 22.0,
                                 th: int = 32):
    """Self-guided color bilateral: x [N, 3, H, W] float32 holding u8
    integer values (0-255) -> [N, 3, H, W].  Same semantics as
    joint_bilateral_planar_batched with joint == src; two channels are
    mantissa-packed so a tap costs 2 rolls instead of 6 (see kernel
    docstring).  Requires integer-valued input (the u8 CLI contract)."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    n, _, h, wid = x.shape
    hp_tiles, hpad, rows, wpad = _tile_geometry(h, wid, radius, th)
    packed = jnp.stack([x[:, 0] + 512.0 * x[:, 1], x[:, 2]], axis=1)
    xp = _pad_tiles(packed, radius, th, h, wid, hpad, rows, wpad)

    out = pl.pallas_call(
        functools.partial(_kernel_color_self, radius=radius, th=th,
                          wout=wid, rows=rows, gcc=float(gcc),
                          gsc=float(gsc)),
        out_shape=jax.ShapeDtypeStruct((n, 3, hpad, wid), jnp.float32),
        grid=(n, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 3, th, wid), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp)
    return out[:, :, :h, :]


def _kernel_color_self_packed(x_hbm, out_ref, pscr, cscr, sem,
                              *, radius: int, th: int, wout: int,
                              rows: int, wseg: int, pack: int,
                              gcc: float, gsc: float):
    """Color-self kernel with ``pack`` images lane-packed per tile (same
    segment argument as _kernel_gray_self_packed; same mantissa packing
    as _kernel_color_self — P = c0 + 512*c1 and c2 ride two planes, each
    holding ``pack`` image segments)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, 0, pl.ds(i * th, rows), :], pscr, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(
        x_hbm.at[b, 1, pl.ds(i * th, rows), :], cscr, sem)
    cp.start()
    cp.wait()

    wpad = pscr.shape[1]
    inv512 = jnp.float32(1.0 / 512.0)
    Pc = pscr[radius:radius + th, :]
    cen1 = jnp.floor(Pc * inv512)
    cen0 = Pc - 512.0 * cen1
    cen2 = cscr[radius:radius + th, :]

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            P = pltpu.roll(pscr[...], rows - dy, 0)[:th, :]
            C = pltpu.roll(cscr[...], rows - dy, 0)[:th, :]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            a0, a1, a2, wsum = carry
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                Pr = pltpu.roll(P, (radius - dx) % wpad, 1)
                c2 = pltpu.roll(C, (radius - dx) % wpad, 1)
                u1 = jnp.floor(Pr * inv512)
                u0 = Pr - 512.0 * u1
                d = (jnp.abs(u0 - cen0) + jnp.abs(u1 - cen1) +
                     jnp.abs(c2 - cen2))
                w = jnp.exp(d * d * gcc + cc)
                a0 = a0 + w * u0
                a1 = a1 + w * u1
                a2 = a2 + w * c2
                wsum = wsum + w
            return a0, a1, a2, wsum
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    a0, a1, a2, wsum = _banded_dy_sweep(radius, make_dy_body,
                                        (zero, zero, zero, zero))
    inv = 1.0 / wsum
    for k in range(pack):
        s = (wpad - (k * wseg + radius)) % wpad
        out_ref[0, k, 0] = pltpu.roll(a0 * inv, s, 1)[:, :wout]
        out_ref[0, k, 1] = pltpu.roll(a1 * inv, s, 1)[:, :wout]
        out_ref[0, k, 2] = pltpu.roll(a2 * inv, s, 1)[:, :wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "th",
                                             "pack"))
def bilateral_color_self_packed_batched(x, d: int = -1,
                                        sigma_color: float = 20.0,
                                        sigma_space: float = 22.0,
                                        th: int = 32, pack: int = 3):
    """Lane-packed variant of :func:`bilateral_color_self_batched`
    (bitwise-identical; u8-integer-valued input contract)."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    n, _, h, wid = x.shape
    wseg = wid + 2 * radius
    g = -(-n // pack)
    if g * pack != n:
        x = jnp.concatenate(
            [x, jnp.zeros((g * pack - n,) + x.shape[1:], x.dtype)],
            axis=0)
    packed2 = jnp.stack([x[:, 0] + 512.0 * x[:, 1], x[:, 2]], axis=1)

    hp_tiles, hpad, rows, _ = _tile_geometry(h, wid, radius, th)
    lead = [(0, 0), (0, 0)]
    xp = jnp.pad(packed2, lead + [(radius, radius), (radius, radius)],
                 mode="reflect")
    extra_h = (hpad - h) + (rows - (th + 2 * radius))
    if extra_h:
        xp = jnp.pad(xp, lead + [(0, extra_h), (0, 0)])
    grp = xp.reshape(g, pack, 2, xp.shape[2], wseg)
    packed = jnp.concatenate([grp[:, k] for k in range(pack)], axis=-1)
    wpad = -(-(pack * wseg) // 128) * 128
    if wpad != pack * wseg:
        packed = jnp.pad(packed, [(0, 0), (0, 0), (0, 0),
                                  (0, wpad - pack * wseg)])

    out = pl.pallas_call(
        functools.partial(_kernel_color_self_packed, radius=radius,
                          th=th, wout=wid, rows=rows, wseg=wseg,
                          pack=pack, gcc=float(gcc), gsc=float(gsc)),
        out_shape=jax.ShapeDtypeStruct((g, pack, 3, hpad, wid),
                                       jnp.float32),
        grid=(g, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, pack, 3, th, wid),
                               lambda b, i: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.VMEM((rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(packed)
    return out.reshape(g * pack, 3, hpad, wid)[:n, :, :h, :]


def _kernel_packed_joint(x_hbm, out_ref, scr, sem,
                         *, radius: int, th: int, wout: int, rows: int,
                         gcc: float, gsc: float, cj: int, cs: int):
    """General mantissa-packed joint!=src kernel (u8 integer values).

    Value streams [j_0..j_{cj-1}, s_0..s_{cs-1}] are packed pairwise into
    lo + 512*hi planes (< 2^17, exact in f32), so a tap costs
    ceil((cj+cs)/2) rolls instead of cj+cs — the roll/XLU data volume is
    THE bilateral bound.  The CLI's BF(reflectance, color photo) case
    (cj=3, cs=1 after mono-src reduction) drops from 6 generic rolls/tap
    to 2.  Unpacking (floor(v/512) + fnmsub, both exact on u8 ints)
    rides the otherwise-idle ALUs.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    m = cj + cs
    npk = (m + 1) // 2

    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * th, rows), :], scr, sem)
    cp.start()
    cp.wait()

    wpad = scr.shape[2]
    inv512 = jnp.float32(1.0 / 512.0)

    def unpack(planes):
        streams = []
        for p, v in enumerate(planes):
            if 2 * p + 1 < m:
                hi = jnp.floor(v * inv512)
                streams.append(v - 512.0 * hi)
                streams.append(hi)
            else:
                streams.append(v)
        return streams

    # centers: only the joint streams feed the range diff, so skip
    # planes that hold src streams exclusively
    cen = unpack([scr[p, radius:radius + th, :]
                  for p in range((cj + 1) // 2)])

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            shifted = [pltpu.roll(scr[p], rows - dy, 0)[:th, :]
                       for p in range(npk)]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            accs = list(carry[:cs])
            wsum = carry[cs]
            # independent static rolls per tap (ALU/XLU overlap)
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                cur = unpack([pltpu.roll(p, (radius - dx) % wpad, 1)
                              for p in shifted])
                diff = jnp.abs(cur[0] - cen[0])
                for c in range(1, cj):
                    diff = diff + jnp.abs(cur[c] - cen[c])
                w = jnp.exp(diff * diff * gcc + cc)
                for c in range(cs):
                    accs[c] = accs[c] + w * cur[cj + c]
                wsum = wsum + w
            return tuple(accs) + (wsum,)
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    carry = _banded_dy_sweep(radius, make_dy_body,
                             tuple(zero for _ in range(cs + 1)))
    inv = 1.0 / carry[cs]
    for c in range(cs):
        out_ref[0, c] = (carry[c] * inv)[:, radius:radius + wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "joint_reps",
                                             "th", "auto_pack"))
def bilateral_packed_joint_batched(joint, src, d: int = -1,
                                   sigma_color: float = 20.0,
                                   sigma_space: float = 22.0,
                                   joint_reps: int = 1,
                                   th: int = 32,
                                   auto_pack: bool = True):
    """Mantissa-packed joint bilateral for u8-integer-valued planar
    inputs: joint [N,cj,H,W], src [N,cs,H,W] float32 holding 0-255 ints
    -> [N,cs,H,W].  cj/cs in {1,3}; joint_reps=k means each joint plane
    stands for k identical channels (diff = k|delta|, matching cv2's
    summed-abs over replicated channels; 1 = the planes are the actual
    channels)."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    n, cj, h, wid = joint.shape
    # batches ride the lane-packed variant (bitwise identical,
    # test_pallas_ops; slope-measured v5e: (3,1) 43.1 vs 38.8 MP/s,
    # (3,3) 29.0 vs 28.3) when the batch-axis pad to a multiple of 3
    # wastes <=5% (batch 8 pads to 9 = 12.5% dead work and measured
    # SLOWER, 38.7 vs 39.2).  auto_pack=False pins the single-image
    # layout (the packed test's reference path).  Color-self packing
    # measured SLOWER (35.5 vs 37.6) so that family stays unpacked.
    if (auto_pack and n >= 3 and wid + 2 * radius <= 512
            and 20 * ((-n) % 3) <= n):
        return bilateral_packed_joint_lanes_batched(
            joint, src, d, sigma_color, sigma_space,
            joint_reps=joint_reps, th=th, pack=3)
    gcc = gcc * float(joint_reps * joint_reps)
    cs = src.shape[1]
    m = cj + cs
    npk = (m + 1) // 2
    streams = [joint[:, c] for c in range(cj)] + [src[:, c]
                                                  for c in range(cs)]
    planes = []
    for p in range(npk):
        if 2 * p + 1 < m:
            planes.append(streams[2 * p] + 512.0 * streams[2 * p + 1])
        else:
            planes.append(streams[2 * p])
    packed = jnp.stack(planes, axis=1)
    hp_tiles, hpad, rows, wpad = _tile_geometry(h, wid, radius, th)
    xp = _pad_tiles(packed, radius, th, h, wid, hpad, rows, wpad)

    out = pl.pallas_call(
        functools.partial(_kernel_packed_joint, radius=radius, th=th,
                          wout=wid, rows=rows, gcc=float(gcc),
                          gsc=float(gsc), cj=cj, cs=cs),
        out_shape=jax.ShapeDtypeStruct((n, cs, hpad, wid), jnp.float32),
        grid=(n, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, cs, th, wid),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((npk, rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xp)
    return out[:, :, :h, :]


def _kernel_packed_joint_lanes(x_hbm, out_ref, scr, sem,
                               *, radius: int, th: int, wout: int,
                               rows: int, wseg: int, pack: int,
                               gcc: float, gsc: float, cj: int, cs: int):
    """Joint!=src mantissa-packed kernel with ``pack`` images
    lane-packed per tile (segments as in _kernel_gray_self_packed)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    m = cj + cs
    npk = (m + 1) // 2

    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * th, rows), :], scr, sem)
    cp.start()
    cp.wait()

    wpad = scr.shape[2]
    inv512 = jnp.float32(1.0 / 512.0)

    def unpack(planes):
        streams = []
        for p, v in enumerate(planes):
            if 2 * p + 1 < m:
                hi = jnp.floor(v * inv512)
                streams.append(v - 512.0 * hi)
                streams.append(hi)
            else:
                streams.append(v)
        return streams

    cen = unpack([scr[p, radius:radius + th, :]
                  for p in range((cj + 1) // 2)])

    def make_dy_body(dxmax: int):
        def dy_body(dy, carry):
            shifted = [pltpu.roll(scr[p], rows - dy, 0)[:th, :]
                       for p in range(npk)]
            fy = (dy - radius).astype(jnp.float32)
            fy2 = fy * fy
            accs = list(carry[:cs])
            wsum = carry[cs]
            for dx in range(radius - dxmax, radius + dxmax + 1):
                fx = float(dx - radius)
                r2 = fy2 + fx * fx
                cc = jnp.where(r2 > float(radius * radius), -jnp.inf,
                               r2 * gsc)
                cur = unpack([pltpu.roll(p, (radius - dx) % wpad, 1)
                              for p in shifted])
                diff = jnp.abs(cur[0] - cen[0])
                for c in range(1, cj):
                    diff = diff + jnp.abs(cur[c] - cen[c])
                w = jnp.exp(diff * diff * gcc + cc)
                for c in range(cs):
                    accs[c] = accs[c] + w * cur[cj + c]
                wsum = wsum + w
            return tuple(accs) + (wsum,)
        return dy_body

    zero = jnp.zeros((th, wpad), jnp.float32)
    carry = _banded_dy_sweep(radius, make_dy_body,
                             tuple(zero for _ in range(cs + 1)))
    inv = 1.0 / carry[cs]
    for k in range(pack):
        s = (wpad - (k * wseg + radius)) % wpad
        for c in range(cs):
            out_ref[0, k, c] = pltpu.roll(carry[c] * inv, s, 1)[:, :wout]


@functools.partial(jax.jit, static_argnames=("d", "sigma_color",
                                             "sigma_space", "joint_reps",
                                             "th", "pack"))
def bilateral_packed_joint_lanes_batched(joint, src, d: int = -1,
                                         sigma_color: float = 20.0,
                                         sigma_space: float = 22.0,
                                         joint_reps: int = 1,
                                         th: int = 32, pack: int = 3):
    """Lane-packed variant of :func:`bilateral_packed_joint_batched`
    (bitwise-identical): ``pack`` images share each mantissa-packed
    plane's lanes."""
    radius, gcc, gsc, _ = opencv_bilateral_params(d, sigma_color,
                                                  sigma_space)
    gcc = gcc * float(joint_reps * joint_reps)
    n, cj, h, wid = joint.shape
    cs = src.shape[1]
    m = cj + cs
    npk = (m + 1) // 2
    wseg = wid + 2 * radius
    g = -(-n // pack)
    if g * pack != n:
        zj = jnp.zeros((g * pack - n,) + joint.shape[1:], joint.dtype)
        zs = jnp.zeros((g * pack - n,) + src.shape[1:], src.dtype)
        joint = jnp.concatenate([joint, zj], axis=0)
        src = jnp.concatenate([src, zs], axis=0)
    streams = [joint[:, c] for c in range(cj)] + [src[:, c]
                                                  for c in range(cs)]
    planes = []
    for p in range(npk):
        if 2 * p + 1 < m:
            planes.append(streams[2 * p] + 512.0 * streams[2 * p + 1])
        else:
            planes.append(streams[2 * p])
    packed2 = jnp.stack(planes, axis=1)

    hp_tiles, hpad, rows, _ = _tile_geometry(h, wid, radius, th)
    lead = [(0, 0), (0, 0)]
    xp = jnp.pad(packed2, lead + [(radius, radius), (radius, radius)],
                 mode="reflect")
    extra_h = (hpad - h) + (rows - (th + 2 * radius))
    if extra_h:
        xp = jnp.pad(xp, lead + [(0, extra_h), (0, 0)])
    grp = xp.reshape(g, pack, npk, xp.shape[2], wseg)
    packed = jnp.concatenate([grp[:, k] for k in range(pack)], axis=-1)
    wpad = -(-(pack * wseg) // 128) * 128
    if wpad != pack * wseg:
        packed = jnp.pad(packed, [(0, 0), (0, 0), (0, 0),
                                  (0, wpad - pack * wseg)])

    out = pl.pallas_call(
        functools.partial(_kernel_packed_joint_lanes, radius=radius,
                          th=th, wout=wid, rows=rows, wseg=wseg,
                          pack=pack, gcc=float(gcc), gsc=float(gsc),
                          cj=cj, cs=cs),
        out_shape=jax.ShapeDtypeStruct((g, pack, cs, hpad, wid),
                                       jnp.float32),
        grid=(g, hp_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, pack, cs, th, wid),
                               lambda b, i: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((npk, rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(packed)
    return out.reshape(g * pack, cs, hpad, wid)[:n, :, :h, :]


def joint_bilateral_filter_fast(joint, src, d: int = -1,
                                sigma_color: float = 20.0,
                                sigma_space: float = 22.0):
    """HWC adapter over the planar kernel ([H,W,C] or [H,W] in/out)."""
    joint = jnp.asarray(joint, jnp.float32)
    src = jnp.asarray(src, jnp.float32)
    squeeze = src.ndim == 2
    if joint.ndim == 2:
        # the 3-plane kernel sums |delta| over channels; replicating a
        # true 1-channel joint triples the diff, so compensate with
        # 3x sigma_color (gcc/9) to keep cv2's 1-channel semantics
        joint = jnp.stack([joint] * 3, axis=0)
        sigma_color = 3.0 * (sigma_color if sigma_color > 0 else 1.0)
    else:
        joint = jnp.moveaxis(joint, -1, 0)
    if src.ndim == 2:
        # gray src rides a single kernel plane: the replicated-3 form
        # would pay 3 identical src rolls per tap for the same output
        srcp = src[None]
    else:
        srcp = jnp.moveaxis(src, -1, 0)
    out = joint_bilateral_planar(joint, srcp, d, sigma_color, sigma_space)
    if squeeze:
        return out[0]
    return jnp.moveaxis(out, 0, -1)
