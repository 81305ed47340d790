"""Spatial sharding with halo exchange — huge single frames across chips.

The image-domain analogue of context/sequence parallelism (SURVEY.md §5.7):
a 4K+ frame is sharded along its width across the mesh; windowed filters
need ``halo`` neighbor columns, exchanged ring-style with
``jax.lax.ppermute`` over ICI inside ``shard_map``.  Global reflect-101
borders are synthesized locally on the edge shards (a shard always owns
more than ``halo`` columns), so results are bit-identical to the
single-device kernels — verified in tests.

Halo widths: bilateral needs r (one windowed pass); the guided filter's
two box-filter stages compose to an effective 2r receptive field.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.bilateral import opencv_bilateral_params


def _exchange_halos_w(local, halo: int, axis_name: str,
                      border: str = "reflect101"):
    """Assemble [left_halo | local | right_halo] along axis 1 (width).

    local: [H, W_shard, C].  Neighbor columns travel via ppermute; the
    outermost shards synthesize global-border columns from their own data
    (border='reflect101': ...c b | a b c; border='reflect'/symmetric:
    ...b a | a b c — matching the kernel being lifted).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    right_edge = local[:, -halo:]   # sent rightward (becomes left halo)
    left_edge = local[:, :halo]     # sent leftward (becomes right halo)

    # ring permutes (wrap-around values are discarded at the edges)
    from_left = jax.lax.ppermute(
        right_edge, axis_name,
        [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name,
        [(i, (i - 1) % n) for i in range(n)])

    if border == "reflect101":
        # global column -k maps to column k
        reflect_left = local[:, 1:halo + 1][:, ::-1]
        reflect_right = local[:, -halo - 1:-1][:, ::-1]
    elif border == "reflect":
        # symmetric: global column -k maps to column k-1
        reflect_left = local[:, :halo][:, ::-1]
        reflect_right = local[:, -halo:][:, ::-1]
    else:
        raise ValueError("unknown border {}".format(border))

    left = jnp.where(idx == 0, reflect_left, from_left)
    right = jnp.where(idx == n - 1, reflect_right, from_right)
    return jnp.concatenate([left, local, right], axis=1)


def sharded_apply_overlap(fn: Callable, halo: int, mesh: Mesh,
                          axis: str = "data", border: str = "reflect101"):
    """Lift a local windowed op into a width-sharded op with halo exchange.

    fn maps ([H, W_shard + 2*halo, C], ...) -> [H, W_shard + 2*halo, C']
    (shape-preserving along W); the wrapper returns the cropped local
    region.  All array arguments are sharded on width.
    """

    if halo < 0:
        raise ValueError("halo must be >= 0, got {}".format(halo))

    def local_fn(*arrays):
        if halo == 0:         # [:, -0:] / [:, :-0] would mis-slice
            return fn(*arrays)
        haloed = [_exchange_halos_w(a, halo, axis, border) for a in arrays]
        out = fn(*haloed)
        return out[:, halo:-halo]

    w_shard = P(None, axis, None)

    def wrapper(*arrays):
        # validate the shard geometry HERE with a clear message — too
        # narrow a shard would otherwise surface as an opaque
        # concatenate-shape mismatch inside _exchange_halos_w's traced
        # border synthesis
        n_shards = mesh.shape[axis]
        w = arrays[0].shape[1]
        if w % n_shards:
            raise ValueError(
                "W = {} not divisible by the mesh size {}".format(
                    w, n_shards))
        need = halo + 1 if border == "reflect101" else halo
        if halo and w // n_shards < need:
            raise ValueError(
                "W/mesh = {} < {} — shards too narrow to synthesize the "
                "halo-{} {} border (use fewer shards)".format(
                    w // n_shards, need, halo, border))
        specs = tuple(w_shard for _ in arrays)
        # check_vma=False: the wrapped kernels create fresh (unvarying)
        # scan carries internally, which the varying-axis checker rejects
        return shard_map(local_fn, mesh=mesh, in_specs=specs,
                         out_specs=w_shard, check_vma=False)(*arrays)

    return wrapper


def _use_pallas(impl: str) -> bool:
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return impl == "pallas"


def sharded_box_filter(x, radius: int, mesh: Mesh, axis: str = "data",
                       border: str = "reflect101", impl: str = "auto"):
    """Width-sharded box filter (halo = radius).  x: [H, W, C] with W
    divisible by the mesh size and W/mesh >= radius+1.

    impl: 'xla', 'pallas', or 'auto' (pallas on TPU).  The Pallas kernel
    runs per shard inside shard_map — collectives move only the halo
    columns over ICI, the window sums stay in VMEM.
    """
    # Run the normal kernel on the haloed block: its own width padding only
    # influences output columns within `radius` of the block edge, all of
    # which lie in the cropped halo — interior results are exact.
    if _use_pallas(impl):
        from ..ops.box_pallas import box_filter_auto

        def local_simple(block):
            return box_filter_auto(block, radius, border=border,
                                   normalize=True)
    else:
        from ..ops.boxfilter import box_filter

        def local_simple(block):
            return box_filter(block, radius, border=border, normalize=True)

    return sharded_apply_overlap(local_simple, radius, mesh, axis,
                                 border)(x)


def sharded_joint_bilateral(joint, src, mesh: Mesh, d: int = -1,
                            sigma_color: float = 20.0,
                            sigma_space: float = 22.0,
                            axis: str = "data", impl: str = "auto"):
    """Width-sharded joint bilateral filter, bit-compatible with
    ops.bilateral.joint_bilateral_filter.

    joint/src: [H, W, C]; W divisible by mesh size; W/mesh > radius.
    impl: 'xla', 'pallas', or 'auto' (Pallas tap-loop kernel per shard).
    OpenCV bilateral borders are reflect-101.
    """
    radius, _, _, _ = opencv_bilateral_params(d, sigma_color, sigma_space)

    if _use_pallas(impl):
        from ..ops.bilateral_pallas import joint_bilateral_filter_fast

        def local(joint_blk, src_blk):
            return joint_bilateral_filter_fast(joint_blk, src_blk, d,
                                               sigma_color, sigma_space)
    else:
        from ..ops.bilateral import joint_bilateral_filter

        def local(joint_blk, src_blk):
            return joint_bilateral_filter(joint_blk, src_blk, d,
                                          sigma_color, sigma_space)

    return sharded_apply_overlap(local, radius, mesh, axis,
                                 "reflect101")(joint, src)


def sharded_bilateral_gray_self(x, mesh: Mesh, d: int = -1,
                                sigma_color: float = 20.0,
                                sigma_space: float = 22.0,
                                reps: int = 1, axis: str = "data",
                                impl: str = "auto"):
    """Width-sharded SELF-GUIDED gray bilateral — the BF(CNN,CNN)
    -r.png case (a replicated-gray map filtered by itself) on a frame
    too wide for one chip.

    Routes each shard through the fastest single-chip kernel
    (``bilateral_gray_self_batched``: 1 roll/tap, ~95 MP/s at the
    product sigmas — ~7x the generic tap-loop kernel the joint API
    uses), instead of the generic path: the joint==src structure is
    static knowledge here, which the host-side u8 dispatch
    (ops/bilateral.py:126-184) cannot discover inside shard_map.

    x: [H, W] float gray in 0-255 (any float values — the gray kernel
    does not pack); ``reps`` = the replicated channel count of the
    original image (3 for a decoded -r.png: cv2's range argument sums
    |delta| over channels).  W divisible by the mesh;
    W/mesh >= radius + 1 (reflect-101 edge synthesis needs one column
    beyond the halo)."""
    radius, _, _, _ = opencv_bilateral_params(d, sigma_color, sigma_space)

    if _use_pallas(impl):
        from ..ops.bilateral_pallas import bilateral_gray_self_batched

        def local(blk):
            out = bilateral_gray_self_batched(blk[..., 0][None], d,
                                              sigma_color, sigma_space,
                                              reps=reps)
            return jnp.moveaxis(out, 0, -1)
    else:
        from ..ops.bilateral import joint_bilateral_filter

        def local(blk):
            rep = jnp.repeat(blk, reps, axis=-1)
            return joint_bilateral_filter(rep, rep, d, sigma_color,
                                          sigma_space)[..., :1]

    out = sharded_apply_overlap(local, radius, mesh, axis,
                                "reflect101")(x[..., None])
    return out[..., 0]


def sharded_bilateral_color_self(img, mesh: Mesh, d: int = -1,
                                 sigma_color: float = 20.0,
                                 sigma_space: float = 22.0,
                                 axis: str = "data", impl: str = "auto"):
    """Width-sharded SELF-GUIDED color bilateral (cv2.bilateralFilter
    semantics: the image filters itself) through the mantissa-packed
    color-self kernel per shard (2 rolls/tap vs the generic kernel's
    6).

    img: [H, W, 3] float holding U8-VALUED data (integers 0-255 — every
    decoded image).  The packed kernel's c0 + 512*c1 mantissa ride is
    exact only for integer values (ops/bilateral_pallas.py); fractional
    input silently corrupts the Pallas path while the XLA fallback
    would handle it — same contract as the single-chip u8 dispatch,
    which only ever routes decoded u8 frames here.  W divisible by the
    mesh; W/mesh >= radius + 1."""
    radius, _, _, _ = opencv_bilateral_params(d, sigma_color, sigma_space)

    if _use_pallas(impl):
        from ..ops.bilateral_pallas import bilateral_color_self_batched

        def local(blk):
            planar = jnp.moveaxis(blk, -1, 0)[None]     # [1,3,H,Wb]
            out = bilateral_color_self_batched(planar, d, sigma_color,
                                               sigma_space)
            return jnp.moveaxis(out[0], 0, -1)
    else:
        from ..ops.bilateral import joint_bilateral_filter

        def local(blk):
            return joint_bilateral_filter(blk, blk, d, sigma_color,
                                          sigma_space)

    return sharded_apply_overlap(local, radius, mesh, axis,
                                 "reflect101")(img)


def sharded_guided_filter(guide, src, radius: int, eps, mesh: Mesh,
                          axis: str = "data", impl: str = "auto"):
    """Width-sharded guided filter, matching ops.guided.guided_filter.

    guide [H, W, 3] or [H, W]; src [H, W, C] or [H, W].  Halo is 2*radius
    (means of a,b compose two box passes); OpenCV guidedFilter borders are
    BORDER_REFLECT (symmetric).  W divisible by mesh size and
    W/mesh >= 2*radius + 1.

    impl: 'xla', 'pallas', or 'auto' (pallas on TPU) — same dispatch as
    :func:`sharded_box_filter`.  With pallas, each shard runs the planar
    MXU/fused kernels (``ops.guided.guided_filter_planar_pallas``); only
    the 2r halo columns cross ICI.  Gray guides always take the XLA path
    (the planar kernels are 3-channel-guide; replicating a gray guide
    changes the covariance system, so it is not a valid fallback).
    """
    from ..ops.guided import guided_filter, guided_filter_planar_pallas

    gray_guide = guide.ndim == 2
    squeeze = src.ndim == 2
    guide3 = guide[..., None] if gray_guide else guide
    src3 = src[..., None] if squeeze else src

    if _use_pallas(impl) and not gray_guide and not isinstance(
            eps, jax.core.Tracer):
        def local(guide_blk, src_blk):
            gp = jnp.moveaxis(guide_blk, -1, 0)[None]   # [1,3,H,Wb]
            sp = jnp.moveaxis(src_blk, -1, 0)[None]     # [1,C,H,Wb]
            q = guided_filter_planar_pallas(gp, sp, radius, eps)
            return jnp.moveaxis(q[0], 0, -1)
    else:
        def local(guide_blk, src_blk):
            g = guide_blk[..., 0] if gray_guide else guide_blk
            return guided_filter(g, src_blk, radius, eps)

    out = sharded_apply_overlap(local, 2 * radius, mesh, axis,
                                "reflect")(guide3, src3)
    return out[..., 0] if squeeze else out


def sharded_guided_filter_iterated(guide, src, radius: int, eps,
                                   iterations: int, mesh: Mesh,
                                   axis: str = "data", impl: str = "auto",
                                   guide_u8: bool = False):
    """Width-sharded Zoran-style iterated GF chain — the flagship
    big-frame capability (BASELINE config 4: 3x GF on 4K+) across chips.

    ONE halo exchange of ``iterations * 2 * radius`` columns, then each
    shard runs the full product chain locally
    (``ops.guided.guided_filter_iterated``: per-tile stats reuse across
    iterations via the fused banded kernels on TPU) and crops.  Per-
    iteration re-exchange would move 3x fewer columns per hop but pay
    ``iterations`` ppermute latencies and lose the fused chain's
    stats-slot reuse across iterations — the single wide halo keeps the
    per-shard compute identical to the measured single-chip path.

    Correctness of the single exchange: one GF has a 2r receptive
    field, so block-local reflect padding corrupts at most 2r columns
    per iteration; after n iterations the corruption reaches exactly
    the n*2r columns the crop removes.  At global borders the box-at-
    mirrored-position identity makes the synthesized reflect halo
    reproduce the whole chain's border behavior (each iteration's
    intermediate q is itself reflect-symmetric about the global edge).

    guide [H, W, 3] or [H, W]; src [H, W, C] or [H, W]; W divisible by
    the mesh size and W/mesh >= iterations * 2 * radius (the edge
    shards synthesize the global reflect border from their own
    columns).  Reference use-case: full-size decompose + 3x GF chain,
    /root/reference/training/train_with_barrista_helper.py:753 +
    README.md:88."""
    halo = 2 * radius * iterations
    n_shards = mesh.shape[axis]
    w_shard = guide.shape[1] // n_shards
    if w_shard < halo:
        raise ValueError(
            "W/mesh = {} < iterations*2*radius = {} — shards too narrow "
            "to carry the chain's halo (use fewer shards or fewer "
            "iterations per exchange)".format(w_shard, halo))

    gray_guide = guide.ndim == 2
    squeeze = src.ndim == 2
    guide3 = guide[..., None] if gray_guide else guide
    src3 = src[..., None] if squeeze else src

    use_pallas = (_use_pallas(impl) and not gray_guide
                  and not isinstance(eps, jax.core.Tracer))

    if use_pallas:
        from ..ops.guided import guided_filter_planar_pallas
        from ..ops.guided_mxu import fits_mxu_guided
        from ..ops.guided_pallas import guided_filter_fused_iterated

        def local(guide_blk, src_blk):
            gp = jnp.moveaxis(guide_blk, -1, 0)[None]   # [1,3,H,Wb]
            sp = jnp.moveaxis(src_blk, -1, 0)[None]     # [1,C,H,Wb]
            # same size dispatch as guided_filter_iterated on TPU:
            # big shards run the fused chain (stats reuse), small ones
            # iterate the whole-plane MXU filter
            if not fits_mxu_guided(sp.shape[2], sp.shape[3], radius,
                                   sp.shape[1]):
                q = guided_filter_fused_iterated(
                    gp.astype(jnp.float32), sp.astype(jnp.float32),
                    radius, float(eps), iterations, guide_u8=guide_u8)
            else:
                q = sp
                for _ in range(iterations):
                    q = guided_filter_planar_pallas(gp, q, radius, eps,
                                                    guide_u8=guide_u8)
            return jnp.moveaxis(q[0], 0, -1)
    else:
        from ..ops.guided import guided_filter

        def local(guide_blk, src_blk):
            g = guide_blk[..., 0] if gray_guide else guide_blk
            q = src_blk
            for _ in range(iterations):
                q = guided_filter(g, q, radius, eps)
            return q

    out = sharded_apply_overlap(local, halo, mesh, axis,
                                "reflect")(guide3, src3)
    return out[..., 0] if squeeze else out
