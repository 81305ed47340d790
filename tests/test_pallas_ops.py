"""Pallas kernel tests (run in TPU-interpret mode on the CPU test mesh).

Each kernel is validated against the already-tested XLA ops (which are
themselves validated against numpy/cv2 oracles in test_filters.py and
test_model.py), closing the chain kernel -> XLA op -> oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from reflectance_filtering_tpu.ops.box_pallas import (
    box_filter_pallas, box_filter_auto)
from reflectance_filtering_tpu.ops.boxfilter import box_filter
from reflectance_filtering_tpu.ops.bilateral import joint_bilateral_filter
from reflectance_filtering_tpu.ops.bilateral_pallas import (
    joint_bilateral_planar_batched, bilateral_gray_self_batched,
    joint_bilateral_filter_fast)
from reflectance_filtering_tpu.ops.guided import (
    guided_filter, guided_filter_planar)
from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe, reflectance_net_apply)
from reflectance_filtering_tpu.ops.cnn_pallas import (
    pack_weights, reflectance_cnn_pallas)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("radius,border", [(1, "reflect"), (4, "reflect"),
                                           (8, "reflect101")])
def test_box_pallas_matches_xla(radius, border, rng):
    x = (rng.rand(3, 40, 50) * 255).astype(np.float32)
    got = np.asarray(box_filter_pallas(jnp.asarray(x), radius, border))
    exp = np.moveaxis(np.asarray(box_filter(
        jnp.asarray(np.moveaxis(x, 0, -1)), radius, border=border)), -1, 0)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=5e-3)


def test_box_auto_layouts(rng):
    x = (rng.rand(2, 24, 30, 3) * 255).astype(np.float32)
    got = np.asarray(box_filter_auto(jnp.asarray(x), 3))
    exp = np.asarray(box_filter(jnp.asarray(x), 3))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=5e-3)


def test_bilateral_planar_matches_xla(rng):
    joint = (rng.rand(30, 40, 3) * 255).astype(np.float32)
    src = (rng.rand(30, 40, 3) * 255).astype(np.float32)
    got = np.asarray(joint_bilateral_filter_fast(joint, src, -1, 20.0, 3.0))
    exp = np.asarray(joint_bilateral_filter(joint, src, -1, 20.0, 3.0))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=2e-3)


def test_bilateral_gray_self_matches_xla(rng):
    g = (rng.rand(30, 40) * 255).astype(np.float32)
    g3 = np.stack([g] * 3, axis=-1)
    exp = np.asarray(joint_bilateral_filter(g3, g3, -1, 20.0, 3.0))[..., 0]
    got = np.asarray(bilateral_gray_self_batched(
        jnp.asarray(g[None]), -1, 20.0, 3.0))[0]
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("n", [1, 3, 5])
def test_bilateral_gray_self_packed_matches_unpacked(rng, n):
    """Lane-packed (3 images/tile) gray-self kernel is BITWISE equal to
    the single-image kernel, incl. the zero-padded partial group."""
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_gray_self_packed_batched)
    x = (rng.rand(n, 30, 40) * 255).astype(np.float32)
    exp = np.asarray(bilateral_gray_self_batched(
        jnp.asarray(x), -1, 20.0, 3.0, auto_pack=False))
    got = np.asarray(bilateral_gray_self_packed_batched(
        jnp.asarray(x), -1, 20.0, 3.0))
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n", [2, 3])
def test_bilateral_color_self_packed_matches_unpacked(rng, n):
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_color_self_batched, bilateral_color_self_packed_batched)
    x = np.floor(rng.rand(n, 3, 24, 32) * 256).astype(np.float32)
    exp = np.asarray(bilateral_color_self_batched(
        jnp.asarray(x), -1, 20.0, 3.0))
    got = np.asarray(bilateral_color_self_packed_batched(
        jnp.asarray(x), -1, 20.0, 3.0))
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("cj,cs,n", [(3, 1, 2), (1, 3, 3)])
def test_bilateral_packed_joint_lanes_matches_unpacked(rng, cj, cs, n):
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_packed_joint_batched,
        bilateral_packed_joint_lanes_batched)
    joint = np.floor(rng.rand(n, cj, 24, 32) * 256).astype(np.float32)
    src = np.floor(rng.rand(n, cs, 24, 32) * 256).astype(np.float32)
    exp = np.asarray(bilateral_packed_joint_batched(
        jnp.asarray(joint), jnp.asarray(src), -1, 20.0, 3.0,
        auto_pack=False))
    got = np.asarray(bilateral_packed_joint_lanes_batched(
        jnp.asarray(joint), jnp.asarray(src), -1, 20.0, 3.0))
    np.testing.assert_array_equal(got, exp)


def test_bilateral_batched_grid(rng):
    joint = (rng.rand(2, 3, 24, 32) * 255).astype(np.float32)
    src = (rng.rand(2, 3, 24, 32) * 255).astype(np.float32)
    got = np.asarray(joint_bilateral_planar_batched(
        jnp.asarray(joint), jnp.asarray(src), -1, 15.0, 2.0))
    for b in range(2):
        exp = np.asarray(joint_bilateral_filter(
            np.moveaxis(joint[b], 0, -1), np.moveaxis(src[b], 0, -1),
            -1, 15.0, 2.0))
        np.testing.assert_allclose(np.moveaxis(got[b], 0, -1), exp,
                                   rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("cj,cs", [(3, 1), (3, 3), (1, 1), (1, 3)])
def test_bilateral_packed_joint_matches_xla(cj, cs, rng):
    """The mantissa-packed joint!=src kernel must match the XLA scan
    oracle for every channel combination (u8 integer inputs).  A mono
    joint stands for 3 identical channels (diff = 3|delta|)."""
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_packed_joint_batched)
    j = np.floor(rng.rand(24, 40, 3) * 256).astype(np.float32)
    s = np.floor(rng.rand(24, 40, 3) * 256).astype(np.float32)
    if cj == 1:
        j = np.repeat(j[..., :1], 3, axis=-1)
    if cs == 1:
        s = s[..., :1]
    exp = np.asarray(joint_bilateral_filter(j, s, -1, 15.0, 2.0))
    jp = j[..., :1] if cj == 1 else j
    got = np.asarray(bilateral_packed_joint_batched(
        jnp.asarray(np.moveaxis(jp, -1, 0)[None]),
        jnp.asarray(np.moveaxis(s, -1, 0)[None]),
        -1, 15.0, 2.0, joint_reps=(3 if cj == 1 else 1)))[0]
    np.testing.assert_allclose(np.moveaxis(got, 0, -1), exp,
                               rtol=1e-4, atol=2e-3)


def test_guided_planar_matches_nhwc(rng):
    I = (rng.rand(2, 30, 40, 3) * 255).astype(np.float32)
    p = (rng.rand(2, 30, 40, 3) * 255).astype(np.float32)
    exp = np.asarray(guided_filter(jnp.asarray(I), jnp.asarray(p),
                                   4, 9.0, batched=True))
    got = np.moveaxis(np.asarray(guided_filter_planar(
        jnp.asarray(np.moveaxis(I, -1, 1)),
        jnp.asarray(np.moveaxis(p, -1, 1)), 4, 9.0)), 1, -1)
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)


def test_guided_fused_matches_xla(rng):
    """The two-kernel fused guided filter must match the Pallas-box + XLA
    pipeline (aligned shapes, single src channel)."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        fits_fused_guided, guided_filter_fused)
    I = jnp.asarray((rng.rand(2, 3, 16, 128) * 255).astype(np.float32))
    p = jnp.asarray((rng.rand(2, 1, 16, 128) * 255).astype(np.float32))
    assert fits_fused_guided(16, 128, 4)
    exp = np.asarray(_guided_filter_planar_xla(I, p, 4, 9.0))
    got = np.asarray(guided_filter_fused(I, p, 4, 9.0))
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)


def test_guided_fused_rejects_unaligned():
    from reflectance_filtering_tpu.ops.guided_pallas import fits_fused_guided
    assert not fits_fused_guided(30, 40, 4)       # unaligned
    assert not fits_fused_guided(2048, 2048, 45)  # plane too big for VMEM


def test_guided_banded_matches_xla(rng):
    """The band-tiled (big-frame) fused path, including odd H/W needing
    band and lane padding, must match the XLA pipeline."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_banded)
    I = jnp.asarray((rng.rand(1, 3, 21, 50) * 255).astype(np.float32))
    p = jnp.asarray((rng.rand(1, 1, 21, 50) * 255).astype(np.float32))
    exp = np.asarray(_guided_filter_planar_xla(I, p, 3, 9.0))
    got = np.asarray(guided_filter_fused_banded(I, p, 3, 9.0, th=8))
    np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)


def test_guided_banded_mxu_matches_xla(rng):
    """The MXU block-banded box path (big frames, radius >= 8, h >= 128)
    must match the XLA pipeline, including u8-exact guide boxes, the
    hi/lo-split f32 boxes, and the grouped row/col band dots."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _use_mxu, guided_filter_fused_banded, guided_filter_fused_iterated)
    for (h, wd, r) in [(136, 200, 8), (160, 272, 45)]:
        assert _use_mxu(h, r, None)
        I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                        .astype(np.float32))
        p = jnp.asarray(np.floor(rng.rand(1, 1, h, wd) * 256)
                        .astype(np.float32))
        exp = np.asarray(_guided_filter_planar_xla(I, p, r, 9.0))
        got = np.asarray(guided_filter_fused_banded(I, p, r, 9.0))
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)
    I = jnp.asarray(np.floor(rng.rand(1, 3, 136, 200) * 256)
                    .astype(np.float32))
    p = jnp.asarray(np.floor(rng.rand(1, 1, 136, 200) * 256)
                    .astype(np.float32))
    exp = p
    for _ in range(3):
        exp = _guided_filter_planar_xla(I, exp, 8, 9.0)
    got = np.asarray(guided_filter_fused_iterated(I, p, 8, 9.0, 3))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-3, atol=0.05)


def test_guided_fused_single_kernel_matches_xla(rng):
    """The single-kernel-per-iteration fused path (h >= 256, 8 <= r <= 64):
    a,b computed on the r-haloed region from the redundant haloed stats
    layout, boxed down to q in the same kernel.  The halo a,b values must
    equal the reflect of the interior ones (box-at-mirrored-position
    identity), reproducing cv2's BORDER_REFLECT box of a,b exactly."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _use_fused_mxu, guided_filter_fused_banded,
        guided_filter_fused_iterated)
    for (h, wd, r) in [(256, 272, 45), (260, 140, 8)]:
        assert _use_fused_mxu(h, r, None)
        I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                        .astype(np.float32))
        p = jnp.asarray(np.floor(rng.rand(1, 1, h, wd) * 256)
                        .astype(np.float32))
        exp = np.asarray(_guided_filter_planar_xla(I, p, r, 9.0))
        got = np.asarray(guided_filter_fused_banded(I, p, r, 9.0))
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)
    I = jnp.asarray(np.floor(rng.rand(2, 3, 256, 272) * 256)
                    .astype(np.float32))
    p = jnp.asarray(np.floor(rng.rand(2, 1, 256, 272) * 256)
                    .astype(np.float32))
    exp = p
    for _ in range(3):
        exp = _guided_filter_planar_xla(I, exp, 45, 3.0)
    got = np.asarray(guided_filter_fused_iterated(I, p, 45, 3.0, 3))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-3, atol=0.05)


def test_fill_margins_matches_pad_fused(rng):
    """The thin-strip margin rebuild used between fused iterations must
    be BITWISE identical to slicing the interior out and running the
    full reflect-pad (_pad_fused single-pad branch) — including the
    corners, which depend on numpy's rows-then-lanes pad order."""
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _fill_margins, _fits_single_pad, _fused_geometry, _fused_offsets,
        _pad_fused)
    for (h, wd, r) in [(256, 272, 45), (260, 140, 8), (300, 400, 16)]:
        geo = _fused_geometry(h, wd, r)
        if not _fits_single_pad(r, geo, h, wd):
            continue
        tp, lp, _, _ = _fused_offsets(r)
        x = jnp.asarray(rng.rand(2, 1, h, wd).astype(np.float32))
        ref = np.asarray(_pad_fused(x, r, geo, h, wd))
        buf = jnp.asarray(rng.rand(*ref.shape).astype(np.float32))
        buf = buf.at[:, :, tp:tp + h, lp:lp + wd].set(x)  # garbage margins
        got = np.asarray(_fill_margins(buf, r, geo, h, wd))
        np.testing.assert_array_equal(got, ref)


def test_guided_fused_multitile_grid(rng):
    """A 2x2 tile grid (wid > tw forces nw=2) exercises the double-
    buffered q DMA slot rotation and the per-tile stats slots across
    both grid axes — the 4K geometry in miniature."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _fused_geometry, _use_fused_mxu, guided_filter_fused_iterated)
    h, wd, r = 300, 1100, 8
    assert _use_fused_mxu(h, r, None)
    geo = _fused_geometry(h, wd, r)
    assert geo[-2] >= 2 and geo[-1] >= 2      # nh, nw
    I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                    .astype(np.float32))
    p = jnp.asarray(np.floor(rng.rand(1, 1, h, wd) * 256)
                    .astype(np.float32))
    exp = p
    for _ in range(2):
        exp = _guided_filter_planar_xla(I, exp, r, 9.0)
    got = np.asarray(guided_filter_fused_iterated(I, p, r, 9.0, 2))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-3, atol=0.05)


def test_guided_fused_exact_divide_tiling(rng):
    """tile_rows/tile_lanes overrides with th off the 128 grid (partial
    final col-pass block in _mkbox_mxu) and an exact-divide tiling, so
    the last iteration emits the plain layout with no output slice —
    the 240x1280 tiling of a 2160x3840 frame in miniature."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _use_fused_mxu, guided_filter_fused_iterated)
    h, wd, r = 272, 256, 8
    assert _use_fused_mxu(h, r, None)
    I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                    .astype(np.float32))
    p = jnp.asarray(np.floor(rng.rand(1, 1, h, wd) * 256)
                    .astype(np.float32))
    exp = p
    for _ in range(3):
        exp = _guided_filter_planar_xla(I, exp, r, 9.0)
    # th=136: 2 tiles rows (272), partial col block (136 % 128 != 0);
    # tw=128: 2 tile cols — both axes divide exactly
    got = np.asarray(guided_filter_fused_iterated(
        I, p, r, 9.0, 3, tile_rows=136, tile_lanes=128))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-3, atol=0.05)
    # and the default tiling agrees with the override
    base = np.asarray(guided_filter_fused_iterated(I, p, r, 9.0, 3))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-3)


def test_fused_geometry_default_schedule():
    """Pin the measured default tile schedule (2026-08-19 sweeps):
    240-row tiles only when they don't add a tile row; 768-lane tiles
    when 1024 leaves dead lanes and 768 divides exactly."""
    from reflectance_filtering_tpu.ops.guided_pallas import _fused_geometry
    g = lambda h, w: _fused_geometry(h, w, 45)[:2]
    assert g(2160, 3840) == (240, 768)     # 4K: 9x240, 5x768 exact
    assert g(4320, 7680) == (256, 768)     # 8K: 17x256 (18x240 slower)
    assert g(480, 512) == (240, 512)       # 2160-class rows, thin frame
    assert g(512, 512) == (256, 512)       # 4320-class rows
    assert g(1080, 1920) == (240, 1024)    # no 768 divisor: plain rule
    assert g(2048, 2048) == (256, 1024)    # 1024 exact: keep the wider
    # overrides always win
    assert _fused_geometry(2160, 3840, 45, 136, 128)[:2] == (136, 128)


def test_guided_fused_u8_guide_bitwise(rng):
    """guide_u8=True (bf16-stored guide windows) must be BITWISE equal
    to the f32 path on u8-valued guides: integers < 256 are bf16-exact
    and the box dots' hi/lo split then has lo == 0 either way."""
    from reflectance_filtering_tpu.ops.guided_pallas import (
        _use_fused_mxu, guided_filter_fused_iterated)
    h, wd, r = 256, 272, 45
    assert _use_fused_mxu(h, r, None)
    I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                    .astype(np.float32))
    p = jnp.asarray((rng.rand(1, 1, h, wd) * 255).astype(np.float32))
    exp = np.asarray(guided_filter_fused_iterated(I, p, r, 3.0, 3))
    got = np.asarray(guided_filter_fused_iterated(I, p, r, 3.0, 3,
                                                  guide_u8=True))
    np.testing.assert_array_equal(got, exp)


def test_guided_planar_u8_banded_dispatch(rng):
    """guide_u8 must thread through the BANDED big-frame branch of
    guided_filter_planar_pallas (regression: it raised TypeError), and
    the bf16 guide windows stay bitwise vs the f32 run."""
    from reflectance_filtering_tpu.ops.guided import (
        guided_filter_planar_pallas)
    from reflectance_filtering_tpu.ops.guided_mxu import fits_mxu_guided
    from reflectance_filtering_tpu.ops.guided_pallas import fits_fused_guided
    h, wd, r = 1100, 1280, 45
    assert not fits_mxu_guided(h, wd, r, 1) and not fits_fused_guided(
        h, wd, r)
    I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                    .astype(np.float32))
    p = jnp.asarray(np.floor(rng.rand(1, 1, h, wd) * 256)
                    .astype(np.float32))
    exp = np.asarray(guided_filter_planar_pallas(I, p, r, 9.0))
    got = np.asarray(guided_filter_planar_pallas(I, p, r, 9.0,
                                                 guide_u8=True))
    np.testing.assert_array_equal(got, exp)


def test_guided_banded_multichannel_src(rng):
    """Big-frame banded paths accept multi-channel src (channels filter
    independently, guide stats shared)."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_banded)
    for (h, wd, r) in [(256, 272, 45), (136, 200, 8)]:
        I = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                        .astype(np.float32))
        p = jnp.asarray(np.floor(rng.rand(1, 3, h, wd) * 256)
                        .astype(np.float32))
        exp = np.asarray(_guided_filter_planar_xla(I, p, r, 9.0))
        got = np.asarray(guided_filter_fused_banded(I, p, r, 9.0))
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)


def test_guided_iterated_stat_cache_matches_naive(rng):
    """Cached guide stats across iterations == recomputing them."""
    from reflectance_filtering_tpu.ops.guided import _guided_filter_planar_xla
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_iterated)
    I = jnp.asarray((rng.rand(1, 3, 16, 128) * 255).astype(np.float32))
    p = jnp.asarray((rng.rand(1, 1, 16, 128) * 255).astype(np.float32))
    exp = p
    for _ in range(3):
        exp = _guided_filter_planar_xla(I, exp, 4, 9.0)
    got = np.asarray(guided_filter_fused_iterated(I, p, 4, 9.0, 3, th=16))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-3, atol=0.05)


def test_cnn_pallas_matches_reference_forward(rng):
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    img = rng.rand(2, 20, 24, 3).astype(np.float32)
    exp = np.asarray(reflectance_net_apply(params, jnp.asarray(img)))[..., 0]
    got = np.asarray(reflectance_cnn_pallas(packed, jnp.asarray(img),
                                            precise=True))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)
    # default bf16x3 dots: within the golden uint8 gate by a wide margin
    fast = np.asarray(reflectance_cnn_pallas(packed, jnp.asarray(img)))
    np.testing.assert_allclose(fast, exp, atol=5e-4)
    flips = (np.floor(fast * 255) != np.floor(exp * 255)).mean()
    assert flips < 0.005


def test_cnn_pallas_planar_matches_hwc(rng):
    """The channels-first entry (no [P,3]->[3,P] transpose) is the same
    kernel math per pixel column — bitwise equal to the HWC entry."""
    from reflectance_filtering_tpu.ops.cnn_pallas import (
        reflectance_cnn_pallas_planar)
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    img = rng.rand(2, 20, 24, 3).astype(np.float32)
    exp = np.asarray(reflectance_cnn_pallas(packed, jnp.asarray(img),
                                            srgb_input=True))
    got = np.asarray(reflectance_cnn_pallas_planar(
        packed, jnp.moveaxis(jnp.asarray(img), -1, 1), srgb_input=True))
    np.testing.assert_array_equal(got, exp)
    # precise scheme too
    exp6 = np.asarray(reflectance_cnn_pallas(packed, jnp.asarray(img),
                                             precise=True))
    got6 = np.asarray(reflectance_cnn_pallas_planar(
        packed, jnp.moveaxis(jnp.asarray(img), -1, 1), precise=True))
    np.testing.assert_array_equal(got6, exp6)


def test_cnn_pallas_srgb_fused(rng):
    from reflectance_filtering_tpu.utils.image import srgb_to_rgb
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    exp = np.asarray(reflectance_net_apply(
        params, jnp.asarray(srgb_to_rgb(img).astype(np.float32))))[..., 0]
    got = np.asarray(reflectance_cnn_pallas(packed, jnp.asarray(img),
                                            srgb_input=True))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_guided_mxu_matches_xla(rng):
    """MXU band-matmul guided filter vs the XLA op (itself oracled in
    test_filters.py), color guide, 1- and 3-channel src, odd sizes."""
    from reflectance_filtering_tpu.ops.guided_mxu import (
        fits_mxu_guided, guided_filter_mxu)

    guide = np.floor(rng.rand(2, 3, 41, 53) * 256).astype(np.float32)
    for c in (1, 3):
        src = np.floor(rng.rand(2, c, 41, 53) * 256).astype(np.float32)
        assert fits_mxu_guided(41, 53, 8, c)
        got = np.asarray(guided_filter_mxu(jnp.asarray(guide),
                                           jnp.asarray(src), 8, 9.0))
        exp = np.stack([np.asarray(guided_filter(
            jnp.asarray(np.moveaxis(guide[i], 0, -1)),
            jnp.asarray(np.moveaxis(src[i], 0, -1)), 8, 9.0))
            for i in range(2)])
        exp = np.moveaxis(exp, -1, 1)
        np.testing.assert_allclose(got, exp, rtol=1e-3, atol=0.05)


def test_guided_mxu_band_matrix_is_exact_box(rng):
    """The banded matrix IS the reflect-bordered window sum."""
    from reflectance_filtering_tpu.ops.guided_mxu import _band_matrix

    n, r = 37, 5
    B = _band_matrix(128, n, r)
    x = rng.rand(n).astype(np.float64)
    got = (x @ B[:n, :n])
    xp = np.pad(x, r, mode="symmetric")
    exp = np.convolve(xp, np.ones(2 * r + 1), mode="valid")
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    assert np.all(B[n:, :] == 0) and np.all(B[:, n:] == 0)


def test_bilateral_color_self_matches_generic(rng):
    """Mantissa-packed color-self kernel == generic kernel at joint==src
    (u8-integer inputs; packing c0+512*c1 is exact there)."""
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_color_self_batched)

    x = np.floor(rng.rand(1, 3, 24, 40) * 256).astype(np.float32)
    got = np.asarray(bilateral_color_self_batched(
        jnp.asarray(x), -1, 20.0, 3.0))
    exp = np.asarray(joint_bilateral_planar_batched(
        jnp.asarray(x), jnp.asarray(x), -1, 20.0, 3.0))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-3)


def test_bilateral_u8_self_joint_dispatch(rng, monkeypatch):
    """joint_bilateral_filter_u8 detects joint==src (gray and color) and
    routes to the specialized kernels; outputs must match the generic
    path to <=1 uint8 level."""
    import reflectance_filtering_tpu.ops.bilateral as B

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    img = (rng.rand(24, 40, 3) * 255).astype(np.uint8)
    gray = np.repeat(img[..., :1], 3, axis=-1)

    got_c = B.joint_bilateral_filter_u8(img, img, -1, 20.0, 3.0)
    got_g = B.joint_bilateral_filter_u8(gray, gray, -1, 20.0, 3.0)
    monkeypatch.undo()
    exp_c = B.joint_bilateral_filter_u8(img, img, -1, 20.0, 3.0)
    exp_g = B.joint_bilateral_filter_u8(gray, gray, -1, 20.0, 3.0)
    assert np.abs(got_c.astype(int) - exp_c.astype(int)).max() <= 1
    assert np.abs(got_g.astype(int) - exp_g.astype(int)).max() <= 1
    assert (got_g[..., 0] == got_g[..., 1]).all()


def test_bilateral_u8_joint_neq_src_dispatch(rng, monkeypatch):
    """The joint != src u8 dispatch (mantissa-packed kernel) must match
    the XLA-scan path for every channel-shape combination the CLI can
    produce: color joint x mono src (BF(reflectance, photo)), mono joint
    x color src, color x color, and a 2-D src array."""
    import reflectance_filtering_tpu.ops.bilateral as B

    photo = (rng.rand(24, 40, 3) * 255).astype(np.uint8)
    mono3 = np.repeat((rng.rand(24, 40, 1) * 255).astype(np.uint8), 3,
                      axis=-1)
    color = (rng.rand(24, 40, 3) * 255).astype(np.uint8)
    gray2d = (rng.rand(24, 40) * 255).astype(np.uint8)
    cases = [(photo, mono3), (mono3, color), (photo, color),
             (photo, gray2d),
             # genuinely 1-channel joints: diff must stay |delta|
             # (NOT the 3x of a replicated joint) on both backends
             (gray2d, color), (gray2d[..., None], color),
             (gray2d, gray2d.copy())]
    exp = [B.joint_bilateral_filter_u8(j, s, -1, 15.0, 3.0)
           for j, s in cases]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = [B.joint_bilateral_filter_u8(j, s, -1, 15.0, 3.0)
           for j, s in cases]
    for g, e in zip(got, exp):
        assert g.shape == e.shape
        assert np.abs(g.astype(int) - e.astype(int)).max() <= 1
    # mono src stays mono across replicated channels
    assert (got[0][..., 0] == got[0][..., 2]).all()


def test_bilateral_u8_true_gray_self_dispatch(rng, monkeypatch):
    """joint == src with a genuinely 2-D array: the self kernel must use
    the 1-channel diff (reps=1), matching the XLA scan path."""
    import reflectance_filtering_tpu.ops.bilateral as B

    g = (rng.rand(24, 40) * 255).astype(np.uint8)
    exp = B.joint_bilateral_filter_u8(g, g, -1, 15.0, 3.0)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = B.joint_bilateral_filter_u8(g, g, -1, 15.0, 3.0)
    assert got.shape == exp.shape
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1


def test_bilateral_planar_gray_src_single_plane(rng):
    """A 2-D src rides ONE kernel plane (cs=1) and must equal both the
    replicated-3 planar form and the XLA oracle's first channel."""
    joint = (rng.rand(30, 40, 3) * 255).astype(np.float32)
    src = (rng.rand(30, 40) * 255).astype(np.float32)
    got = np.asarray(joint_bilateral_filter_fast(joint, src, -1,
                                                 20.0, 3.0))
    assert got.shape == (30, 40)
    rep3 = np.asarray(joint_bilateral_filter_fast(
        joint, np.repeat(src[..., None], 3, axis=-1), -1, 20.0, 3.0))
    np.testing.assert_array_equal(got, rep3[..., 0])
    exp = np.asarray(joint_bilateral_filter(
        joint, np.repeat(src[..., None], 3, axis=-1), -1, 20.0, 3.0))
    np.testing.assert_allclose(got, exp[..., 0], rtol=1e-4, atol=2e-3)
