"""AOT-lower the Pallas kernels for platform 'tpu' WITHOUT a TPU.

Mosaic kernel verification happens at lowering, so this catches
unsupported primitives (e.g. dynamic_slice on values, unlowerable
broadcasts, misaligned slices) that interpret-mode tests CANNOT see —
exactly the failure class that would otherwise surface only on the
real chip at benchmark time.  (Found in round 3: a dynamic_slice crept
into the fused-GF interior read and lowered nowhere.)

Uses jax AOT: jit(f).trace(args).lower(lowering_platforms=('tpu',)).
Small geometries keep this fast; they exercise the same kernel code
paths as the production sizes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe)


def _lower(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_cnn_inference_kernel_lowers():
    from reflectance_filtering_tpu.ops.cnn_pallas import (
        pack_weights, reflectance_cnn_pallas, reflectance_cnn_pallas_planar)
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _lower(lambda v: reflectance_cnn_pallas(packed, v, srgb_input=True,
                                            tile=4096), x)
    _lower(lambda v: reflectance_cnn_pallas(packed, v, precise=True,
                                            tile=4096), x)
    xp = jnp.zeros((1, 3, 64, 64), jnp.float32)
    _lower(lambda v: reflectance_cnn_pallas_planar(
        packed, v, srgb_input=True, tile=4096), xp)
    _lower(lambda v: reflectance_cnn_pallas_planar(
        packed, v, precise=True, tile=4096), xp)


@pytest.mark.parametrize("input_grad", [True, False])
def test_training_trunk_grad_lowers(input_grad):
    from reflectance_filtering_tpu.ops.cnn_train_pallas import (
        skip_trunk_pre)
    params = reference_params_from_caffe(load_reference_weights())
    im = jnp.zeros((2, 64, 64, 3), jnp.float32)

    def loss(pp, v):
        return jnp.sum(skip_trunk_pre(pp, v, num_layers=5, tile=4096,
                                      input_grad=input_grad))

    _lower(lambda pp, v: jax.grad(loss)(pp, v), params, im)


def test_training_trunk_mxu_head_grad_lowers():
    """cout>2 keeps the MXU fuse-head backward (the RS-mode trunk,
    cout=6) and uses its own sub-8-row (cout, tile) g block and
    (cout, nfpad) accumulator geometry — a different Mosaic shape class
    from the cout=1 flagship, so it needs its own lowering check."""
    import numpy as np
    from reflectance_filtering_tpu.ops.cnn_train_pallas import (
        skip_trunk_pre)
    rng = np.random.RandomState(0)
    n, ci, f, cout = 3, 3, 32, 6
    params = {}
    for i in range(n):
        cin = ci if i == 0 else f
        params["conv%d" % i] = {
            "kernel": jnp.asarray(rng.randn(1, 1, cin, f), jnp.float32),
            "bias": jnp.zeros((f,), jnp.float32)}
    params["fuse_skip_layers"] = {
        "kernel": jnp.asarray(rng.randn(1, 1, n * f, cout), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32)}
    im = jnp.zeros((2, 64, 64, ci), jnp.float32)

    def loss(pp, v):
        return jnp.sum(skip_trunk_pre(pp, v, num_layers=n, tile=4096,
                                      input_grad=False))

    _lower(lambda pp, v: jax.grad(loss)(pp, v), params, im)


def test_fused_gf_kernels_lower():
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_iterated)
    g = jnp.zeros((1, 3, 272, 512), jnp.float32)
    s = jnp.zeros((1, 1, 272, 512), jnp.float32)
    # exact-divide tile override (off-128-grid th, plain-layout last
    # iteration), u8 bf16 guide
    _lower(lambda a, b: guided_filter_fused_iterated(
        a, b, 8, 9.0, 2, guide_u8=True, tile_rows=136, tile_lanes=128),
        g, s)
    # default (padded aligned-halo) path
    g2 = jnp.zeros((1, 3, 300, 1100), jnp.float32)
    s2 = jnp.zeros((1, 1, 300, 1100), jnp.float32)
    _lower(lambda a, b: guided_filter_fused_iterated(a, b, 8, 9.0, 2),
           g2, s2)


def test_bilateral_kernels_lower():
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        bilateral_color_self_batched, bilateral_gray_self_batched,
        bilateral_packed_joint_batched)
    x = jnp.zeros((2, 96, 128), jnp.float32)
    _lower(lambda v: bilateral_gray_self_batched(v, -1, 20.0, 22.0), x)
    # packed (lanes3) variants: batch 3 dispatches them
    x3 = jnp.zeros((3, 96, 128), jnp.float32)
    _lower(lambda v: bilateral_gray_self_batched(v, -1, 20.0, 22.0), x3)
    c = jnp.zeros((2, 3, 96, 128), jnp.float32)
    _lower(lambda v: bilateral_color_self_batched(v, -1, 20.0, 22.0), c)
    s1 = jnp.zeros((2, 1, 96, 128), jnp.float32)
    _lower(lambda j, v: bilateral_packed_joint_batched(j, v, -1, 20.0,
                                                       22.0), c, s1)
    # generic planar kernel at cs=1 (gray src through the float API —
    # the sharded joint wrapper's path)
    from reflectance_filtering_tpu.ops.bilateral_pallas import (
        joint_bilateral_planar_batched)
    _lower(lambda j, v: joint_bilateral_planar_batched(j, v, -1, 20.0,
                                                       22.0), c, s1)
    s3 = jnp.zeros((2, 3, 96, 128), jnp.float32)
    _lower(lambda j, v: joint_bilateral_planar_batched(j, v, -1, 20.0,
                                                       22.0), c, s3)


def test_whole_plane_guided_and_grid_lower():
    from reflectance_filtering_tpu.ops.guided_mxu import guided_filter_mxu
    from reflectance_filtering_tpu.ops.bilateral_grid import (
        bilateral_grid_gray)
    g = jnp.zeros((2, 3, 64, 128), jnp.float32)
    s = jnp.zeros((2, 1, 64, 128), jnp.float32)
    _lower(lambda a, b: guided_filter_mxu(a, b, 8, 9.0), g, s)
    gj = jnp.zeros((2, 64, 128), jnp.float32)
    _lower(lambda a, b: bilateral_grid_gray(a, b, 20.0 / 3.0, 22.0,
                                            ss=8, sr=6), gj, s)


def test_whdr_gather_lowers():
    from reflectance_filtering_tpu.losses.whdr import whdr_batch
    img = jnp.zeros((2, 64, 64, 1), jnp.float32)
    comps = jnp.zeros((2, 21, 6), jnp.float32)
    _lower(lambda a, b: whdr_batch(a, b), img, comps)


def test_8k_product_chain_lowers():
    """The bench gf_3x_8k stage's EXACT geometry (4320x7680, r=45, 3
    iterations, u8 guide) through the fused chain — the path that
    crashed at 8K until aef6c4f.  ~35 s, but it is the one geometry the
    driver artifact pins that no smaller lowering covers.

    Calls guided_filter_fused_iterated DIRECTLY: guided_filter_iterated's
    dispatch gates on jax.default_backend() == 'tpu', which is 'cpu' in
    this suite, so routing through the dispatcher here would silently
    lower the XLA fallback instead of the product kernels (what this
    test did until round 5)."""
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_iterated)
    g = jnp.zeros((1, 3, 4320, 7680), jnp.float32)
    s = jnp.zeros((1, 1, 4320, 7680), jnp.float32)
    _lower(lambda a, b: guided_filter_fused_iterated(
        a, b, 45, 3.0, 3, guide_u8=True), g, s)


def test_sharded_chain_per_shard_geometry_lowers():
    """The per-shard block of the 8-way sharded 4K 3x chain
    (parallel.spatial.sharded_guided_filter_iterated: 2160 rows x
    480-col shard + 2*270 halo = 1020 cols) through the fused kernels —
    the tile schedule this width resolves to is not covered by the 4K/
    8K whole-frame lowerings."""
    from reflectance_filtering_tpu.ops.guided_pallas import (
        guided_filter_fused_iterated)
    g = jnp.zeros((1, 3, 2160, 1020), jnp.float32)
    s = jnp.zeros((1, 1, 2160, 1020), jnp.float32)
    _lower(lambda a, b: guided_filter_fused_iterated(
        a, b, 45, 3.0, 3, guide_u8=True), g, s)
