"""Fused training trunk (ops/cnn_train_pallas.py) vs XLA autodiff.

The custom-vjp pair must reproduce the HIGHEST-precision XLA path's
forward AND parameter gradients (the reference's hand-derived layer
gradients are replaced by autodiff — SURVEY.md §4.6; this kernel must
not reintroduce silent gradient drift)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from reflectance_filtering_tpu.models.networks import (
    NetworkConfig, apply_network, init_network)
from reflectance_filtering_tpu.ops.cnn_train_pallas import (
    fits_fused_trunk, skip_trunk_pre)


def _grad_pair(cfg, seed=1, shape=(2, 48, 64)):
    params = init_network(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(0)
    b, h, w = shape
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    cot = jnp.asarray(
        rng.rand(b, h, w, cfg.num_output_final).astype(np.float32))

    def xla_loss(p):
        blobs = apply_network(p, imgs, cfg, train=True)
        return jnp.sum(blobs["RS_est_before_sigmoid"] * cot)

    def fused_loss(p):
        pre = skip_trunk_pre(p, imgs, num_layers=cfg.num_layers, tile=512)
        return jnp.sum(pre * cot)

    lx, gx = jax.value_and_grad(xla_loss)(params)
    with pltpu.force_tpu_interpret_mode():
        lf, gf = jax.value_and_grad(fused_loss)(params)
    return (lx, gx), (lf, gf)


def _assert_close(gx, gf, tol=5e-5):
    for k in gx:
        for part in ("kernel", "bias"):
            a = np.asarray(gx[k][part])
            b = np.asarray(gf[k][part])
            scale = np.abs(a).max() + 1e-30
            err = np.abs(a - b).max() / scale
            assert err < tol, (k, part, err)


@pytest.mark.parametrize("num_layers,nfl", [(5, 5), (2, 4), (1, 5),
                                            (2, 7)])  # 7: f=128 lanepad
def test_fused_trunk_grads_match_autodiff(num_layers, nfl):
    cfg = NetworkConfig(network_type="convStaticSkipLayers",
                        num_layers=num_layers, num_filters_log=nfl,
                        kernel_pad=0, rs_est_mode="rDirectly")
    assert fits_fused_trunk(cfg, 3)
    (lx, gx), (lf, gf) = _grad_pair(cfg)
    # wider nets accumulate more bf16x3 roundoff in the summed loss
    assert abs(float(lx) - float(lf)) / (abs(float(lx)) + 1e-30) < 1e-4
    _assert_close(gx, gf, tol=2e-4)


def test_fused_trunk_multi_output_head():
    """RS mode: 6-channel head (networks.py:95-111 channel table)."""
    cfg = NetworkConfig(network_type="convStaticSkipLayers", num_layers=3,
                        num_filters_log=4, kernel_pad=0, rs_est_mode="RS")
    assert cfg.num_output_final == 6
    assert fits_fused_trunk(cfg, 3)
    (lx, gx), (lf, gf) = _grad_pair(cfg)
    assert abs(float(lx) - float(lf)) / (abs(float(lx)) + 1e-30) < 1e-5
    _assert_close(gx, gf, tol=2e-4)  # 6-ch head: larger bf16x3 roundoff


def test_fused_trunk_odd_pixel_count():
    """Non-tile-multiple pixel counts exercise the zero-padded tail."""
    cfg = NetworkConfig(network_type="convStaticSkipLayers", num_layers=2,
                        num_filters_log=3, kernel_pad=0,
                        rs_est_mode="rDirectly")
    (lx, gx), (lf, gf) = _grad_pair(cfg, shape=(1, 37, 53))
    assert abs(float(lx) - float(lf)) / (abs(float(lx)) + 1e-30) < 1e-5
    _assert_close(gx, gf)


def test_fused_trunk_input_cotangent():
    """Gradients must flow through the trunk INPUT: cascadeSkipLayers
    feeds level-1 from level-0's recovered reflectance, so a zero input
    cotangent would silently starve level-0 of the final loss's signal."""
    cfg = NetworkConfig(network_type="convStaticSkipLayers", num_layers=2,
                        num_filters_log=3, kernel_pad=0,
                        rs_est_mode="rDirectly")
    params = init_network(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 24, 40, 3).astype(np.float32))
    cot = jnp.asarray(rng.rand(1, 24, 40, 1).astype(np.float32))

    def xla_loss(im):
        blobs = apply_network(params, im, cfg, train=True)
        return jnp.sum(blobs["RS_est_before_sigmoid"] * cot)

    def fused_loss(im):
        pre = skip_trunk_pre(params, im, num_layers=cfg.num_layers,
                             tile=512)
        return jnp.sum(pre * cot)

    gx = jax.grad(xla_loss)(imgs)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(fused_loss)(imgs)
    a, b = np.asarray(gx), np.asarray(gf)
    assert np.abs(a).max() > 0
    assert np.abs(a - b).max() / np.abs(a).max() < 5e-5


def test_fused_trunk_input_grad_false_param_grads_unchanged():
    """input_grad=False (leaf-input trunks) must leave PARAM gradients
    bitwise-identical to the input_grad=True variant — it only drops the
    dx output — and return a zeros input cotangent without error."""
    cfg = NetworkConfig(network_type="convStaticSkipLayers", num_layers=2,
                        num_filters_log=3, kernel_pad=0,
                        rs_est_mode="rDirectly")
    params = init_network(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, 24, 40, 3).astype(np.float32))
    cot = jnp.asarray(rng.rand(1, 24, 40, 1).astype(np.float32))

    def loss(p, im, ig):
        pre = skip_trunk_pre(p, im, num_layers=cfg.num_layers,
                             tile=512, input_grad=ig)
        return jnp.sum(pre * cot)

    with pltpu.force_tpu_interpret_mode():
        g_on = jax.grad(loss)(params, imgs, True)
        g_off = jax.grad(loss)(params, imgs, False)
        gi_off = jax.grad(loss, argnums=1)(params, imgs, False)
    for k in g_on:
        for part in ("kernel", "bias"):
            np.testing.assert_array_equal(np.asarray(g_on[k][part]),
                                          np.asarray(g_off[k][part]))
    assert float(np.abs(np.asarray(gi_off)).max()) == 0.0


def test_fused_trunk_cascade_level0_gets_final_loss_grads():
    """End-to-end cascade: level-0 params receive gradient from a loss on
    the level-1 output (through recover + the level-1 trunk input)."""
    cfg = NetworkConfig(network_type="cascadeSkipLayers", num_layers=2,
                        num_filters_log=3, kernel_pad=0,
                        rs_est_mode="rDirectly")
    params = init_network(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(1, 24, 40, 3).astype(np.float32))

    def xla_loss(p):
        return jnp.sum(apply_network(p, imgs, cfg, train=True)["RS_est"])

    gx = jax.grad(xla_loss)(params)

    def fused_loss(p):
        # route both levels through the fused trunk by monkeypatching
        # the backend gate is CPU here; call skip_trunk_pre directly to
        # mirror what the TPU dispatch builds
        from reflectance_filtering_tpu.models.networks import (
            recover_reflectance_shading)
        pre0 = skip_trunk_pre(p, imgs, num_layers=cfg.num_layers,
                              suffix="_level0", tile=512)
        refl0, _ = recover_reflectance_shading(
            jax.nn.sigmoid(pre0), imgs, "rRelMax")
        pre1 = skip_trunk_pre(p, refl0, num_layers=cfg.num_layers,
                              suffix="_level1", tile=512)
        return jnp.sum(jax.nn.sigmoid(pre1))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(fused_loss)(params)
    for name in ("conv0_level0", "conv1_level0", "fuse_skip_layers_level0"):
        a = np.asarray(gx[name]["kernel"])
        b = np.asarray(gf[name]["kernel"])
        assert np.abs(a).max() > 0, name
        err = np.abs(a - b).max() / np.abs(a).max()
        assert err < 1e-4, (name, err)


def test_fused_trunk_eligibility_gates():
    bn = NetworkConfig(network_type="convStaticSkipLayers",
                       use_batch_normalization=True, kernel_pad=0)
    assert not fits_fused_trunk(bn, 3)
    k3 = NetworkConfig(network_type="convStaticSkipLayers", kernel_pad=1)
    assert not fits_fused_trunk(k3, 3)
    assert not fits_fused_trunk(
        NetworkConfig(network_type="convStaticSkipLayers", kernel_pad=0), 9)
