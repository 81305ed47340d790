"""MXU one-hot gather kernel (ops/whdr_gather_pallas.py) — parity with
the XLA gather path, forward and backward, in TPU-interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import reflectance_filtering_tpu.losses.whdr as whdr_mod
from reflectance_filtering_tpu.losses.whdr import (whdr_batch,
                                                   whdr_hinge_batch)
from reflectance_filtering_tpu.ops.whdr_gather_pallas import (
    fits_mxu_gather, gather_pairs)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand_points(rng, b, h, w, k):
    return tuple(jnp.asarray(rng.randint(0, lim, (b, k)).astype(np.int32))
                 for lim in (h, w, h, w))


@pytest.mark.parametrize("b,h,w,k", [(2, 33, 150, 37), (1, 8, 128, 128),
                                     (3, 64, 200, 260)])
def test_gather_pairs_matches_numpy(b, h, w, k, rng):
    img = rng.rand(b, h, w).astype(np.float32) + 0.1
    y1, x1, y2, x2 = _rand_points(rng, b, h, w, k)
    l1, l2 = gather_pairs(jnp.asarray(img), y1, x1, y2, x2)
    bi = np.arange(b)[:, None]
    np.testing.assert_array_equal(np.asarray(l1),
                                  img[bi, np.asarray(y1), np.asarray(x1)])
    np.testing.assert_array_equal(np.asarray(l2),
                                  img[bi, np.asarray(y2), np.asarray(x2)])


def test_gather_pairs_grad_is_scatter_add(rng):
    b, h, w, k = 2, 24, 140, 50
    img = rng.rand(b, h, w).astype(np.float32) + 0.1
    y1, x1, y2, x2 = _rand_points(rng, b, h, w, k)
    w1 = rng.rand(b, k).astype(np.float32)
    w2 = rng.rand(b, k).astype(np.float32)

    def f(im):
        a, c = gather_pairs(im, y1, x1, y2, x2)
        return jnp.sum(a * w1 + c * w2)

    g = np.asarray(jax.grad(f)(jnp.asarray(img)))
    gref = np.zeros_like(img)
    np.add.at(gref, (np.arange(b)[:, None], np.asarray(y1),
                     np.asarray(x1)), w1)
    np.add.at(gref, (np.arange(b)[:, None], np.asarray(y2),
                     np.asarray(x2)), w2)
    # scatter collisions are summed by the matmul; bf16x3 split of the
    # cotangent reconstructs f32 to ~1 ulp
    np.testing.assert_allclose(g, gref, atol=1e-5)


def _blob(rng, b, k, num):
    blob = np.full((b, k + 1, 6), np.nan, np.float32)
    blob[:, :num, 0:4] = rng.rand(b, num, 4)
    blob[:, :num, 4] = rng.randint(0, 3, (b, num))
    blob[:, :num, 5] = 0.1 + rng.rand(b, num)
    blob[:, k, 0] = num
    blob[:, k, 1] = 1
    blob[:, k, 2] = 0
    return jnp.asarray(blob)


@pytest.mark.parametrize("channels", [1, 3])
def test_whdr_dispatch_equivalence(channels, rng):
    b, h, w, k = 2, 32, 128, 90
    refl = jnp.asarray(rng.rand(b, h, w, channels).astype(np.float32)
                       + 0.05)
    blob = _blob(rng, b, k, 70)
    try:
        whdr_mod.FORCE_MXU_GATHER = False
        ref = float(whdr_batch(refl, blob))
        whdr_mod.FORCE_MXU_GATHER = True
        assert fits_mxu_gather(h, w, k)
        got = float(whdr_batch(refl, blob))
    finally:
        whdr_mod.FORCE_MXU_GATHER = None
    # the MXU gather is value-exact; channel-mean order is identical
    assert got == pytest.approx(ref, abs=2e-7)


def test_hinge_dispatch_equivalence_with_grad(rng):
    b, h, w, k = 2, 32, 128, 90
    refl = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32) + 0.05)
    blob = _blob(rng, b, k, 70)

    def loss(r):
        return whdr_hinge_batch(r, blob)

    try:
        whdr_mod.FORCE_MXU_GATHER = False
        ref_v, ref_g = jax.value_and_grad(loss)(refl)
        whdr_mod.FORCE_MXU_GATHER = True
        got_v, got_g = jax.value_and_grad(loss)(refl)
    finally:
        whdr_mod.FORCE_MXU_GATHER = None
    assert float(got_v) == pytest.approx(float(ref_v), abs=1e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=1e-6)
