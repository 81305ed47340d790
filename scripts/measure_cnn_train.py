"""Slope-timed CNN inference kernel + fused training step (run on TPU).

PYTHONPATH=/root/.axon_site:/root/repo python /tmp/measure_cnn_train.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe)
from reflectance_filtering_tpu.ops.cnn_pallas import (
    pack_weights, reflectance_cnn_pallas)

B, H, W = 32, 256, 256
rng = np.random.RandomState(0)
imgs = jax.device_put(rng.rand(B, H, W, 3).astype(np.float32))
params = reference_params_from_caffe(load_reference_weights())
packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
MP = B * H * W / 1e6


def slope(fn, x, iters):
    @jax.jit
    def loop(x0, n):
        def body(i, y):
            return y * (1.0 + 1e-12 * jnp.sum(fn(y)[..., :1, :1]))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x0)[0, 0, 0])
    float(loop(x, iters))
    lo = hi = None
    for _ in range(2):
        t0 = time.time(); float(loop(x, iters)); t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(loop(x, 3 * iters)); t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    return (hi - lo) / (2 * iters)


t = slope(lambda x: reflectance_cnn_pallas(packed, x), imgs, 50)
print("CNN fused kernel: %.3f ms  %.0f MP/s" % (t * 1e3, MP / t), flush=True)
t = slope(lambda x: reflectance_cnn_pallas(packed, x, precise=True),
          imgs, 50)
print("CNN precise:      %.3f ms  %.0f MP/s" % (t * 1e3, MP / t), flush=True)

# training step (mirrors bench.py's train_many)
from reflectance_filtering_tpu.models.networks import (
    NetworkConfig, init_network)
from reflectance_filtering_tpu.train.loop import (
    LossConfig, compute_losses, make_optimizer)

tcfg = NetworkConfig()
tl = LossConfig()
tparams = init_network(jax.random.PRNGKey(0), tcfg)
topt = make_optimizer("ADAM", 1e-3)
tstate = topt.init(tparams)
import optax

tb = 20
k = 120
timgs = jax.device_put(rng.rand(tb, H, W, 3).astype(np.float32))
comps = np.full((tb, k + 1, 6), np.nan, np.float32)
comps[:, :k, :4] = rng.rand(tb, k, 4)
comps[:, :k, 4] = rng.randint(0, 3, (tb, k))
comps[:, :k, 5] = rng.rand(tb, k)
comps[:, k, 0] = k
comps[:, k, 1] = 1.0
comps[:, k, 2] = 0
tcomps = jax.device_put(comps)
titers = 40


@jax.jit
def train_many(p0, o0, im, c, n):
    def body(i, carry):
        p, o = carry
        (_, m), g = jax.value_and_grad(
            lambda pp: compute_losses(pp, im, c, tcfg, tl,
                                      jax.random.PRNGKey(0), train=True),
            has_aux=True)(p)
        up, o = topt.update(g, o, p)
        return optax.apply_updates(p, up), o
    return jax.lax.fori_loop(0, n, body, (p0, o0))


def _run_train(n):
    tp, _ = train_many(tparams, tstate, timgs, tcomps, n)
    float(jnp.sum(jax.tree_util.tree_leaves(tp)[0]))


_run_train(titers)
lo = hi = None
for _ in range(2):
    t0 = time.time(); _run_train(titers); t1 = time.time() - t0
    lo = t1 if lo is None else min(lo, t1)
    t0 = time.time(); _run_train(3 * titers); t3 = time.time() - t0
    hi = t3 if hi is None else min(hi, t3)
per = (hi - lo) / (2 * titers)
print("train step: %.2f ms  %.0f imgs/s" % (per * 1e3, tb / per), flush=True)
