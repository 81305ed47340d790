#!/usr/bin/env python
"""Decompose the bench GF-pipeline and train-step costs stage by stage.

Slope-timed (two trip counts, shared compile) like bench.py so the axon
tunnel's fixed ~29 ms RPC intercept cancels.  Run on the real chip:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_pipeline_split.py

Prints one line per stage: name, ms per batch/step, derived MP/s where
meaningful.  Used to pick round-4 perf targets; keep it runnable.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

BATCH, H, W = 32, 256, 256
MP = BATCH * H * W / 1e6
K = 1181


def timed(fn, x, iters):
    @jax.jit
    def loop(x0, n):
        def body(i, y):
            return y + 1e-12 * fn(y)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x0))
    float(loop(x, iters))
    lo = hi = None
    for _ in range(2):
        t0 = time.time(); float(loop(x, iters)); t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(loop(x, 3 * iters)); t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    return (hi - lo) / (2 * iters)


def main():
    from reflectance_filtering_tpu.models.caffe_io import (
        load_reference_weights)
    from reflectance_filtering_tpu.models.networks import (
        reference_params_from_caffe)
    from reflectance_filtering_tpu.ops.cnn_pallas import (
        pack_weights, reflectance_cnn_pallas)
    from reflectance_filtering_tpu.ops.guided import guided_filter_planar
    from reflectance_filtering_tpu.losses.whdr import whdr_batch

    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    rng = np.random.RandomState(0)
    imgs = jax.device_put(rng.rand(BATCH, H, W, 3).astype(np.float32))
    comps = np.full((BATCH, K + 1, 6), np.nan, np.float32)
    comps[:, :K, :4] = rng.rand(BATCH, K, 4)
    comps[:, :K, 4] = rng.randint(0, 3, (BATCH, K))
    comps[:, :K, 5] = rng.rand(BATCH, K)
    comps[:, K, 0] = K
    comps[:, K, 1] = 1.0
    comps[:, K, 2] = 0
    comps = jax.device_put(comps)

    def cnn(x):
        return jnp.sum(reflectance_cnn_pallas(packed, x, srgb_input=True))

    def cnn_u8(x):
        r = reflectance_cnn_pallas(packed, x, srgb_input=True)
        return jnp.sum(jnp.floor(r * 255.0))

    def cnn_u8_gf(x):
        r = reflectance_cnn_pallas(packed, x, srgb_input=True)
        r8 = jnp.floor(r * 255.0)
        guide = jnp.moveaxis(jnp.floor(x * 255.0), -1, 1)
        f = guided_filter_planar(guide, r8[:, None], 45, 3.0)
        return jnp.sum(f)

    def full(x):
        r = reflectance_cnn_pallas(packed, x, srgb_input=True)
        r8 = jnp.floor(r * 255.0)
        guide = jnp.moveaxis(jnp.floor(x * 255.0), -1, 1)
        f = guided_filter_planar(guide, r8[:, None], 45, 3.0)
        fh = jnp.moveaxis(f, 1, -1) / 255.0
        return jnp.sum(whdr_batch(fh, comps)) + jnp.sum(f) * 0

    def gf_only(x):
        guide = jnp.moveaxis(x, -1, 1) * 255.0
        f = guided_filter_planar(guide, guide[:, :1], 45, 3.0)
        return jnp.sum(f)

    def whdr_only(x):
        return jnp.sum(whdr_batch(x[..., :1], comps))

    for name, fn, iters in [("cnn", cnn, 50), ("cnn+u8", cnn_u8, 50),
                            ("cnn+u8+gf", cnn_u8_gf, 40),
                            ("full gf_pipeline", full, 40),
                            ("gf only", gf_only, 40),
                            ("whdr only", whdr_only, 50)]:
        t = timed(fn, imgs, iters)
        print("%-20s %7.3f ms   %8.1f MP/s" % (name, t * 1e3, MP / t))

    # ---- train step decomposition (B=20, reference config) ----
    from reflectance_filtering_tpu.models.networks import (
        NetworkConfig, init_network, apply_network)
    from reflectance_filtering_tpu.train.loop import (
        LossConfig, compute_losses, make_optimizer)
    from reflectance_filtering_tpu.losses.whdr import whdr_hinge_batch
    import optax
    tcfg = NetworkConfig()
    tl = LossConfig()
    tparams = init_network(jax.random.PRNGKey(0), tcfg)
    topt = make_optimizer("ADAM", 1e-3)
    tstate = topt.init(tparams)
    tb = 20
    timgs = jax.device_put(rng.rand(tb, H, W, 3).astype(np.float32))
    tcomps = jax.device_put(np.broadcast_to(
        np.asarray(comps)[:1], (tb,) + comps.shape[1:]).copy())

    def t_loop(step, n_iters):
        @jax.jit
        def loop(p0, o0, n):
            def body(i, carry):
                return step(*carry)
            return jax.lax.fori_loop(0, n, body, (p0, o0))

        def run(n):
            p, o = loop(tparams, tstate, n)
            float(jnp.sum(jax.tree_util.tree_leaves(p)[0]))
        run(n_iters)
        lo = hi = None
        for _ in range(2):
            t0 = time.time(); run(n_iters); t1 = time.time() - t0
            lo = t1 if lo is None else min(lo, t1)
            t0 = time.time(); run(3 * n_iters); t3 = time.time() - t0
            hi = t3 if hi is None else min(hi, t3)
        return (hi - lo) / (2 * n_iters)

    def mk_step(loss_fn):
        def step(p, o):
            g = jax.grad(loss_fn)(p)
            up, o2 = topt.update(g, o, p)
            return optax.apply_updates(p, up), o2
        return step

    def loss_full(p):
        return compute_losses(p, timgs, tcomps, tcfg, tl,
                              jax.random.PRNGKey(0), train=True)[0]

    def loss_trunk(p):
        blobs = apply_network(p, timgs, tcfg, train=True)
        return jnp.sum(jax.nn.relu(blobs["RS_est"])) * 1e-6

    def loss_hinge(p):
        blobs = apply_network(p, timgs, tcfg, train=True)
        refl = jax.nn.relu(blobs["RS_est"])
        return whdr_hinge_batch(refl, tcomps, 0.1, 0.05, 1.0, True,
                                jax.random.PRNGKey(0))

    def fwd_only(p, o):
        blobs = apply_network(p, timgs, tcfg, train=True)
        s = jnp.sum(blobs["RS_est"]) * 1e-12
        return jax.tree_util.tree_map(lambda a: a * (1 + s), p), o

    for name, step, n in [("train fwd only", fwd_only, 40),
                          ("train trunk f+b+adam", mk_step(loss_trunk), 40),
                          ("train hinge f+b+adam", mk_step(loss_hinge), 40),
                          ("train full step", mk_step(loss_full), 40)]:
        t = t_loop(step, n)
        print("%-22s %7.3f ms   %8.1f imgs/s"
              % (name, t * 1e3, tb / t))


if __name__ == "__main__":
    main()
