"""Measure the channels-first CNN entry (no [P,3]->[3,P] XLA transpose)
vs the HWC entry, plus the end-to-end GF pipeline fed planar (guide
moveaxis also deleted).  Slope-timed.  VERDICT r4 item 2.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_cnn_planar.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe)
from reflectance_filtering_tpu.ops.cnn_pallas import (
    pack_weights, reflectance_cnn_pallas, reflectance_cnn_pallas_planar)
from reflectance_filtering_tpu.ops.guided import guided_filter_planar
from reflectance_filtering_tpu.losses.whdr import whdr_batch

B, H, W = 32, 256, 256
MP = B * H * W / 1e6
K = 1181


def timed(fn, x, iters=50):
    @jax.jit
    def loop(x0, n):
        def body(i, y):
            return y + 1e-12 * fn(y)
        return jnp.sum(jax.lax.fori_loop(0, n, body, x0))
    float(loop(x, iters))
    lo = hi = None
    for _ in range(3):
        t0 = time.time(); float(loop(x, iters)); t1 = time.time() - t0
        lo = t1 if lo is None else min(lo, t1)
        t0 = time.time(); float(loop(x, 3 * iters)); t3 = time.time() - t0
        hi = t3 if hi is None else min(hi, t3)
    return (hi - lo) / (2 * iters)


def main():
    rng = np.random.RandomState(0)
    params = reference_params_from_caffe(load_reference_weights())
    packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
    imgs = jax.device_put(rng.rand(B, H, W, 3).astype(np.float32))
    imgs_p = jax.device_put(np.moveaxis(np.asarray(imgs), -1, 1).copy())
    from reflectance_filtering_tpu.utils.testimages import (
        make_synthetic_comps)
    comps = jax.device_put(make_synthetic_comps(0, K, batch=B))

    for tile in (4096, 8192):
        def hwc(x, _t=tile):
            return jnp.sum(reflectance_cnn_pallas(
                packed, x, srgb_input=True, tile=_t))

        def planar(x, _t=tile):
            return jnp.sum(reflectance_cnn_pallas_planar(
                packed, x, srgb_input=True, tile=_t))

        t1 = timed(hwc, imgs)
        t2 = timed(planar, imgs_p)
        print("tile %5d  hwc: %.3f ms %4.0f MP/s   planar: %.3f ms %4.0f MP/s"
              % (tile, t1 * 1e3, MP / t1, t2 * 1e3, MP / t2), flush=True)

    # end-to-end GF pipeline, HWC-fed vs planar-fed
    def gf_hwc(x):
        r = reflectance_cnn_pallas(packed, x, srgb_input=True)
        r8 = jnp.floor(r * 255.0)
        guide = jnp.moveaxis(jnp.floor(x * 255.0), -1, 1)
        f = guided_filter_planar(guide, r8[:, None], 45, 3.0)
        fh = jnp.moveaxis(f, 1, -1) / 255.0
        return jnp.sum(whdr_batch(fh, comps)) + jnp.sum(f) * 0

    def gf_planar(x):
        r = reflectance_cnn_pallas_planar(packed, x, srgb_input=True)
        r8 = jnp.floor(r * 255.0)
        guide = jnp.floor(x * 255.0)
        f = guided_filter_planar(guide, r8[:, None], 45, 3.0)
        fh = jnp.moveaxis(f, 1, -1) / 255.0   # unit axis: free reshape
        return jnp.sum(whdr_batch(fh, comps)) + jnp.sum(f) * 0

    t1 = timed(gf_hwc, imgs, iters=40)
    t2 = timed(gf_planar, imgs_p, iters=40)
    print("gf pipeline  hwc: %.3f ms %4.0f MP/s   planar: %.3f ms %4.0f MP/s"
          % (t1 * 1e3, MP / t1, t2 * 1e3, MP / t2), flush=True)


if __name__ == "__main__":
    main()
