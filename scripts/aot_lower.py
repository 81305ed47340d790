"""AOT-lower the changed Pallas kernels for platform 'tpu' WITHOUT a
TPU device — Mosaic verification runs at lowering, catching unsupported
ops (bad broadcasts, misaligned dynamic slices) before chip time."""
import numpy as np, jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

ok = True

def lower(name, fn, *args):
    global ok
    try:
        jax.jit(fn).trace(*args).lower(lowering_platforms=('tpu',))
        print("LOWER OK  ", name, flush=True)
    except Exception as e:
        ok = False
        print("LOWER FAIL", name, ":", repr(e)[:400], flush=True)

# 1) inference CNN kernel (new VPU fuse)
from reflectance_filtering_tpu.models.caffe_io import load_reference_weights
from reflectance_filtering_tpu.models.networks import (
    reference_params_from_caffe)
from reflectance_filtering_tpu.ops.cnn_pallas import (
    pack_weights, reflectance_cnn_pallas)
params = reference_params_from_caffe(load_reference_weights())
packed = {k: jnp.asarray(v) for k, v in pack_weights(params).items()}
x = jnp.zeros((32, 256, 256, 3), jnp.float32)
lower("cnn fused", lambda v: reflectance_cnn_pallas(packed, v,
                                                    srgb_input=True), x)
lower("cnn precise", lambda v: reflectance_cnn_pallas(packed, v,
                                                      precise=True), x)

# 2) training trunk fwd+bwd (VPU fuse + dcat broadcast + input_grad)
from reflectance_filtering_tpu.ops.cnn_train_pallas import skip_trunk_pre
kb = {m: {p: jnp.asarray(np.asarray(params[m][p]))
          for p in ("kernel", "bias")} for m in params}
im = jnp.zeros((20, 256, 256, 3), jnp.float32)
for ig in (True, False):
    def loss(pp, v, _ig=ig):
        pre = skip_trunk_pre(pp, v, num_layers=5, input_grad=_ig)
        return jnp.sum(pre)
    lower("trunk grad input_grad=%s" % ig,
          lambda pp, v, _l=loss: jax.grad(_l)(pp, v), kb, im)

# 3) fused GF chain at the 4K bench geometry (default = 240-row tiles)
from reflectance_filtering_tpu.ops.guided_pallas import (
    guided_filter_fused_iterated)
g4 = jnp.zeros((1, 3, 2160, 3840), jnp.float32)
s4 = jnp.zeros((1, 1, 2160, 3840), jnp.float32)
lower("gf default 4K",
      lambda g, s: guided_filter_fused_iterated(g, s, 45, 3.0, 3,
                                                guide_u8=True), g4, s4)
lower("gf 256-row override 4K",
      lambda g, s: guided_filter_fused_iterated(g, s, 45, 3.0, 3,
                                                guide_u8=True,
                                                tile_rows=256), g4, s4)
print("ALL OK" if ok else "FAILURES PRESENT")
