"""Fused Pallas kernel for the flagship reflectance CNN.

The shipped model (network_definition.prototxt:17-165) is a per-pixel MLP:
3 -> 32 -> 32 -> 32 -> 32 -> 32 (ReLU), skip-concat to 160, 160 -> 1 fuse,
sigmoid.  The XLA NHWC formulation wastes the machine: channel counts of
3/32 occupy a sliver of the 128-lane axis and the five skip tensors bounce
through HBM.

TPU-native layout: *channels-planar* — pixels live on the lane axis, the
whole MLP runs on one VMEM-resident pixel tile:

    x tile     [8(pad 3), T]      (T pixels on lanes)
    h_i        [32, T] = relu(W_i @ h_{i-1} + b_i)     (MXU, M=32, N=T)
    pre        [1, T]  = sum_i wf_i @ h_i + bf          (fuse as 5 dots)
    out        sigmoid(pre)

Optionally fuses the sRGB->linear gamma (decompose_with_trained_CNN.py:
57-69) into the same kernel so the input only crosses HBM once.

Weights are packed once with `pack_weights`; the kernel reads them from
VMEM (they total ~18 KB).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8


def pack_weights(params: Dict) -> Dict[str, np.ndarray]:
    """Pack the converter's params (HWIO kernels) for the kernel.

    Returns arrays:
      w0   [8, 32]   (3 input channels zero-padded to 8 sublanes)
      b0   [1, 32]
      wmid [4, 32, 32]  (conv1..conv4, layout [in, out])
      bmid [4, 1, 32]
      wf   [5, 32]   (fuse weights per skip block; fuse input order is
                      conv0..conv4 concat — prototxt:132-143)
      bf   float
    """
    w0 = np.zeros((SUB, 32), np.float32)
    w0[:3] = np.asarray(params["conv0"]["kernel"])[0, 0]          # [3,32]
    b0 = np.asarray(params["conv0"]["bias"]).reshape(1, 32)
    wmid = np.stack([np.asarray(params["conv%d" % i]["kernel"])[0, 0]
                     for i in range(1, 5)])                        # [4,32,32]
    bmid = np.stack([np.asarray(params["conv%d" % i]["bias"]).reshape(1, 32)
                     for i in range(1, 5)])
    wf_full = np.asarray(params["fuse_skip_layers"]["kernel"])[0, 0, :, 0]
    wf = wf_full.reshape(5, 32).astype(np.float32)
    bf = np.float32(np.asarray(params["fuse_skip_layers"]["bias"])[0])
    return {"w0": w0, "b0": b0, "wmid": wmid.astype(np.float32),
            "bmid": bmid.astype(np.float32), "wf": wf, "bf": bf}


def _kernel(x_ref, w0_ref, b0_ref, wmid_ref, bmid_ref, wf_ref, bf_ref,
            out_ref, *, srgb_input: bool):
    x = x_ref[...]                      # [8, T] rows 0..2 = RGB, rest zero
    if srgb_input:
        x = jnp.where(x <= 0.04045, x / 12.92,
                      jnp.power(jnp.maximum((x + 0.055) / 1.055, 0.0), 2.4))

    hi = jax.lax.Precision.HIGHEST
    # conv0: [32,8] @ [8,T]
    h = jnp.dot(w0_ref[...].T, x, preferred_element_type=jnp.float32,
                precision=hi) + b0_ref[...].T
    h = jnp.maximum(h, 0.0)
    pre = jnp.dot(wf_ref[0:1, :], h, preferred_element_type=jnp.float32,
                  precision=hi)
    for i in range(4):
        h = jnp.dot(wmid_ref[i].T, h, preferred_element_type=jnp.float32,
                    precision=hi) + bmid_ref[i].T
        h = jnp.maximum(h, 0.0)
        pre = pre + jnp.dot(wf_ref[i + 1:i + 2, :], h,
                            preferred_element_type=jnp.float32, precision=hi)
    pre = pre + bf_ref[0]
    out = 1.0 / (1.0 + jnp.exp(-pre))          # [1, T]
    out_ref[...] = jnp.broadcast_to(out, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("srgb_input", "tile"))
def _run(xpad, w0, b0, wmid, bmid, wf, bf, *, srgb_input: bool, tile: int):
    p = xpad.shape[1]
    grid = (p // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, srgb_input=srgb_input),
        out_shape=jax.ShapeDtypeStruct((SUB, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SUB, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 32, 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((SUB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xpad, w0, b0, wmid, bmid, wf, jnp.reshape(bf, (1,)))
    return out


def reflectance_cnn_pallas(packed: Dict, images, *,
                           srgb_input: bool = False,
                           tile: int = 2048):
    """Fused flagship forward.

    images: [..., 3] float32 (linear RGB, or sRGB with srgb_input=True).
    Returns reflectance intensity [...] (channel axis dropped).
    """
    lead = images.shape[:-1]
    p = int(np.prod(lead))
    x = jnp.moveaxis(images.reshape(p, 3), -1, 0)        # [3, P]
    ppad = -(-p // tile) * tile
    xpad = jnp.zeros((SUB, ppad), jnp.float32).at[:3, :p].set(x)
    out = _run(xpad, packed["w0"], packed["b0"], packed["wmid"],
               packed["bmid"], packed["wf"], packed["bf"],
               srgb_input=srgb_input, tile=tile)
    return out[0, :p].reshape(lead)
