"""Fused Pallas kernel for the flagship reflectance CNN.

The shipped model (network_definition.prototxt:17-165) is a per-pixel MLP:
3 -> 32 -> 32 -> 32 -> 32 -> 32 (ReLU), skip-concat to 160, 160 -> 1 fuse,
sigmoid.  The XLA NHWC formulation wastes the machine: channel counts of
3/32 occupy a sliver of the 128-lane axis and the five skip tensors bounce
through HBM.

TPU-native layout: *channels-planar, pixel-group block-diagonal* — the
pixel stream is split into G=4 contiguous chunks that ride the sublane
axis together, so every matmul presents a full 128-wide MXU tile instead
of a 32-wide sliver.  (Measured on v5e this ties the 32-wide form —
Mosaic handles the small-M/K dots without the naive 16x padding loss —
but the 128-tile layout also halves the gamma's wasted sublanes and is
the right shape if the dots ever move to bf16 multi-pass.)

    x tile     [16, T]   (4 groups x (3 channels + 1 zero row))
    h          [128, T] = relu(W' @ x + b')     W' block-diag of 4 [32x.]
    pre        [4, T]   = sum_k wf_k' @ h + bf  (per-group fuse rows)
    out        sigmoid(pre)                     row g = pixel chunk g

Optionally fuses the sRGB->linear gamma (decompose_with_trained_CNN.py:
57-69) into the same kernel so the input only crosses HBM once.

Weights are packed once with `pack_weights` (block-diagonal, ~74 KB);
the kernel reads them from VMEM.  Dots default to a bf16x3 3-pass scheme
(exact bf16 hi/lo splits of both operands, dropping the lo*lo term) —
1.6x the 6-pass f32 HIGHEST dots at 1.8e-4 max abs output error, far
inside the parity gate (uint8 maps within 1 of the float64 caffemodel
oracle at <0.5% flipped bytes; plain 1-pass bf16 would be 7e-2 off and
is never used).  precise=True selects the HIGHEST dots.
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
G = 4           # pixel groups per tile (4 x 32 channels = 128 lanes)
IN_ROWS = 16    # 4 groups x (3 channels + 1 pad row)


def pack_weights(params: Dict) -> Dict[str, np.ndarray]:
    """Pack the converter's params (HWIO kernels) block-diagonally.

    Returns arrays:
      w0   [16, 128]    w0[4g+c, 32g+o] = conv0[c, o]
      b0   [1, 128]     per-group copies of the conv0 bias
      wmid [4, 128, 128] conv1..conv4 as 4-block diagonals ([in, out])
      bmid [4, 1, 128]
      wf   [5, 128, 4]  fuse weights: wf[k, 32g+i, g] = fuse_k[i]
                        (fuse input order conv0..conv4, prototxt:132-143)
      bf   float
    """
    w0s = np.asarray(params["conv0"]["kernel"])[0, 0]            # [3, 32]
    b0s = np.asarray(params["conv0"]["bias"]).reshape(32)
    w0 = np.zeros((IN_ROWS, G * 32), np.float32)
    b0 = np.zeros((1, G * 32), np.float32)
    for g in range(G):
        w0[4 * g:4 * g + 3, 32 * g:32 * (g + 1)] = w0s
        b0[0, 32 * g:32 * (g + 1)] = b0s

    wmid = np.zeros((4, G * 32, G * 32), np.float32)
    bmid = np.zeros((4, 1, G * 32), np.float32)
    for i in range(1, 5):
        wi = np.asarray(params["conv%d" % i]["kernel"])[0, 0]    # [32, 32]
        bi = np.asarray(params["conv%d" % i]["bias"]).reshape(32)
        for g in range(G):
            wmid[i - 1, 32 * g:32 * (g + 1), 32 * g:32 * (g + 1)] = wi
            bmid[i - 1, 0, 32 * g:32 * (g + 1)] = bi

    wf_full = np.asarray(params["fuse_skip_layers"]["kernel"])[0, 0, :, 0]
    wf_blocks = wf_full.reshape(5, 32)
    wf = np.zeros((5, G * 32, G), np.float32)
    for k in range(5):
        for g in range(G):
            wf[k, 32 * g:32 * (g + 1), g] = wf_blocks[k]
    bf = np.float32(np.asarray(params["fuse_skip_layers"]["bias"])[0])
    return {"w0": w0, "b0": b0, "wmid": wmid, "bmid": bmid, "wf": wf,
            "bf": bf}


def _dot3(w_hi_t, w_lo_t, x):
    """W @ x as three bf16 MXU passes (the bf16x3 'HIGH' scheme Mosaic
    lacks): W = Whi + Wlo and x = xhi + xlo split exactly into bf16
    parts; the dropped Wlo@xlo term is ~2^-16 relative.  Measured 1.6x
    the 6-pass HIGHEST dots at 1.8e-4 max abs output error (0.065% of
    uint8 levels flip vs HIGHEST — the golden gate allows 0.5%)."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(w_hi_t, x_hi, preferred_element_type=jnp.float32)
            + jnp.dot(w_hi_t, x_lo, preferred_element_type=jnp.float32)
            + jnp.dot(w_lo_t, x_hi, preferred_element_type=jnp.float32))


def _kernel(x_ref, w0_ref, b0_ref, wmid_ref, bmid_ref, wf_ref, bf_ref,
            out_ref, *, srgb_input: bool, precise: bool):
    x = x_ref[...]                      # [16, T]; rows 4g..4g+2 = RGB
    if srgb_input:
        x = jnp.where(x <= 0.04045, x / 12.92,
                      jnp.power(jnp.maximum((x + 0.055) / 1.055, 0.0), 2.4))

    hi = jax.lax.Precision.HIGHEST

    def split(w):
        w_hi = w.astype(jnp.bfloat16)
        return w_hi, (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(w, v):
        if precise:
            return jnp.dot(w, v, preferred_element_type=jnp.float32,
                           precision=hi)
        w_hi, w_lo = split(w)
        return _dot3(w_hi, w_lo, v)

    # conv0 for all 4 groups: [128,16] @ [16,T]
    h = dot(w0_ref[...].T, x) + b0_ref[...].T
    h = jnp.maximum(h, 0.0)
    pre = dot(wf_ref[0].T, h)                                # [4, T]
    for i in range(4):
        h = dot(wmid_ref[i].T, h) + bmid_ref[i].T
        h = jnp.maximum(h, 0.0)
        pre = pre + dot(wf_ref[i + 1].T, h)
    pre = pre + bf_ref[0]
    out = 1.0 / (1.0 + jnp.exp(-pre))          # [4, T] (row g = chunk g)
    out_ref[...] = jnp.concatenate([out, jnp.zeros_like(out)], axis=0)


@functools.partial(jax.jit, static_argnames=("srgb_input", "tile",
                                              "precise"))
def _run(xpad, w0, b0, wmid, bmid, wf, bf, *, srgb_input: bool, tile: int,
         precise: bool = False):
    p = xpad.shape[1]
    grid = (p // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, srgb_input=srgb_input, precise=precise),
        out_shape=jax.ShapeDtypeStruct((SUB, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((IN_ROWS, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IN_ROWS, G * 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, G * 32, G * 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, G * 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, G * 32, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((SUB, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xpad, w0, b0, wmid, bmid, wf, jnp.reshape(bf, (1,)))
    return out


def reflectance_cnn_pallas(packed: Dict, images, *,
                           srgb_input: bool = False,
                           tile: int = 2048,
                           precise: bool = False):
    """Fused flagship forward.

    images: [..., 3] float32 (linear RGB, or sRGB with srgb_input=True).
    Returns reflectance intensity [...] (channel axis dropped).
    precise=True uses 6-pass f32 HIGHEST dots instead of the default
    bf16x3 scheme (1.6x slower, 1.8e-4 closer — both far inside the
    golden uint8 gate).
    """
    lead = images.shape[:-1]
    p = int(np.prod(lead))
    x = jnp.moveaxis(images.reshape(p, 3), -1, 0)        # [3, P]
    # split the pixel stream into G contiguous chunks riding the sublane
    # axis together; chunk g occupies rows [4g, 4g+3)
    chunk = -(-p // (G * tile)) * tile
    ppad = chunk * G
    xc = jnp.zeros((3, ppad), jnp.float32).at[:, :p].set(x)
    xc = xc.reshape(3, G, chunk)
    xpad = jnp.zeros((IN_ROWS, chunk), jnp.float32)
    for g in range(G):
        xpad = xpad.at[4 * g:4 * g + 3, :].set(xc[:, g])
    out = _run(xpad, packed["w0"], packed["b0"], packed["wmid"],
               packed["bmid"], packed["wf"], packed["bf"],
               srgb_input=srgb_input, tile=tile, precise=precise)
    return out[:G, :].reshape(ppad)[:p].reshape(lead)
