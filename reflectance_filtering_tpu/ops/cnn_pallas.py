"""Fused Pallas kernel for the flagship reflectance CNN.

The shipped model (network_definition.prototxt:17-165) is a per-pixel MLP:
3 -> 32 -> 32 -> 32 -> 32 -> 32 (ReLU), skip-concat to 160, 160 -> 1 fuse,
sigmoid.  The XLA NHWC formulation wastes the machine: channel counts of
3/32 occupy a sliver of the 128-lane axis and the five skip tensors bounce
through HBM.

TPU-native layout: *K-concatenated multi-pass dots*.  The MXU pads the
contraction dim K to 128 no matter what, so a K=32 dot and a K=96 dot
cost the same pass — which means the bf16x3 precision scheme

    W @ x  ~=  Whi @ xhi  +  Whi @ xlo  +  Wlo @ xhi

collapses into ONE MXU pass per layer by stacking the splits along K:

    [Whi | Whi | Wlo] [32, 96]  @  [xhi; xlo; xhi] [96, T]

(vs 3 separate [128,128] passes for the earlier pixel-group
block-diagonal form, whose K was already full).  Measured on v5e this is
1.45x the block-diagonal bf16x3 kernel (~1015 vs ~700 MP/s at batch 32
256x256 with fused gamma) at identical output error (5e-5 max abs diff).

precise=True uses the same trick on the full-f32 6-product scheme
(3-way exact bf16 splits of both operands, keeping the six products with
magnitude >= 2^-24 relative):

    [W1|W1|W2|W1|W2|W3] [32, 192] @ [x1; x2; x1; x3; x2; x1] [192, T]

— two MXU K-tiles instead of the six passes XLA's HIGHEST emits.

The 160->1 skip-concat fuse is NOT a dot: as an MXU pass its K=480
(bf16x3) would cost 4 of the kernel's 9 K-tile passes for a single real
output row (MXU time scales with K-tiles, not M).  It runs instead as an
f32 VPU multiply-accumulate folded into the layer loop — exact f32 (beats
both dot schemes' error) and the [160, T] concat + 480-row bf16 stack
build disappear with it.

Optionally fuses the sRGB->linear gamma (decompose_with_trained_CNN.py:
57-69) into the same kernel so the input only crosses HBM once.

Weights are packed once with `pack_weights` (split layouts precomputed
host-side, stored as f32 holding exactly-bf16 values; ~150 KB).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF = jnp.bfloat16


def _split3_np(w):
    """Exact 3-term bf16 decomposition of f32 (8+8+8 mantissa bits)."""
    w = np.asarray(w, np.float32)
    h1 = np.asarray(jnp.asarray(w).astype(BF).astype(F32))
    r = w - h1
    h2 = np.asarray(jnp.asarray(r).astype(BF).astype(F32))
    h3 = r - h2  # representable: <= 8 mantissa bits remain
    return h1, h2, h3


def pack_weights(params: Dict) -> Dict[str, np.ndarray]:
    """Pack the converter's params (HWIO kernels) into K-concat layouts.

    Returns f32 arrays whose values are exactly bf16-representable:
      w0_3  [32, 9]    [Whi|Whi|Wlo] of conv0^T       (3-pass scheme)
      w0_6  [32, 18]   [W1|W1|W2|W1|W2|W3]            (6-product scheme)
      wmid3 [4, 32, 96], wmid6 [4, 32, 192]  conv1..conv4 likewise
      wfv   [5, 32, 1]  fuse column per skip layer (conv0..conv4 input
                        order, prototxt:132-143), full f32 — consumed by
                        the VPU multiply-accumulate, not an MXU dot
      b0, bmid [4, 32, 1], bf float
    """
    def kc3(w_oi):     # w [in, out] -> [out, 3*in]
        h1, h2, _ = _split3_np(w_oi)
        return np.concatenate([h1.T, h1.T, h2.T], axis=1)

    def kc6(w_oi):
        w1, w2, w3 = _split3_np(w_oi)
        return np.concatenate([w1.T, w1.T, w2.T, w1.T, w2.T, w3.T], axis=1)

    out: Dict[str, np.ndarray] = {}
    w0 = np.asarray(params["conv0"]["kernel"])[0, 0]            # [3, 32]
    out["w0_3"] = kc3(w0)
    out["w0_6"] = kc6(w0)
    out["b0"] = np.asarray(params["conv0"]["bias"],
                           np.float32).reshape(32, 1)

    m3, m6, bm = [], [], []
    for i in range(1, 5):
        wi = np.asarray(params["conv%d" % i]["kernel"])[0, 0]   # [32, 32]
        m3.append(kc3(wi))
        m6.append(kc6(wi))
        bm.append(np.asarray(params["conv%d" % i]["bias"],
                             np.float32).reshape(32, 1))
    out["wmid3"] = np.stack(m3)
    out["wmid6"] = np.stack(m6)
    out["bmid"] = np.stack(bm)

    wf = np.asarray(params["fuse_skip_layers"]["kernel"])[0, 0, :, 0]
    # fuse = 1 real output row: as an MXU dot its K=480 costs 4 of the 9
    # K-tile passes (MXU time scales with K-tiles, not M).  Instead the
    # kernel runs it as an f32 VPU multiply-accumulate over the five skip
    # tensors (exact f32 — tighter than either dot scheme) — so the fuse
    # weights stay full-precision columns, one [32, 1] per skip layer.
    out["wfv"] = np.asarray(wf, np.float32).reshape(5, 32, 1)
    out["bf"] = np.float32(
        np.asarray(params["fuse_skip_layers"]["bias"])[0])
    return out


def _stack3(v):
    """[xhi; xlo; xhi] along sublanes — pairs with kc3 weights."""
    hi = v.astype(BF)
    lo = (v - hi.astype(F32)).astype(BF)
    return jnp.concatenate([hi, lo, hi], axis=0)


def _stack6(v):
    """[x1; x2; x1; x3; x2; x1] — pairs with kc6 weights."""
    x1 = v.astype(BF)
    r1 = v - x1.astype(F32)
    x2 = r1.astype(BF)
    x3 = (r1 - x2.astype(F32)).astype(BF)
    return jnp.concatenate([x1, x2, x1, x3, x2, x1], axis=0)


def _tile_math(x, w0, b0, wm, bm, wfv, bf0, *,
               srgb_input: bool, precise: bool):
    """The shared per-tile forward: x [3, T] planar RGB -> sigmoid [1, T]."""
    if srgb_input:
        # shared gamma math (utils/image.py) — pure jnp, traces inside
        # the kernel; keeps the fused path pinned to the parity curve
        from ..utils.image import srgb_to_rgb_jnp
        x = srgb_to_rgb_jnp(x)
    stack = _stack6 if precise else _stack3

    def dot(w, v):
        return jnp.dot(w.astype(BF), v, preferred_element_type=F32)

    h = dot(w0, stack(x[:3]))                            # [32, T]
    h = jnp.maximum(h + b0, 0.0)
    # fuse as it goes: the skip-concat dot would pay 4 MXU K-tile passes
    # (K=480 bf16x3) for ONE real output row; an f32 VPU accumulate is
    # exact and also deletes the 480-row stack build.
    acc = h * wfv[0]                                     # [32, T]
    for i in range(4):
        h = dot(wm[i], stack(h))
        h = jnp.maximum(h + bm[i], 0.0)
        acc = acc + h * wfv[i + 1]
    pre = jnp.sum(acc, axis=0, keepdims=True)            # [1, T]
    return 1.0 / (1.0 + jnp.exp(-(pre + bf0)))


def _kernel(x_ref, w0, b0, wm, bm, wfv, bfs, out_ref, *,
            srgb_input: bool, precise: bool):
    out_ref[...] = _tile_math(x_ref[...], w0[...], b0[...], wm, bm, wfv,
                              bfs[0], srgb_input=srgb_input,
                              precise=precise)


def _kernel_planar(x_ref, w0, b0, wm, bm, wfv, bfs, out_ref, *,
                   srgb_input: bool, precise: bool):
    # blocks carry a leading unit batch dim ([1, 3, T] / [1, 1, T])
    out_ref[0] = _tile_math(x_ref[0], w0[...], b0[...], wm, bm, wfv,
                            bfs[0], srgb_input=srgb_input,
                            precise=precise)


@functools.partial(jax.jit, static_argnames=("srgb_input", "tile",
                                             "precise"))
def _run(xpad, w0, b0, wm, bm, wfv, bf, *, srgb_input: bool, tile: int,
         precise: bool = False):
    p = xpad.shape[1]
    # sub-8 sublane blocks on the HBM boundary: Mosaic pads the VMEM
    # tile to (8, 128) internally, but the HBM arrays stay 3 rows in /
    # 1 row out — rows of zero padding here are pure HBM bandwidth
    # (measured: the old (8, p) in+out layout cost ~0.2 ms of the
    # 1.0 ms batch-32 forward in dead-row traffic + XLA pad/slice glue)
    out = pl.pallas_call(
        functools.partial(_kernel, srgb_input=srgb_input, precise=precise),
        out_shape=jax.ShapeDtypeStruct((1, p), F32),
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xpad, w0, b0, wm, bm, wfv, jnp.reshape(bf, (1,)))
    return out


@functools.partial(jax.jit, static_argnames=("srgb_input", "tile",
                                             "precise"))
def _run_planar(x, w0, b0, wm, bm, wfv, bf, *, srgb_input: bool,
                tile: int, precise: bool = False):
    b, _, hwp = x.shape
    return pl.pallas_call(
        functools.partial(_kernel_planar, srgb_input=srgb_input,
                          precise=precise),
        out_shape=jax.ShapeDtypeStruct((b, 1, hwp), F32),
        grid=(b, hwp // tile),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
    )(x, w0, b0, wm, bm, wfv, jnp.reshape(bf, (1,)))


def reflectance_cnn_pallas_planar(packed: Dict, images, *,
                                  srgb_input: bool = False,
                                  tile: int = 4096,
                                  precise: bool = False):
    """Fused flagship forward on CHANNELS-FIRST input: images [B, 3, H, W]
    float32 -> reflectance [B, H, W].

    Same kernel math as :func:`reflectance_cnn_pallas`; the planar layout
    feeds the kernel's [3, T] blocks straight off HBM via the grid's
    batch axis, deleting the [P, 3] -> [3, P] XLA transpose the
    channels-last entry pays (~0.1 ms of the 0.95 ms batch-32 stage —
    VERDICT r4 item 2).  Pipelines that are already planar (GF guide
    [B, 3, H, W], filtered planes [B, 1, H, W]) can then stay planar end
    to end: every remaining moveaxis is a unit-axis reshape, i.e. free.
    """
    b = images.shape[0]
    lead = images.shape[2:]
    hw = int(np.prod(lead))
    x = images.reshape(b, 3, hw)
    hwpad = -(-hw // tile) * tile
    if hwpad != hw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hwpad - hw)))
    sel = "6" if precise else "3"
    out = _run_planar(x, packed["w0_" + sel], packed["b0"],
                      packed["wmid" + sel], packed["bmid"], packed["wfv"],
                      packed["bf"], srgb_input=srgb_input, tile=tile,
                      precise=precise)
    return out[:, 0, :hw].reshape((b,) + lead)


def reflectance_cnn_pallas(packed: Dict, images, *,
                           srgb_input: bool = False,
                           tile: int = 4096,
                           precise: bool = False):
    """Fused flagship forward.

    images: [..., 3] float32 (linear RGB, or sRGB with srgb_input=True).
    Returns reflectance intensity [...] (channel axis dropped).
    precise=True runs the 6-product full-f32 scheme (2 MXU K-tiles/layer)
    instead of the default bf16x3 (1 K-tile/layer) — both far inside the
    golden uint8 gate (bf16x3 is 1.8e-4 max abs off the f32 forward).

    tile=4096 default per the 2026-08-19 on-chip sweep (batch-32 fwd:
    4096 0.895 ms / 8192 0.909 / 16384 0.946 / 32768 0.915; 65536 OOMs
    the 16 MB scoped-VMEM stack).  The training trunk keeps 8192 (its
    sweep was flat: 3.30-3.35 ms across 4096..32768).
    """
    lead = images.shape[:-1]
    p = int(np.prod(lead))
    x = jnp.moveaxis(images.reshape(p, 3), -1, 0)        # [3, P]
    ppad = -(-p // tile) * tile
    xpad = jnp.pad(x, ((0, 0), (0, ppad - p)))
    sel = "6" if precise else "3"
    out = _run(xpad, packed["w0_" + sel], packed["b0"],
               packed["wmid" + sel], packed["bmid"], packed["wfv"],
               packed["bf"], srgb_input=srgb_input, tile=tile,
               precise=precise)
    return out[0, :p].reshape(lead)
