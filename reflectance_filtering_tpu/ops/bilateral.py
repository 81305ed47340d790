"""Joint bilateral filter with OpenCV-compatible semantics.

Replaces native component N3 (cv2.ximgproc.jointBilateralFilter, SURVEY.md
§2.3), invoked by the reference as ``jointBilateralFilter(joint, image,
d=-1, sigmaColor, sigmaSpace)`` on uint8 images (filter_reflectance.py:60-64).

OpenCV semantics reproduced exactly (validated against cv2.bilateralFilter,
which is the same algorithm with joint == src):

  * sigma_color/sigma_space <= 0 are clamped to 1.
  * d <= 0  =>  radius = round(1.5 * sigma_space); radius = max(radius, 1);
    window is the *disk* of taps with sqrt(dx^2+dy^2) <= radius.
  * spatial weight  exp(-(dx^2+dy^2) / (2 sigma_space^2))
  * range weight    exp(-(sum_c |J_c(q)-J_c(p)|)^2 / (2 sigma_color^2)),
    computed on the *joint* (guidance) image values.
  * border BORDER_REFLECT_101; float32 accumulation; round-to-nearest-even
    on the uint8 output (cvRound).

Implementation: a `lax.scan` over the tap list.  Each step slices the
reflect-padded joint/src at a (dy, dx) offset and does a fused elementwise
update over the whole image — VPU work with perfect data reuse in HBM
terms.  This is the correctness oracle and the large-image path; a Pallas
kernel (bilateral_pallas.py) tiles it through VMEM for peak throughput.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def opencv_bilateral_params(d: int, sigma_color: float, sigma_space: float
                            ) -> Tuple[int, float, float, np.ndarray]:
    """Replicate OpenCV's parameter preprocessing.

    Returns (radius, gauss_color_coeff, gauss_space_coeff,
    taps[[dy, dx, space_weight], ...]) with the disk mask applied in
    OpenCV's tap order (row-major over the square, skipping r > radius).
    """
    if sigma_color <= 0:
        sigma_color = 1.0
    if sigma_space <= 0:
        sigma_space = 1.0
    gauss_color_coeff = -0.5 / (sigma_color * sigma_color)
    gauss_space_coeff = -0.5 / (sigma_space * sigma_space)
    if d <= 0:
        radius = int(round(sigma_space * 1.5))
    else:
        radius = d // 2
    radius = max(radius, 1)

    taps = []
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            r = math.sqrt(i * i + j * j)
            if r > radius:
                continue
            w = math.exp((i * i + j * j) * gauss_space_coeff)
            taps.append((i, j, w))
    return radius, gauss_color_coeff, gauss_space_coeff, np.asarray(
        taps, dtype=np.float64)


@functools.partial(jax.jit, static_argnames=("radius", "h", "w"))
def _jbf_scan(joint_pad, src_pad, joint_center, tap_offsets, tap_weights,
              gauss_color_coeff, radius: int, h: int, w: int):
    """Scan over taps.  joint_pad/src_pad: [H+2r, W+2r, C] float32;
    joint_center: [H, W, C]."""

    def step(carry, tap):
        acc, wsum = carry
        off, sw = tap
        dy, dx = off[0], off[1]
        js = jax.lax.dynamic_slice(
            joint_pad, (dy, dx, 0), (h, w, joint_pad.shape[2]))
        ss = jax.lax.dynamic_slice(
            src_pad, (dy, dx, 0), (h, w, src_pad.shape[2]))
        diff = jnp.sum(jnp.abs(js - joint_center), axis=-1)
        wgt = sw * jnp.exp(diff * diff * gauss_color_coeff)
        return (acc + wgt[..., None] * ss, wsum + wgt), None

    acc0 = jnp.zeros_like(src_pad, shape=(h, w, src_pad.shape[2]))
    wsum0 = jnp.zeros((h, w), jnp.float32)
    (acc, wsum), _ = jax.lax.scan(
        step, (acc0, wsum0), (tap_offsets, tap_weights))
    return acc / wsum[..., None]


def joint_bilateral_filter(joint, src, d: int = -1,
                           sigma_color: float = 20.0,
                           sigma_space: float = 22.0):
    """Float joint bilateral filter.

    joint: [H,W,C_j] or [H,W]; src: [H,W,C] or [H,W]; values in the units
    sigma_color refers to (0-255 for the reference pipeline).  Returns
    float32 of src's shape.
    """
    joint = jnp.asarray(joint, jnp.float32)
    src = jnp.asarray(src, jnp.float32)
    squeeze = src.ndim == 2
    if joint.ndim == 2:
        joint = joint[..., None]
    if src.ndim == 2:
        src = src[..., None]
    h, w = src.shape[:2]

    radius, gcc, _gsc, taps = opencv_bilateral_params(
        d, sigma_color, sigma_space)

    pad = [(radius, radius), (radius, radius), (0, 0)]
    joint_pad = jnp.pad(joint, pad, mode="reflect")  # BORDER_REFLECT_101
    src_pad = jnp.pad(src, pad, mode="reflect")

    tap_offsets = jnp.asarray(taps[:, :2].astype(np.int32) + radius)
    tap_weights = jnp.asarray(taps[:, 2].astype(np.float32))

    out = _jbf_scan(joint_pad, src_pad, joint, tap_offsets, tap_weights,
                    jnp.float32(gcc), radius, h, w)
    return out[..., 0] if squeeze else out


def joint_bilateral_filter_u8(joint_u8, src_u8, d: int = -1,
                              sigma_color: float = 20.0,
                              sigma_space: float = 22.0) -> np.ndarray:
    """uint8 wrapper with cvRound (round-half-to-even) output.

    Dispatches on TPU to the fastest applicable Pallas kernel —
    gray-self (1 roll/tap) when joint == src with identical channels
    (the BF(CNN,CNN) -r.png case), mantissa-packed color-self
    (2 rolls/tap) when joint == src in color (cv2.bilateralFilter
    semantics), mantissa-packed joint kernel for the remaining u8
    combinations (mono/color joint x mono/color src reduce to 1-3
    rolls/tap, e.g. BF(reflectance, color photo) = 2); XLA scan off-TPU.
    All paths implement the same OpenCV semantics and are oracle-gated."""
    if jax.default_backend() == "tpu":
        from .bilateral_pallas import (bilateral_color_self_batched,
                                       bilateral_gray_self_batched,
                                       bilateral_packed_joint_batched)

        j = np.asarray(joint_u8)
        s = np.asarray(src_u8)
        self_joint = j is s or (j.shape == s.shape and np.array_equal(j, s))
        mono = j.ndim == 2 or (j.ndim == 3 and bool(
            (j[..., :1] == j).all()))
        # a replicated-channel joint contributes |delta| per channel to
        # cv2's summed-abs diff; a genuinely 1-channel array does not
        j_reps = j.shape[-1] if j.ndim == 3 else 1
        if self_joint and mono:
            plane = (j if j.ndim == 2 else j[..., 0]).astype(np.float32)
            g = bilateral_gray_self_batched(jnp.asarray(plane[None]), d,
                                            sigma_color, sigma_space,
                                            reps=j_reps)[0]
            out = np.asarray(g)
            if j.ndim == 3:
                out = np.repeat(out[..., None], j.shape[-1], axis=-1)
        elif self_joint and j.ndim == 3 and j.shape[-1] == 3:
            planar = jnp.asarray(
                np.moveaxis(j.astype(np.float32), -1, 0)[None])
            out = np.moveaxis(np.asarray(bilateral_color_self_batched(
                planar, d, sigma_color, sigma_space))[0], 0, -1)
        else:
            s_mono = s.ndim == 2 or bool((s[..., :1] == s).all())
            jp = (j[..., None] if j.ndim == 2
                  else j[..., :1] if mono else j).astype(np.float32)
            sp = (s[..., None] if s.ndim == 2
                  else s[..., :1] if s_mono else s).astype(np.float32)
            q = np.asarray(bilateral_packed_joint_batched(
                jnp.asarray(np.moveaxis(jp, -1, 0)[None]),
                jnp.asarray(np.moveaxis(sp, -1, 0)[None]),
                d, sigma_color, sigma_space,
                joint_reps=j_reps if mono else 1))[0]
            out = np.moveaxis(q, 0, -1)
            if s.ndim == 2:
                out = out[..., 0]
            elif s_mono and s.shape[-1] > 1:
                out = np.repeat(out[..., :1], s.shape[-1], axis=-1)
    else:
        out = joint_bilateral_filter(joint_u8, src_u8, d, sigma_color,
                                     sigma_space)
    return np.clip(np.rint(np.asarray(out)), 0, 255).astype(np.uint8)
