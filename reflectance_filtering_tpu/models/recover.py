"""Reflectance/shading recovery from the network estimate — pure jnp.

Reference: training/layers/recover_reflectance_shading_layer.py (mode table
:99-184, interpreters :246-400, norms :403-427, eps threshold :430-431) and
the 'rDirectly'/'RS' special cases wired directly in the graph
(training/networks.py:169-219).

All modes are differentiable jnp expressions; JAX autodiff supersedes the
reference's hand-derived ``diff_reflectance``/``diff_shading`` bookkeeping
(recover_reflectance_shading_layer.py:206-244).

Conventions: feature maps NHWC; ``estimate`` has 1, 3 or 6 channels per the
mode; ``images`` is linear RGB [B,H,W,3].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = np.float32(np.finfo(np.float32).eps)

RS_EST_MODES = (
    "sAbs", "S", "rAbs", "R", "RS",
    "rRelNorm", "rRelMean", "rRelY", "rRelMax",
    "sRelNorm", "sRelMean", "sRelY", "sRelMax",
    "rDirectly",
)


def _threshold(x):
    """max(x, float32 eps) — recover_reflectance_shading_layer.py:430-431."""
    return jnp.maximum(x, EPS)


def _norm_mean(image):
    """(r+g+b)/3 as in Bell et al. 2014 (:403-405)."""
    return jnp.sum(image, axis=-1, keepdims=True) / 3


def _norm_l2(image):
    """L2 norm over color (:408-410)."""
    return jnp.linalg.norm(image, axis=-1, keepdims=True)


def _norm_lightness(image):
    """Perceptual lightness 0.299/0.587/0.114 (:413-419)."""
    return (0.299 * image[..., 0:1] +
            0.587 * image[..., 1:2] +
            0.114 * image[..., 2:3])


def _norm_max(image):
    """L_inf over color (:422-427)."""
    return jnp.max(image, axis=-1, keepdims=True)


_NORMS = {
    "Norm": _norm_l2,
    "Mean": _norm_mean,
    "Y": _norm_lightness,
    "Max": _norm_max,
}


def recover_reflectance_shading(estimate, images, rs_est_mode: str):
    """Map (estimate, images) -> (reflectance, shading), both [B,H,W,3].

    Mode semantics (file:line refer to recover_reflectance_shading_layer.py):
      rDirectly     : ReLU pass-through to both outputs (networks.py:187-202)
      RS            : channel split 3+3 (:384-400)
      R / S         : RGB estimate, counterpart = I/est (:354-382)
      rAbs / sAbs   : scalar absolute intensity (:285-304, :331-352)
      rRel<N>/sRel<N>: scalar relative to image intensity under norm N
                      (:246-283, :306-329); NOTE the reference wires sRelMean/
                      sRelY/sRelMax to the *reflectance* interpreter
                      (:122-139) — reproduced faithfully.
    """
    mode = rs_est_mode.split("-")[0]

    if mode == "rDirectly":
        r = jax.nn.relu(estimate)
        return r, jax.nn.relu(estimate)

    if mode == "RS":
        return estimate[..., 0:3], estimate[..., 3:6]

    if mode == "R":
        r = _threshold(estimate)
        return r, images / r

    if mode == "S":
        s = _threshold(estimate)
        return images / s, s

    if mode == "rAbs":
        r_i = _threshold(estimate)
        return r_i * images, (1.0 / r_i) * jnp.ones_like(images)

    if mode == "sAbs":
        s = _threshold(estimate)
        return images / s, s * jnp.ones_like(images)

    if mode.startswith("rRel") or mode in ("sRelMean", "sRelY", "sRelMax"):
        # interpret_input_as_reflectance_intensity_relative (:246-283)
        norm = _NORMS[mode[4:]]
        r_i = _threshold(estimate)
        intensity = _threshold(norm(images))
        normalized = images / intensity
        reflectance = r_i * normalized
        shading = (intensity / r_i) * jnp.ones_like(images)
        return reflectance, shading

    if mode == "sRelNorm":
        # interpret_input_as_shading_intensity_relative (:306-329)
        s = _threshold(estimate)
        intensity = _threshold(_norm_l2(images))
        reflectance = images / intensity / s
        shading = intensity * s * jnp.ones_like(images)
        return reflectance, shading

    raise ValueError("RS_est_mode '{}' not known".format(rs_est_mode))
