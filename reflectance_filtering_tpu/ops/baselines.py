"""Trivial decomposition baselines from the reference's evaluation suite.

  * Rescaling baseline (reference README.md:91, the ~10^-2.5 s plot-floor
    method): map image intensity linearly into [0.55, 1] and call it
    reflectance.
  * rgbMean / rgbNorm movie baselines live in train/predict.py
    (save_movie_baseline, helper:998-1024).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = np.float32(np.finfo(np.float32).eps)


def rescaling_baseline(images, lo: float = 0.55, hi: float = 1.0):
    """Per-image linear rescale of intensity into [lo, hi] as reflectance.

    images: [..., H, W, 3] linear RGB.  Returns (reflectance_intensity
    [..., H, W], shading [..., H, W]) with I_mean = R * S.
    """
    intensity = jnp.mean(images, axis=-1)
    axes = (-2, -1)
    mn = jnp.min(intensity, axis=axes, keepdims=True)
    mx = jnp.max(intensity, axis=axes, keepdims=True)
    scale = jnp.where(mx > mn, (hi - lo) / (mx - mn), 0.0)
    reflectance = lo + (intensity - mn) * scale
    shading = intensity / jnp.maximum(reflectance, EPS)
    return reflectance, shading
