"""Boundary and Lambertian reconstruction losses.

Reference:
  * training/layers/boundary_loss_layer.py:65-120 — mean pixelwise penalty
    of the channel-mean intensity outside [0, 1], L1 or L2 flavor; wired for
    reflectance and shading when loss_scale_boundaries01 != 0 and mode is
    not rDirectly (training/networks.py:256-278).
  * training/networks.py:281-299 — Lambertian term: caffe EuclideanLoss of
    reflectance*shading vs images, i.e. sum((R*S - I)^2) / (2*batch).

JAX autodiff replaces the reference's hand gradients (the tiled /3 RGB
backprop of boundary_loss_layer.py:78 is exactly d/dx of mean over the
intensity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def boundary_loss(rgb, norm: str = "L1"):
    """Penalize channel-mean intensity outside [0, 1].

    rgb: [B, H, W, 3] (or any [..., 3]).  Returns scalar.
    """
    intensity = jnp.mean(rgb, axis=-1)
    below = jax.nn.relu(-intensity)
    above = jax.nn.relu(intensity - 1.0)
    if norm == "L1":
        loss = below + above
    elif norm == "L2":
        loss = below ** 2 + above ** 2
    else:
        raise ValueError("boundary loss norm must be 'L1' or 'L2'")
    return jnp.mean(loss)


def lambert_loss(reflectance, shading, images):
    """Caffe EuclideanLoss(R*S, I) = sum((R*S - I)^2) / (2 * batch_size)."""
    batch = images.shape[0]
    diff = reflectance * shading - images
    return jnp.sum(diff ** 2) / (2.0 * batch)
