"""Bilateral-grid fast bilateral filter (Paris & Durand 2006 / Chen 2007).

OPTIONAL approximate speed mode beyond the reference's capability
surface — the exact OpenCV-semantics kernels (ops/bilateral.py,
ops/bilateral_pallas.py) remain the parity path.  The exact per-tap
bilateral is VPU-bound at ~91 MP/s on one v5e chip (README "Why the
exact bilateral cannot reach 500 MP/s"); this grid approximation runs
an order of magnitude faster at the classic grid-artifact cost (a few
uint8 levels vs the exact filter on natural images).

Algorithm (gray guide J, per-channel src S, all 0-255 units):
  splat  : accumulate (w=1, S) into a coarse grid over (y/ss, x/ss,
           J/sr) with TRILINEAR weights — expressed TPU-natively as
           B intensity-bin hat masks (no scatter: masked plane sums
           pooled by ss with box weights);
  blur   : small separable Gaussian over the two spatial grid axes and
           the intensity axis (sigma = sigma_space/ss, sigma_color/sr
           in grid cells);
  slice  : trilinear read at (y/ss, x/ss, J(p)/sr) — bilinear upsample
           of each bin plane + per-pixel intensity hat weights — and
           the homogeneous divide.

Everything is jnp (resize, conv via small matmuls, elementwise): XLA
fuses the per-bin math; no Pallas needed because the grid is ~ss*ss*sr
times smaller than the image.

Reference mapping: same parameter conventions as
cv2.ximgproc.jointBilateralFilter (filter_reflectance.py:60-64) —
sigma_color on 0-255 guide values, sigma_space in pixels; the guide is
the image itself or a separate joint image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_axis(g, kernel: np.ndarray, axis: int):
    """Separable 1-D Gaussian along ``axis`` with replicate edges."""
    r = (len(kernel) - 1) // 2
    pad = [(0, 0)] * g.ndim
    pad[axis] = (r, r)
    gp = jnp.pad(g, pad, mode="edge")
    out = jnp.zeros_like(g)
    for i, w in enumerate(kernel):
        sl = [slice(None)] * g.ndim
        sl[axis] = slice(i, i + g.shape[axis])
        out = out + w * gp[tuple(sl)]
    return out


@functools.partial(jax.jit, static_argnames=("sigma_color", "sigma_space",
                                             "ss", "sr"))
def bilateral_grid_gray(joint, src, sigma_color: float = 20.0,
                        sigma_space: float = 22.0,
                        ss: int = None, sr: int = None):
    """Fast approximate joint bilateral, gray guide.

    joint [N,H,W] (0-255), src [N,C,H,W] -> [N,C,H,W] float32.
    ss/sr: spatial / range grid cell sizes (pixels / intensity levels);
    default None picks ~sigma/3 spatial and ~1.2 sigma range cells —
    measured mean error ~0.4 uint8 levels / p99 ~2 / max 3 vs the exact
    filter on the study image at ~425 MP/s (v5e, headline batch).
    Larger cells trade accuracy for speed: ss=16, sr=1.5 sigma is ~1.6x
    faster (690 MP/s) at p99 2 / max 4; sr=2 sigma ~1.9x (790) at p99 3.
    Keep ss a divisor of H and W — a non-dividing ss pads the image and
    breaks the pow-2 pooling layout (ss=12 on 256 px measured SLOWER
    than ss=8)."""
    if ss is None:  # ~sigma/3, snapped to x4 (pow-2-ish reshapes pool
        ss = max(2, 4 * int(round(sigma_space / 12.0)))  # ~15% faster)
    if sr is None:
        sr = max(2, int(round(1.2 * sigma_color)))
    n, h, w = joint.shape
    c = src.shape[1]
    hs, ws = -(-h // ss), -(-w // ss)
    nb = int(np.ceil(255.0 / sr)) + 1          # bin centers b*sr
    hp, wp = hs * ss, ws * ss

    # zero-pad to grid multiples and mask the splat weights: padded
    # pixels contribute nothing to either accumulator, and the
    # homogeneous num/den divide self-corrects the partial border cells
    # (edge-replicate padding would bias them instead)
    jp = jnp.pad(joint, [(0, 0), (0, hp - h), (0, wp - w)])
    sp = jnp.pad(src, [(0, 0), (0, 0), (0, hp - h), (0, wp - w)])
    mask = jnp.pad(jnp.ones((n, h, w), jnp.float32),
                   [(0, 0), (0, hp - h), (0, wp - w)])

    # --- splat: trilinear hat in intensity, box pool in space ---------
    z = jp / float(sr)                          # [N,Hp,Wp] in bin units
    bins = jnp.arange(nb, dtype=jnp.float32)
    # hat weights per bin: max(0, 1-|z-b|)  -> [N,nb,Hp,Wp]
    hat = mask[:, None] * jnp.maximum(
        0.0, 1.0 - jnp.abs(z[:, None] - bins[None, :, None, None]))
    wgrid = hat.reshape(n, nb, hs, ss, ws, ss).mean(axis=(3, 5))
    sgrid = (hat[:, None] * sp[:, :, None]).reshape(
        n, c, nb, hs, ss, ws, ss).mean(axis=(4, 6))   # [N,C,nb,hs,ws]

    # --- blur: separable Gaussian over (bin, y, x) grid axes ----------
    # spatial kernel truncated at 1.5 sigma, mirroring OpenCV's
    # radius = round(1.5 sigma_space) window rule (the dominant source
    # of over-smoothing if left untruncated); range kernel at 2 sigma
    kz = _gauss_kernel(sigma_color / sr, max(1, int(round(
        2 * sigma_color / sr))))
    ks = _gauss_kernel(sigma_space / ss, max(1, int(round(
        1.5 * sigma_space / ss))))
    for g_ax, kern in ((1, kz), (2, ks), (3, ks)):
        wgrid = _blur_axis(wgrid, kern, g_ax)
    for g_ax, kern in ((2, kz), (3, ks), (4, ks)):
        sgrid = _blur_axis(sgrid, kern, g_ax)

    # --- slice: bilinear spatial upsample per bin + intensity hat -----
    wup = jax.image.resize(wgrid, (n, nb, hp, wp), "bilinear")
    sup = jax.image.resize(sgrid, (n, c, nb, hp, wp), "bilinear")
    hat_p = jnp.maximum(0.0, 1.0 - jnp.abs(z[:, None] - bins[None, :,
                                                             None, None]))
    den = jnp.sum(hat_p * wup, axis=1)                       # [N,Hp,Wp]
    num = jnp.sum(hat_p[:, None] * sup, axis=2)              # [N,C,Hp,Wp]
    out = num / jnp.maximum(den, 1e-20)[:, None]
    return out[:, :, :h, :w]


def bilateral_grid_u8(joint_u8, src_u8, sigma_color: float = 20.0,
                      sigma_space: float = 22.0,
                      ss: int = None, sr: int = None) -> np.ndarray:
    """uint8 convenience wrapper (gray or replicated-channel joint).

    A color joint is converted to its channel mean (the grid treats the
    guide as scalar — the standard luminance-grid approximation), and
    sigma_color is divided by the channel count to match the exact
    filter's summed-abs range diff (3 identical channels -> 3|delta|)."""
    j = np.asarray(joint_u8)
    s = np.asarray(src_u8)
    if j.ndim == 3:
        sigma_color = sigma_color / j.shape[-1]
        j = j.mean(axis=-1)
    if s.ndim == 2:
        sp = s[None, None].astype(np.float32)
    else:
        sp = np.moveaxis(s, -1, 0)[None].astype(np.float32)
    out = np.asarray(bilateral_grid_gray(
        jnp.asarray(j[None].astype(np.float32)), jnp.asarray(sp),
        float(sigma_color), float(sigma_space), ss, sr))[0]
    out = out[0] if s.ndim == 2 else np.moveaxis(out, 0, -1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
