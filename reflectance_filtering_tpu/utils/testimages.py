"""Shared synthetic-workload generators for the parity gate, benchmarks
and tests.

These define the *image classes* and the *packed IIW-style comparison
blob* the framework's fidelity gates score against; keeping one
definition ensures the on-chip gate (bench.py), the regression tests and
the measurement scripts all exercise the same workload (a silent
divergence here would mean the gate and the tests stop testing the same
thing).
"""
from __future__ import annotations

import numpy as np


def pink_noise(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """1/f 'pink' noise — the natural-image power spectrum: random phase
    over a 1/f amplitude spectrum, span-normalized and floored to uint8
    levels.  Returns float64 values in {0..255} (callers cast).

    The closest acquirable stand-in for real photos in this environment
    (no dataset images ship with the repo); used in the grid quality set
    and the bench parity gallery."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    rad = np.sqrt(fy * fy + fx * fx)
    rad[0, 0] = 1.0
    img = np.real(np.fft.ifft2(np.exp(2j * np.pi * rng.rand(h, w)) / rad))
    return np.floor((img - img.min()) / (img.max() - img.min() + 1e-12)
                    * 255.0)


def make_synthetic_comps(seed: int, k: int, batch: int = None) -> np.ndarray:
    """Deterministic packed IIW-style comparison blob [K+1, 6] (or
    [B, K+1, 6] with ``batch``): rows [x1, y1, x2, y2, darker, weight]
    in normalized coordinates, darker in {0,1,2}, random weights, and
    the metadata last row [num_comparisons, 1.0, 0, nan...] — the
    builder contract of data/builder.py (reference
    createNumpyArrayWithComparisonsForIIW.py:616-649)."""
    rr = np.random.RandomState(seed)
    b = 1 if batch is None else batch
    c = np.full((b, k + 1, 6), np.nan, np.float32)
    c[:, :k, :4] = rr.rand(b, k, 4)
    c[:, :k, 4] = rr.randint(0, 3, (b, k))
    c[:, :k, 5] = rr.rand(b, k)
    c[:, k, 0] = k
    c[:, k, 1] = 1.0
    c[:, k, 2] = 0
    return c[0] if batch is None else c
