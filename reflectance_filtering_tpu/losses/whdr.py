"""WHDR metric and WHDR hinge loss as vectorized, padded jnp ops.

Reference semantics (file:line into /root/reference/training/layers/):

  * whdr_layer.py:253-287 — exact Bell-2014 WHDR: per comparison classify
    l2/l1 > 1+delta -> darker 1, l1/l2 > 1+delta -> darker 2, else E(0);
    error = sum of weights where the human label disagrees; whdr =
    error_sum / weight_sum (0 if weight_sum == 0).
  * whdr_layer.py:182-198 — lightness L = max(float32_eps, mean(RGB)) for
    3 channels, max(eps, r) for 1 channel.
  * whdr_layer.py:239-250 — normalized coords scaled by width/height and
    *truncated* to int.
  * whdr_hinge_loss_layer.py:126-230 — hinge relaxation: y = L1/L2;
    darker 1: max(0, y - 1/(1+d+m)); darker 2: max(0, (1+d+m) - y);
    darker E, m<=d: two-sided hinge outside [1/(1+d-m), 1+d-m];
    m>d: max(1/border - y, y - border).  Per-image normalization by the
    evaluated weight sum, then batch mean.
  * whdr_hinge_loss_layer.py:136-148 — dense-skip (eval_dense=0 and
    n>300 -> evaluate 1), ratio subsampling (n = ceil(ratio*n)), cap at
    MAX_EVALUATED_COMPARISONS=1500 by uniform choice without replacement.

The comparisons blob layout is the reference's packed format
(createNumpyArrayWithComparisonsForIIW.py:616-649): [K+1, 1, 6] rows
[x1, y1, x2, y2, darker, weight] (normalized coords, NaN padded), last row
metadata [num_comparisons, file_name, 0].  Here the trailing singleton axis
is dropped: [K+1, 6].

TPU design: everything is fixed-shape gather + masked segment math — one
XLA program, no per-comparison Python.  JAX autodiff through the hinge
reproduces the reference's hand-derived gradients
(whdr_hinge_loss_layer.py:164-230) exactly (verified in tests against
finite differences and the reference formulas).
"""
from __future__ import annotations

import functools
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = np.float32(np.finfo(np.float32).eps)
MAX_EVALUATED_COMPARISONS = 1500  # whdr_hinge_loss_layer.py:36
DENSE_SKIP_THRESHOLD = 300        # whdr_hinge_loss_layer.py:136-138


def _ratio_ceil(num_eval, ratio: float, k: int):
    """Exact reference subsample count: int(np.ceil(ratio * n)) in
    float64 (whdr_hinge_loss_layer.py:139-140), via a host-precomputed
    table — an in-graph float32 ceil diverges on ~120 (ratio, n) pairs
    (e.g. 0.6*25 -> 16 instead of 15)."""
    table = jnp.asarray(np.ceil(
        ratio * np.arange(k + 1, dtype=np.float64)).astype(np.int32))
    return table[num_eval]


def comparisons_to_pixel_indices(comparisons, height: int, width: int):
    """Split a [K+1, 6] padded comparisons blob into gather-ready pieces.

    Returns (x1, y1, x2, y2, darker, weight, valid_mask, num_comparisons)
    where coordinates are int32 pixel indices (truncation semantics of
    whdr_layer.py:239-250) clamped into bounds for the padded rows.
    """
    num = comparisons[-1, 0].astype(jnp.int32)
    rows = comparisons[:-1]
    k = rows.shape[0]
    idx = jnp.arange(k)
    valid = idx < num

    safe = jnp.where(valid[:, None], rows, 0.0)
    x1 = jnp.clip((safe[:, 0] * width).astype(jnp.int32), 0, width - 1)
    y1 = jnp.clip((safe[:, 1] * height).astype(jnp.int32), 0, height - 1)
    x2 = jnp.clip((safe[:, 2] * width).astype(jnp.int32), 0, width - 1)
    y2 = jnp.clip((safe[:, 3] * height).astype(jnp.int32), 0, height - 1)
    darker = safe[:, 4].astype(jnp.int32)
    weight = safe[:, 5]
    return x1, y1, x2, y2, darker, weight, valid, num


def _lightness_at(reflectance, ys, xs):
    """Gather L = max(eps, channel-mean) at pixel coords.

    reflectance: [H, W, C] (C in {1, 3}); ys/xs: [K] int32 -> [K] float32.
    """
    vals = reflectance[ys, xs]              # [K, C]
    return jnp.maximum(jnp.mean(vals, axis=-1), EPS)


def whdr(reflectance, comparisons, delta: float = 0.1):
    """Exact Bell-2014 WHDR for one image.

    reflectance: [H, W, C] linear; comparisons: [K+1, 6] padded blob.
    Returns a float32 scalar in [0, 1].
    """
    h, w = reflectance.shape[:2]
    x1, y1, x2, y2, darker, weight, valid, _ = comparisons_to_pixel_indices(
        comparisons, h, w)
    l1 = _lightness_at(reflectance, y1, x1)
    l2 = _lightness_at(reflectance, y2, x2)

    alg = jnp.where(l2 / l1 > 1 + delta, 1,
                    jnp.where(l1 / l2 > 1 + delta, 2, 0))
    err = jnp.where(valid & (alg != darker), weight, 0.0)
    wsum = jnp.where(valid, weight, 0.0).sum()
    return jnp.where(wsum > 0, err.sum() / wsum, 0.0)


def _batch_lightness_pairs(reflectance, comparisons):
    """Shared batched gather: (l1, l2, darker, weight, valid, num) with
    shapes [B, K].

    Uses one flat gather over [B*H*W, C] instead of vmap-ing per-image
    gathers — the same math, but a far simpler XLA program (the vmapped
    gather/scatter pattern made the train step's backward pathologically
    slow to compile on TPU).
    """
    b, h, w = reflectance.shape[:3]
    k = comparisons.shape[1] - 1
    num = comparisons[:, -1, 0].astype(jnp.int32)            # [B]
    rows = comparisons[:, :-1, :]                            # [B,K,6]
    valid = jnp.arange(k)[None, :] < num[:, None]

    safe = jnp.where(valid[..., None], rows, 0.0)
    x1 = jnp.clip((safe[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip((safe[..., 1] * h).astype(jnp.int32), 0, h - 1)
    x2 = jnp.clip((safe[..., 2] * w).astype(jnp.int32), 0, w - 1)
    y2 = jnp.clip((safe[..., 3] * h).astype(jnp.int32), 0, h - 1)
    darker = safe[..., 4].astype(jnp.int32)
    weight = safe[..., 5]

    if _use_mxu_gather(h, w, k):
        # one-hot MXU matmul gather (ops/whdr_gather_pallas.py): XLA's
        # TPU gather scalarizes (~530 us for B=32, K=1181 vs ~170 for
        # the kernel).  Lightness (channel mean) commutes with the
        # pixel gather, so the plane is reduced first — identical f32
        # arithmetic per pixel.
        from ..ops.whdr_gather_pallas import gather_pairs
        plane = (reflectance if reflectance.ndim == 3
                 else jnp.mean(reflectance, axis=-1))
        l1raw, l2raw = gather_pairs(plane, y1, x1, y2, x2)
        l1 = jnp.maximum(l1raw, EPS)
        l2 = jnp.maximum(l2raw, EPS)
        return l1, l2, darker, weight, valid, num

    flat = reflectance.reshape(b * h * w, -1)
    base = (jnp.arange(b) * (h * w))[:, None]
    l1 = jnp.maximum(jnp.mean(flat[base + y1 * w + x1], axis=-1), EPS)
    l2 = jnp.maximum(jnp.mean(flat[base + y2 * w + x2], axis=-1), EPS)
    return l1, l2, darker, weight, valid, num


# MXU-gather dispatch override: None = auto (TPU backend and the sizes
# fit VMEM), True/False force (tests exercise both paths on the CPU
# interpret backend)
FORCE_MXU_GATHER: Optional[bool] = None


def _use_mxu_gather(h: int, w: int, k: int) -> bool:
    from ..ops.whdr_gather_pallas import fits_mxu_gather
    if FORCE_MXU_GATHER is not None:
        return FORCE_MXU_GATHER and fits_mxu_gather(h, w, k)
    return (jax.default_backend() == "tpu"
            and fits_mxu_gather(h, w, k))


def whdr_per_image(reflectance, comparisons, delta: float = 0.1):
    """Per-image WHDR [B] (the reference's whdr_layer forward vectorized
    over the batch, whdr_layer.py:70-86).  reflectance [B,H,W,C],
    comparisons [B,K+1,6]."""
    l1, l2, darker, weight, valid, _ = _batch_lightness_pairs(
        reflectance, comparisons)
    alg = jnp.where(l2 / l1 > 1 + delta, 1,
                    jnp.where(l1 / l2 > 1 + delta, 2, 0))
    err = jnp.where(valid & (alg != darker), weight, 0.0).sum(axis=1)
    wsum = jnp.where(valid, weight, 0.0).sum(axis=1)
    return jnp.where(wsum > 0, err / wsum, 0.0)


def whdr_batch(reflectance, comparisons, delta: float = 0.1):
    """Batch mean WHDR (whdr_layer.py:84: mean of the per-image values)."""
    return jnp.mean(whdr_per_image(reflectance, comparisons, delta))


def _hinge_per_comparison(y, darker, delta: float, margin: float):
    """Hinge loss for one ratio y given the human label
    (whdr_hinge_loss_layer.py:183-221)."""
    b12 = 1.0 + delta + margin
    loss1 = jax.nn.relu(y - 1.0 / b12)           # darker == 1
    loss2 = jax.nn.relu(b12 - y)                 # darker == 2
    if margin <= delta:
        br = 1.0 + delta - margin
        loss0 = jax.nn.relu(y - br) + jax.nn.relu(1.0 / br - y)
    else:
        border = 1.0 + delta - margin
        loss0 = jnp.maximum(1.0 / border - y, y - border)
        # Documented gradient deviation (loss VALUES match the reference):
        # for margin > delta the reference hand-codes dl/dy = sign(y - 1)
        # (whdr_hinge_loss_layer.py:207-214), while autodiff of the max
        # yields -1 wherever the first arm dominates — i.e. up to
        # y = (border + 1/border)/2, which exceeds 1.  The autodiff
        # subgradient is the correct one for the loss as written; the
        # reference's is inconsistent with its own forward in
        # (1, (border+1/border)/2).  margin > delta is outside every
        # shipped config (default margin 0.05 < delta 0.1).
    return jnp.where(darker == 1, loss1,
                     jnp.where(darker == 2, loss2, loss0))


def _eval_selection_mask(valid, num, ratio: float, eval_dense: bool,
                         key: Optional[jax.Array], k: int):
    """Which comparisons get evaluated (whdr_hinge_loss_layer.py:136-148).

    Selection is by *prefix*: the reference evaluates comparisons
    range(num_eval) (not random) unless num_eval > MAX_EVALUATED_COMPARISONS,
    in which case it uniformly samples MAX without replacement.

    num may carry leading batch dims ([...]); returns a [..., k] mask
    (before AND-ing with ``valid``, which must broadcast against it).
    """
    num_eval = num
    if not eval_dense:
        num_eval = jnp.where(num > DENSE_SKIP_THRESHOLD, 1, num_eval)
    if ratio < 1.0:
        num_eval = _ratio_ceil(num_eval, ratio, k)
    mask = jnp.arange(k) < num_eval[..., None]
    if k > MAX_EVALUATED_COMPARISONS:
        if key is None:
            # trace-time warning: a fixed key freezes the >cap subsample
            # to ONE subset forever, where the reference draws a fresh
            # np.random.choice per step (whdr_hinge_loss_layer.py:142).
            # The training paths always thread per-step keys; this
            # fallback exists for ad-hoc/metric calls only.
            warnings.warn(
                "comparisons exceed MAX_EVALUATED_COMPARISONS but no key "
                "was passed: the capped subsample is deterministic "
                "(PRNGKey(0)) — pass a per-step key for training",
                stacklevel=2)
            key = jax.random.PRNGKey(0)
        # rank the first num_eval rows by random keys; keep the MAX smallest
        r = jax.random.uniform(key, jnp.shape(num_eval) + (k,))
        r = jnp.where(mask, r, 2.0)  # unselected rows rank last
        # inverse permutation of argsort = the rank of each row
        rank = jnp.argsort(jnp.argsort(r, axis=-1), axis=-1)
        cap_mask = rank < MAX_EVALUATED_COMPARISONS
        mask = jnp.where((num_eval > MAX_EVALUATED_COMPARISONS)[..., None],
                         mask & cap_mask, mask)
    return mask & valid


def select_comparisons_host(blob: np.ndarray, ratio: float,
                            eval_dense: bool,
                            rng: np.random.RandomState,
                            cap: int = None) -> np.ndarray:
    """Host-side evaluation selection for oversized comparison blobs
    (the 'augmented' K=60,049 case).

    Applies the same dense-skip / ratio / cap rules as
    ``_eval_selection_mask`` in numpy and packs the selected rows into a
    compact [B, cap+1, 6] blob (NaN padded, metadata row [m, file, 0]).
    Feeding the compact blob (with the downstream loss told the
    selection is done — ratio=1, eval_dense=True) is mathematically
    identical to masking the full blob on device: the hinge is a
    weighted mean over exactly the selected rows either way.  What it
    removes from the device program is the 60k-row gather and the
    2x argsort rank of the cap selection, and from the feed the 60k-row
    per-step transfer — the reference itself selects host-side with
    np.random.choice (whdr_hinge_loss_layer.py:142-148).

    The cap draw uses ``rng`` (uniform, without replacement — reference
    semantics); key it by the global step for resumable determinism.
    """
    if cap is None:
        cap = MAX_EVALUATED_COMPARISONS
    b, k1, _ = blob.shape
    k = k1 - 1
    out = np.full((b, cap + 1, 6), np.nan, blob.dtype)
    for i in range(b):
        num = int(blob[i, -1, 0])
        num_eval = num
        if not eval_dense and num > DENSE_SKIP_THRESHOLD:
            num_eval = 1
        if ratio < 1.0:
            num_eval = int(np.ceil(ratio * float(num_eval)))
        num_eval = min(num_eval, k)
        if num_eval > cap:
            sel = np.sort(rng.choice(num_eval, cap, replace=False))
        else:
            sel = np.arange(num_eval)
        m = len(sel)
        out[i, :m] = blob[i, sel]
        out[i, cap, 0] = m
        out[i, cap, 1] = blob[i, -1, 1]
        out[i, cap, 2] = 0
    return out


def whdr_hinge(reflectance, comparisons, delta: float = 0.1,
               margin: float = 0.05, ratio: float = 1.0,
               eval_dense: bool = True,
               key: Optional[jax.Array] = None):
    """Differentiable WHDR hinge loss for one image
    (whdr_hinge_loss_layer.py:93-162).  Returns scalar float32."""
    h, w = reflectance.shape[:2]
    x1, y1, x2, y2, darker, weight, valid, num = comparisons_to_pixel_indices(
        comparisons, h, w)
    mask = _eval_selection_mask(valid, num, ratio, eval_dense, key,
                                valid.shape[0])

    l1 = _lightness_at(reflectance, y1, x1)
    l2 = _lightness_at(reflectance, y2, x2)
    y = l1 / l2
    loss = _hinge_per_comparison(y, darker, delta, margin)

    err = jnp.where(mask, weight * loss, 0.0).sum()
    wsum = jnp.where(mask, weight, 0.0).sum()
    return jnp.where(wsum > 0, err / wsum, 0.0)


def whdr_hinge_batch(reflectance, comparisons, delta: float = 0.1,
                     margin: float = 0.05, ratio: float = 1.0,
                     eval_dense: bool = True,
                     key: Optional[jax.Array] = None):
    """Batch-mean hinge loss (whdr_hinge_loss_layer.py:102-110).
    reflectance [B,H,W,C], comparisons [B,K+1,6].

    Flat-gather formulation (see _batch_lightness_pairs); autodiff of the
    single batched gather gives one scatter-add in the backward pass
    instead of a vmapped scatter per image.
    """
    k = comparisons.shape[1] - 1
    l1, l2, darker, weight, valid, num = _batch_lightness_pairs(
        reflectance, comparisons)

    # evaluation-selection mask per image (dense-skip / ratio / cap)
    mask = _eval_selection_mask(valid, num, ratio, eval_dense, key, k)

    y = l1 / l2
    loss = _hinge_per_comparison(y, darker, delta, margin)
    err = jnp.where(mask, weight * loss, 0.0).sum(axis=1)
    wsum = jnp.where(mask, weight, 0.0).sum(axis=1)
    per_img = jnp.where(wsum > 0, err / wsum, 0.0)
    return jnp.mean(per_img)


def parse_wdm_string(wdm: str):
    """Parse the reference's underscore-packed '0.1_0.05_1.0_1' flag
    (whdr_hinge_loss_layer.py:58-80)."""
    if wdm == "":
        return 0.1, 0.0, 1.0, True
    parts = wdm.split("_")
    if len(parts) != 4:
        raise ValueError(
            "parameters to WhdrHingeLoss were not as expected: {} — need "
            "delta_margin_ratio_dense".format(wdm))
    delta, margin, ratio = float(parts[0]), float(parts[1]), float(parts[2])
    eval_dense = bool(int(parts[3]))
    assert delta >= 0 and margin >= 0 and 0 < ratio <= 1
    return delta, margin, ratio, eval_dense
