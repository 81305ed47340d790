"""Checkpointing: params + optimizer state with self-describing filenames.

The reference snapshots net + solverstate every ``checkpoint_interval``
samples and renames to ``{description}_barrista_iter_{N}.caffemodel`` /
``.solverstate`` where N counts samples processed
(extend_monitoring.py:83-165).  Here a single ``.npz`` carries both the
flattened parameter pytree and the optimizer state, plus a JSON metadata
blob (the orbax-style explicit metadata SURVEY.md §5.4 calls for) — while
the filename keeps the reference's description/iteration encoding so
predict mode can recover the config from the name alone.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template, flat: Dict[str, np.ndarray]):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        arr = flat[key]
        leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, params, opt_state=None,
                    metadata: Optional[Dict[str, Any]] = None):
    """Write params (+ optional optimizer state, metadata) to one .npz."""
    payload = {"param/" + k: v for k, v in _flatten(params).items()}
    if opt_state is not None:
        payload.update({"opt/" + k: v
                        for k, v in _flatten(opt_state).items()})
    payload["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint(path: str, params_template, opt_state_template=None
                    ) -> Tuple[Any, Any, Dict]:
    """Load a checkpoint back into (params, opt_state, metadata)."""
    with np.load(path) as npz:
        flat_p = {k[len("param/"):]: npz[k] for k in npz.files
                  if k.startswith("param/")}
        flat_o = {k[len("opt/"):]: npz[k] for k in npz.files
                  if k.startswith("opt/")}
        meta = {}
        if "__metadata__" in npz.files:
            meta = json.loads(bytes(npz["__metadata__"]).decode())
    params = _unflatten_into(params_template, flat_p)
    opt_state = None
    if opt_state_template is not None and flat_o:
        opt_state = _unflatten_into(opt_state_template, flat_o)
    return params, opt_state, meta


class Checkpointer:
    """Periodic snapshots named the reference way
    (extend_monitoring.py:83-165): every ``interval`` *samples*, plus a
    forced final snapshot; filename iteration = samples processed."""

    def __init__(self, snapshot_dir: str, description: str, interval: int):
        assert interval > 0
        self.snapshot_dir = snapshot_dir
        self.description = description
        self.interval = interval
        self.created = []

    def path(self, samples: int) -> str:
        return os.path.join(
            self.snapshot_dir,
            "{}_barrista_iter_{}.npz".format(self.description, samples))

    _path = path  # backwards-compatible alias

    def would_save(self, samples: int, prev: Optional[int] = None) -> bool:
        """True if maybe_save would write (modulo the dedup list).

        With ``prev`` (the previous step's sample count) a save fires
        when the count CROSSES an interval boundary — equal to the
        exact-multiple rule whenever the step size divides the interval,
        but still firing when a --startOver=0 resume with a DIFFERENT
        batch size walks off the old sample grid (base + k*new_bs can
        never hit samples %% interval == 0 there, which silently
        disabled every intermediate snapshot).  Without ``prev``, the
        exact-multiple rule.  fit()'s scan-chunked trainer aligns chunk
        boundaries on this so saved params are exact — keep the rule
        HERE, in one place."""
        if prev is None:
            return samples % self.interval == 0
        return samples // self.interval > prev // self.interval

    def maybe_save(self, samples: int, params, opt_state=None,
                   metadata=None, finalize: bool = False,
                   prev: Optional[int] = None):
        if samples in self.created:
            return None
        if self.would_save(samples, prev) or finalize:
            path = self._path(samples)
            save_checkpoint(path, params, opt_state, metadata)
            self.created.append(samples)
            return path
        return None

    def highest_iteration(self) -> int:
        """Scan the snapshot dir for the latest checkpoint
        (helper:463-473; no fnmatch because of '[' in descriptions)."""
        prefix = self.description + "_barrista_iter_"
        best = 0
        if not os.path.isdir(self.snapshot_dir):
            return 0
        for f in os.listdir(self.snapshot_dir):
            if f.startswith(prefix):
                m = re.match(r".*_barrista_iter_(\d+)\.npz$", f)
                if m:
                    best = max(best, int(m.group(1)))
        return best
