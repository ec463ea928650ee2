"""Checkpoint management with best-score retention (orbax-backed).

Equivalent of CheckPointManager (/root/reference/src/cvhelpers/
torch_helpers.py:98-242): keeps the last `max_to_keep` checkpoints, keeps a
permanent snapshot every `keep_every_hours`, retains the best-by-validation
checkpoint, and supports directory-resume (latest or best).  State saved =
params + optimizer state + step (+ any extra pytrees), so training resumes
exactly (the TPU-preemption story the reference lacks).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep: int = 6,
                 keep_every_hours: float = 3.0):
        self.directory = Path(ckpt_dir).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_time_interval=None if keep_every_hours is None else
            __import__("datetime").timedelta(hours=keep_every_hours),
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._best_file = self.directory / "best.json"

    # -- save ---------------------------------------------------------------
    def save(self, step: int, state, score: Optional[float] = None):
        """Save train state; update the best-checkpoint record when `score`
        improves (higher is better, matching reg_success selection)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        # Multi-host: orbax coordinates the save itself (every process calls
        # save; the primary host writes); only rank 0 updates best.json.
        if score is not None and jax.process_index() == 0:
            best = self.best_record()
            if best is None or score > best["score"]:
                with open(self._best_file, "w") as f:
                    json.dump({"step": int(step), "score": float(score)}, f)

    # -- load ---------------------------------------------------------------
    def best_record(self):
        if self._best_file.exists():
            with open(self._best_file) as f:
                return json.load(f)
        return None

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None,
                best: bool = False):
        """Restore into the given pytree template.  step=None -> latest (or
        best when best=True and a best record exists)."""
        if step is None:
            if best and (rec := self.best_record()) is not None and \
                    rec["step"] in self._mgr.all_steps():
                step = rec["step"]
            else:
                step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, int(step)

    def close(self):
        self._mgr.close()


def _slash_key(keypath) -> str:
    """'a/b/c' interchange key for a tree keypath — the same format
    tools/convert_torch_ckpt.py writes."""
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
    )


def save_params_npz(path, params):
    """Flat .npz export of a param pytree, keys 'a/b/c' (the interchange
    format shared with tools/convert_torch_ckpt.py)."""
    flat = {
        _slash_key(keypath): np.asarray(leaf)
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez(path, **flat)


def load_params_npz(path, params_template):
    """Load a flat .npz back into the structure of params_template.

    Accepts 'a/b/c' keys (save_params_npz / the torch converter) and the
    legacy jax keystr format.  Entries missing from the archive keep the
    template's value (converted checkpoints may legitimately omit params the
    torch model lacks, e.g. loss-criterion weights) — a warning reports how
    many.
    """
    import logging

    data = np.load(path)
    leaves, _ = jax.tree_util.tree_flatten_with_path(params_template)
    out, missing = [], []
    for keypath, leaf in leaves:
        key = _slash_key(keypath)
        if key not in data.files:
            key = jax.tree_util.keystr(keypath)
        if key in data.files:
            arr = data[key]
            assert arr.shape == tuple(leaf.shape), \
                (keypath, arr.shape, leaf.shape)
            out.append(arr.astype(leaf.dtype))
        else:
            missing.append(_slash_key(keypath))
            out.append(np.asarray(leaf))
    if missing:
        # A converted checkpoint legitimately lacks a few params the torch
        # model never had (norm-free blocks, loss criteria) — but a mostly-
        # missing archive means a config mismatch, and silently evaluating
        # near-random weights would masquerade as a real result.
        if len(missing) > 0.5 * len(leaves):
            raise ValueError(
                f"{path} matches only {len(leaves) - len(missing)}/"
                f"{len(leaves)} params of this model — wrong config or "
                f"checkpoint? (first missing: {missing[:3]})"
            )
        logging.getLogger("regtr_tpu").warning(
            "%d params not in %s (kept init values): %s%s",
            len(missing), path, ", ".join(missing[:5]),
            "..." if len(missing) > 5 else "",
        )
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda x: 0, params_template)
        ),
        out,
    )
