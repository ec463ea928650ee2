"""Logging, metric accumulation, and run provenance.

Equivalents of the reference's observability stack:
  * prepare_logger (/root/reference/src/cvhelpers/misc.py:58-114): colored
    console + log.txt, timestamped run dirs, git-SHA provenance
  * AverageMeter/StatsMeter (/root/reference/src/utils/misc.py:40-97)
  * TensorBoard scalar summaries (/root/reference/src/models/
    generic_model.py:99-117) — here: always-on metrics.jsonl plus optional
    torch TensorBoard writer when the package is importable.
"""
from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def _process_index() -> int:
    """This host's rank (0 when jax is absent or single-process)."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def prepare_logger(log_path=None, dev: bool = False, name: str = "regtr_tpu"):
    """Create the run directory (timestamped, or ../logdev wiped when dev)
    and wire console + file logging.  Returns (logger, logdir)."""
    if dev:
        logdir = Path("../logdev")
        if logdir.exists():
            import shutil

            shutil.rmtree(logdir)
    else:
        base = Path(log_path) if log_path else Path("../logs")
        stamp = time.strftime("%y%m%d_%H%M%S")
        # Multi-host: every process must resolve the SAME run directory
        # (the test protocol merges per-rank est.log trees under one
        # out_dir) — broadcast rank 0's timestamp.
        try:
            import jax

            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                enc = np.zeros(16, np.int32)
                raw = stamp.encode()[:16]
                enc[: len(raw)] = np.frombuffer(raw, np.uint8)
                enc = np.asarray(
                    multihost_utils.broadcast_one_to_all(enc)
                )
                stamp = bytes(enc[enc > 0].astype(np.uint8)).decode()
        except ImportError:
            pass
        logdir = base / stamp
    logdir.mkdir(parents=True, exist_ok=True)

    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    console = logging.StreamHandler(sys.stdout)
    console.setLevel(logging.INFO)
    console.setFormatter(
        logging.Formatter("%(asctime)s [%(levelname)s] %(message)s", "%H:%M:%S")
    )
    logger.addHandler(console)
    # Multi-host ranks share the logdir (est.log merge needs that) but must
    # not append to the same file: O_APPEND interleaving is not atomic on
    # network filesystems.  Rank 0 keeps the canonical name.
    rank = _process_index()
    log_name = "log.txt" if rank == 0 else f"log.rank{rank}.txt"
    fileh = logging.FileHandler(logdir / log_name)
    fileh.setLevel(logging.DEBUG)
    fileh.setFormatter(
        logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
    )
    logger.addHandler(fileh)

    # Provenance: command line + git state (misc.py:20-44).
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5,
        ).stdout.strip()
        diff = subprocess.run(
            ["git", "diff"], capture_output=True, text=True, timeout=10
        ).stdout
        (logdir / "compareHead.diff").write_text(diff)
    except Exception:
        sha = "unknown"
    logger.info("Command: %s", " ".join(sys.argv))
    logger.info("Git SHA: %s; logdir: %s", sha, logdir)
    return logger, logdir


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n=1):
        if np.isfinite(value):
            self.sum += float(value) * n
            self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def combine_process_sums(gathered):
    """Combine per-process (sum, count) stats into global averages.

    gathered: (P, K, 2) array — for each of P processes, K metrics'
    (sum, count).  Returns (K,) global averages.  Pure so it is unit-testable
    without a multi-process run; _run_validation feeds it the result of
    jax.experimental.multihost_utils.process_allgather.
    """
    tot = np.asarray(gathered, np.float64).sum(axis=0)       # (K, 2)
    return tot[:, 0] / np.maximum(tot[:, 1], 1.0)


class StatsMeter:
    """Dict of AverageMeters keyed by metric name."""

    def __init__(self):
        self.meters = defaultdict(AverageMeter)

    def sums_counts(self, keys):
        """(K, 2) array of (sum, count) for cross-process reduction."""
        return np.asarray(
            [[self.meters[k].sum, self.meters[k].count] for k in keys],
            np.float64,
        )

    def update(self, metrics: dict):
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                self.meters[k].update(float(v))
            else:
                # Per-layer vectors: log the final layer + full vector mean.
                self.meters[k].update(float(v.reshape(-1)[-1]))

    def averages(self):
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        self.meters.clear()


class MetricsWriter:
    """metrics.jsonl (always) + TensorBoard (when available)."""

    def __init__(self, logdir, subdir="train"):
        # Per-rank files on multi-host: validation metrics are globally
        # reduced before write() (Trainer._global_averages) so rank>0 files
        # are redundant, but separate names keep concurrent appends from
        # interleaving/corrupting one JSONL; TensorBoard is rank-0 only.
        rank = _process_index()
        suffix = "" if rank == 0 else f".rank{rank}"
        self.path = Path(logdir) / f"metrics_{subdir}{suffix}.jsonl"
        self._f = open(self.path, "a")
        self._tb = None
        if rank == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(Path(logdir) / subdir))
            except Exception:
                pass

    def write(self, step: int, metrics: dict):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            arr = np.asarray(v)
            rec[k] = float(arr.reshape(-1)[-1]) if arr.ndim else float(arr)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def write_histogram(self, step: int, tag: str, values):
        """Per-pair error distribution (reference logs these as TensorBoard
        histograms, generic_reg_model.py:119-123).  JSONL gets quantile
        summaries; TensorBoard gets the full histogram."""
        v = np.asarray(values, np.float64).reshape(-1)
        if v.size == 0:
            return
        rec = {
            "step": int(step), "tag": tag, "count": int(v.size),
            "mean": float(v.mean()),
            "p50": float(np.percentile(v, 50)),
            "p90": float(np.percentile(v, 90)),
            "p99": float(np.percentile(v, 99)),
            "max": float(v.max()),
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_histogram(tag, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
