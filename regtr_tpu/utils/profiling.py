"""Stage timing + device profiling harness.

Equivalent of the reference's _TIMEIT instrumentation (/root/reference/src/
models/regtr.py:19,108-216 — CUDA-event timers around preproc / encoder /
attention / pose, appended to timings.txt) and the Timer class
(kpconv_blocks.py:34-64), adapted to async device semantics: execution is
forced with a scalar device->host round trip (block_until_ready is not
reliable on tunneled backends), and `jax.profiler` traces can be captured
around any stage.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def force(tree) -> float:
    """Force execution of a pytree; returns a checksum scalar."""
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


class Timer:
    """Accumulating wall-clock timer (tic/toc), async-safe via force()."""

    def __init__(self):
        self.total = 0.0
        self.calls = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.time()

    def toc(self, tree=None):
        if tree is not None:
            force(tree)
        dt = time.time() - self._t0
        self.total += dt
        self.calls += 1
        return dt

    @property
    def avg(self):
        return self.total / max(self.calls, 1)


class StageTimer:
    """Named per-stage timers + timings.txt artifact (reference parity)."""

    def __init__(self, out_path=None):
        self.timers = {}
        self.out_path = Path(out_path) if out_path else None

    @contextlib.contextmanager
    def stage(self, name, tree_fn=None):
        t = self.timers.setdefault(name, Timer())
        t.tic()
        yield
        t.toc(tree_fn() if tree_fn else None)

    def record(self, name, seconds):
        t = self.timers.setdefault(name, Timer())
        t.total += seconds
        t.calls += 1

    def summary(self):
        return {k: t.avg for k, t in self.timers.items()}

    def dump(self):
        if self.out_path is None:
            return
        with open(self.out_path, "a") as f:
            f.write("\t".join(
                f"{t.avg:10f}" for t in self.timers.values()
            ) + "\n")


def bench_jitted(fn, *args, iters: int = 10):
    """(compile_seconds, per_iteration_seconds) for a jitted callable."""
    t0 = time.time()
    out = fn(*args)
    force(out)
    compile_s = time.time() - t0
    force(fn(*args))
    t0 = time.time()
    force(fn(*args))
    rtt = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return compile_s, (time.time() - t0 - rtt) / iters


@contextlib.contextmanager
def device_trace(out_dir):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
