"""Probe: sorted-Pallas segment-sum vs XLA scatter on the real L0 table.

Usage: python tools/exp_pallas_segsum.py [n0=20480] [k=40] [b=4] [c=32]
"""
from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from exp_bwd_gather import real_table
    from regtr_tpu.ops.pallas.segsum import (
        padded_segment_sum_reference, sorted_padded_segment_sum,
    )
    from regtr_tpu.utils.profiling import bench_jitted

    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    inds1 = real_table(n0, k)
    rng = np.random.RandomState(0)
    rows = b * n0 * k
    stride = n0 + 1
    nseg = b * stride
    print(f"table: b={b} n0={n0} k={k} c={c} rows={rows/1e6:.2f}M",
          flush=True)

    offs = (np.arange(b, dtype=np.int64) * stride)[:, None]
    flat_ids = (np.tile(inds1.reshape(1, -1), (b, 1)) + offs).reshape(-1)
    ids = jnp.asarray(flat_ids.astype(np.int32))
    g32 = jnp.asarray(rng.randn(rows, c).astype(np.float32))

    def run(name, fn, *args, iters=10, reps=3):
        # reps>1: the backend is bimodal run-to-run (CLAUDE.md), so report
        # every repetition, not a single draw.
        try:
            jfn = jax.jit(fn)
            compile_s, dt = bench_jitted(jfn, *args, iters=iters)
            dts = [dt]
            for _ in range(reps - 1):
                _, dt = bench_jitted(jfn, *args, iters=iters)
                dts.append(dt)
            per = "  ".join(f"{d*1e9/rows:.2f}" for d in dts)
            print(f"{name:24s} {min(dts)*1e3:8.2f} ms best "
                  f"  ns/row reps: [{per}]  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    run("segsum_ref",
        lambda gg, ii: padded_segment_sum_reference(gg, ii, nseg, stride),
        g32, ids)
    run("pallas_sorted",
        lambda gg, ii: sorted_padded_segment_sum(gg, ii, nseg, stride),
        g32, ids)

    # correctness on-device
    try:
        want = np.asarray(jax.jit(
            lambda gg, ii: padded_segment_sum_reference(gg, ii, nseg, stride)
        )(g32, ids))
        got = np.asarray(jax.jit(
            lambda gg, ii: sorted_padded_segment_sum(gg, ii, nseg, stride)
        )(g32, ids))
        print(f"max abs err vs ref: {np.abs(got - want).max():.3e}",
              flush=True)
    except Exception as e:
        print(f"correctness check FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
