"""Experiment: scatter-free segment-sum formulations (round 4). Dev tool.

exp_bwd_gather.py established (RESULTS.md): XLA scatter costs ~13-16 ns/row
regardless of width, sorted-ids scatter 7.1, forward gather 3.1-3.8, and
argsort only 1.37 ns/row.  That makes "sort the cotangent rows by segment,
then reduce runs WITHOUT scattering" the open question.  This measures, on
the same real level-0 redkitchen table:

  segsum_f32            baseline (current custom-VJP backward)
  cumsum_only           raw cost of a (R, C) axis-0 cumsum
  sorted_prefix         full pipeline: take(g, perm) -> two-level f32
                        cumsum -> dx[s] = cum[end(s)] - cum[start(s)-1]
                        (perm/boundary positions are per-table data, built
                        once per step: argsort + searchsorted)
  build_cost            argsort + searchsorted boundary build (per table)

Usage: python tools/exp_bwd_gather2.py [n0=20480] [k=40] [b=4] [c=32]
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
    from regtr_tpu.utils.profiling import bench_jitted

    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    inds1 = real_table(n0, k)
    rng = np.random.RandomState(0)
    rows = b * n0 * k
    print(f"table: b={b} n0={n0} k={k} c={c}  rows={rows/1e6:.2f}M",
          flush=True)

    offs = (np.arange(b, dtype=np.int64) * (n0 + 1))[:, None]
    flat_ids = (np.tile(inds1.reshape(1, -1), (b, 1)) + offs).reshape(-1)
    ids = jnp.asarray(flat_ids.astype(np.int32))
    nseg = b * (n0 + 1)

    g32 = jnp.asarray(rng.randn(rows, c).astype(np.float32))

    results = {}

    def run(name, fn, *args, iters=10):
        try:
            compile_s, dt = bench_jitted(jax.jit(fn), *args, iters=iters)
            ns_row = dt * 1e9 / rows
            results[name] = round(ns_row, 2)
            print(f"{name:22s} {dt*1e3:8.2f} ms  {ns_row:6.2f} ns/row  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    run("segsum_f32",
        lambda gg, ii: jax.ops.segment_sum(gg, ii, num_segments=nseg),
        g32, ids)
    run("cumsum_only", lambda gg: jnp.cumsum(gg, axis=0), g32)

    # --- per-table build (once per step, shared by every consumer) ---
    def build(ii):
        perm = jnp.argsort(ii).astype(jnp.int32)
        si = jnp.take(ii, perm)
        # ends[s] = last sorted position with id <= s (exclusive form)
        ends = jnp.searchsorted(si, jnp.arange(nseg, dtype=ii.dtype),
                                side="right").astype(jnp.int32)
        return perm, ends

    run("build_cost", build, ids)
    perm, ends = jax.jit(build)(ids)

    # --- the scatter-free backward: permute + chunked 2-level cumsum ---
    CH = 2048  # chunk for the 2-level prefix (bounds fp32 error ~sqrt(T)eps)

    def sorted_prefix(gg, pp, ee):
        gs = jnp.take(gg, pp, axis=0)                       # (R, C) sorted
        t = rows // CH
        gsc = gs.reshape(t, CH, c)
        local = jnp.cumsum(gsc, axis=1)                     # within-chunk
        carry = jnp.cumsum(local[:, -1], axis=0)            # chunk totals
        carry = jnp.concatenate(
            [jnp.zeros((1, c), carry.dtype), carry], axis=0
        )
        cum = (local + carry[:-1, None]).reshape(rows, c)
        cum = jnp.concatenate([jnp.zeros((1, c), cum.dtype), cum], axis=0)
        ze = jnp.take(cum, ee, axis=0)                      # (nseg, C)
        starts = jnp.concatenate([ee[:1] * 0, ee[:-1]])
        zs = jnp.take(cum, starts, axis=0)
        return ze - zs

    run("sorted_prefix", sorted_prefix, g32, perm, ends)

    # correctness check vs segsum
    want = np.asarray(jax.jit(
        lambda gg, ii: jax.ops.segment_sum(gg, ii, num_segments=nseg)
    )(g32, ids))
    got = np.asarray(jax.jit(sorted_prefix)(g32, perm, ends))
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"sorted_prefix max rel err vs segsum: {err:.2e}", flush=True)

    print(results, flush=True)


if __name__ == "__main__":
    main()
