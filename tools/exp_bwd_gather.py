"""Experiment: cost of the gather TRANSPOSE (segment-sum) on TPU. Dev tool.

The train-step backward is dominated by fp32 segment-sums over the same
neighbor tables the forward gathers (RESULTS.md round 3).  This measures,
at real 3DMatch level-0 shapes (real redkitchen neighbor tables via the
native host lib), every candidate formulation of dx[s] += g[q,k]:

  fwd_gather       baseline: what the forward pays on this table
  segsum           jax.ops.segment_sum (current custom-VJP backward)
  segsum_bf16in    same but summing bf16 cotangents (accumulate f32)
  sort_then_segsum permute g by a precomputed sort of ids, then sorted
                   segment-sum (scatter with indices_are_sorted)
  inv_gather       capacity-M inverse table: dx = masked sum of gathers
  argsort_build    device cost of building the sort permutation in-graph
  invtab_build     device cost of building the inverse table in-graph

Usage: python tools/exp_bwd_gather.py [n0=20480] [k=40] [b=4] [c=128]
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


def real_table(n0: int, k: int):
    """Level-0 conv neighbor table for the real redkitchen scan (host lib)."""
    from bench import load_pair
    from regtr_tpu.native_bindings import grid_subsample, radius_neighbors

    src, _ = load_pair()
    pts = grid_subsample(src, 0.025)[:n0].astype(np.float32)
    n = len(pts)
    radius = 0.025 * 2.5
    inds = radius_neighbors(pts, pts, radius, k)  # (n, k), shadow = n
    if n < n0:  # pad queries with all-shadow rows
        pad = np.full((n0 - n, k), n, np.int32)
        inds = np.vstack([inds, pad])
    # re-map shadow to n0 (capacity), valid rows stay
    inds = np.where(inds >= n, n0, inds).astype(np.int32)
    return inds


def main():
    import jax
    import jax.numpy as jnp
    from regtr_tpu.utils.profiling import bench_jitted

    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    inds1 = real_table(n0, k)                        # (n0, k)
    rng = np.random.RandomState(0)
    rows = b * n0 * k
    print(f"table: b={b} n0={n0} k={k} c={c}  rows={rows/1e6:.2f}M  "
          f"valid={float((inds1 < n0).mean()):.3f}", flush=True)

    # flat segment ids exactly as _row_gather_bwd builds them
    offs = (np.arange(b, dtype=np.int64) * (n0 + 1))[:, None]
    flat_ids = (np.tile(inds1.reshape(1, -1), (b, 1)) + offs).reshape(-1)
    flat_ids = flat_ids.astype(np.int32)
    nseg = b * (n0 + 1)

    g32 = jnp.asarray(rng.randn(rows, c), jnp.float32)
    g16 = g32.astype(jnp.bfloat16)
    ids = jnp.asarray(flat_ids)

    # host-built sort permutation + inverse table
    perm_np = np.argsort(flat_ids, kind="stable").astype(np.int32)
    sorted_ids_np = flat_ids[perm_np]
    mult = np.bincount(flat_ids, minlength=nseg)
    shadow_ids = np.arange(b) * (n0 + 1) + n0  # one shadow segment per cloud
    mult[shadow_ids] = 0
    m_max = int(mult.max())
    print(f"multiplicity: mean={float(mult[mult > 0].mean()):.1f} "
          f"max(non-shadow)={m_max}", flush=True)
    perm = jnp.asarray(perm_np)
    sorted_ids = jnp.asarray(sorted_ids_np)

    # capacity-M inverse table (shadow segment excluded -> its dx is unused)
    m_cap = min(int(2 ** np.ceil(np.log2(max(m_max, 1)))), 128)
    inv = np.full((nseg, m_cap), rows, np.int32)  # rows = pad position
    fill = np.zeros(nseg, np.int32)
    drop = 0
    for pos, s in enumerate(flat_ids):
        if s % (n0 + 1) == n0:
            continue  # shadow segment: gradient row is discarded anyway
        f = fill[s]
        if f < m_cap:
            inv[s, f] = pos
            fill[s] = f + 1
        else:
            drop += 1
    print(f"inverse table M={m_cap}  dropped={drop}", flush=True)
    inv_j = jnp.asarray(inv)

    results = {}

    def run(name, fn, *args, iters=10):
        try:
            compile_s, dt = bench_jitted(jax.jit(fn), *args, iters=iters)
            ns_row = dt * 1e9 / rows
            results[name] = (dt, ns_row)
            print(f"{name:26s} {dt*1e3:8.2f} ms  {ns_row:6.2f} ns/row  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {e}", flush=True)

    x = jnp.asarray(rng.randn(b * (n0 + 1), c), jnp.float32)

    run("fwd_gather_f32", lambda xx, ii: jnp.take(xx, ii, axis=0), x, ids)
    run("segsum_f32",
        lambda gg, ii: jax.ops.segment_sum(gg, ii, num_segments=nseg),
        g32, ids)
    # Width scaling: is the scatter per-row latency-bound (cost independent
    # of C) or traffic-bound?  Decides whether narrow-channel levels pay the
    # same per-row toll and whether count-histograms (C=1) are cheap.
    for cw in (1, 8, 32, 64, 256):
        gw = jnp.asarray(rng.randn(rows, cw), jnp.float32)
        run(f"segsum_f32_c{cw}",
            lambda gg, ii: jax.ops.segment_sum(gg, ii, num_segments=nseg),
            gw, ids)
    run("fwd_gather_f32_c32",
        lambda xx, ii: jnp.take(xx, ii, axis=0),
        jnp.asarray(rng.randn(b * (n0 + 1), 32), jnp.float32), ids)
    run("segsum_bf16in",
        lambda gg, ii: jax.ops.segment_sum(
            gg.astype(jnp.float32), ii, num_segments=nseg), g16, ids)
    run("segsum_sorted_ids",
        lambda gg, ii: jax.ops.segment_sum(
            gg, ii, num_segments=nseg, indices_are_sorted=True),
        g32, sorted_ids)
    run("permute_then_sorted",
        lambda gg, pp, ii: jax.ops.segment_sum(
            jnp.take(gg, pp, axis=0), ii, num_segments=nseg,
            indices_are_sorted=True),
        g32, perm, sorted_ids)

    def inv_gather(gg, iv):
        gpad = jnp.concatenate([gg, jnp.zeros((1, c), gg.dtype)], axis=0)
        out = jnp.take(gpad, iv.reshape(-1), axis=0)
        return jnp.sum(out.reshape(nseg, m_cap, c), axis=1)

    run("inv_gather", inv_gather, g32, inv_j)

    def inv_gather_bf16(gg, iv):
        gpad = jnp.concatenate([gg, jnp.zeros((1, c), gg.dtype)], axis=0)
        out = jnp.take(gpad, iv.reshape(-1), axis=0)
        return jnp.sum(out.reshape(nseg, m_cap, c).astype(jnp.float32),
                       axis=1)

    run("inv_gather_bf16rows", inv_gather_bf16, g16, inv_j)

    run("argsort_build", lambda ii: jnp.argsort(ii), ids)

    def invtab_build(ii, pp):
        si = jnp.take(ii, pp)                     # sorted ids
        # rank within segment = position - first position of this segment
        first = jnp.searchsorted(si, jnp.arange(nseg), side="left")
        starts = jnp.take(first, si)
        rank = jnp.arange(rows, dtype=jnp.int32) - starts
        tab = jnp.full((nseg * m_cap,), rows, jnp.int32)
        ok = rank < m_cap
        addr = jnp.where(ok, si * m_cap + rank, nseg * m_cap - 1)
        return tab.at[addr].set(jnp.where(ok, pp, rows))

    run("invtab_build_given_perm", invtab_build, ids, perm)

    print({k2: round(v[1], 2) for k2, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
