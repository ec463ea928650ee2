"""Experiment: approx_min_k recall/chunk parameter scan for radius search.

Dev tool; results recorded in RESULTS.md / git log.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import load_pair
    from regtr_tpu.ops.neighbors import radius_neighbors_batch
    from regtr_tpu.utils.profiling import bench_jitted

    n0 = 20480
    src, tgt = load_pair()

    def pad(p):
        out = np.zeros((n0, 3), np.float32)
        out[: len(p)] = p[:n0]
        m = np.zeros(n0, bool)
        m[: min(len(p), n0)] = True
        return out, m

    ps, ms = pad(src)
    pt, mt = pad(tgt)
    pts = jnp.asarray(np.stack([ps, pt] * 4))
    mask = jnp.asarray(np.stack([ms, mt] * 4))
    dev = jax.devices()[0]
    pts = jax.device_put(pts, dev)
    mask = jax.device_put(mask, dev)
    r = jnp.float32(0.0625)
    k = 40

    # ground truth in-radius neighbor count via the exact scan oracle
    exact = jax.jit(functools.partial(
        radius_neighbors_batch, k=k, method="scan"))
    idx_exact = np.asarray(jax.block_until_ready(exact(
        pts, mask, pts, mask, r)))
    n_exact = (idx_exact < n0).sum()
    print(f"exact in-radius-or-K neighbors: {n_exact} "
          f"(mean {n_exact / (8 * mask.sum() / 8):.1f})", flush=True)

    for qc in (4096, 10240, 20480):
        for rt in (0.95, 0.85, 0.7, 0.5):
            fn = jax.jit(functools.partial(
                radius_neighbors_batch, k=k, method="brute",
                query_chunk=qc, recall_target=rt))
            try:
                c, per = bench_jitted(fn, pts, mask, pts, mask, r)
                idx = np.asarray(jax.block_until_ready(
                    fn(pts, mask, pts, mask, r)))
                found = (idx < n0).sum()
                print(f"qc={qc:6d} rt={rt:.2f}: {per*1000:7.2f} ms  "
                      f"recall={(found / n_exact):.4f} (compile {c:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"qc={qc:6d} rt={rt:.2f}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
