"""Hardware grid probe for the sorted Pallas segment-sum: localize any
real-Mosaic numeric divergence across the configurations the TRAIN program
actually uses (probe_segsum.py tests one f32/c=32 point; the in-program
gather transposes run bf16 cotangents at c in {64,128,131->128} through the
channel-slab path, on tables at every pyramid level).

Usage: python tools/probe_segsum_grid.py
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

    rng = np.random.RandomState(0)
    fails = 0

    def check(tag, n0, k, b, c, dtype):
        nonlocal fails
        inds1 = real_table(n0, k)
        rows = b * n0 * k
        stride = n0 + 1
        nseg = b * stride
        offs = (np.arange(b, dtype=np.int64) * stride)[:, None]
        flat_ids = (np.tile(inds1.reshape(1, -1), (b, 1)) + offs).reshape(-1)
        ids = jnp.asarray(flat_ids.astype(np.int32))
        g = jnp.asarray(rng.randn(rows, c).astype(np.float32)).astype(dtype)

        got = np.asarray(jax.jit(
            lambda gg, ii: sorted_padded_segment_sum(gg, ii, nseg, stride)
        )(g, ids))
        want = np.asarray(jax.jit(
            lambda gg, ii: padded_segment_sum_reference(gg, ii, nseg, stride)
        )(g, ids))
        err = float(np.abs(got - want).max())
        rel = err / max(float(np.abs(want).max()), 1e-9)
        # bf16 inputs: both sides cast the SAME bf16 values to f32 before
        # any accumulation, so exactness (not bf16-eps) is still the bar.
        ok = err <= 1e-3
        fails += 0 if ok else 1
        print(f"{tag:34s} n0={n0:6d} k={k:2d} b={b} c={c:3d} {dtype!s:9s}"
              f"  max_abs_err={err:.3e} rel={rel:.1e} {'OK' if ok else 'FAIL'}",
              flush=True)

    # the point probe_segsum.py already covers
    check("L0-f32-c32 (baseline)", 20480, 40, 4, 32, jnp.float32)
    # bf16 cotangents (what bf16 training feeds the backward)
    check("L0-bf16-c32", 20480, 40, 4, 32, jnp.bfloat16)
    # channel-slab path: c=128 -> slabs [64,64] at this nseg
    check("L0-f32-c128 (slabs)", 20480, 40, 4, 128, jnp.float32)
    check("L0-bf16-c128 (slabs)", 20480, 40, 4, 128, jnp.bfloat16)
    # c=64 single slab
    check("L0-bf16-c64", 20480, 40, 4, 64, jnp.bfloat16)
    # train-shape: b=2 (the profile_train config), K cut
    check("L0-bf16-c128-b2", 20480, 40, 2, 128, jnp.bfloat16)
    check("L0-bf16-c128-b2-k32", 20480, 32, 2, 128, jnp.bfloat16)
    # deeper pyramid levels (smaller tables, wider features)
    check("L1-bf16-c128", 5120, 40, 2, 128, jnp.bfloat16)
    check("L2-bf16-c128", 1280, 40, 2, 128, jnp.bfloat16)
    check("L3-bf16-c128", 320, 40, 2, 128, jnp.bfloat16)

    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}", flush=True)
    sys.exit(0 if fails == 0 else 1)


if __name__ == "__main__":
    main()
