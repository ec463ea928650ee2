"""Experiment: Mosaic dynamic_gather with matching shapes. Dev tool."""
from __future__ import annotations

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from regtr_tpu.utils.profiling import bench_jitted

    W, C = 5120, 32
    n_tiles = 160  # one L0 cloud worth of query tiles (T=128, K=40)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(n_tiles, W, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, W, (n_tiles, W)), jnp.int32)

    ref = np.take_along_axis(
        np.asarray(src), np.asarray(idx)[..., None].repeat(C, -1), axis=1
    )

    def k_taa(idx_ref, src_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[0].reshape(W, 1), (W, C))
        out_ref[0] = jnp.take_along_axis(src_ref[0], ii, axis=0)

    @jax.jit
    def call(src, idx):
        return pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct((n_tiles, W, C), jnp.bfloat16),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, src)

    try:
        c, per = bench_jitted(call, src, idx)
        got = np.asarray(call(src, idx))
        ok = bool(np.array_equal(got, ref))
        rows = n_tiles * W
        print(f"dyn_gather_eqshape {per*1000:8.3f} ms  correct={ok} "
              f"({per/rows*1e9:.3f} ns/row)", flush=True)
    except Exception as e:
        print(f"dyn_gather_eqshape FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # variant: indices as 2-D iota-style without broadcast (idx per element)
    def k_taa2(idx_ref, src_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(
            src_ref[0], idx_ref[0], axis=0)

    idx2 = jnp.asarray(
        rng.randint(0, W, (n_tiles, W, C)), jnp.int32)

    @jax.jit
    def call2(src, idx2):
        return pl.pallas_call(
            k_taa2,
            out_shape=jax.ShapeDtypeStruct((n_tiles, W, C), jnp.bfloat16),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx2, src)

    try:
        c, per = bench_jitted(call2, src, idx2)
        got = np.asarray(call2(src, idx2))
        ref2 = np.take_along_axis(np.asarray(src), np.asarray(idx2), axis=1)
        ok = bool(np.array_equal(got, ref2))
        print(f"dyn_gather_fullidx {per*1000:8.3f} ms  correct={ok}",
              flush=True)
    except Exception as e:
        print(f"dyn_gather_fullidx FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
