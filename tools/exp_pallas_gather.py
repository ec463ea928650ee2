"""Experiment: can Mosaic do a vectorized dynamic gather from VMEM?

Tests three in-kernel gather strategies on the TPU at a representative tile
shape, vs the XLA take baseline.  Dev tool.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from regtr_tpu.utils.profiling import bench_jitted

    NS, C = 20480, 32
    NQ, K = 20480, 40
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(NS + 8, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, NS, (NQ * K,)), jnp.int32)

    # XLA baseline
    def xla_take(src, idx):
        return jnp.take(src, idx, axis=0)

    c, per = bench_jitted(jax.jit(xla_take), src, idx)
    print(f"xla_take 1 cloud {per*1000:8.3f} ms", flush=True)

    # 1) jnp.take inside a pallas kernel (vector dynamic gather?)
    T = 4096  # index tile

    def take_kernel(idx_ref, src_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def pallas_take(src, idx):
        grid = (NQ * K // T,)
        return pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((NQ * K, C), jnp.bfloat16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((NS + 8, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, src)

    try:
        c, per = bench_jitted(pallas_take, src, idx)
        got = np.asarray(pallas_take(src, idx))
        ref = np.asarray(xla_take(src, idx))
        ok = np.allclose(got, ref)
        print(f"pallas_jnp_take  {per*1000:8.3f} ms  correct={ok}",
              flush=True)
    except Exception as e:
        print(f"pallas_jnp_take  FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # 2) one-hot matmul gather with full-width support in W-chunks
    WCH = 512

    def onehot_kernel(idx_ref, src_ref, out_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        n_ch = (NS + 8) // WCH
        ii = idx_ref[:][:, None]

        def body(j, _):
            base = j * WCH
            cols = base + jax.lax.broadcasted_iota(jnp.int32, (T, WCH), 1)
            oh = (ii == cols).astype(jnp.bfloat16)
            acc[:] += jnp.dot(oh, src_ref[pl.ds(base, WCH), :],
                              preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_ch, body, 0)
        out_ref[:] = acc[:].astype(jnp.bfloat16)

    @jax.jit
    def pallas_onehot(src, idx):
        grid = (NQ * K // T,)
        return pl.pallas_call(
            onehot_kernel,
            out_shape=jax.ShapeDtypeStruct((NQ * K, C), jnp.bfloat16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((NS + 8, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
        )(idx, src)

    try:
        c, per = bench_jitted(pallas_onehot, src, idx)
        got = np.asarray(pallas_onehot(src, idx))
        ref = np.asarray(xla_take(src, idx))
        ok = np.allclose(got, ref, atol=1e-2)
        print(f"pallas_onehot_fullwidth {per*1000:8.3f} ms  correct={ok}",
              flush=True)
    except Exception as e:
        print(f"pallas_onehot FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
