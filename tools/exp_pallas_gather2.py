"""Experiment: probe Mosaic's accepted dynamic-gather forms. Dev tool."""
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

    NS, C = 20480, 32
    NQ, K = 20480, 40
    T = 4096
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(NS + 8, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, NS, (NQ * K,)), jnp.int32)
    ref = np.asarray(jnp.take(src, idx, axis=0))

    def run(name, kernel, idx_spec_shape, idx_map):
        @jax.jit
        def call(src, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NQ * K, C), jnp.bfloat16),
                grid=(NQ * K // T,),
                in_specs=[
                    pl.BlockSpec(idx_spec_shape, idx_map,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NS + 8, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(idx, src)

        try:
            c, per = bench_jitted(call, src, idx)
            got = np.asarray(call(src, idx))
            ok = bool(np.array_equal(got, ref))
            print(f"{name:36s} {per*1000:8.3f} ms  correct={ok}", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # (a) take_along_axis with broadcast 2-D indices
    def k_taa(idx_ref, src_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[:][:, None], (T, C))
        out_ref[:] = jnp.take_along_axis(src_ref[:], ii, axis=0)

    run("take_along_axis_bcast2d", k_taa, (T,), lambda i: (i,))

    # (b) take with 2-D indices (T, 1)
    def k_take2d(idx_ref, src_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[:].reshape(T), axis=0)

    run("take_1d_reshaped", k_take2d, (T, 1), lambda i: (i, 0))

    # (c) lax.gather explicit
    def k_gather(idx_ref, src_ref, out_ref):
        out_ref[:] = src_ref[:][idx_ref[:]]

    run("bracket_index", k_gather, (T,), lambda i: (i,))

    # (d) per-row fori_loop dynamic slice (correctness baseline, slow?)
    def k_loop(idx_ref, src_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = src_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, T, body, 0)

    run("fori_row_loop", k_loop, (T,), lambda i: (i,))


if __name__ == "__main__":
    main()
