"""Experiment: lane-axis dynamic gather perf + shape flexibility. Dev tool."""
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

    # shape-flex probe: idx wider than src along lanes?
    def probe(C, W, M, dtype):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(C, W), dtype)
        idx = jnp.asarray(rng.randint(0, W, (C, M)), jnp.int32)

        def k(idx_ref, src_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

        @jax.jit
        def call(src, idx):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((C, M), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, src)

        try:
            got = np.asarray(jax.block_until_ready(call(src, idx)))
            ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
            ok = bool(np.array_equal(got, ref))
            print(f"C={C:3d} W={W:5d} M={M:6d} {np.dtype(dtype).name:8s}"
                  f" ok={ok}", flush=True)
            return True
        except Exception as e:
            msg = str(e).replace("\n", " ")[:120]
            print(f"C={C:3d} W={W:5d} M={M:6d} {np.dtype(dtype).name:8s}"
                  f" {type(e).__name__}: {msg}", flush=True)
            return False

    probe(32, 5120, 5120, np.float32)
    probe(32, 5120, 8192, np.float32)     # idx wider than src?
    probe(32, 5120, 5120, np.dtype("bfloat16"))
    probe(8, 512, 1024, np.float32)
    probe(16, 5120, 5120, np.dtype("bfloat16"))

    # throughput at L0-cloud scale: grid over 160 tiles,
    # each gathers (32, 5120) from its own (32, 5120) window
    C, W, NT = 32, 5120, 160
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(NT, C, W), jnp.float32)
    idx = jnp.asarray(rng.randint(0, W, (NT, C, W)), jnp.int32)

    def k3(idx_ref, src_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(src_ref[0], idx_ref[0], axis=1)

    @jax.jit
    def call3(src, idx):
        return pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((NT, C, W), jnp.float32),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, C, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, src)

    try:
        c, per = bench_jitted(call3, src, idx)
        rows = NT * W
        got = np.asarray(call3(src, idx))
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=2)
        ok = bool(np.array_equal(got, ref))
        print(f"lane_gather cloud-scale {per*1000:8.3f} ms ok={ok} "
              f"({per/rows*1e9:.3f} ns/row-of-32ch)", flush=True)
    except Exception as e:
        print(f"cloud-scale FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
