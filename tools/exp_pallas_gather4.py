"""Experiment: minimal Mosaic dynamic_gather shapes/dtypes matrix. Dev tool."""
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

    def try_one(W, C, dtype, axis):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(W, C), dtype)
        if axis == 0:
            idx = jnp.asarray(rng.randint(0, W, (W, C)), jnp.int32)
        else:
            idx = jnp.asarray(rng.randint(0, C, (W, C)), jnp.int32)

        def k(idx_ref, src_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:],
                                             axis=axis)

        @jax.jit
        def call(src, idx):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((W, C), dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, src)

        try:
            got = np.asarray(jax.block_until_ready(call(src, idx)))
            ref = np.take_along_axis(np.asarray(src), np.asarray(idx),
                                     axis=axis)
            ok = bool(np.array_equal(got, ref))
            print(f"W={W:5d} C={C:4d} {np.dtype(dtype).name:8s} axis={axis}"
                  f" -> ok={ok}", flush=True)
            return ok
        except Exception as e:
            msg = str(e).replace("\n", " ")[:140]
            print(f"W={W:5d} C={C:4d} {np.dtype(dtype).name:8s} axis={axis}"
                  f" -> {type(e).__name__}: {msg}", flush=True)
            return False

    for dtype in (np.float32, np.int32, np.dtype("bfloat16")):
        for (W, C) in ((512, 128), (1024, 128), (512, 256), (5120, 32)):
            try_one(W, C, dtype, 0)
    try_one(512, 128, np.float32, 1)


if __name__ == "__main__":
    main()
