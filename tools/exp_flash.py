"""Experiment: compiled flash attention vs XLA attention on TPU. Dev tool."""
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
    from regtr_tpu.ops.pallas.attention import (NEG_BIAS, _xla_reference,
                                                flash_masked_attention)
    from regtr_tpu.utils.profiling import bench_jitted
    import functools

    bh, nq, nk, d = 64, 1872, 1872, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, nq, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, nk, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, nk, d), jnp.bfloat16)
    mask = rng.rand(bh, nk) > 0.1
    bias = jnp.asarray(np.where(mask, 0.0, NEG_BIAS), jnp.float32)
    scale = 1.0 / d ** 0.5

    flash = jax.jit(functools.partial(flash_masked_attention,
                                      sm_scale=scale))
    ref = jax.jit(functools.partial(_xla_reference, sm_scale=scale))

    c, per_f = bench_jitted(flash, q, k, v, bias)
    print(f"flash   {per_f*1000:8.3f} ms (compile {c:.0f}s)", flush=True)
    c, per_r = bench_jitted(ref, q, k, v, bias)
    print(f"xla_ref {per_r*1000:8.3f} ms (compile {c:.0f}s)", flush=True)

    got = np.asarray(flash(q, k, v, bias), np.float32)
    want = np.asarray(ref(q, k, v, bias), np.float32)
    err = np.abs(got - want)[np.asarray(mask)[:, :nq].nonzero()[0][:0] or ...]
    print(f"max abs err {np.max(np.abs(got - want)):.5f}  "
          f"mean {np.mean(np.abs(got - want)):.6f}", flush=True)
    print(f"speedup {per_r / per_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
