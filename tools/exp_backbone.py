"""Experiment: dissect the KPConv backbone cost at 3DMatch scale on TPU.

Times each primitive at its true shapes: geometry (influence tensors),
feature gathers, the weighted einsum, the output matmul, instance norm,
max_pool shortcut.  Dev tool.
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
    from regtr_tpu.models import create_model
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.ops.pyramid import build_pyramid
    from regtr_tpu.ops.kpconv import (batched_row_gather, kpconv_apply,
                                      kpconv_geometry, max_pool)
    from regtr_tpu.core.masking import masked_instance_norm
    from regtr_tpu.utils.kernel_points import load_kernel_points
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

    cfg = threedmatch_config(compute_dtype="bfloat16")
    model = create_model(cfg, n0)
    spec = model.spec

    pyr_fn = jax.jit(functools.partial(
        build_pyramid, spec=spec, recall_target=0.7))
    levels = jax.block_until_ready(pyr_fn(pts, mask))
    results = {}

    def stage(name, fn, *args, iters=10):
        c, per = bench_jitted(fn, *args, iters=iters)
        results[name] = per
        print(f"{name:46s} {per*1000:9.2f} ms  (compile {c:.1f}s)",
              flush=True)

    rng = np.random.RandomState(0)
    P = cfg["num_kernel_points"]

    # geometry per level (conv tables)
    geoms = {}
    for li, (r, nq) in enumerate(zip(spec.radii, spec.capacities)):
        extent = r * cfg["KP_extent"] / cfg["conv_radius"]
        kp = jnp.asarray(load_kernel_points(r, P, 3, "center", 0))
        lvl = levels[li]
        fn = jax.jit(functools.partial(
            kpconv_geometry, kp_extent=extent, compute_dtype=jnp.bfloat16))

        def geo_bf16(q, s, n, kpts, _fn=fn):
            return _fn(q, s, n, kpts)

        stage(f"L{li}_geometry", jax.jit(geo_bf16),
              lvl.points, lvl.points, lvl.neighbors, kp)
        geoms[li] = jax.block_until_ready(jax.jit(geo_bf16)(
            lvl.points, lvl.points, lvl.neighbors, kp))

    # block-shaped kpconv_apply + pieces: (level, cin) for each conv block
    block_shapes = [(0, 32), (1, 64), (2, 128), (3, 256)]
    for li, cin in block_shapes:
        lvl = levels[li]
        nq = lvl.points.shape[1]
        x = jnp.asarray(rng.randn(8, nq, cin), jnp.float32)
        w = jnp.asarray(rng.randn(P, cin, cin), jnp.float32)
        infl, inv_n = geoms[li]
        stage(f"L{li}_kpconv_apply_c{cin}",
              jax.jit(functools.partial(kpconv_apply,
                                        compute_dtype=jnp.bfloat16)),
              infl, inv_n, lvl.neighbors, x, w)

        # gather alone
        def gather_only(x, inds):
            b, n, c = x.shape
            xp = jnp.concatenate(
                [x.astype(jnp.bfloat16), jnp.zeros((b, 1, c), jnp.bfloat16)],
                axis=1)
            return batched_row_gather(xp, inds.reshape(b, -1))

        stage(f"L{li}_gather_only_c{cin}", jax.jit(gather_only),
              x, lvl.neighbors)

        # instance norm alone
        stage(f"L{li}_instnorm_c{cin}", jax.jit(masked_instance_norm),
              x, lvl.mask)

    # strided max_pool shortcut shapes
    for li, c in [(0, 128), (1, 256), (2, 512)]:
        lvl = levels[li]
        x = jnp.asarray(rng.randn(8, lvl.points.shape[1], c), jnp.float32)
        stage(f"L{li}_maxpool_c{c}",
              jax.jit(functools.partial(max_pool, compute_dtype=jnp.bfloat16)),
              x, lvl.pools)

    print("\nsummary (ms):")
    for k_, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k_:44s} {v*1000:9.2f}")
    print(f"  TOTAL {sum(results.values())*1000:9.2f}")


if __name__ == "__main__":
    main()
