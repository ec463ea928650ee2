"""Experiment: where does kpconv_geometry time go at L0 scale? Dev tool."""
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
    from regtr_tpu.ops.kpconv import batched_row_gather
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
    levels = jax.block_until_ready(jax.jit(functools.partial(
        build_pyramid, spec=model.spec, recall_target=0.7))(pts, mask))

    lvl = levels[0]
    b, nq, k = lvl.neighbors.shape
    P = 15
    kp = jnp.asarray(load_kernel_points(model.spec.radii[0], P, 3,
                                        "center", 0))
    rng = np.random.RandomState(0)

    def stage(name, fn, *args):
        c, per = bench_jitted(fn, *args)
        print(f"{name:44s} {per*1000:9.2f} ms (compile {c:.0f}s)", flush=True)

    # (a) coordinate gather alone (fp32 rows of 12B)
    def coord_gather(s_pts, inds):
        sp = jnp.concatenate([s_pts, jnp.full((b, 1, 3), 1e6)], axis=1)
        return batched_row_gather(sp, inds.reshape(b, -1))

    stage("coord_gather_6.5Mrows_f32", jax.jit(coord_gather),
          lvl.points, lvl.neighbors)

    # (b) geometry math on pre-gathered neighbors (no gather)
    neighbors = jax.block_until_ready(jax.jit(coord_gather)(
        lvl.points, lvl.neighbors)).reshape(b, nq, k, 3)

    def geom_math(neighbors, q_pts, kernel_pts):
        rel = (neighbors - q_pts[:, :, None, :]).astype(jnp.bfloat16)
        kpts = kernel_pts.astype(jnp.bfloat16)
        rel_sq = jnp.sum(rel * rel, axis=-1)
        dots = jnp.einsum("bqkc,pc->bqkp", rel, kpts,
                          preferred_element_type=jnp.bfloat16)
        kp_sq = jnp.sum(kpts * kpts, axis=-1)
        sq_d = jnp.maximum(rel_sq[..., None] - 2.0 * dots + kp_sq, 0.0)
        return jnp.maximum(1.0 - jnp.sqrt(sq_d) / 0.05, 0.0)

    stage("geom_math_only_bf16", jax.jit(geom_math), neighbors, lvl.points, kp)

    # (c) geometry math via direct broadcast diff (no matmul expansion)
    def geom_bcast(neighbors, q_pts, kernel_pts):
        rel = (neighbors - q_pts[:, :, None, :]).astype(jnp.bfloat16)
        kpts = kernel_pts.astype(jnp.bfloat16)
        d = rel[:, :, :, None, :] - kpts[None, None, None, :, :]
        sq_d = jnp.sum(d * d, axis=-1)
        return jnp.maximum(1.0 - jnp.sqrt(sq_d) / 0.05, 0.0)

    stage("geom_math_bcast_bf16", jax.jit(geom_bcast), neighbors, lvl.points,
          kp)

    # (d) merged gather: features(32ch bf16) + coords packed as 6 bf16 lanes
    x = jnp.asarray(rng.randn(b, nq, 32), jnp.bfloat16)

    def merged_gather(x, s_pts, inds):
        halves = jax.lax.bitcast_convert_type(
            s_pts, jnp.bfloat16).reshape(b, nq, 6)
        cat = jnp.concatenate([x, halves], axis=-1)
        cat = jnp.concatenate([cat, jnp.zeros((b, 1, 38), jnp.bfloat16)],
                              axis=1)
        g = batched_row_gather(cat, inds.reshape(b, -1))
        feats = g[..., :32]
        coords = jax.lax.bitcast_convert_type(
            g[..., 32:].reshape(b, nq * k, 3, 2), jnp.float32)
        return feats, coords

    stage("merged_gather_feat32+coords", jax.jit(merged_gather),
          x, lvl.points, lvl.neighbors)

    # (e) gather with row-sorted indices (locality ceiling test)
    srt = jnp.sort(lvl.neighbors.reshape(b, -1), axis=-1)

    def gather_sorted(x, inds):
        xp = jnp.concatenate([x, jnp.zeros((b, 1, 32), jnp.bfloat16)], axis=1)
        return batched_row_gather(xp, inds)

    stage("gather_fully_sorted_indices", jax.jit(gather_sorted), x, srt)

    # (f) iota indices: pure sequential-read ceiling
    seq = jnp.broadcast_to(
        (jnp.arange(nq * k, dtype=jnp.int32) // k)[None], (b, nq * k))
    stage("gather_sequential_indices", jax.jit(gather_sorted), x, seq)


if __name__ == "__main__":
    main()
