"""Stage-level profile of the register() path on real 3DMatch scans.

Times each stage of the forward (pyramid, backbone, transformer+head+pose)
and each individual neighbor-search / subsample op at the pyramid's true
shapes, so optimization work targets measured costs (reference instrumenting
analogue: /root/reference/src/models/regtr.py:108-216).

Usage: python tools/profile_stages.py [n_pairs=4] [n0=20480] [dtype=bfloat16]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import load_pair
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.ops.pyramid import build_pyramid
    from regtr_tpu.ops.neighbors import radius_neighbors_batch
    from regtr_tpu.ops.subsample import grid_subsample_batch
    from regtr_tpu.train.steps import make_forward
    from regtr_tpu.utils.profiling import bench_jitted

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n0 = int(sys.argv[2]) if len(sys.argv) > 2 else 20480
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    src, tgt = load_pair()

    def pad(p):
        out = np.zeros((n0, 3), np.float32)
        out[: len(p)] = p[:n0]
        m = np.zeros(n0, bool)
        m[: min(len(p), n0)] = True
        return out, m

    ps, ms = pad(src)
    pt, mt = pad(tgt)
    pts = np.stack([ps, pt] * n_pairs)
    mask = np.stack([ms, mt] * n_pairs)

    cfg = threedmatch_config(compute_dtype=dtype)
    model = create_model(cfg, n0)
    spec = model.spec
    log(f"caps {spec.capacities} ks {spec.neighbor_ks} radii {spec.radii}")

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = init_model_params(model, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, dev)
    pts_d = jax.device_put(jnp.asarray(pts), dev)
    mask_d = jax.device_put(jnp.asarray(mask), dev)

    results = {}

    def stage(name, fn, *args, iters=10):
        c, per = bench_jitted(fn, *args, iters=iters)
        results[name] = per
        log(f"{name:42s} {per*1000:9.2f} ms   (compile {c:.1f}s)")
        return per

    # --- full forward -----------------------------------------------------
    fwd = make_forward(model)
    stage("full_forward", fwd, variables["params"], pts_d, mask_d)

    # --- pyramid ----------------------------------------------------------
    import functools
    pyr_fn = jax.jit(functools.partial(
        build_pyramid, spec=spec,
        method=cfg.get("neighbor_method", "brute"),
        recall_target=float(cfg.get("neighbor_recall", 0.95)),
    ))
    stage("pyramid_total", pyr_fn, pts_d, mask_d)
    levels = jax.block_until_ready(pyr_fn(pts_d, mask_d))

    # --- backbone on precomputed levels ------------------------------------
    feats0 = jnp.where(mask_d[..., None], 1.0, 0.0)

    def backbone_fn(params, feats0, levels):
        return model.apply({"params": params}, feats0, levels,
                           method=lambda m, f, l: m.backbone(f, l))

    stage("backbone", jax.jit(backbone_fn), variables["params"], feats0,
          levels)

    # --- transformer + head + pose on precomputed encoder output -----------
    out_bb = jax.block_until_ready(
        jax.jit(backbone_fn)(variables["params"], feats0, levels))[0]

    def rest_fn(params, feats_enc, levels):
        def run(m, feats_enc, levels):
            coarse = levels[-1]
            feats_un = m.feat_proj(feats_enc)
            pe = m.pos_embed(coarse.points)
            feats_cond = m.transformer(feats_un, pe, coarse.mask, True)
            corr, ov = m.head(feats_cond, coarse.points, pe, coarse.mask)
            return feats_cond, corr, ov
        return model.apply({"params": params}, feats_enc, levels, method=run)

    stage("transformer_head", jax.jit(rest_fn), variables["params"], out_bb,
          levels)

    # --- individual neighbor ops at true shapes -----------------------------
    lvl_pts = [l.points for l in levels]
    lvl_msk = [l.mask for l in levels]
    for li in range(spec.num_levels):
        r = spec.radii[li]
        k = spec.neighbor_ks[li]
        for method in ("brute", "grid"):
            fn = jax.jit(functools.partial(
                radius_neighbors_batch, k=k, method=method))
            try:
                stage(f"L{li}_conv_{method}", fn,
                      lvl_pts[li], lvl_msk[li], lvl_pts[li], lvl_msk[li],
                      jnp.float32(r))
            except Exception as e:  # noqa
                log(f"L{li}_conv_{method} failed: {type(e).__name__}")
        if li + 1 < spec.num_levels:
            fn = jax.jit(functools.partial(
                radius_neighbors_batch, k=k, method="brute"))
            stage(f"L{li}_pool_brute", fn,
                  lvl_pts[li + 1], lvl_msk[li + 1], lvl_pts[li], lvl_msk[li],
                  jnp.float32(r))
            stage(f"L{li}_ups_brute", fn,
                  lvl_pts[li], lvl_msk[li], lvl_pts[li + 1], lvl_msk[li + 1],
                  jnp.float32(2 * r))
            sub = jax.jit(functools.partial(
                grid_subsample_batch, capacity=spec.capacities[li + 1]))
            stage(f"L{li}_subsample", sub, lvl_pts[li], lvl_msk[li],
                  jnp.float32(spec.voxel_sizes[li + 1]))

    log("\nsummary (ms):")
    for k_, v in sorted(results.items(), key=lambda kv: -kv[1]):
        log(f"  {k_:40s} {v*1000:9.2f}")
    neigh = sum(v for k_, v in results.items()
                if "_conv_brute" in k_ or "_pool_" in k_ or "_ups_" in k_)
    log(f"  sum(neighbor ops, brute)               {neigh*1000:9.2f}")


if __name__ == "__main__":
    main()
