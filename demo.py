"""Single-pair registration demo CLI.

Equivalent of /root/reference/src/demo.py: load two clouds (.ply/.pth/.bin),
run the model, report the predicted pose + overlap scores, optionally export
colored result clouds as PLY (this environment is headless, so the
reference's interactive VTK window becomes PLY/console output).
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

DEMO_EXAMPLES = [
    # (src, tgt) pairs from the bundled demo data (reference demo.py:26-49)
    ("/root/reference/data/indoor/test/7-scenes-redkitchen/cloud_bin_0.pth",
     "/root/reference/data/indoor/test/7-scenes-redkitchen/cloud_bin_5.pth"),
    ("/root/reference/data/indoor/test/sun3d-home_at-home_at_scan1_2013_jan_1/cloud_bin_38.pth",
     "/root/reference/data/indoor/test/sun3d-home_at-home_at_scan1_2013_jan_1/cloud_bin_41.pth"),
    ("/root/reference/data/indoor/test/sun3d-hotel_umd-maryland_hotel3/cloud_bin_8.pth",
     "/root/reference/data/indoor/test/sun3d-hotel_umd-maryland_hotel3/cloud_bin_15.pth"),
    ("/root/reference/data/modelnet_demo_data/modelnet_test_2_0.ply",
     "/root/reference/data/modelnet_demo_data/modelnet_test_2_1.ply"),
    ("/root/reference/data/modelnet_demo_data/modelnet_test_630_0.ply",
     "/root/reference/data/modelnet_demo_data/modelnet_test_630_1.ply"),
]


def load_cloud(path):
    path = str(path)
    if path.endswith(".ply"):
        from regtr_tpu.utils.ply import read_ply_xyz

        return read_ply_xyz(path)
    if path.endswith(".pth"):
        import torch

        return np.asarray(torch.load(path, weights_only=False), np.float32)
    if path.endswith(".bin"):
        return np.fromfile(path, np.float32).reshape(-1, 6)[:, :3].copy()
    raise ValueError(f"unsupported cloud format: {path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--example", type=int, default=0,
                   help=f"Demo example index (0-{len(DEMO_EXAMPLES)-1})")
    p.add_argument("--src", type=str, help="Source cloud (overrides example)")
    p.add_argument("--tgt", type=str, help="Target cloud (overrides example)")
    p.add_argument("--ckpt", type=str, help="Checkpoint dir (optional; random"
                   " weights give garbage poses but exercise the pipeline)")
    p.add_argument("--params", type=str, help="Flat .npz params (e.g. from"
                   " tools/convert_torch_ckpt.py); alternative to --ckpt")
    p.add_argument("--config", type=str, help="Config YAML")
    p.add_argument("--out", type=str, default="demo_out",
                   help="Output dir for PLY visualization")
    p.add_argument("--save_attn", action="store_true",
                   help="Also save the cross-encoder attention maps "
                        "(per layer, self+cross) to attn.npz — the "
                        "reference's get_attentions analysis capability; "
                        "works on the flash-kernel path too")
    p.add_argument("--platform", type=str, default=None)
    opt = p.parse_args(argv)

    if opt.platform:
        os.environ["JAX_PLATFORMS"] = opt.platform
    from regtr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    import jax.numpy as jnp

    from regtr_tpu.config import load_config
    from regtr_tpu.data.collate import pick_bucket
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import modelnet_config, threedmatch_config
    from regtr_tpu.utils.ply import write_ply

    src = load_cloud(opt.src or DEMO_EXAMPLES[opt.example][0])
    tgt = load_cloud(opt.tgt or DEMO_EXAMPLES[opt.example][1])
    print(f"src: {src.shape}, tgt: {tgt.shape}")

    if opt.config:
        cfg = load_config(opt.config)
    elif max(len(src), len(tgt)) > 4096:
        cfg = threedmatch_config()
    else:
        cfg = modelnet_config()

    n0 = pick_bucket(max(len(src), len(tgt)), cfg["buckets"])
    model = create_model(cfg, n0)

    def pad(c):
        out = np.zeros((n0, 3), np.float32)
        out[: len(c)] = c[:n0]
        m = np.zeros(n0, bool)
        m[: min(len(c), n0)] = True
        return out, m

    ps, ms = pad(src)
    pt, mt = pad(tgt)
    points = jnp.asarray(np.stack([ps, pt]))
    mask = jnp.asarray(np.stack([ms, mt]))

    variables = init_model_params(model, jax.random.PRNGKey(0))
    params = variables["params"]
    npz_path = opt.params or (
        opt.ckpt if opt.ckpt and opt.ckpt.endswith(".npz") else None
    )
    if npz_path:
        from regtr_tpu.train.checkpoints import load_params_npz

        params = load_params_npz(npz_path, params)
        print(f"loaded .npz params from {npz_path}")
    elif opt.ckpt:
        from regtr_tpu.train.checkpoints import CheckpointManager
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState

        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=make_optimizer(cfg)
        )
        state, step = CheckpointManager(opt.ckpt).restore(state, best=True)
        params = state.params
        print(f"loaded checkpoint step {step}")
    else:
        print("WARNING: no checkpoint given; using random weights")

    if opt.save_attn:
        # Requesting the 'intermediates' collection makes every attention
        # module expose its probabilities (the flash path recomputes them
        # explicitly; see nn/transformer.py).
        out, inter = jax.jit(
            lambda v, p, m: model.apply(
                {"params": v}, p, m, mutable=["intermediates"]
            )
        )(params, points, mask)
    else:
        out = jax.jit(lambda v, p, m: model.apply({"params": v}, p, m))(
            params, points, mask
        )
    pose = np.asarray(out["pose"][-1, 0])
    src_overlap = np.asarray(
        jax.nn.sigmoid(out["overlap_logits"][-1, 0])
    )[np.asarray(out["kp_mask"][0])]
    print("Predicted pose (src -> tgt):")
    print(np.array2string(pose, precision=4, suppress_small=True))
    print(f"overlap scores: mean {src_overlap.mean():.3f}, "
          f"frac>0.5: {(src_overlap > 0.5).mean():.3f}")

    outdir = Path(opt.out)
    outdir.mkdir(parents=True, exist_ok=True)
    from regtr_tpu.core import se3_np

    src_warped = se3_np.se3_transform(pose, src)
    colors_src = np.tile([255, 80, 80], (len(src), 1)).astype(np.uint8)
    colors_tgt = np.tile([80, 160, 255], (len(tgt), 1)).astype(np.uint8)
    write_ply(outdir / "before.ply",
              [np.concatenate([src, tgt]),
               np.concatenate([colors_src, colors_tgt])],
              ["x", "y", "z", "red", "green", "blue"])
    write_ply(outdir / "after.ply",
              [np.concatenate([src_warped, tgt]),
               np.concatenate([colors_src, colors_tgt])],
              ["x", "y", "z", "red", "green", "blue"])
    print(f"wrote {outdir}/before.ply and {outdir}/after.ply")

    if opt.save_attn:
        # Flatten {layer_i: {self_attn/cross_attn: {attn: (...)}}} into
        # 'layer_0/self_attn' etc., batch slot 0 = src cloud, 1 = tgt.
        maps = {}

        def walk(tree, prefix=""):
            for k, v in tree.items():
                name = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, name)
                else:
                    # sow stores a tuple of sown values
                    arr = v[0] if isinstance(v, (tuple, list)) else v
                    maps[name.replace("/attn", "")] = np.asarray(arr)

        walk(inter["intermediates"])
        np.savez_compressed(outdir / "attn.npz", **maps)
        shapes = {k: v.shape for k, v in list(maps.items())[:2]}
        print(f"wrote {outdir}/attn.npz: {len(maps)} attention maps, "
              f"e.g. {shapes}")


if __name__ == "__main__":
    main()
