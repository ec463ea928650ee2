"""Evaluation CLI.

Same surface as the reference (/root/reference/src/test.py): pick a
benchmark, load a checkpoint (config resolved from the checkpoint dir), run
the dataset-specific test protocol.
ModelLoNet maps to cfg.partial=[0.5, 0.5] (test.py:62-65).
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a registration model")
    p.add_argument("--config", type=str, help="Config YAML (default: next to ckpt)")
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint directory (orbax) or a flat .npz")
    p.add_argument("--params", type=str, default=None,
                   help="Flat .npz params (e.g. from tools/convert_torch_"
                        "ckpt.py); alternative to --resume")
    p.add_argument("--benchmark", type=str, default="3DMatch",
                   choices=["3DMatch", "3DLoMatch", "ModelNet", "ModelLoNet"])
    p.add_argument("--logdir", type=str, default="../logs")
    p.add_argument("--dev", action="store_true")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--platform", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    if opt.platform:
        os.environ["JAX_PLATFORMS"] = opt.platform
    from regtr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from regtr_tpu.config import load_config
    from regtr_tpu.data import get_dataloader
    from regtr_tpu.evaluation import run_test
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.train.checkpoints import CheckpointManager
    from regtr_tpu.train.logging_utils import prepare_logger
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState

    if opt.resume is None and opt.params is None:
        sys.exit("one of --resume / --params is required")
    ckpt_ref = opt.resume or opt.params
    if opt.config is None:
        candidate = Path(ckpt_ref).parent / "config.yaml"
        if not candidate.exists():
            candidate = Path(ckpt_ref) / "config.yaml"
        if not candidate.exists():
            sys.exit(f"config.yaml not found near {ckpt_ref}")
        opt.config = str(candidate)
    cfg = load_config(opt.config)

    cfg["benchmark"] = opt.benchmark
    if opt.benchmark in ("3DMatch", "3DLoMatch"):
        assert cfg["dataset"] == "3dmatch"
    else:
        assert cfg["dataset"] in ("modelnet", "synthetic")
        cfg["partial"] = [0.5, 0.5] if opt.benchmark == "ModelLoNet" \
            else [0.7, 0.7]

    logger, logdir = prepare_logger(opt.logdir, dev=opt.dev)
    shard = (jax.process_index(), jax.process_count()) \
        if jax.process_count() > 1 else None
    test_loader = get_dataloader(
        cfg, "test", num_workers=opt.num_workers, shard=shard
    )

    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    npz_path = opt.params or (
        opt.resume if str(ckpt_ref).endswith(".npz") else None
    )
    if npz_path:
        from regtr_tpu.train.checkpoints import load_params_npz

        params = load_params_npz(npz_path, variables["params"])
        logger.info("Loaded .npz params from %s", npz_path)
    else:
        tx = make_optimizer(cfg)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx
        )
        saver = CheckpointManager(opt.resume)
        state, step = saver.restore(state, best=True)
        params = state.params
        logger.info("Loaded checkpoint at step %d", step)

    results = run_test(cfg, model, params, test_loader, logdir)
    logger.info("Test results: %s", results)


if __name__ == "__main__":
    main()
