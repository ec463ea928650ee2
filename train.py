"""Training CLI.

Same user surface as the reference (/root/reference/src/train.py): configure
via a two-level YAML, resume pulls the config saved next to the checkpoint,
the config is copied into the log dir for reproducibility.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a registration model (TPU)")
    p.add_argument("--config", type=str, help="Path to the config YAML")
    p.add_argument("--logdir", type=str, default="../logs",
                   help="Directory to store logs, summaries, checkpoints")
    p.add_argument("--dev", action="store_true",
                   help="If true, logs to ../logdev (wiped each run)")
    p.add_argument("--name", type=str, help="Experiment name prefix")
    p.add_argument("--summary_every", type=int, default=500)
    p.add_argument("--validate_every", type=int, default=-1,
                   help="-1: once per epoch; 0: validate then exit")
    p.add_argument("--debug", action="store_true",
                   help="Enable jax nan-debugging (slow)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--resume", type=str, help="Checkpoint dir to resume from")
    p.add_argument("--nb_sanity_val_steps", type=int, default=2)
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. cpu)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="Data-parallel mesh size (default: all devices)")
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
    if opt.debug:
        jax.config.update("jax_debug_nans", True)

    from regtr_tpu.config import load_config
    from regtr_tpu.data import get_dataloader
    from regtr_tpu.models import create_model
    from regtr_tpu.parallel.mesh import make_mesh
    from regtr_tpu.train.logging_utils import prepare_logger
    from regtr_tpu.train.trainer import Trainer

    # Resume implies config (train.py:44-56 in the reference).
    if opt.config is None:
        if opt.resume is None:
            sys.exit("--config or --resume required")
        candidate = Path(opt.resume).parent / "config.yaml"
        if not candidate.exists():
            candidate = Path(opt.resume) / "config.yaml"
        if not candidate.exists():
            sys.exit(f"config.yaml not found near {opt.resume}")
        opt.config = str(candidate)

    cfg = load_config(opt.config)
    logger, logdir = prepare_logger(
        opt.logdir if not opt.name else os.path.join(opt.logdir, opt.name),
        dev=opt.dev,
    )
    shutil.copy(opt.config, logdir / "config.yaml")

    n_dev = opt.num_devices or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    logger.info("Devices: %s; mesh: %s", jax.devices()[:n_dev], mesh)

    # Multi-host: each process loads its shard of the pair list.
    shard = (jax.process_index(), jax.process_count()) \
        if jax.process_count() > 1 else None
    train_loader = get_dataloader(
        cfg, "train", num_workers=opt.num_workers, shard=shard
    )
    # Validation is also sharded per process; the trainer reduces the metric
    # sums across processes (Trainer._global_averages).
    val_loader = get_dataloader(
        cfg, "val", num_workers=opt.num_workers, shard=shard
    )
    model = create_model(cfg, max(cfg["buckets"]))

    trainer = Trainer(
        cfg, logdir, mesh=mesh,
        summary_every=opt.summary_every,
        validate_every=opt.validate_every,
        nb_sanity_val_steps=opt.nb_sanity_val_steps,
    )
    if opt.validate_every == 0:
        from regtr_tpu.train.steps import make_eval_step
        from regtr_tpu.models import init_model_params
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState

        variables = init_model_params(model, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx
        )
        if opt.resume:
            state, _ = trainer.restore_from(opt.resume, state)
        trainer._run_validation(
            make_eval_step(model, mesh=mesh), state, val_loader
        )
        return

    trainer.fit(
        model, train_loader, val_loader,
        resume=opt.resume, niter=cfg.get("niter", -1),
    )


if __name__ == "__main__":
    main()
