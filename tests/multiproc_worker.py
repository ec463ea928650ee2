"""Worker process for the assembled multi-process (multi-host) test.

Launched as a subprocess by tests/test_multiprocess.py (NOT collected by
pytest).  Each worker is one "host": it initializes jax.distributed against
a localhost coordinator, builds its shard of the data loaders, joins the
global device mesh, and drives the REAL runtime end-to-end — Trainer.fit
(sharded train steps + sharded validation with cross-process metric
reduction + orbax checkpoint), then the test protocol (per-rank est.log
trees, rank-0 merge, Predator recall).  This executes every
`jax.process_count() > 1` branch in the framework for real; the single
capability the unit tests' synthetic inputs could not cover.

Multi-host design being exercised (ARCHITECTURE.md; the reference is
strictly single-device — SURVEY.md §2.3):
  * per-process loader shards (train.py:80-90 equivalent)
  * global-mesh train/eval steps: gradients all-reduce over Gloo/ICI via
    out_shardings=replicated (parallel/mesh.py, train/steps.py)
  * Trainer._global_averages process_allgather reduction
  * logging_utils timestamp broadcast -> shared run dir, per-rank files
  * evaluation.run_test: per-rank est trees + _allgather_ragged +
    merge_est_log_dirs + rank-0 benchmark scoring

Usage:
  python tests/multiproc_worker.py --rank R --nprocs N --port P \
      --root DATA_ROOT --workdir OUT [--train-steps 2]

The parent must set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--train-steps", type=int, default=2)
    a = ap.parse_args()

    # Force CPU (both knobs — the ambient sitecustomize overrides platform
    # selection; see conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{a.port}",
            num_processes=a.nprocs,
            process_id=a.rank,
        )
    assert jax.process_count() == a.nprocs, jax.process_count()

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    import numpy as np

    from regtr_tpu.data import get_dataloader
    from regtr_tpu.evaluation import run_test
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.parallel.mesh import make_mesh
    from regtr_tpu.train.logging_utils import prepare_logger
    from regtr_tpu.train.trainer import Trainer
    from tests.synth_threedmatch import build_root, tiny_cfg

    root = Path(a.root)
    if a.rank == 0 and not (root / "meta").exists():
        build_root(root)
    if a.nprocs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("data_root_ready")

    workdir = Path(a.workdir)
    cfg = tiny_cfg(root, metadata_dir=root / "meta")
    cfg["benchmark"] = "3DMatch"
    cfg["seed"] = 0

    # Exercises the rank-0 timestamp broadcast -> one shared run dir.
    logger, logdir = prepare_logger(str(workdir / "logs"))

    shard = (jax.process_index(), jax.process_count()) \
        if jax.process_count() > 1 else None
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    n_local = len(jax.local_devices())
    logger.info("rank %d: %d local / %d global devices; mesh=%s",
                a.rank, n_local, len(jax.devices()), mesh)

    model = create_model(cfg, max(cfg["buckets"]))

    # --- Test protocol FIRST, on deterministic init params: every process
    # forwards its own loader shard locally, writes an est_rank{r} tree;
    # rank 0 merges and scores.  Using init params (identical everywhere by
    # deterministic PRNG) makes the recall bit-comparable to a
    # single-process run of the same protocol.
    variables = init_model_params(model, jax.random.PRNGKey(0))
    test_loader = get_dataloader(cfg, "test", num_workers=0, shard=shard)
    eval_dir = workdir / "eval"
    results = run_test(cfg, model, variables["params"], test_loader,
                       eval_dir, gt_benchmark_dir=str(root / "benchmarks"))

    # --- Assembled training: sharded loaders, global-mesh steps, sharded
    # validation with cross-process reduction, orbax save.
    train_loader = get_dataloader(cfg, "train", num_workers=0, shard=shard)
    val_loader = get_dataloader(cfg, "val", num_workers=0, shard=shard)
    trainer = Trainer(cfg, logdir, mesh=mesh, summary_every=1,
                      validate_every=a.train_steps, nb_sanity_val_steps=1)
    state, step = trainer.fit(model, train_loader, val_loader,
                              niter=a.train_steps)

    # Cross-process consistency: data-parallel training must leave every
    # process with bit-identical replicated params.
    leaves = jax.tree_util.tree_leaves(state.params)
    digest = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in leaves))
    if a.nprocs > 1:
        from jax.experimental import multihost_utils

        digests = np.asarray(
            multihost_utils.process_allgather(np.asarray([digest]))
        ).reshape(-1)
    else:
        digests = np.asarray([digest])

    out = {
        "rank": a.rank,
        "nprocs": a.nprocs,
        "step": int(step),
        "param_digest": digest,
        "param_digests_all": digests.tolist(),
        "n_est_pairs": None,
        **{k: results[k] for k in
           ("rot_err_deg_mean", "trans_err_mean", "reg_success")},
    }
    if "registration_recall" in results:
        out["registration_recall"] = results["registration_recall"]
        from regtr_tpu.benchmark.predator import read_trajectory

        est = eval_dir / "3DMatch" / "synthscene" / "est.log"
        pairs, _ = read_trajectory(est)
        out["n_est_pairs"] = len(pairs)
    (workdir / f"results_rank{a.rank}.json").write_text(json.dumps(out))
    print(f"rank {a.rank}: OK step={step} digest={digest:.6f}", flush=True)


if __name__ == "__main__":
    main()
