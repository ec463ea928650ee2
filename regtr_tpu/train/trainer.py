"""Training/eval runtime.

Equivalent of Trainer (/root/reference/src/trainer.py:38-269) redesigned for
the jitted-step world: the loop body is one donated XLA program; the host
loop only feeds bucketed batches, accumulates metrics, runs periodic
validation, and checkpoints (orbax, best-by-val-score retention).

Differences from the reference (by design):
  * negative `niter` means epochs, positive means steps (same convention,
    trainer.py:64);
  * per-step try/except resilience (trainer.py:137-141) is replaced by
    non-finite-loss detection + skip, since shape errors can't occur with
    bucketed static shapes;
  * jit caches per bucket size: the first batch of each bucket compiles, the
    rest reuse.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..parallel.mesh import replicated, shard_batch
from .checkpoints import CheckpointManager
from .logging_utils import MetricsWriter, StatsMeter
from .optim import make_optimizer
from .steps import TrainState, make_eval_step, make_train_step


class Trainer:
    def __init__(self, cfg, logdir, mesh=None,
                 summary_every: int = 500, validate_every: int = -1,
                 nb_sanity_val_steps: int = 2):
        # NOTE: gradient clipping comes from cfg.grad_clip via make_optimizer.
        self.cfg = cfg
        self.logdir = Path(logdir)
        self.mesh = mesh
        self.summary_every = summary_every
        self.validate_every = validate_every
        self.nb_sanity_val_steps = nb_sanity_val_steps
        self.logger = logging.getLogger("regtr_tpu")
        self.saver = CheckpointManager(
            self.logdir / "ckpt", max_to_keep=6, keep_every_hours=3.0
        )

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def restore_from(self, resume, state_template):
        """Restore from an explicit --resume path (a run dir or its ckpt/
        subdir), like the reference's directory-resume
        (/root/reference/src/cvhelpers/torch_helpers.py:195-242).  When the
        path is this run's own ckpt dir the existing saver is reused;
        otherwise a read-only manager over the foreign dir is opened, so a
        fresh logdir can continue a previous run's training."""
        path = Path(resume).resolve()
        if (path / "ckpt").is_dir():
            path = path / "ckpt"
        if path == self.saver.directory:
            return self.saver.restore(state_template)
        src = CheckpointManager(path)
        try:
            return src.restore(state_template)
        finally:
            src.close()

    def fit(self, model, train_loader, val_loader,
            resume: Optional[str] = None, niter: int = -1):
        cfg = self.cfg
        tx = make_optimizer(cfg)
        import jax.random as jrandom

        from ..models import init_model_params

        variables = init_model_params(model, jrandom.PRNGKey(cfg.get("seed", 0)))
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx
        )
        step = 0
        if resume is not None:
            state, step = self.restore_from(resume, state)
            self.logger.info("Resumed from step %d", step)
        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))

        train_step = make_train_step(model, mesh=self.mesh)
        eval_step = make_eval_step(model, mesh=self.mesh)

        if niter < 0:
            total_steps = -niter * len(train_loader)
            self.logger.info(
                "Training for %d epochs (%d steps)", -niter, total_steps
            )
        else:
            total_steps = niter

        validate_every = self.validate_every
        if validate_every < 0:
            validate_every = len(train_loader)  # once per epoch

        # Sanity validation (train.py:40-41, trainer.py:77-80).
        if self.nb_sanity_val_steps > 0 and val_loader is not None:
            self._run_validation(
                eval_step, state, val_loader, limit=self.nb_sanity_val_steps
            )

        writer = MetricsWriter(self.logdir, "train")
        val_writer = MetricsWriter(self.logdir, "val") \
            if val_loader is not None else None
        meters = StatsMeter()
        best_score = -np.inf
        epoch = 0
        t_last = time.time()
        done = False
        consecutive_failures = 0
        # Interactive progress with EMA-smoothed loss (reference
        # trainer.py:87,127-135).  tty + rank 0 only — batch logs keep the
        # line-based summaries; the EMA updates only at metric sync points
        # so the async dispatch pipeline is never stalled.
        import sys as _sys

        from tqdm import tqdm
        tbar = tqdm(
            total=total_steps, initial=step, ncols=80, leave=False,
            disable=not (_sys.stdout.isatty() and jax.process_index() == 0),
        )
        loss_ema = None
        while not done:
            train_loader.set_epoch(epoch)
            for batch, _meta in train_loader:
                # Per-step resilience (reference trainer.py:137-141): a bad
                # batch must not kill an unattended run.  Device-side NaNs
                # are handled in-graph (steps.py apply_fn); this guards
                # host-side surprises (loader/transfer errors).  Persistent
                # failure still raises — silence would hide real breakage.
                try:
                    state, metrics = train_step(state, self._put(batch))
                except Exception:
                    consecutive_failures += 1
                    self.logger.exception(
                        "Train step %d failed (%d consecutive)",
                        step + 1, consecutive_failures,
                    )
                    # The update program donates the state buffers; if the
                    # failure hit mid-update the old state is gone and every
                    # retry would fail with a misleading donation error —
                    # verify the state is still alive before continuing.
                    try:
                        jax.block_until_ready(
                            jax.tree_util.tree_leaves(state.params)[0]
                        )
                    except Exception:
                        self.logger.error(
                            "Optimizer state was donated to the failed "
                            "update; cannot recover in-process — re-raising "
                            "the original error (resume from the last "
                            "checkpoint)."
                        )
                        raise
                    if consecutive_failures >= 5:
                        raise
                    continue
                consecutive_failures = 0
                step += 1
                tbar.update(1)
                # Only sync metrics to host at summary boundaries: a per-step
                # device->host conversion stalls the async dispatch pipeline
                # (~3x slower on the tunneled backend).
                if step % max(self.summary_every // 4, 1) == 0:
                    total = float(metrics["total"])
                    if not np.isfinite(total):
                        self.logger.warning(
                            "Non-finite loss at step %d; skipping metrics",
                            step,
                        )
                    else:
                        meters.update(
                            {k: np.asarray(v) for k, v in metrics.items()}
                        )
                        loss_ema = total if loss_ema is None \
                            else 0.99 * loss_ema + 0.01 * total
                        tbar.set_postfix(loss=f"{loss_ema:.3f}")
                if step % self.summary_every == 0:
                    avgs = meters.averages()
                    rate = self.summary_every / (time.time() - t_last)
                    t_last = time.time()
                    self.logger.info(
                        "step %d | loss %.4f | %.2f it/s | %s", step,
                        avgs.get("total", float("nan")), rate,
                        ", ".join(f"{k}={v:.4f}" for k, v in sorted(avgs.items())
                                  if k != "total"),
                    )
                    writer.write(step, avgs)
                    meters.reset()
                if validate_every > 0 and step % validate_every == 0 \
                        and val_loader is not None:
                    score = self._run_validation(
                        eval_step, state, val_loader,
                        writer=val_writer, step=step,
                    )
                    self.saver.save(step, state, score=score)
                    best_score = max(best_score, score)
                if step >= total_steps:
                    done = True
                    break
            epoch += 1
        tbar.close()
        if val_loader is not None:
            score = self._run_validation(
                eval_step, state, val_loader, writer=val_writer, step=step
            )
            self.saver.save(step, state, score=score)
        if val_writer is not None:
            val_writer.close()
        writer.close()
        return state, step

    def _run_validation(self, eval_step, state, val_loader, limit=None,
                        writer=None, step=0):
        meters = StatsMeter()
        per_pair = {}
        for i, (batch, _meta) in enumerate(val_loader):
            if limit is not None and i >= limit:
                break
            metrics = dict(eval_step(state.params, self._put(batch)))
            for k in [k for k in metrics if k.startswith("hist/")]:
                per_pair.setdefault(k, []).append(np.asarray(metrics.pop(k)))
            meters.update({k: np.asarray(v) for k, v in metrics.items()})
        avgs = self._global_averages(meters)
        score = avgs.get("reg_success_final", 0.0)
        self.logger.info(
            "validation | score %.4f | %s", score,
            ", ".join(f"{k}={v:.4f}" for k, v in sorted(avgs.items())),
        )
        if writer is not None:
            writer.write(step, avgs)
            for k, chunks in per_pair.items():
                writer.write_histogram(step, k, np.concatenate(chunks))
        return score

    def _global_averages(self, meters):
        """Validation averages, reduced across processes when multi-host
        (each process evaluates its own loader shard; see SURVEY.md §2.3)."""
        avgs = meters.averages()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            from .logging_utils import combine_process_sums

            keys = sorted(meters.meters)
            gathered = np.asarray(
                multihost_utils.process_allgather(meters.sums_counts(keys))
            )
            avgs = dict(zip(keys, combine_process_sums(gathered).tolist()))
        return avgs

    def test(self, model, test_loader, params, test_step_fn):
        """Run the dataset-specific test protocol; see eval/ for the
        benchmark writers (generic_reg_model.py:130-195)."""
        all_out = []
        for batch, meta in test_loader:
            all_out.append(test_step_fn(params, self._put(batch), meta))
        return all_out
