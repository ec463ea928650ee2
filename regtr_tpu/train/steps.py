"""Jitted train/eval step builders.

Replaces the reference's imperative loop body (/root/reference/src/
trainer.py:100-141: zero_grad -> backward -> clip -> opt.step -> sched.step)
with one donated, optionally mesh-sharded XLA program per step.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax.training import train_state

from ..core.se3 import se3_compare
from ..parallel.mesh import batch_sharding, replicated


class TrainState(train_state.TrainState):
    pass


def registration_metrics(pose_pred, pose_gt, cfg, per_pair: bool = False
                         ) -> Dict[str, jnp.ndarray]:
    """Rot/trans errors per decoder layer + success rate at the validation
    thresholds (generic_reg_model.py:197-250).  With per_pair=True also
    returns the final-layer per-pair errors under 'hist/...' keys, which the
    trainer aggregates into validation histograms
    (generic_reg_model.py:119-123)."""
    err = se3_compare(pose_pred, pose_gt[None])           # over (L, B)
    rot_thresh = float(cfg.get("reg_success_thresh_rot", 10.0))
    trans_thresh = float(cfg.get("reg_success_thresh_trans", 0.1))
    success = (
        (err["rot_deg"] < rot_thresh) & (err["trans"] < trans_thresh)
    ).astype(jnp.float32)
    out = {
        "rot_err_deg": jnp.mean(err["rot_deg"], axis=-1),   # (L,)
        "trans_err": jnp.mean(err["trans"], axis=-1),       # (L,)
        "reg_success": jnp.mean(success, axis=-1),          # (L,)
        "reg_success_final": jnp.mean(success[-1]),
    }
    if per_pair:
        out["hist/rot_err_deg"] = err["rot_deg"][-1]        # (B,)
        out["hist/trans_err"] = err["trans"][-1]            # (B,)
    return out


def make_train_step(model, mesh=None, donate: bool = True):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: {'points' (2B,N,3), 'mask' (2B,N), 'pose' (B,3,4),
            'overlap0' (2B,N)} — pairs interleaved.

    Implementation note: this is TWO jitted programs (grads+metrics, then
    optimizer update) rather than one.  Fusing everything into a single XLA
    program that outputs {new state, losses, registration metrics,
    grad_norm} triggers a pathological schedule at 3DMatch scale on v5e
    (~32 s/step vs ~0.65 s split — measured; any strict subset of those
    outputs is fast).  The split costs one extra dispatch and keeps the
    gradients materialized between the two programs, which is negligible.
    """

    def grads_fn(params, batch: Dict[str, Any]):
        def loss_fn(params):
            losses, out = model.apply(
                {"params": params},
                batch["points"], batch["mask"],
                batch["pose"], batch["overlap0"],
                method=model.compute_loss,
            )
            return losses["total"], (losses, out["pose"])

        grads, (losses, pose_pred) = jax.grad(loss_fn, has_aux=True)(params)
        return grads, losses, pose_pred

    def apply_fn(state: TrainState, grads, total):
        # Skip the update when the loss or any gradient is non-finite
        # (reference trainer.py:129-132 detects and skips before stepping).
        # In-graph so one bad batch cannot poison the params between host
        # syncs; the skip is counted in the metrics ('update_skipped').
        grad_sq = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        )
        ok = jnp.isfinite(total) & jnp.isfinite(grad_sq)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        new_state = state.apply_gradients(grads=safe_grads)
        # Zero grads still advance opt_state (moments decay); on a skipped
        # step keep the old state entirely, like the reference's `continue`.
        new_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_state, state,
        )
        return new_state, (1.0 - ok.astype(jnp.float32))

    def metrics_fn(losses, pose_pred, pose_gt, grads):
        metrics = dict(losses)
        metrics.update(registration_metrics(pose_pred, pose_gt, model.cfg))
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
        )
        return metrics

    g_kwargs, a_kwargs, m_kwargs = {}, {}, {}
    if donate:
        a_kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        g_kwargs["in_shardings"] = (rep, {
            "points": bs, "mask": bs,
            "pose": bs, "overlap0": bs,
        })
        g_kwargs["out_shardings"] = (rep, rep, rep)
        a_kwargs["in_shardings"] = (rep, rep, rep)
        a_kwargs["out_shardings"] = (rep, rep)
        m_kwargs["in_shardings"] = (rep, rep, bs, rep)
        m_kwargs["out_shardings"] = rep
    g_jit = jax.jit(grads_fn, **g_kwargs)
    a_jit = jax.jit(apply_fn, **a_kwargs)
    m_jit = jax.jit(metrics_fn, **m_kwargs)

    def step(state: TrainState, batch: Dict[str, Any]):
        grads, losses, pose_pred = g_jit(state.params, batch)
        metrics = m_jit(losses, pose_pred, batch["pose"], grads)
        new_state, skipped = a_jit(state, grads, losses["total"])
        metrics["update_skipped"] = skipped
        return new_state, metrics

    # Exposed for profilers (FLOP accounting via .lower().compile()
    # .cost_analysis(); grads_jit is ~all of the step's FLOPs).
    step.grads_jit = g_jit
    step.metrics_jit = m_jit
    step.apply_jit = a_jit
    return step


def make_eval_step(model, mesh=None):
    """Returns eval_step(params, batch) -> metrics (losses + registration)."""

    def step(params, batch):
        losses, out = model.apply(
            {"params": params},
            batch["points"], batch["mask"],
            batch["pose"], batch["overlap0"],
            method=model.compute_loss,
            deterministic=True,
        )
        metrics = dict(losses)
        metrics.update(
            registration_metrics(out["pose"], batch["pose"], model.cfg,
                                 per_pair=True)
        )
        return metrics

    kwargs = {}
    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        kwargs["in_shardings"] = (rep, {
            "points": bs, "mask": bs, "pose": bs, "overlap0": bs,
        })
        kwargs["out_shardings"] = rep
    return jax.jit(step, **kwargs)


def make_forward(model, mesh=None):
    """Returns forward(params, points, mask) -> outputs (inference path)."""

    def fwd(params, points, mask):
        return model.apply({"params": params}, points, mask)

    kwargs = {}
    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        kwargs["in_shardings"] = (rep, bs, bs)
    return jax.jit(fwd, **kwargs)
