"""Optimizer + LR schedule construction from config.

Equivalents of GenericRegModel.configure_optimizers (/root/reference/src/
models/generic_reg_model.py:28-62) and WarmUpScheduler (/root/reference/src/
models/scheduler/warmup.py:4-63), expressed as optax transforms:
  * optimizer: Adam / AdamW (weight decay)
  * schedule 'warmup':  linear warmup then exponential decay
  * schedule 'step':    step decay by gamma every N steps
  * schedule 'none':    constant
  * global-norm gradient clipping (cfg.grad_clip, reference default 0.1)
"""
from __future__ import annotations

import math

import optax


def make_schedule(cfg):
    base_lr = float(cfg.get("base_lr", 1e-4))
    kind = cfg.get("scheduler", "none") or "none"
    params = cfg.get("scheduler_param", [])

    if kind == "none":
        return base_lr
    if kind == "step":
        step_size, gamma = int(params[0]), float(params[1])
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=step_size,
            decay_rate=gamma,
            staircase=True,
        )
    if kind == "warmup":
        warmup_steps = int(params[0])
        if len(params) >= 3:
            gamma = math.exp(math.log(float(params[2])) / float(params[1]))
        else:
            gamma = 1.0

        def schedule(step):
            import jax.numpy as jnp

            warm = jnp.minimum(step / max(warmup_steps, 1), 1.0) * base_lr
            decay = base_lr * gamma ** (step - warmup_steps)
            return jnp.where(step < warmup_steps, warm, decay)

        return schedule
    raise ValueError(f"unknown scheduler {kind!r}")


def make_optimizer(cfg):
    sched = make_schedule(cfg)
    name = cfg.get("optimizer", "AdamW")
    wd = float(cfg.get("weight_decay", 0.0))
    if name == "AdamW":
        opt = optax.adamw(learning_rate=sched, weight_decay=wd)
    elif name == "Adam":
        opt = optax.adam(learning_rate=sched)
    elif name == "SGD":
        opt = optax.sgd(learning_rate=sched, momentum=cfg.get("momentum", 0.9))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    clip = float(cfg.get("grad_clip", 0.0) or 0.0)
    transforms = []
    if clip > 0:
        transforms.append(optax.clip_by_global_norm(clip))
    transforms.append(opt)
    tx = optax.chain(*transforms)

    accum = int(cfg.get("grad_accum_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
