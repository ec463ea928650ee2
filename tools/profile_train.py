"""Profile the full training step at 3DMatch scale on TPU.

Usage: python tools/profile_train.py [n_pairs=2] [n0=20480] [dtype=bfloat16]
           [remat|noremat] [config=3dmatch] [k=K0,K1,K2,K3]

config picks the preset family: "3dmatch" (default) or "modelnet"
(the 768-bucket ModelNet-scale training row in RESULTS.md).
k= overrides neighborhood_limits (the per-level gather width — the
backward's segment-sum rows scale with it; RESULTS.md "K reduction").
The steady-state timing loop runs 3 repetitions (the backend is bimodal
run-to-run; CLAUDE.md).
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


def main():
    import jax
    import jax.numpy as jnp
    from bench import load_pair
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step
    from regtr_tpu.utils.profiling import force

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
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
    pose = np.broadcast_to(np.eye(3, 4, dtype=np.float32),
                           (n_pairs, 3, 4)).copy()
    ov = np.ones((2 * n_pairs, n0), np.float32)

    if len(sys.argv) > 5 and sys.argv[5] == "modelnet":
        from regtr_tpu.presets import modelnet_config

        cfg = modelnet_config(compute_dtype=dtype)
    else:
        cfg = threedmatch_config(compute_dtype=dtype)
    if len(sys.argv) > 4 and sys.argv[4] != "default":
        cfg['remat'] = sys.argv[4] != 'noremat'
    for a in sys.argv[6:]:
        if a.startswith("k="):
            cfg["neighborhood_limits"] = [int(x) for x in
                                          a[2:].split(",")]
            print(f"neighborhood_limits override: "
                  f"{cfg['neighborhood_limits']}", flush=True)
    model = create_model(cfg, n0)
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = init_model_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    state = jax.device_put(state, dev)
    batch = {
        "points": jax.device_put(jnp.asarray(pts), dev),
        "mask": jax.device_put(jnp.asarray(mask), dev),
        "pose": jax.device_put(jnp.asarray(pose), dev),
        "overlap0": jax.device_put(jnp.asarray(ov), dev),
    }

    step = make_train_step(model)
    t0 = time.time()
    state, metrics = step(state, batch)
    force(metrics["total"])
    print(f"compile+first: {time.time()-t0:.1f}s  "
          f"loss={float(metrics['total']):.3f}", flush=True)
    state, metrics = step(state, batch)
    force(metrics["total"])
    t0 = time.time()
    force(metrics["total"])
    rtt = time.time() - t0

    iters = 5
    dts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            state, metrics = step(state, batch)
        force(metrics["total"])
        dts.append((time.time() - t0 - rtt) / iters)
    dt = min(dts)
    reps = "  ".join(f"{d*1000:.0f}" for d in dts)
    print(f"train step: {dt*1000:.0f} ms best of [{reps}]  "
          f"({n_pairs/dt:.2f} pairs/s)  "
          f"grad_norm={float(metrics['grad_norm']):.3f}", flush=True)

    # Per-program split of the step (three XLA programs; see steps.py).
    import jax as _jax

    def time_prog(fn, *args, n=5):
        out = fn(*args)
        force(_jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        force(_jax.tree_util.tree_leaves(out)[0])
        return (time.time() - t0 - rtt) / n * 1000

    g_ms = time_prog(step.grads_jit, state.params, batch)
    grads, losses, pose_pred = step.grads_jit(state.params, batch)
    m_ms = time_prog(step.metrics_jit, losses, pose_pred, batch["pose"],
                     grads)
    print(f"program split: grads {g_ms:.0f} ms, metrics {m_ms:.1f} ms "
          f"(update = remainder of {dt*1000:.0f} ms)", flush=True)

    # FLOP/MFU of the dominant program (grads holds ~all of the step's
    # FLOPs; the metrics/update programs are negligible).
    try:
        cost = step.grads_jit.lower(state.params, batch) \
            .compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = 197e12 if dtype == "bfloat16" else 98.5e12
        print(f"grads program: {flops/1e9:.1f} GFLOP -> "
              f"{flops/dt/1e12:.2f} TFLOP/s = {100*flops/dt/peak:.2f}% MFU "
              f"(vs whole-step time; v5e {dtype} peak)", flush=True)
    except Exception as e:
        print(f"cost_analysis unavailable: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
