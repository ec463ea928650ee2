"""Compare FIRST-step train gradients between the XLA and Pallas segsum
backward impls on the real backend.

Why: profile_train prints grad_norm after ~17 optimizer updates; any
accumulation-order-level numeric difference (fp32 eps) between the two
gather-transpose impls amplifies chaotically over steps in bf16 training,
so a grad_norm gap there does NOT distinguish "kernel wrong" from
"different-but-equivalent reduction order".  This probe differentiates:
it compares the gradients of ONE step from identical params/batch,
leaf by leaf.

Usage: python tools/probe_train_grads.py [n_pairs=2] [n0=20480]
           [dtype=bfloat16] [k=K0,K1,K2,K3]
"""
from __future__ import annotations

import os
import sys

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
    from regtr_tpu.ops import kpconv as K
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

    cfg = threedmatch_config(compute_dtype=dtype)
    for a in sys.argv[4:]:
        if a.startswith("k="):
            cfg["neighborhood_limits"] = [int(x) for x in a[2:].split(",")]
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

    def grads_with(impl):
        K.set_segsum_impl(impl)
        try:
            step = make_train_step(model)
            grads, losses, _ = step.grads_jit(state.params, batch)
            force(losses["total"])
            return jax.device_get(grads), float(losses["total"])
        finally:
            K.set_segsum_impl("auto")

    g_xla, l_xla = grads_with("xla")
    g_pal, l_pal = grads_with("pallas")
    print(f"loss: xla={l_xla:.6f} pallas={l_pal:.6f}", flush=True)

    flat_x = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(g_pal)[0]
    worst = []
    gn_x = gn_p = 0.0
    for (path, ax), (_, ap) in zip(flat_x, flat_p):
        ax = np.asarray(ax, np.float64)
        ap = np.asarray(ap, np.float64)
        gn_x += float((ax ** 2).sum())
        gn_p += float((ap ** 2).sum())
        d = np.abs(ax - ap).max() if ax.size else 0.0
        scale = max(np.abs(ax).max(), 1e-12)
        name = jax.tree_util.keystr(path)
        worst.append((d / scale, d, scale, name))
    worst.sort(reverse=True)
    print(f"grad_norm: xla={gn_x ** 0.5:.4f} pallas={gn_p ** 0.5:.4f}",
          flush=True)
    print("worst leaves by rel diff:", flush=True)
    for rel, d, scale, name in worst[:12]:
        print(f"  rel={rel:.3e} abs={d:.3e} scale={scale:.3e}  {name}",
              flush=True)


if __name__ == "__main__":
    main()
