"""Prewarm: AOT-compile the flagship programs and prime the .jax_cache.

Cold start on the tunneled TPU backend has two components (RESULTS.md "Cold
start"): local XLA compilation (cacheable; this tool populates the persistent
cache) and the remote backend's executable-load floor (infra weather,
86-530 s observed for Mosaic-custom-call programs, not cacheable from here).
Running this once after a code change makes every later CLI invocation start
at the warm floor instead of paying full compiles.

Equivalent developer-experience role to the reference's first-epoch warm-up
(its torch graphs build lazily on the first batch); here compilation is
explicit, so warming is an explicit build step.

Usage:
    python tools/prewarm.py [--buckets 20480,8192] [--pairs 4,2]
                            [--dtype bfloat16] [--train] [--xla-attention]

Prints per-program lower+compile times and, last, a warm first-result time
for the largest-bucket forward (the number bench.py's compile_s converges to
once the cache is hot).
"""
from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="20480,8192")
    ap.add_argument("--pairs", default="4,2",
                    help="pairs per bucket (parallel list with --buckets)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="also prewarm the 3-program train step at the "
                         "first bucket")
    ap.add_argument("--xla-attention", action="store_true",
                    help="prewarm the attention_impl=xla variant (the "
                         "cold-start-sensitive deployment configuration)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import load_pair
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.train.steps import make_forward

    buckets = [int(b) for b in args.buckets.split(",")]
    pairs = [int(p) for p in args.pairs.split(",")]
    assert len(pairs) == len(buckets), "--pairs must parallel --buckets"

    src, tgt = load_pair()
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]

    def make_batch(n0, n_pairs):
        def pad(p):
            out = np.zeros((n0, 3), np.float32)
            out[: len(p)] = p[:n0]
            m = np.zeros(n0, bool)
            m[: min(len(p), n0)] = True
            return out, m

        ps, ms = pad(src)
        pt, mt = pad(tgt)
        return (np.stack([ps, pt] * n_pairs), np.stack([ms, mt] * n_pairs))

    overrides = {"compute_dtype": args.dtype}
    if args.xla_attention:
        overrides["attention_impl"] = "xla"
    cfg = threedmatch_config(**overrides)

    total_t0 = time.time()
    warm_probe = None  # (fwd, params, pts, mask) for the final warm timing
    for n0, n_pairs in zip(buckets, pairs):
        model = create_model(cfg, n0)
        with jax.default_device(cpu):
            variables = init_model_params(model, jax.random.PRNGKey(0))
        params = jax.device_put(variables["params"], dev)
        pts, mask = make_batch(n0, n_pairs)
        pts_d = jax.device_put(jnp.asarray(pts), dev)
        mask_d = jax.device_put(jnp.asarray(mask), dev)

        fwd = make_forward(model)
        t0 = time.time()
        fwd.lower(params, pts_d, mask_d).compile()
        print(f"forward  bucket={n0} pairs={n_pairs}: "
              f"lower+compile {time.time()-t0:.1f}s", flush=True)
        if warm_probe is None:
            warm_probe = (fwd, params, pts_d, mask_d)

        if args.train and n0 == buckets[0]:
            from regtr_tpu.train.optim import make_optimizer
            from regtr_tpu.train.steps import TrainState, make_train_step

            tx = make_optimizer(cfg)
            with jax.default_device(cpu):
                state = TrainState.create(
                    apply_fn=model.apply, params=variables["params"], tx=tx
                )
            state = jax.device_put(state, dev)
            step = make_train_step(model)
            batch = {
                "points": pts_d, "mask": mask_d,
                "overlap0": jax.device_put(
                    jnp.ones((2 * n_pairs, n0), jnp.float32), dev),
                "pose": jax.device_put(
                    jnp.broadcast_to(
                        jnp.eye(3, 4), (n_pairs, 3, 4)).astype(jnp.float32),
                    dev),
            }
            t0 = time.time()
            grads_l = step.grads_jit.lower(state.params, batch).compile()
            print(f"train/grads bucket={n0} pairs={n_pairs}: "
                  f"lower+compile {time.time()-t0:.1f}s", flush=True)
            del grads_l
            # metrics/update programs: cheap shapes, compile via one real
            # step (also validates the whole 3-program pipeline end to end).
            t0 = time.time()
            _, metrics = step(state, batch)
            float(jnp.asarray(metrics["total"], jnp.float32))
            print(f"train/full-step first run: {time.time()-t0:.1f}s "
                  f"(loss={float(metrics['total']):.3f})", flush=True)

    # Warm first-result figure: what a fresh process pays for its first
    # answer once the cache is populated (executable load + one execution).
    fwd, params, pts_d, mask_d = warm_probe
    t0 = time.time()
    out = fwd(params, pts_d, mask_d)
    float(jnp.sum(out["pose"].astype(jnp.float32)))
    print(f"warm first-result (bucket {buckets[0]}): "
          f"{time.time()-t0:.1f}s", flush=True)
    print(f"prewarm total: {time.time()-total_t0:.1f}s  "
          f"cache dir: {os.environ['JAX_COMPILATION_CACHE_DIR']}", flush=True)


if __name__ == "__main__":
    main()
