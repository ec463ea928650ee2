"""Experiment: index-window coverage stats for the windowed KPConv kernel.

After spatial sorting, a query's neighbors should sit near the affine-mapped
support row a(q) = q * Ns / Nq.  Measures |idx - a(q)| quantiles per level
pair on real 3DMatch scans to size the static window W.  Dev tool; CPU.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import jax.numpy as jnp
    from bench import load_pair
    from regtr_tpu.models import create_model
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.ops.pyramid import build_pyramid

    n0 = 20480
    src, tgt = load_pair()

    def pad(p):
        out = np.zeros((n0, 3), np.float32)
        out[: len(p)] = p[:n0]
        m = np.zeros(n0, bool)
        m[: min(len(p), n0)] = True
        return out, m

    ps, ms = pad(src)
    pt, mt = pad(tgt)
    pts = jnp.asarray(np.stack([ps, pt] * 1))
    mask = jnp.asarray(np.stack([ms, mt] * 1))
    cfg = threedmatch_config(compute_dtype="bfloat16")
    model = create_model(cfg, n0)
    spec = model.spec
    levels = jax.block_until_ready(jax.jit(functools.partial(
        build_pyramid, spec=spec, recall_target=0.7))(pts, mask))

    def stats(name, idx, nq, ns, t=128):
        """Per-tile spread: window the kernel needs for tiles of t queries."""
        idx = np.asarray(idx)
        b, nq_, k = idx.shape
        spreads = []
        for bb in range(b):
            for q0 in range(0, nq_, t):
                tile = idx[bb, q0:q0 + t]
                v = tile[tile < ns]
                if v.size:
                    spreads.append(v.max() - v.min() + 1)
        s = np.asarray(spreads)
        qs = np.quantile(s, [0.5, 0.9, 0.99, 1.0])
        print(f"{name:14s} Nq={nq_:6d} Ns={ns:6d} tile-spread "
              f"p50={qs[0]:7.0f} p90={qs[1]:7.0f} p99={qs[2]:7.0f} "
              f"max={qs[3]:7.0f}", flush=True)

    for li, lvl in enumerate(levels):
        ns = lvl.points.shape[1]
        stats(f"L{li}_conv", lvl.neighbors, ns, ns)
        if lvl.pools is not None:
            ns_next = levels[li + 1].points.shape[1]
            stats(f"L{li}_pool", lvl.pools, ns_next, ns)
            stats(f"L{li}_ups", lvl.upsamples, ns, ns_next)


if __name__ == "__main__":
    main()
