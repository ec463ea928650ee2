"""Quantify the approx-neighbor recall knob's effect on END metrics.

VERDICT r2 #3: the production pyramid uses brute MXU distances +
approx_min_k with a recall_target guarantee (plus a bf16 distance
reduction); the tuned 3DMatch setting is 0.7.  This experiment ties that
knob to registration metrics at model level: a trained 3DMatch-scale
checkpoint (.runs/synth_big2, 1500 steps, reg_success 0.875 train) is
evaluated on its deterministic synthetic val set under
  * brute @ recall_target 0.7   (production 3DMatch setting)
  * brute @ recall_target 0.95  (conservative global default)
  * scan (exact oracle neighbor tables)
and the same pyramid's neighbor tables are compared row-wise against the
exact oracle.  Reference contract being approximated:
/root/reference/src/models/backbone_kpconv/cpp_wrappers/cpp_neighbors/
neighbors/neighbors.cpp:125-208 (exact radius neighbors).

Round 5 re-run (VERDICT r4 #2): the round-3 checkpoint (reg_success 0.125)
was too weak for a 1-2% recall leak to show; this script now restores the
BEST checkpoint (per best.json) of the given run, e.g. the converged
round-5 run .runs/synth_r5 (val reg_success >=0.87), and also measures the
K=[32,36,40,40] neighbor-limit cut's accuracy cost (VERDICT r4 #4).

Usage: python tools/exp_recall.py [config=conf/synthetic_3dmatch.yaml]
           [ckpt=<run>/ckpt] [n_batches=32] [best|latest]
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

    from regtr_tpu.config import load_config
    from regtr_tpu.data import get_dataloader
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.train.checkpoints import CheckpointManager
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_eval_step
    from regtr_tpu.utils.profiling import force

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "conf/synthetic_3dmatch.yaml"
    ckpt = sys.argv[2] if len(sys.argv) > 2 \
        else ".runs/synth_big2/260817_052131/ckpt"
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    which = sys.argv[4] if len(sys.argv) > 4 else "best"

    cfg = load_config(cfg_path)
    bucket = max(cfg["buckets"])
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]

    model0 = create_model(cfg, bucket)
    with jax.default_device(cpu):
        variables = init_model_params(model0, jax.random.PRNGKey(0))
    state = TrainState.create(apply_fn=model0.apply,
                              params=variables["params"],
                              tx=make_optimizer(cfg))
    mgr = CheckpointManager(ckpt)
    if which == "best" and (rec := mgr.best_record()):
        print(f"best record: step {rec['step']} score {rec.get('score')}",
              flush=True)
    state, step = mgr.restore(state, best=(which == "best"))
    print(f"restored step {step} from {ckpt}", flush=True)
    params = jax.device_put(state.params, dev)

    # Deterministic val batches, shared across settings.
    loader = get_dataloader(cfg, "val", num_workers=2)
    batches = []
    for i, (batch, _meta) in enumerate(loader):
        if i >= n_batches:
            break
        batches.append(batch)
    print(f"{len(batches)} val batches x {batches[0]['pose'].shape[0]} pairs",
          flush=True)

    settings = [
        ("brute@0.70", {"neighbor_method": "brute", "neighbor_recall": 0.7}),
        ("brute@0.95", {"neighbor_method": "brute", "neighbor_recall": 0.95}),
        ("scan_exact", {"neighbor_method": "scan"}),
        # The K=[32,36,40,40] neighbor-limit cut (314 vs 343 ms/step,
        # RESULTS.md round 5): its accuracy cost at eval time, under the
        # production neighbor setting.  The checkpoint was trained at
        # K=40, so this measures the deployment-style mismatch too.
        ("brute@0.70+K32", {"neighbor_method": "brute",
                            "neighbor_recall": 0.7,
                            "neighborhood_limits": [32, 36, 40, 40]}),
        ("scan+K32", {"neighbor_method": "scan",
                      "neighborhood_limits": [32, 36, 40, 40]}),
    ]
    results = {}
    for name, over in settings:
        c = cfg.copy()
        c.update(over)
        model = create_model(c, bucket)
        eval_step = make_eval_step(model)
        agg = {}
        for batch in batches:
            import jax.numpy as jnp

            m = eval_step(params, {k: jnp.asarray(v)
                                   for k, v in batch.items()})
            force(m["total"])
            for k in ("rot_err_deg", "trans_err", "reg_success_final",
                      "total"):
                v = np.asarray(m[k], np.float64).reshape(-1)[-1]
                agg.setdefault(k, []).append(float(v))
        results[name] = {k: float(np.mean(v)) for k, v in agg.items()}
        print(f"{name}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in results[name].items()), flush=True)

    # Table-level recall of the approx pyramids against the exact oracle,
    # on the first batch.
    import jax.numpy as jnp

    from regtr_tpu.ops.pyramid import build_pyramid

    b0 = batches[0]
    pts = jnp.asarray(b0["points"])
    msk = jnp.asarray(b0["mask"])
    spec = model0.spec

    def tables(method, recall):
        levels = build_pyramid(
            pts, msk, spec, chunk=int(cfg.get("neighbor_chunk", 1024)),
            method=method, cell_cap=int(cfg.get("cell_capacity", 32)),
            recall_target=recall, sort_input=bool(cfg.get("sort_input", True)),
        )
        return [np.asarray(lv.neighbors) for lv in levels]

    exact = tables("scan", 0.95)
    for name, recall in [("brute@0.70", 0.7), ("brute@0.95", 0.95)]:
        approx = tables("brute", recall)
        recs = []
        for lv, (a, e) in enumerate(zip(approx, exact)):
            # row-wise set recall vs the exact table (shadow rows excluded)
            hit = tot = 0
            for b in range(a.shape[0]):
                ae = a[b].reshape(a.shape[1], -1)
                ee = e[b].reshape(e.shape[1], -1)
                valid = ee < ee.max()
                for q in range(0, ae.shape[0], 37):  # sample queries
                    es = set(ee[q][valid[q]].tolist())
                    if not es:
                        continue
                    hit += len(es & set(ae[q].tolist()))
                    tot += len(es)
            recs.append(hit / max(tot, 1))
        print(f"{name}: per-level table recall vs exact = "
              + ", ".join(f"{r:.4f}" for r in recs), flush=True)

    d = {k: results[k] for k in results}
    ref = d["scan_exact"]
    for name in (n for n in d if n != "scan_exact"):
        print(f"delta {name} vs exact: "
              f"rot_err {d[name]['rot_err_deg']-ref['rot_err_deg']:+.4f} deg, "
              f"trans {d[name]['trans_err']-ref['trans_err']:+.5f}, "
              f"success {d[name]['reg_success_final']-ref['reg_success_final']:+.4f}",
              flush=True)


if __name__ == "__main__":
    main()
