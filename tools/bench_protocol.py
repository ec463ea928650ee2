"""Mixed-size eval-protocol throughput on the six bundled real scans.

The single-bucket bench (bench.py) replicates one pair at one bucket; real
3DMatch evaluation sees mixed cloud sizes (17k-25k points here), which the
test-phase loader routes to per-pair buckets and regroups into same-bucket
batches (data/prefetch.py regroup_by_bucket, VERDICT r3 #6).  This tool
measures that realistic case end to end: natural sizes, multi-bucket
routing, one compile per bucket (excluded from the steady-state figure),
and reports pairs/sec for

  * grouped  — size-grouped batching (production): pairs batched with
    same-bucket peers;
  * max-bucket — the pre-fix behavior: every batch padded to the batch max
    bucket (here: everything lands in the biggest needed bucket).

Reference analogue being outdone: the torch pipeline pays per-pair ragged
kernels instead (/root/reference/src/data_loaders/collate_functions.py:4-22
and the per-sample loop in /root/reference/src/models/regtr.py:108-216).

Usage: python tools/bench_protocol.py [reps=8] [batch=2] [dtype=bfloat16]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_scans():
    import torch

    scans = {}
    for f in sorted(glob.glob("/root/reference/data/indoor/test/*/*.pth")):
        scene = os.path.basename(os.path.dirname(f))
        name = os.path.basename(f).replace(".pth", "")
        scans[(scene, name)] = np.asarray(
            torch.load(f, weights_only=False), np.float32
        )
    return scans


# The three natural (same-scene, overlapping) pairs among the bundled scans.
NATURAL_PAIRS = [
    ("7-scenes-redkitchen", "cloud_bin_0", "cloud_bin_5"),
    ("sun3d-home_at-home_at_scan1_2013_jan_1", "cloud_bin_38", "cloud_bin_41"),
    ("sun3d-hotel_umd-maryland_hotel3", "cloud_bin_15", "cloud_bin_8"),
]


def main():
    import jax
    import jax.numpy as jnp

    from regtr_tpu.data.collate import pick_bucket
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.presets import threedmatch_config
    from regtr_tpu.train.steps import make_forward

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    smoke = os.environ.get("BENCH_PROTOCOL_SMOKE") == "1"
    if smoke:
        # sitecustomize overrides platform selection; force CPU explicitly
        jax.config.update("jax_platforms", "cpu")

    scans = load_scans()
    if smoke:
        # logic validation on CPU: subsampled scans, tiny model
        from regtr_tpu.presets import tiny_config

        # vary target sizes so pairs route to different buckets
        sizes = [300, 450, 700, 350, 500, 650]
        scans = {k: v[:: max(1, len(v) // s)]
                 for (k, v), s in zip(sorted(scans.items()), sizes)}
        cfg = tiny_config(compute_dtype=dtype)
        cfg["buckets"] = [384, 512, 768]
    else:
        cfg = threedmatch_config(compute_dtype=dtype)
    buckets = cfg["buckets"]

    # Work list: natural pairs replicated `reps` times, with per-pair bucket.
    work = []
    for scene, a, b in NATURAL_PAIRS:
        src, tgt = scans[(scene, a)], scans[(scene, b)]
        n0 = pick_bucket(max(len(src), len(tgt)), buckets)
        work.append((src, tgt, n0))
    work = work * reps
    by_bucket = defaultdict(list)
    for src, tgt, n0 in work:
        by_bucket[n0].append((src, tgt))
    log(f"{len(work)} pairs over buckets "
        f"{{{', '.join(f'{k}: {len(v)}' for k, v in sorted(by_bucket.items()))}}}"
        f"; batch={batch}, dtype={dtype}; devices: {jax.devices()}")

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]

    def pad_batch(pairs, n0):
        pts = np.zeros((2 * len(pairs), n0, 3), np.float32)
        mask = np.zeros((2 * len(pairs), n0), bool)
        for i, (src, tgt) in enumerate(pairs):
            for j, p in enumerate((src, tgt)):
                n = min(len(p), n0)
                pts[2 * i + j, :n] = p[:n]
                mask[2 * i + j, :n] = True
        return pts, mask

    def sync(o):
        return float(jnp.sum(o["pose"].astype(jnp.float32)))

    def run_mode(name, routing):
        """routing: list of (bucket, [pair, ...]) batches."""
        # one model/forward per distinct bucket; params shared by structure
        fwds, params = {}, {}
        compile_s = 0.0
        for n0 in sorted({n0 for n0, _ in routing}):
            model = create_model(cfg, n0)
            with jax.default_device(cpu):
                variables = init_model_params(model, jax.random.PRNGKey(0))
            params[n0] = jax.device_put(variables["params"], dev)
            fwds[n0] = make_forward(model)
            pts, mask = pad_batch(next(p for b, p in routing if b == n0), n0)
            t0 = time.time()
            sync(fwds[n0](params[n0],
                          jax.device_put(jnp.asarray(pts), dev),
                          jax.device_put(jnp.asarray(mask), dev)))
            compile_s += time.time() - t0
        # steady state: host pad + device_put + forward per batch
        t0 = time.time()
        out = None
        n_pairs = 0
        for n0, pairs in routing:
            pts, mask = pad_batch(pairs, n0)
            out = fwds[n0](params[n0],
                           jax.device_put(jnp.asarray(pts), dev),
                           jax.device_put(jnp.asarray(mask), dev))
            n_pairs += len(pairs)
        sync(out)
        dt = time.time() - t0
        pps = n_pairs / dt
        log(f"{name:12s} {n_pairs} pairs in {dt:.2f}s -> {pps:.2f} pairs/s "
            f"(compile+warm {compile_s:.0f}s, {len(fwds)} bucket programs)")
        return pps

    # grouped: same-bucket batches of `batch` pairs
    grouped = []
    for n0, pairs in sorted(by_bucket.items()):
        for i in range(0, len(pairs) - batch + 1, batch):
            grouped.append((n0, pairs[i:i + batch]))
        if len(pairs) % batch:
            log(f"note: dropping {len(pairs) % batch} pairs of bucket {n0} "
                f"(partial batch; pick reps*counts divisible by batch)")
    # max-bucket: stream in dataset order, each batch padded to its max need
    maxb = []
    stream = work
    for i in range(0, len(stream) - batch + 1, batch):
        chunk = stream[i:i + batch]
        n0 = max(c[2] for c in chunk)
        maxb.append((n0, [(s, t) for s, t, _ in chunk]))

    pps_grouped = run_mode("grouped", grouped)
    pps_maxb = run_mode("max-bucket", maxb)

    print(json.dumps({
        "metric": "3dmatch_protocol_mixed_size_throughput",
        "value": round(pps_grouped, 3),
        "unit": "pairs/sec",
        "vs_baseline": round(pps_grouped / 10.0, 3),
        "max_bucket_pairs_per_sec": round(pps_maxb, 3),
        "grouping_speedup": round(pps_grouped / pps_maxb, 3),
    }))


if __name__ == "__main__":
    main()
