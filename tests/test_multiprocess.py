"""Assembled multi-process (multi-host) integration test.

Spawns REAL worker processes (tests/multiproc_worker.py), each a separate
"host" with its own local CPU devices, joined via jax.distributed against a
localhost coordinator.  This executes every `jax.process_count() > 1`
branch in the framework end-to-end — per-process loader shards, global-mesh
train steps with cross-process gradient all-reduce, sharded validation with
`Trainer._global_averages`, the rank-0 run-dir timestamp broadcast, orbax
multi-host checkpointing, per-rank est.log trees, `merge_est_log_dirs`, and
rank-0 Predator scoring — and checks the results against a single-process
run of the identical protocol.

The reference has no distributed support at all (SURVEY.md §2.3); this is
the TPU-native framework's pod-scale story validated without pod hardware
(JAX multi-process works on CPU via the Gloo collective backend).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nprocs, root, workdir, local_devices=2, train_steps=2,
                 timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Workers get their own device count — deliberately NOT the parent
    # conftest's 8 — so the global mesh is nprocs x local_devices.
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    port = _free_port()
    procs = []
    for r in range(nprocs):
        log = open(workdir / f"worker{r}.log", "w")
        procs.append((r, subprocess.Popen(
            [sys.executable, "tests/multiproc_worker.py",
             "--rank", str(r), "--nprocs", str(nprocs),
             "--port", str(port), "--root", str(root),
             "--workdir", str(workdir), "--train-steps", str(train_steps)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        ), log))
    failures = []
    for r, p, *rest in [(r, p, log) for r, p, log in procs]:
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            for _, q, _ in procs:
                q.kill()
            rc = -9
        if rc != 0:
            failures.append(r)
    for _, _, log in procs:
        log.close()
    if failures:
        msgs = []
        for r in failures:
            tail = (workdir / f"worker{r}.log").read_text()[-3000:]
            msgs.append(f"--- worker {r} ---\n{tail}")
        raise AssertionError(
            f"workers {failures} failed:\n" + "\n".join(msgs)
        )
    return [
        json.loads((workdir / f"results_rank{r}.json").read_text())
        for r in range(nprocs)
    ]


@pytest.mark.slow
def test_multiprocess_end_to_end(tmp_path):
    from .synth_threedmatch import PAIRS, build_root

    root = tmp_path / "data"
    root.mkdir()
    build_root(root)

    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()

    # 2 processes x 2 local devices = 4-device global mesh (global batch =
    # 2 procs x 2 pairs = 4 pairs, one per device).
    res_mp = _run_workers(2, root, mp_dir, local_devices=2)
    # Single-process correctness baseline.  2 local devices: its global
    # batch is one process's 2 pairs, which must divide the mesh size.
    res_sp = _run_workers(1, root, sp_dir, local_devices=2)

    r0, r1 = res_mp
    sp = res_sp[0]
    assert r0["nprocs"] == 2 and r0["step"] == 2

    # Data-parallel training left bit-identical replicated params on every
    # process (the grads all-reduce through the global mesh).
    d = r0["param_digests_all"]
    assert len(d) == 2 and d[0] == d[1], d

    # The merged est.log tree covers every protocol pair exactly once.
    assert r0["n_est_pairs"] == len(PAIRS) == sp["n_est_pairs"]

    # Rank-0 scored the merged tree; recall matches the single-process run
    # (identical deterministic init params -> identical per-pair poses).
    assert "registration_recall" in r0
    assert r0["registration_recall"] == pytest.approx(
        sp["registration_recall"])

    # Globally-gathered per-pair errors equal the single-process protocol.
    assert r0["rot_err_deg_mean"] == pytest.approx(
        sp["rot_err_deg_mean"], rel=1e-4)
    assert r0["trans_err_mean"] == pytest.approx(
        sp["trans_err_mean"], rel=1e-4)
    # Every rank reports the same gathered values (allgather, not a shard).
    assert r0["rot_err_deg_mean"] == pytest.approx(
        r1["rot_err_deg_mean"], rel=1e-6)

    # Per-rank est trees existed before the merge.
    assert (mp_dir / "eval" / "est_rank0" / "3DMatch").exists()
    assert (mp_dir / "eval" / "est_rank1" / "3DMatch").exists()

    # The shared-run-dir broadcast worked: exactly one run dir, rank-1 logs
    # under rank-suffixed filenames.
    runs = list((mp_dir / "logs").iterdir())
    assert len(runs) == 1, runs
    assert (runs[0] / "log.txt").exists()
    assert (runs[0] / "log.rank1.txt").exists()
