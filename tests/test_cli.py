"""CLI-level smoke tests (the reference's de-facto QA was demo.py runs)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]


def _mini_synthetic_config(tmp_path):
    with open(REPO / "conf" / "synthetic.yaml") as f:
        raw = yaml.safe_load(f)
    raw["dataset"].update(
        synthetic_items=8, train_batch_size=2, val_batch_size=2,
        num_points=256,
    )
    raw["train_options"]["niter"] = 4
    raw["kpconv_options"].update(
        first_feats_dim=64, neighborhood_limits=[12, 12]
    )
    raw["model"].update(d_embed=64, nhead=4, d_feedforward=128,
                        num_encoder_layers=2)
    raw["losses"].update(overlap_loss_on=[1], feature_loss_on=[1],
                         corr_loss_on=[1])
    raw["tpu_options"].update(buckets=[256], compute_dtype="float32")
    path = tmp_path / "mini.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    return path


def _run(args, cwd=REPO, timeout=540):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_train_cli_smoke(tmp_path):
    cfg = _mini_synthetic_config(tmp_path)
    r = _run([
        "train.py", "--config", str(cfg),
        "--logdir", str(tmp_path / "logs"),
        "--summary_every", "2", "--validate_every", "4",
        "--nb_sanity_val_steps", "1", "--num_workers", "0",
        "--platform", "cpu", "--num_devices", "1",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    runs = list((tmp_path / "logs").iterdir())
    assert len(runs) == 1
    assert (runs[0] / "config.yaml").exists()
    assert (runs[0] / "metrics_train.jsonl").exists()
    metrics = [json.loads(l) for l in
               open(runs[0] / "metrics_train.jsonl")]
    assert len(metrics) >= 1
    assert np.isfinite(metrics[-1]["total"])
    # checkpoint written at final validation
    assert any((runs[0] / "ckpt").iterdir())


def test_demo_cli_smoke(tmp_path):
    r = _run([
        "demo.py", "--example", "3", "--platform", "cpu",
        "--out", str(tmp_path / "demo"),
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (tmp_path / "demo" / "after.ply").exists()
    assert "Predicted pose" in r.stdout
