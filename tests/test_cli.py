"""CLI-level smoke tests (the reference's de-facto QA was demo.py runs)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # compile-heavy: fresh XLA compiles dominate


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
        "--out", str(tmp_path / "demo"), "--save_attn",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (tmp_path / "demo" / "after.ply").exists()
    assert "Predicted pose" in r.stdout
    # attention-map analysis capability (reference get_attentions)
    attn = np.load(tmp_path / "demo" / "attn.npz")
    assert len(attn.files) == 12  # 6 layers x (self + cross)
    a = attn[attn.files[0]]
    assert a.ndim == 4 and a.shape[0] == 2  # (clouds, heads, N, N)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-3)


def _mini_model_and_cfg(cfg_path):
    import jax

    from regtr_tpu.config import load_config
    from regtr_tpu.models import create_model, init_model_params

    cfg = load_config(cfg_path)
    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_test_cli_npz_params(tmp_path):
    """test.py --params foo.npz: the converted-checkpoint entry path plus
    the ModelNet benchmark dispatch (ref workflow: test.py:53-71)."""
    from regtr_tpu.train.checkpoints import save_params_npz

    cfg_path = _mini_synthetic_config(tmp_path)
    _, _, variables = _mini_model_and_cfg(cfg_path)
    npz = tmp_path / "params.npz"
    save_params_npz(npz, variables["params"])

    r = _run([
        "test.py", "--params", str(npz), "--config", str(cfg_path),
        "--benchmark", "ModelNet", "--logdir", str(tmp_path / "testlogs"),
        "--num_workers", "0", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    runs = list((tmp_path / "testlogs").iterdir())
    assert len(runs) == 1
    # the ModelNet protocol saves predicted poses + logs summary metrics
    assert (runs[0] / "pred_transforms.npy").exists()
    poses = np.load(runs[0] / "pred_transforms.npy")
    assert poses.shape[1:] == (3, 4)
    assert "Test results" in r.stdout + r.stderr


def test_test_cli_resume_orbax(tmp_path):
    """test.py --resume <ckpt dir>: config resolution next to the
    checkpoint + orbax restore + benchmark dispatch."""
    import shutil

    from regtr_tpu.train.checkpoints import CheckpointManager
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState

    cfg_path = _mini_synthetic_config(tmp_path)
    cfg, model, variables = _mini_model_and_cfg(cfg_path)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(cfg),
    )
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    shutil.copy(cfg_path, run_dir / "config.yaml")
    saver = CheckpointManager(run_dir / "ckpt")
    saver.save(3, state, score=0.5)
    saver.close()

    r = _run([
        "test.py", "--resume", str(run_dir / "ckpt"),
        "--benchmark", "ModelNet", "--logdir", str(tmp_path / "testlogs"),
        "--num_workers", "0", "--platform", "cpu",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Loaded checkpoint at step 3" in r.stdout + r.stderr


def test_evaluate_3dmatch_cli(tmp_path):
    """evaluate_3dmatch.py: GT est.logs re-score to recall 1.0; per-pair
    errors land in the CSV (ref writes xlsx: evaluate_3dmatch.py:23-34)."""
    import pickle

    from regtr_tpu.benchmark.predator import write_est_log
    from regtr_tpu.core import se3_np

    from .synth_threedmatch import PAIRS, SCENE, build_root

    root = build_root(tmp_path / "data")
    with open(root / "meta" / "test_3DMatch_info.pkl", "rb") as f:
        infos = pickle.load(f)
    est_dir = tmp_path / "results" / SCENE
    est_dir.mkdir(parents=True)
    for idx, (i, j) in enumerate(PAIRS):
        # GT pose is tgt<-src with tgt = cloud_bin_i, src = cloud_bin_j;
        # the writer emits the (tgt_idx, src_idx) header.
        rel = se3_np.se3_init(
            infos["rot"][idx].astype(np.float64),
            infos["trans"][idx].astype(np.float64),
        )
        mat = np.concatenate([rel, [[0, 0, 0, 1]]], axis=0)
        write_est_log(est_dir / "est.log", i, j, mat)

    csv_path = tmp_path / "errors.csv"
    r = _run([
        "evaluate_3dmatch.py", str(tmp_path / "results"),
        "--gt_dir", str(root / "benchmarks"),
        "--errors_csv", str(csv_path),
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Mean registration recall: 1.0000" in r.stdout
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 1 + len(PAIRS)  # header + one row per pair

    # Default xlsx export (ref parity: individual_errors.xlsx) round-trips.
    from regtr_tpu.utils.xlsx import read_xlsx

    rows = read_xlsx(tmp_path / "results" / "individual_errors.xlsx")
    assert rows[0] == ["scene", "src", "tgt", "error", "flag"]
    assert len(rows) == 1 + len(PAIRS)
    # perfect GT poses: every scored pair registers (flag 0); consecutive
    # pairs are excluded from gt (flag 2); nothing fails (flag 1)
    assert all(r[4] in (0.0, 2.0) for r in rows[1:])
    assert any(r[4] == 0.0 for r in rows[1:])

    # DGR protocol on the same perfect logs
    r = _run([
        "evaluate_3dmatch.py", str(tmp_path / "results"),
        "--gt_dir", str(root / "benchmarks"), "--method", "dgr",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Mean success rate: 1.0000" in r.stdout


def test_compute_overlap_cli_roundtrip(tmp_path):
    """compute_overlap_3dmatch.py writes the h5 that ThreeDMatchDataset
    then loads instead of computing overlaps on the fly."""
    from .synth_threedmatch import build_root, tiny_cfg

    root = build_root(tmp_path / "data")
    r = _run([
        "compute_overlap_3dmatch.py", "--root", str(root),
        "--phase", "train", "--metadata_dir", str(root / "meta"),
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    h5_path = root / "train_pairs-overlapmask.h5"
    assert h5_path.exists()

    from regtr_tpu.data.threedmatch import ThreeDMatchDataset

    cfg = tiny_cfg(root)
    ds_h5 = ThreeDMatchDataset(cfg, "train", transforms=None,
                               metadata_dir=str(root / "meta"))
    assert ds_h5.pairs_data is not None  # loaded the precomputed masks
    s_h5 = ds_h5[0]
    # equivalent to on-the-fly computation
    h5_path.unlink()
    ds_fly = ThreeDMatchDataset(cfg, "train", transforms=None,
                                metadata_dir=str(root / "meta"))
    assert ds_fly.pairs_data is None
    s_fly = ds_fly[0]
    np.testing.assert_array_equal(s_h5["src_overlap"], s_fly["src_overlap"])
    np.testing.assert_array_equal(s_h5["tgt_overlap"], s_fly["tgt_overlap"])


def test_calibrate_cli(tmp_path):
    """calibrate.py measures the static shape schedule and writes it back
    into the YAML (ref: calibrate_neighbors, kpconv.py:702-734)."""
    import pickle

    from .synth_threedmatch import build_root

    root = build_root(tmp_path / "data")
    # a YAML config pointing at the synthesized root
    with open(REPO / "conf" / "3dmatch.yaml") as f:
        raw = yaml.safe_load(f)
    raw["dataset"]["root"] = str(root)
    raw["dataset"]["metadata_dir"] = str(root / "meta")
    raw["kpconv_options"]["first_subsampling_dl"] = 0.08
    cfg_path = tmp_path / "cal.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)

    keep_ratio = 0.8
    r = _run([
        "calibrate.py", "--config", str(cfg_path),
        "--num_samples", "3", "--keep_ratio", str(keep_ratio),
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    with open(cfg_path) as f:
        updated = yaml.safe_load(f)
    limits = updated["kpconv_options"]["neighborhood_limits"]
    caps = updated["tpu_options"]["level_capacities"]
    assert len(limits) == 4 and len(caps) == 4
    assert updated["tpu_options"]["cell_capacity"] >= 1

    # The suggested K really covers >= keep_ratio of all neighbors: re-count
    # with the oracle radius search at level 0.
    from regtr_tpu import native_bindings as nb
    from regtr_tpu.config import load_config

    cfg = load_config(cfg_path)
    r0 = float(cfg["first_subsampling_dl"]) * float(cfg["conv_radius"])
    import torch

    all_counts, max_pts = [], 0
    for i in range(4):
        pts = np.asarray(
            torch.load(root / "test" / "synthscene" / f"cloud_bin_{i}.pth",
                       weights_only=False), np.float32)
        max_pts = max(max_pts, len(pts))
        idx = nb.radius_neighbors(pts, pts, r0, 512)
        all_counts.append((idx < len(pts)).sum(1))
    counts = np.concatenate(all_counts)
    # calibrator semantic: K such that >= keep_ratio of queries keep their
    # FULL neighborhood (count <= K).  Small tolerance: the CLI measured
    # augmented train clouds, this re-check uses the raw fragments.
    coverage = (counts <= limits[0]).mean()
    assert coverage >= keep_ratio - 0.05, (limits[0], coverage)
    # capacities cover the actual cloud sizes
    assert caps[0] >= max_pts


def test_bench_cli_smoke(tmp_path):
    """bench.py (the driver-run benchmark entry point) prints exactly one
    JSON line on stdout with the contract fields, on a tiny CPU bucket."""
    r = _run(["bench.py", "1", "2048", "float32"], timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, r.stdout
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "3dmatch_inference_throughput"
    assert rec["unit"] == "pairs/sec"
    assert rec["value"] > 0 and np.isfinite(rec["value"])
    # both fields are independently rounded to 3 decimals
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 10.0, abs=1e-3)
    # cold-start decomposition: cacheable compile vs remote execution floor
    for k in ("init_s", "compile_s", "lower_compile_s", "first_exec_s"):
        assert rec[k] >= 0
    assert rec["compile_s"] == pytest.approx(
        rec["lower_compile_s"] + rec["first_exec_s"], abs=0.2)
