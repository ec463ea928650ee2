"""Smoke test: tools/make_synth_3dmatch_root.py output round-trips through
the real 3DMatch loading stack (ThreeDMatchDataset + overlap compute +
benchmark GT parsing) — the path the hardware run of conf/3dmatch.yaml
uses.  Formats under test are the real dataset's (.pth fragments,
info.pkl, Redwood gt.log); see tests/synth_threedmatch.py for the
conventions."""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

TOOLS = str(Path(__file__).resolve().parent.parent / "tools")


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory, monkeypatch_module):
    sys.path.insert(0, TOOLS)
    import make_synth_3dmatch_root as msr

    root = tmp_path_factory.mktemp("synthroot")
    # shrink everything: small rooms, small fragments
    monkeypatch_module.setattr(msr, "MAX_FRAG_PTS", 1500)
    monkeypatch_module.setattr(msr, "MIN_FRAG_PTS", 200)
    # tiny rooms are sparse (~8 cm point spacing), so the real 3.75 cm
    # overlap radius would reject every pair — widen it for the test
    monkeypatch_module.setattr(msr, "OVERLAP_RADIUS", 0.20)
    orig = msr.make_room_world
    monkeypatch_module.setattr(
        msr, "make_room_world", lambda rng, n_points=8000: orig(rng, 8000))
    msr.build(root, scenes_train=2, scenes_val=1, scenes_test=1,
              n_frags=3, seed=0, niter=50)
    return Path(root)


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_root_loads_through_threedmatch_dataset(tiny_root):
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset

    radius = 0.20  # matches the widened test-build radius (sparse rooms)
    cfg = {"root": str(tiny_root), "overlap_radius": radius}
    ds = ThreeDMatchDataset(cfg, "train",
                            metadata_dir=str(tiny_root / "meta"))
    assert len(ds) > 0
    s = ds[0]
    assert s["src_xyz"].shape[1] == 3
    assert s["src_overlap"].dtype == bool
    assert s["pose"].shape == (3, 4)
    # GT consistency: transformed src overlap points should be near tgt
    from regtr_tpu.core import se3_np

    src_w = se3_np.se3_transform(s["pose"], s["src_xyz"])
    corr = s["correspondences"]
    assert corr.shape[1] > 0
    d = np.linalg.norm(src_w[corr[0]] - s["tgt_xyz"][corr[1]], axis=1)
    assert (d < radius + 1e-6).all()


def test_gt_log_parses_and_derived_config_valid(tiny_root):
    from regtr_tpu.benchmark.predator import read_trajectory

    scenes = sorted((tiny_root / "benchmarks" / "3DMatch").iterdir())
    assert scenes
    traj = read_trajectory(str(scenes[0] / "gt.log"))
    assert len(traj) > 0

    with open(tiny_root / "3dmatch_synthroot.yaml") as f:
        conf = yaml.safe_load(f)
    assert conf["dataset"]["root"] == str(tiny_root)
    assert conf["train_options"]["niter"] == 50
    # every other key matches the shipped config
    ship = yaml.safe_load(
        open(Path(__file__).resolve().parent.parent / "conf/3dmatch.yaml"))
    for section, vals in ship.items():
        for k, v in vals.items():
            if (section, k) in (("dataset", "root"),
                                ("train_options", "niter")):
                continue
            assert conf[section][k] == v, (section, k)
