"""End-to-end 3DMatch pipeline test on a synthesized data root.

No 3DMatch training data ships in this environment, so this test fabricates
a miniature dataset in the EXACT on-disk formats (per-fragment .pth files,
{phase}_info.pkl pair metadata, Redwood gt.log/gt.info) and drives the whole
path: dataset -> augmentations -> bucketed collate -> train step ->
test protocol (est.log writing) -> Predator benchmark scoring.
"""
import os
import pickle
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from regtr_tpu.core import se3_np


N_FRAG = 4
SCENE = "synthscene"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Fabricate fragments of one synthetic 'room' + pair metadata + GT."""
    root = tmp_path_factory.mktemp("threedmatch")
    (root / "test" / SCENE).mkdir(parents=True)
    rng = np.random.RandomState(0)

    # A "room": points on the surface of a box with furniture-ish blobs.
    room = np.concatenate([
        rng.rand(4000, 3).astype(np.float32) * [4, 3, 0.02],
        rng.rand(1500, 3).astype(np.float32) * [0.02, 3, 2.5],
        rng.rand(1500, 3).astype(np.float32) * [4, 0.02, 2.5] + [0, 3, 0],
        rng.rand(800, 3).astype(np.float32) * 0.6 + [1.5, 1.0, 0],
        rng.rand(800, 3).astype(np.float32) * [0.8, 0.8, 1.2] + [3.0, 2.0, 0],
    ])

    # Fragments = overlapping spatial crops, each in its own (GT) frame.
    frag_poses = []  # frame -> world
    for i in range(N_FRAG):
        center = np.array([0.8 + i * 0.7, 1.5, 1.0], np.float32)
        keep = np.linalg.norm(room - center, axis=1) < 1.6
        frag_world = room[keep]
        pose = se3_np.se3_init(
            se3_np.sample_uniform_rotation(rng, max_deg=30.0),
            rng.randn(3).astype(np.float32) * 0.2,
        )  # world -> frame? store frame->world as GT convention below
        frag_local = se3_np.se3_transform(se3_np.se3_inv(pose), frag_world)
        torch.save(
            torch.from_numpy(frag_local),
            root / "test" / SCENE / f"cloud_bin_{i}.pth",
        )
        frag_poses.append(pose)

    # Pair metadata (src -> tgt pose: tgt_frame <- world <- src_frame).
    pairs = [(0, 2), (1, 3), (0, 3)]
    infos = {"src": [], "tgt": [], "rot": [], "trans": [], "overlap": []}
    for i, j in pairs:
        rel = se3_np.se3_cat(se3_np.se3_inv(frag_poses[j]), frag_poses[i])
        infos["src"].append(f"test/{SCENE}/cloud_bin_{i}.pth")
        infos["tgt"].append(f"test/{SCENE}/cloud_bin_{j}.pth")
        infos["rot"].append(rel[:3, :3])
        infos["trans"].append(rel[:3, 3:4])
        infos["overlap"].append(0.5)
    infos["rot"] = np.stack(infos["rot"])
    infos["trans"] = np.stack(infos["trans"])
    infos["overlap"] = np.asarray(infos["overlap"])
    meta_dir = root / "meta"
    meta_dir.mkdir()
    for phase in ("train", "val"):
        with open(meta_dir / f"{phase}_info.pkl", "wb") as f:
            pickle.dump(infos, f)
    with open(meta_dir / "test_3DMatch_info.pkl", "wb") as f:
        pickle.dump(infos, f)

    # Redwood GT benchmark files: gt.log entries are (i, j) with j-i>1 only
    # counted; transform stored is the 4x4 that the est.log convention
    # matches (tgt_idx, src_idx header per the reference writer).
    gt_dir = root / "benchmarks" / "3DMatch" / SCENE
    gt_dir.mkdir(parents=True)
    with open(gt_dir / "gt.log", "w") as f, open(gt_dir / "gt.info", "w") as g:
        for i, j in pairs:
            rel = se3_np.se3_cat(se3_np.se3_inv(frag_poses[j]), frag_poses[i])
            mat = np.concatenate([rel, [[0, 0, 0, 1]]], 0)
            f.write(f"{i}\t{j}\t{N_FRAG}\n")
            for row in mat:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")
            g.write(f"{i}\t{j}\t{N_FRAG}\n")
            info = np.eye(6) * 100.0
            for row in info:
                g.write("\t".join(f"{v:.12f}" for v in row) + "\n")
    return root


def _cfg(root):
    from regtr_tpu.presets import threedmatch_config

    return threedmatch_config(
        root=str(root),
        first_subsampling_dl=0.08,  # coarser: keep the test small/fast
        neighborhood_limits=[12, 12, 12, 12],
        first_feats_dim=32, d_embed=32, nhead=4, d_feedforward=64,
        num_encoder_layers=2,
        overlap_loss_on=[1], feature_loss_on=[1], corr_loss_on=[1],
        buckets=[1536], train_batch_size=2, test_batch_size=2,
        capacity_factor=0.6,
    )


def test_dataset_and_augmentation(data_root):
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset

    cfg = _cfg(data_root)
    # construct directly with the fabricated metadata dir
    from regtr_tpu.data import transforms as T

    aug = T.Compose([
        T.RigidPerturb("small"), T.Jitter(0.005),
        T.ShufflePoints(), T.RandomSwap(),
    ])
    ds = ThreeDMatchDataset(cfg, "train", transforms=aug,
                            metadata_dir=str(data_root / "meta"))
    assert len(ds) == 3
    s = ds[0]
    assert s["src_xyz"].shape[1] == 3
    assert s["src_overlap"].dtype == bool
    # overlap labels nontrivial: fragments genuinely overlap
    assert 0.05 < s["src_overlap"].mean() <= 1.0
    # pose consistency: GT-transformed src overlap points near tgt cloud
    warped = se3_np.se3_transform(s["pose"], s["src_xyz"][s["src_overlap"]])
    from scipy.spatial import cKDTree

    d, _ = cKDTree(s["tgt_xyz"]).query(warped[:200], k=1)
    assert np.median(d) < 0.1


def test_train_step_on_3dmatch_batch(data_root):
    from regtr_tpu.data.collate import collate_pairs
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState, make_train_step

    cfg = _cfg(data_root)
    ds = ThreeDMatchDataset(cfg, "train", transforms=None,
                            metadata_dir=str(data_root / "meta"))
    batch, meta = collate_pairs([ds[0], ds[1]], cfg["buckets"])
    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(model, donate=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))


def test_full_eval_protocol(data_root, tmp_path):
    """Untrained model through the complete 3DMatch test protocol: est.log
    per scene + Predator benchmark scoring against the fabricated GT."""
    from regtr_tpu.data.collate import collate_pairs
    from regtr_tpu.data.prefetch import DataLoader
    from regtr_tpu.data.threedmatch import ThreeDMatchDataset
    from regtr_tpu.evaluation import run_test
    from regtr_tpu.models import create_model, init_model_params
    from functools import partial

    cfg = _cfg(data_root)
    cfg["benchmark"] = "3DMatch"
    ds = ThreeDMatchDataset(cfg, "test", transforms=None,
                            metadata_dir=str(data_root / "meta"))
    loader = DataLoader(ds, batch_size=2,
                        collate_fn=partial(collate_pairs,
                                           buckets=cfg["buckets"]),
                        num_workers=0)
    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    results = run_test(
        cfg, model, variables["params"], loader, tmp_path,
        gt_benchmark_dir=str(data_root / "benchmarks"),
    )
    est = tmp_path / "3DMatch" / SCENE / "est.log"
    assert est.exists()
    from regtr_tpu.benchmark.predator import read_trajectory

    pairs, traj = read_trajectory(est)
    assert len(pairs) == 3
    assert "registration_recall" in results  # scored against fabricated GT
    assert 0.0 <= results["registration_recall"] <= 1.0
