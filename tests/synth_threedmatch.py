"""Shared builder for a miniature synthesized 3DMatch data root.

Fabricates fragments of one synthetic 'room' in the EXACT on-disk formats
the real dataset uses (per-fragment .pth files, {phase}_info.pkl pair
metadata, Redwood gt.log/gt.info).  Used by tests/test_threedmatch_pipeline
and by the assembled multi-process integration test
(tests/test_multiprocess.py + tests/multiproc_worker.py), whose worker
subprocesses need to rebuild the same config outside of pytest.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

N_FRAG = 4
SCENE = "synthscene"
PAIRS = [(0, 2), (1, 3), (0, 3)]


def build_root(root, seed: int = 0):
    """Create the data root under `root` (a Path-like). Returns Path."""
    import torch

    from regtr_tpu.core import se3_np

    root = Path(root)
    (root / "test" / SCENE).mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)

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
        )
        frag_local = se3_np.se3_transform(se3_np.se3_inv(pose), frag_world)
        torch.save(
            torch.from_numpy(frag_local),
            root / "test" / SCENE / f"cloud_bin_{i}.pth",
        )
        frag_poses.append(pose)

    # Pair metadata, REAL-dataset convention (test_3DMatch_info.pkl): for a
    # fragment pair (i, j) with i < j, src is the HIGHER-index fragment and
    # tgt the lower (e.g. src=cloud_bin_1, tgt=cloud_bin_0), and the pose is
    # tgt_frame <- src_frame.  The est.log writer emits headers
    # (tgt_idx, src_idx) = (i, j), which is exactly the (i, j) order the
    # gt.log headers use — getting this backwards silently scores recall 0.
    infos = {"src": [], "tgt": [], "rot": [], "trans": [], "overlap": []}
    for i, j in PAIRS:
        rel = se3_np.se3_cat(se3_np.se3_inv(frag_poses[i]), frag_poses[j])
        infos["src"].append(f"test/{SCENE}/cloud_bin_{j}.pth")
        infos["tgt"].append(f"test/{SCENE}/cloud_bin_{i}.pth")
        infos["rot"].append(rel[:3, :3])
        infos["trans"].append(rel[:3, 3:4])
        infos["overlap"].append(0.5)
    infos["rot"] = np.stack(infos["rot"])
    infos["trans"] = np.stack(infos["trans"])
    infos["overlap"] = np.asarray(infos["overlap"])
    meta_dir = root / "meta"
    meta_dir.mkdir(exist_ok=True)
    for phase in ("train", "val"):
        with open(meta_dir / f"{phase}_info.pkl", "wb") as f:
            pickle.dump(infos, f)
    with open(meta_dir / "test_3DMatch_info.pkl", "wb") as f:
        pickle.dump(infos, f)

    # Redwood GT benchmark files: header (i, j) = (tgt, src), matrix
    # tgt_frame <- src_frame — matches the real 3DMatch gt.log layout.
    gt_dir = root / "benchmarks" / "3DMatch" / SCENE
    gt_dir.mkdir(parents=True, exist_ok=True)
    with open(gt_dir / "gt.log", "w") as f, open(gt_dir / "gt.info", "w") as g:
        for i, j in PAIRS:
            rel = se3_np.se3_cat(se3_np.se3_inv(frag_poses[i]), frag_poses[j])
            mat = np.concatenate([rel, [[0, 0, 0, 1]]], 0)
            f.write(f"{i}\t{j}\t{N_FRAG}\n")
            for row in mat:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")
            g.write(f"{i}\t{j}\t{N_FRAG}\n")
            info = np.eye(6) * 100.0
            for row in info:
                g.write("\t".join(f"{v:.12f}" for v in row) + "\n")
    return root


def tiny_cfg(root, metadata_dir=None):
    """Small/fast 3DMatch config pointing at a synthesized root."""
    from regtr_tpu.presets import threedmatch_config

    cfg = threedmatch_config(
        root=str(root),
        first_subsampling_dl=0.08,  # coarser: keep tests small/fast
        neighborhood_limits=[12, 12, 12, 12],
        first_feats_dim=32, d_embed=32, nhead=4, d_feedforward=64,
        num_encoder_layers=2,
        overlap_loss_on=[1], feature_loss_on=[1], corr_loss_on=[1],
        buckets=[1536], train_batch_size=2, test_batch_size=2,
        val_batch_size=2,
        capacity_factor=0.6,
    )
    if metadata_dir is not None:
        cfg["metadata_dir"] = str(metadata_dir)
    return cfg
