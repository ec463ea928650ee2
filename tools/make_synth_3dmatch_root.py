"""Synthesize a full-scale 3DMatch-format data root for hardware training.

The real 3DMatch download is unavailable here (zero egress), but the
as-shipped `conf/3dmatch.yaml` + `ThreeDMatchDataset` path should still be
exercisable end to end on the TPU.  This tool fabricates indoor-scan-like
scenes at METERS scale in the exact on-disk formats the real dataset uses
(per-fragment `.pth` clouds, `{phase}_info.pkl` pair metadata, Redwood
`gt.log`/`gt.info` for the test benchmark — conventions documented in
tests/synth_threedmatch.py and matched against the reference's bundled
files), at real-scan sizes (~12-16k points/fragment, vs the reference's
19-28k `.pth` scans), then writes a derived config YAML that is
`conf/3dmatch.yaml` with only `dataset.root`/`dataset.metadata_dir`/`niter`
patched.

After building, precompute the overlap masks (otherwise every train-time
__getitem__ pays a KD-tree radius search):

    python compute_overlap_3dmatch.py --root OUT --metadata_dir OUT/meta \
        --phase train   # and again with --phase val

Usage: python tools/make_synth_3dmatch_root.py OUT_DIR [--scenes-train 20]
           [--scenes-val 3] [--scenes-test 2] [--frags 6] [--niter 2000]
           [--seed 0]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regtr_tpu.data.synthetic import (  # noqa: E402
    N_PART_KINDS, _random_rotation, _sample_part, _sample_wavy_plane,
)

OVERLAP_RADIUS = 0.0375   # conf/3dmatch.yaml dataset.overlap_radius
MIN_OVERLAP = 0.30        # real train_info.pkl pairs are filtered > 0.3
FRAG_RADIUS = 2.0         # spatial crop radius (m)
MAX_FRAG_PTS = 16000      # like real scans, and inside the 16384 bucket
MIN_FRAG_PTS = 8000


def make_room_world(rng, n_points=90000):
    """One indoor scene at meters scale: floor + walls + clutter."""
    lx, ly = rng.uniform(3.5, 5.5), rng.uniform(3.5, 5.5)
    h = rng.uniform(2.3, 2.8)
    n_objs = rng.randint(4, 9)
    weights = np.concatenate([
        [lx * ly, lx * h, lx * h, ly * h, ly * h],
        rng.uniform(0.8, 2.5, n_objs),
    ])
    counts = (weights / weights.sum() * n_points).astype(int)
    pts_all = []
    amp = lambda: rng.uniform(0.005, 0.04)  # noqa: E731
    # floor
    p, _ = _sample_wavy_plane(rng, counts[0], lx / 2, ly / 2, amp())
    pts_all.append(p + [lx / 2, ly / 2, 0.0])
    # four walls (x=0, x=lx, y=0, y=ly)
    wall_specs = [
        ((lx / 2, h / 2), lambda q: np.stack(
            [q[:, 0] + lx / 2, q[:, 2], q[:, 1] + h / 2], 1), 1),
        ((lx / 2, h / 2), lambda q: np.stack(
            [q[:, 0] + lx / 2, np.full(len(q), ly) + q[:, 2], q[:, 1] + h / 2],
            1), 2),
        ((ly / 2, h / 2), lambda q: np.stack(
            [q[:, 2], q[:, 0] + ly / 2, q[:, 1] + h / 2], 1), 3),
        ((ly / 2, h / 2), lambda q: np.stack(
            [np.full(len(q), lx) + q[:, 2], q[:, 0] + ly / 2, q[:, 1] + h / 2],
            1), 4),
    ]
    for (hx, hy), place, ci in wall_specs:
        p, _ = _sample_wavy_plane(rng, counts[ci], hx, hy, amp())
        pts_all.append(place(p))
    # furniture: parts at 0.3-1.2 m scale scattered in the room
    for o in range(n_objs):
        kind = rng.randint(N_PART_KINDS - 1)
        p, _ = _sample_part(rng, kind, counts[5 + o])
        scale = rng.uniform(0.4, 1.4)
        rot = _random_rotation(rng)
        off = np.array([rng.uniform(0.6, lx - 0.6),
                        rng.uniform(0.6, ly - 0.6),
                        rng.uniform(0.2, 1.2)])
        pts_all.append(p * scale @ rot.T + off)
    return np.concatenate(pts_all).astype(np.float32), (lx, ly, h)


def make_fragments(rng, room, dims, n_frags):
    """Overlapping spatial crops along a path, each in its own GT frame."""
    from regtr_tpu.core import se3_np

    lx, ly, _ = dims
    t = np.linspace(0.15, 0.85, n_frags)
    # A wandering path through the room; consecutive crops overlap.
    cx = lx * t + rng.uniform(-0.3, 0.3, n_frags)
    cy = ly * (0.5 + 0.35 * np.sin(t * np.pi * rng.uniform(0.8, 1.6)
                                   + rng.uniform(0, np.pi)))
    frags, poses = [], []
    for i in range(n_frags):
        center = np.array([cx[i], cy[i], 1.1], np.float32)
        d = np.linalg.norm(room - center, axis=1)
        keep = np.flatnonzero(d < FRAG_RADIUS)
        if len(keep) > MAX_FRAG_PTS:
            keep = rng.choice(keep, MAX_FRAG_PTS, replace=False)
        frag_world = room[keep]
        pose = se3_np.se3_init(
            se3_np.sample_uniform_rotation(rng, max_deg=50.0),
            rng.randn(3).astype(np.float32) * 0.3,
        )
        frag_local = se3_np.se3_transform(se3_np.se3_inv(pose), frag_world)
        frags.append(frag_local.astype(np.float32))
        poses.append(pose)
    return frags, poses


def overlap_fraction(src_world, tgt_world, radius=None):
    from scipy.spatial import cKDTree

    if radius is None:  # read the global at call time (testable override)
        radius = OVERLAP_RADIUS
    tree = cKDTree(tgt_world)
    d, _ = tree.query(src_world, k=1, distance_upper_bound=radius)
    return float(np.isfinite(d).mean())


def build(out, scenes_train, scenes_val, scenes_test, n_frags, seed, niter):
    import torch
    import yaml

    from regtr_tpu.core import se3_np

    out = Path(out)
    meta = out / "meta"
    meta.mkdir(parents=True, exist_ok=True)
    rng_master = np.random.RandomState(seed)

    phases = ([("train", i) for i in range(scenes_train)]
              + [("val", i) for i in range(scenes_val)]
              + [("test", i) for i in range(scenes_test)])
    infos = {ph: {"src": [], "tgt": [], "rot": [], "trans": [], "overlap": []}
             for ph in ("train", "val", "test")}
    gt_entries = {}

    for phase, si in phases:
        scene = f"synth-{phase}-{si:03d}"
        sub = "test" if phase == "test" else "train"
        sdir = out / sub / scene
        sdir.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(rng_master.randint(2 ** 31))
        room, dims = make_room_world(rng)
        frags, poses = make_fragments(rng, room, dims, n_frags)
        sizes = [len(f) for f in frags]
        keep_frag = [n >= MIN_FRAG_PTS for n in sizes]
        for i, frag in enumerate(frags):
            torch.save(torch.from_numpy(frag),
                       sdir / f"cloud_bin_{i}.pth")
        n_pairs = 0
        for i in range(n_frags):
            for j in range(i + 1, min(i + 3, n_frags)):
                if not (keep_frag[i] and keep_frag[j]):
                    continue
                # Real-data convention (tests/synth_threedmatch.py): src is
                # the HIGHER-index fragment, pose maps src frame -> tgt
                # frame (tgt = lower index).
                rel = se3_np.se3_cat(se3_np.se3_inv(poses[i]), poses[j])
                src_world = se3_np.se3_transform(poses[j], frags[j])
                tgt_world = se3_np.se3_transform(poses[i], frags[i])
                ov = overlap_fraction(src_world, tgt_world)
                if ov < MIN_OVERLAP:
                    continue
                info = infos[phase]
                info["src"].append(f"{sub}/{scene}/cloud_bin_{j}.pth")
                info["tgt"].append(f"{sub}/{scene}/cloud_bin_{i}.pth")
                info["rot"].append(rel[:3, :3])
                info["trans"].append(rel[:3, 3:4])
                info["overlap"].append(ov)
                n_pairs += 1
                if phase == "test":
                    gt_entries.setdefault(scene, []).append((i, j, rel))
        print(f"{scene}: frag sizes {min(sizes)}-{max(sizes)}, "
              f"{n_pairs} pairs", flush=True)

    for phase, fname in (("train", "train_info.pkl"),
                         ("val", "val_info.pkl"),
                         ("test", "test_3DMatch_info.pkl")):
        info = infos[phase]
        info["rot"] = np.stack(info["rot"])
        info["trans"] = np.stack(info["trans"])
        info["overlap"] = np.asarray(info["overlap"])
        with open(meta / fname, "wb") as f:
            pickle.dump(info, f)
        print(f"{fname}: {len(info['src'])} pairs", flush=True)

    for scene, entries in gt_entries.items():
        gdir = out / "benchmarks" / "3DMatch" / scene
        gdir.mkdir(parents=True, exist_ok=True)
        with open(gdir / "gt.log", "w") as f, \
                open(gdir / "gt.info", "w") as g:
            for i, j, rel in entries:
                mat = np.concatenate([rel, [[0, 0, 0, 1]]], 0)
                f.write(f"{i}\t{j}\t{n_frags}\n")
                for row in mat:
                    f.write("\t".join(f"{v:.12f}" for v in row) + "\n")
                g.write(f"{i}\t{j}\t{n_frags}\n")
                info = np.eye(6) * 100.0
                for row in info:
                    g.write("\t".join(f"{v:.12f}" for v in row) + "\n")

    # Derived config: conf/3dmatch.yaml with only root/metadata_dir/niter
    # patched (dict-level patch; everything else byte-identical semantics).
    conf_path = Path(__file__).resolve().parent.parent / "conf/3dmatch.yaml"
    with open(conf_path) as f:
        conf = yaml.safe_load(f)
    conf["dataset"]["root"] = str(out)
    conf["dataset"]["metadata_dir"] = str(meta)
    conf["train_options"]["niter"] = niter
    cfg_out = out / "3dmatch_synthroot.yaml"
    with open(cfg_out, "w") as f:
        yaml.safe_dump(conf, f, sort_keys=False)
    print(f"config written: {cfg_out}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scenes-train", type=int, default=20)
    ap.add_argument("--scenes-val", type=int, default=3)
    ap.add_argument("--scenes-test", type=int, default=2)
    ap.add_argument("--frags", type=int, default=6)
    ap.add_argument("--niter", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    build(a.out, a.scenes_train, a.scenes_val, a.scenes_test, a.frags,
          a.seed, a.niter)


if __name__ == "__main__":
    main()
