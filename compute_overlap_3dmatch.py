"""Offline precompute of 3DMatch groundtruth overlap masks.

Equivalent of /root/reference/src/data_processing/compute_overlap_3dmatch.py:
writes {phase}_pairs-overlapmask.h5 with per-pair src/tgt overlap masks and
mutual correspondences, so training-time loading skips the KD-tree search.
Uses the native C++ library when available.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="3DMatch data root")
    p.add_argument("--phase", default="train", choices=["train", "val"])
    p.add_argument(
        "--metadata_dir",
        default="/root/reference/src/datasets/3dmatch",
    )
    p.add_argument("--overlap_radius", type=float, default=0.0375)
    opt = p.parse_args(argv)

    import h5py
    import torch

    from regtr_tpu import native_bindings as nb
    from regtr_tpu.core import se3_np

    with open(os.path.join(opt.metadata_dir, f"{opt.phase}_info.pkl"), "rb") as f:
        infos = pickle.load(f)

    out_path = os.path.join(opt.root, f"{opt.phase}_pairs-overlapmask.h5")
    n = len(infos["rot"])
    with h5py.File(out_path, "w") as h5:
        for i in range(n):
            pose = se3_np.se3_init(
                infos["rot"][i].astype(np.float32),
                infos["trans"][i].astype(np.float32),
            )
            src = np.asarray(torch.load(
                os.path.join(opt.root, infos["src"][i]), weights_only=False
            ), np.float32)
            tgt = np.asarray(torch.load(
                os.path.join(opt.root, infos["tgt"][i]), weights_only=False
            ), np.float32)
            src_mask, tgt_mask, corr = nb.compute_overlap(
                se3_np.se3_transform(pose, src), tgt, opt.overlap_radius
            )
            grp = h5.create_group(f"pair_{i:06d}")
            grp.create_dataset("src_mask", data=src_mask)
            grp.create_dataset("tgt_mask", data=tgt_mask)
            grp.create_dataset("src_tgt_corr", data=corr)
            if i % 500 == 0:
                print(f"{i}/{n}", flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
