"""Data-layer factory.

Equivalent of get_dataloader (/root/reference/src/data_loaders/
__init__.py:11-58): 3DMatch gets [RigidPerturb, Jitter, ShufflePoints,
RandomSwap] at train time; ModelNet uses the noise_type pipelines; both feed
the bucketed dense collate.
"""
from __future__ import annotations

from functools import partial

from . import transforms as T
from .collate import collate_pairs
from .modelnet import make_modelnet_datasets
from .prefetch import DataLoader
from .threedmatch import ThreeDMatchDataset


def get_dataset(cfg, phase: str):
    assert phase in ("train", "val", "test")
    name = cfg.get("dataset", "modelnet")
    if name == "3dmatch":
        if phase == "train":
            aug = T.Compose([
                T.RigidPerturb(cfg.get("perturb_pose", "small")),
                T.Jitter(scale=cfg.get("augment_noise", 0.005)),
                T.ShufflePoints(),
                T.RandomSwap(),
            ])
        else:
            aug = None
        kwargs = {}
        if cfg.get("metadata_dir"):
            kwargs["metadata_dir"] = cfg["metadata_dir"]
        return ThreeDMatchDataset(cfg, phase, transforms=aug, **kwargs)
    if name in ("modelnet", "synthetic"):
        return make_modelnet_datasets(cfg, phase)
    raise ValueError(f"unknown dataset {name!r}")


def get_dataloader(cfg, phase: str, num_workers: int = 4, shard=None):
    dataset = get_dataset(cfg, phase)
    batch_size = cfg.get(f"{phase}_batch_size", 1)
    return DataLoader(
        dataset,
        batch_size=batch_size,
        collate_fn=partial(collate_pairs, buckets=cfg.get("buckets")),
        shuffle=phase == "train",
        num_workers=num_workers,
        seed=int(cfg.get("seed", 0)),
        drop_last=phase == "train",
        shard=shard,
        # train/val run collective mesh programs per batch -> all processes
        # must see equal batch counts (an uneven shard after drop_last could
        # otherwise leave one rank with zero batches and hang the
        # collectives); test runs per-process local forwards and must NOT
        # duplicate protocol samples (see prefetch.py).
        shard_pad=phase in ("train", "val"),
        # val batches must all have the full batch shape: mesh-sharded eval
        # needs the batch axis to divide the mesh (train gets this from
        # drop_last; test runs unsharded per process).
        pad_last_batch=phase == "val",
    )
