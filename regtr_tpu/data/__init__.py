"""Data-layer factory.

Equivalent of get_dataloader (/root/reference/src/data_loaders/
__init__.py:11-58): 3DMatch gets [RigidPerturb, Jitter, ShufflePoints,
RandomSwap] at train time; ModelNet uses the noise_type pipelines; both feed
the bucketed dense collate.
"""
from __future__ import annotations

from functools import partial

from . import transforms as T
from .collate import collate_pairs, pick_bucket
from .modelnet import make_modelnet_datasets
from .prefetch import DataLoader
from .threedmatch import ThreeDMatchDataset


def _bucket_of(sample, buckets) -> int:
    n = max(sample["src_xyz"].shape[0], sample["tgt_xyz"].shape[0])
    return pick_bucket(n, buckets)


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
    # Size-grouped TEST batching: the bucketed collate pads every pair in a
    # batch to the batch max bucket, so on mixed-size data one large cloud
    # drags whole batches to the largest bucket.  Grouping same-bucket
    # samples into batches removes that cost.  Test only: the protocol is
    # per-process (no collectives mid-loop) and run_test keys all ordered
    # artifacts on sample idx, so the changed batch order is invisible.
    group_key = None
    if (phase == "test" and batch_size > 1 and cfg.get("buckets")
            and cfg.get("bucket_grouped_test", True)):
        group_key = partial(_bucket_of, buckets=cfg["buckets"])
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
        group_key=group_key,
    )
