"""Dataset-specific test protocols.

Equivalent of the test paths in GenericRegModel (/root/reference/src/models/
generic_reg_model.py:125-195):
  * 3dmatch: per-scene est.log written in Redwood format, then registration
    recall via the Predator protocol against the bundled gt trajectories.
  * modelnet: DCP/RPMNet pose metrics + Chamfer, poses saved to
    pred_transforms.npy.
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from .benchmark import modelnet as bm_modelnet
from .benchmark import predator as bm_predator
from .benchmark.predator import write_est_log
from .core import se3_np
from .train.steps import make_forward

logger = logging.getLogger("regtr_tpu")

DEFAULT_GT_BENCHMARK_DIR = "/root/reference/src/datasets/3dmatch/benchmarks"


def _pose_to_4x4(pose_3x4):
    return np.concatenate(
        [np.asarray(pose_3x4, np.float64), [[0.0, 0.0, 0.0, 1.0]]], axis=0
    )


def merge_est_log_dirs(rank_dirs, merged_dir):
    """Concatenate per-rank est.log trees into one (multi-host test
    protocol: each process evaluates its loader shard and writes
    `est_rank{r}/<benchmark>/<scene>/est.log`; rank 0 merges before running
    the Predator benchmark).  Pair order within a scene is irrelevant to the
    Redwood-format reader."""
    merged_dir = Path(merged_dir)
    scenes: dict = {}
    missing = [str(rd) for rd in rank_dirs if not Path(rd).exists()]
    if missing:
        # A missing rank tree means the hosts don't share a filesystem (or a
        # rank died before writing): scoring the remainder would silently
        # report recall on a subset of pairs masquerading as a full result.
        raise FileNotFoundError(
            f"est.log merge expected {len(rank_dirs)} rank directories but "
            f"{len(missing)} are missing: {missing}. All hosts must write to "
            "a shared filesystem (or copy rank trees to rank 0) before "
            "scoring."
        )
    for rd in rank_dirs:
        rd = Path(rd)
        for scene_dir in sorted(p for p in rd.iterdir() if p.is_dir()):
            src = scene_dir / "est.log"
            if src.exists():
                scenes.setdefault(scene_dir.name, []).append(src.read_text())
    for scene, texts in scenes.items():
        dst_dir = merged_dir / scene
        dst_dir.mkdir(parents=True, exist_ok=True)
        # write-once ("w"): appending would double-count pairs if the
        # out_dir already held a previous run's merged est.log
        (dst_dir / "est.log").write_text("".join(texts))


def _allgather_ragged(arr):
    """All-gather a per-process array whose leading dim differs by process.

    Pads axis 0 to the global max (two fixed-shape allgathers), then strips
    the padding.  Returns the concatenation over processes, in rank order.
    """
    from jax.experimental import multihost_utils

    arr = np.asarray(arr, np.float64)
    if arr.ndim == 0:
        arr = arr[None]
    ns = np.asarray(
        multihost_utils.process_allgather(np.asarray([arr.shape[0]]))
    ).reshape(-1)
    m = int(ns.max())
    padded = np.full((m,) + arr.shape[1:], np.nan)
    padded[: arr.shape[0]] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[p, : ns[p]] for p in range(gathered.shape[0])], axis=0
    )


def run_test(cfg, model, params, test_loader, out_dir, mesh=None,
             gt_benchmark_dir=DEFAULT_GT_BENCHMARK_DIR):
    """Run the full test protocol; returns a dict of summary results.

    Multi-host: the caller shards the test loader by process (test.py); this
    function all-gathers the per-pair errors, merges per-rank est.log trees,
    and only process 0 runs the benchmark scoring.
    """
    import jax

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fwd = make_forward(model, mesh=mesh)
    dataset_name = cfg.get("dataset", "modelnet")
    benchmark = cfg.get("benchmark", "3DMatch")
    proc, nproc = jax.process_index(), jax.process_count()
    est_root = out_dir if nproc == 1 else out_dir / f"est_rank{proc}"

    rot_errs, trans_errs = [], []
    mn_metrics, mn_poses, mn_idx = [], [], []

    import jax.numpy as jnp

    for batch, meta in test_loader:
        out = fwd(params, jnp.asarray(batch["points"]),
                  jnp.asarray(batch["mask"]))
        pose_final = np.asarray(out["pose"][-1])      # (B, 3, 4)
        err = se3_np.se3_compare(pose_final, batch["pose"])
        rot_errs.extend(err["rot_deg"].tolist())
        trans_errs.extend(err["trans"].tolist())

        if dataset_name == "3dmatch":
            for b in range(pose_final.shape[0]):
                src_path = meta["src_path"][b]
                tgt_path = meta["tgt_path"][b]
                # Scene = the directory containing the cloud file; robust to
                # any `<...>/<scene>/cloud_bin_N.pth` layout (the reference
                # hardcodes path component [1], generic_reg_model.py:266).
                scene = Path(src_path).parent.name
                src_idx = int(
                    os.path.basename(src_path).split("_")[-1].replace(".pth", "")
                )
                tgt_idx = int(
                    os.path.basename(tgt_path).split("_")[-1].replace(".pth", "")
                )
                scene_dir = est_root / benchmark / scene
                scene_dir.mkdir(parents=True, exist_ok=True)
                write_est_log(
                    scene_dir / "est.log", tgt_idx, src_idx,
                    _pose_to_4x4(pose_final[b]),
                )
        elif dataset_name in ("modelnet", "synthetic"):
            data = {
                "points_src": _ragged_valid(batch, 0),
                "points_ref": _ragged_valid(batch, 1),
                "points_raw": meta["tgt_raw"],
                "transform_gt": batch["pose"],
            }
            mn_metrics.append(_modelnet_metrics_ragged(data, pose_final))
            mn_poses.append(pose_final)
            # Dataset indices: batches may arrive size-grouped (out of
            # dataset order); ordered artifacts are re-sorted by idx below.
            mn_idx.extend(int(i) for i in meta.get(
                "idx", range(len(mn_idx), len(mn_idx) + pose_final.shape[0])
            ))

    if nproc > 1:
        from jax.experimental import multihost_utils

        rot_errs = _allgather_ragged(rot_errs).tolist()
        trans_errs = _allgather_ragged(trans_errs).tolist()
        multihost_utils.sync_global_devices("regtr_est_logs_written")
        if proc == 0 and dataset_name == "3dmatch":
            merge_est_log_dirs(
                [out_dir / f"est_rank{r}" / benchmark for r in range(nproc)],
                out_dir / benchmark,
            )

    results = {
        "rot_err_deg_mean": float(np.mean(rot_errs)),
        "trans_err_mean": float(np.mean(trans_errs)),
        "reg_success": float(np.mean(
            (np.array(rot_errs) < cfg.get("reg_success_thresh_rot", 10))
            & (np.array(trans_errs) < cfg.get("reg_success_thresh_trans", 0.1))
        )),
    }

    if dataset_name == "3dmatch":
        gt_dir = os.path.join(gt_benchmark_dir, benchmark)
        if proc != 0:
            pass  # only rank 0 scores the merged est.log tree
        elif os.path.exists(gt_dir):
            report, recall = bm_predator.benchmark(
                str(out_dir / benchmark), gt_dir
            )
            logger.info("\n%s", report)
            results["registration_recall"] = recall
            (out_dir / "benchmark_report.txt").write_text(report)
        else:
            logger.warning("GT benchmark dir %s missing; recall skipped", gt_dir)
    elif dataset_name in ("modelnet", "synthetic"):
        # Collectives below must run on EVERY process, including one whose
        # test shard was empty — it contributes zero-length arrays.
        keys = mn_metrics[0].keys() if mn_metrics else bm_modelnet.METRIC_KEYS
        cat = {
            k: (np.concatenate([m[k] for m in mn_metrics]) if mn_metrics
                else np.zeros((0,), np.float64))
            for k in keys
        }
        poses = (np.concatenate(mn_poses) if mn_poses
                 else np.zeros((0, 3, 4), np.float64))
        idxs = np.asarray(mn_idx, np.int64)
        if nproc > 1:
            cat = {k: _allgather_ragged(v) for k, v in cat.items()}
            poses = _allgather_ragged(poses)
            idxs = _allgather_ragged(idxs).astype(np.int64)
        if len(poses):
            # Restore dataset order (size-grouped test batches arrive out of
            # order; pred_transforms.npy row i must be dataset sample i).
            order = np.argsort(idxs, kind="stable")
            poses = poses[order]
            cat = {k: v[order] for k, v in cat.items()}
            summary = bm_modelnet.summarize_metrics(cat)
            bm_modelnet.print_metrics(logger, summary)
            results.update(summary)
            if proc == 0:
                np.save(out_dir / "pred_transforms.npy", poses)

    return results


def _ragged_valid(batch, which):
    """Extract per-pair valid clouds (list of (Ni, 3)) for src (0) / tgt (1)."""
    pts, mask = batch["points"], batch["mask"]
    out = []
    for i in range(pts.shape[0] // 2):
        slot = 2 * i + which
        out.append(np.asarray(pts[slot][mask[slot]]))
    return out


def _modelnet_metrics_ragged(data, pose_final):
    """ModelNet metrics over possibly ragged per-pair clouds: pad each pair
    to its own shapes by evaluating pairs independently."""
    n = pose_final.shape[0]
    per_pair = []
    for b in range(n):
        d = {
            "points_src": data["points_src"][b][None],
            "points_ref": data["points_ref"][b][None],
            "points_raw": np.asarray(data["points_raw"][b])[None],
            "transform_gt": np.asarray(data["transform_gt"][b])[None],
        }
        per_pair.append(bm_modelnet.compute_metrics(d, pose_final[b][None]))
    return {
        k: np.concatenate([p[k] for p in per_pair]) for k in per_pair[0]
    }
