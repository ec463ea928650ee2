"""Offline re-scoring of saved est.log files.

Equivalent of /root/reference/src/evaluate_3dmatch.py: evaluate an est.log
directory against the bundled 3DMatch/3DLoMatch groundtruth trajectories
with either the Predator (RMSE < 0.2 m) or DGR (<15 deg, <0.3 m) protocol.
Writes individual errors to CSV.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("results_dir", type=str,
                   help="Directory containing <scene>/est.log files")
    p.add_argument("--benchmark", type=str, default="3DMatch",
                   choices=["3DMatch", "3DLoMatch"])
    p.add_argument("--method", type=str, default="predator",
                   choices=["predator", "dgr"])
    p.add_argument(
        "--gt_dir", type=str,
        default="/root/reference/src/datasets/3dmatch/benchmarks",
    )
    opt = p.parse_args(argv)

    gt = os.path.join(opt.gt_dir, opt.benchmark)
    if opt.method == "predator":
        from regtr_tpu.benchmark.predator import benchmark

        report, recall = benchmark(opt.results_dir, gt)
        print(report)
        print(f"Mean registration recall: {recall:.4f}")
    else:
        from regtr_tpu.benchmark.dgr import benchmark_dgr

        report, rate = benchmark_dgr(opt.results_dir, gt)
        print(report)
        print(f"Mean success rate: {rate:.4f}")


if __name__ == "__main__":
    main()
