"""Offline re-scoring of saved est.log files.

Equivalent of /root/reference/src/evaluate_3dmatch.py: evaluate an est.log
directory against the bundled 3DMatch/3DLoMatch groundtruth trajectories
with either the Predator (RMSE < 0.2 m) or DGR (<15 deg, <0.3 m) protocol.
Writes individual errors to CSV.
"""
from __future__ import annotations

import argparse
import os


def _error_table(results_dir, gt_dir):
    """Per-pair error rows (header first), mirroring the reference's
    ``individual_errors.xlsx`` (/root/reference/src/evaluate_3dmatch.py:32)."""
    import numpy as np

    from regtr_tpu.benchmark.predator import read_trajectory

    rows = [["scene", "src", "tgt", "error", "flag"]]
    for scene in sorted(os.listdir(gt_dir)):
        pairs, _ = read_trajectory(
            os.path.join(results_dir, scene, "est.log"))
        errs = np.load(os.path.join(results_dir, scene, "errors.npy"))
        flags = np.load(os.path.join(results_dir, scene, "flag.npy"))
        for (i, j, _n), e, fl in zip(pairs, errs, flags):
            rows.append([scene, int(i), int(j), float(e), int(fl)])
    return rows


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
    p.add_argument("--errors_csv", type=str,
                   help="also write per-pair transformation errors to CSV")
    p.add_argument("--errors_xlsx", type=str, default=None,
                   help="path for the per-pair error spreadsheet (default: "
                        "<results_dir>/individual_errors.xlsx, matching the "
                        "reference; pass 'none' to skip)")
    opt = p.parse_args(argv)

    gt = os.path.join(opt.gt_dir, opt.benchmark)
    if opt.method == "predator":
        from regtr_tpu.benchmark.predator import benchmark

        report, recall = benchmark(opt.results_dir, gt)
        print(report)
        print(f"Mean registration recall: {recall:.4f}")

        rows = _error_table(opt.results_dir, gt)
        if opt.errors_csv:
            import csv

            with open(opt.errors_csv, "w", newline="") as f:
                w = csv.writer(f)
                w.writerows(rows)
            print(f"wrote {opt.errors_csv}")
        xlsx_path = opt.errors_xlsx
        if xlsx_path is None:
            xlsx_path = os.path.join(opt.results_dir,
                                     "individual_errors.xlsx")
        if xlsx_path.lower() != "none":
            from regtr_tpu.utils.xlsx import write_xlsx

            write_xlsx(xlsx_path, rows, sheet_name="individual_errors")
            print(f"wrote {xlsx_path}")
    else:
        from regtr_tpu.benchmark.dgr import benchmark_dgr

        report, rate = benchmark_dgr(opt.results_dir, gt)
        print(report)
        print(f"Mean success rate: {rate:.4f}")


if __name__ == "__main__":
    main()
