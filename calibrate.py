"""Calibration CLI: measure the static shape schedule for a dataset and
write it back into the config YAML.

TPU-native equivalent of the reference's calibrate_neighbors
(/root/reference/src/models/backbone_kpconv/kpconv.py:702-734), which runs
implicitly at loader construction.  Here the shape schedule must be STATIC
(XLA compiles one program per bucket), so calibration is an explicit
offline step whose outputs are persisted into the YAML:

  * kpconv_options.neighborhood_limits  — per-level K covering keep_ratio
    of all neighbors (undersized K silently truncates neighborhoods via
    shadow indices; oversized K wastes gather bandwidth);
  * tpu_options.level_capacities        — max points per pyramid level;
  * tpu_options.cell_capacity           — max supports per grid cell.

Usage:
  python calibrate.py --config conf/3dmatch.yaml [--output conf/3dmatch.yaml]
      [--phase train] [--num_samples 50] [--keep_ratio 0.8] [--dry-run]
"""
from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Calibrate static shapes (neighbor K, level capacities)"
    )
    p.add_argument("--config", required=True, help="Config YAML to calibrate")
    p.add_argument("--output", default=None,
                   help="Where to write the updated YAML "
                        "(default: in-place over --config)")
    p.add_argument("--phase", default="train",
                   choices=["train", "val", "test"])
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--keep_ratio", type=float, default=0.8)
    p.add_argument("--safety", type=float, default=1.15)
    p.add_argument("--dry-run", action="store_true",
                   help="Print the suggestions without writing the YAML")
    return p.parse_args(argv)


def update_yaml(raw: dict, result: dict) -> dict:
    """Fold calibration results into a two-level raw-YAML dict (in place).

    neighborhood_limits belongs to the section that already defines it
    (kpconv_options in the shipped schema); capacities go to tpu_options.
    """
    target = None
    for section, entries in raw.items():
        if isinstance(entries, dict) and "neighborhood_limits" in entries:
            target = section
            break
    raw.setdefault("kpconv_options", {})
    raw[target or "kpconv_options"]["neighborhood_limits"] = \
        result["neighborhood_limits"]
    tpu = raw.setdefault("tpu_options", {})
    tpu["level_capacities"] = result["level_capacities"]
    tpu["cell_capacity"] = result["cell_capacity"]
    return raw


def main(argv=None):
    opt = parse_args(argv)

    import yaml

    from regtr_tpu.config import load_config
    from regtr_tpu.data import get_dataset
    from regtr_tpu.data.calibrate import calibrate

    cfg = load_config(opt.config)
    dataset = get_dataset(cfg, opt.phase)
    result = calibrate(
        dataset, cfg, num_samples=opt.num_samples,
        keep_ratio=opt.keep_ratio, safety=opt.safety,
    )
    print(f"calibrated over {result['num_samples']} samples "
          f"({opt.phase}):", file=sys.stderr)
    print(f"  neighborhood_limits: {result['neighborhood_limits']}",
          file=sys.stderr)
    print(f"  level_capacities:    {result['level_capacities']}",
          file=sys.stderr)
    print(f"  cell_capacity:       {result['cell_capacity']}",
          file=sys.stderr)

    if opt.dry_run:
        print(yaml.safe_dump(
            {"tpu_options": {
                "level_capacities": result["level_capacities"],
                "cell_capacity": result["cell_capacity"]},
             "kpconv_options": {
                "neighborhood_limits": result["neighborhood_limits"]}},
            default_flow_style=None))
        return result

    with open(opt.config) as f:
        raw = yaml.safe_load(f)
    update_yaml(raw, result)
    out_path = opt.output or opt.config
    with open(out_path, "w") as f:
        yaml.safe_dump(raw, f, default_flow_style=None, sort_keys=False)
    print(f"wrote {out_path}", file=sys.stderr)
    return result


if __name__ == "__main__":
    main()
