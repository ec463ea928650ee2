"""Config system: two-level YAML flattened into one attribute-dict.

Same user-facing schema as the reference (/root/reference/src/utils/
misc.py:10-29 + src/conf/*.yaml): the YAML has section headers (general /
dataset / train_options / solver / kpconv_options / model / losses /
validation) whose keys are merged into a single flat namespace that every
layer reads from.  New TPU-specific keys (buckets, capacities, dtype, mesh)
live in additional sections and flatten the same way.
"""
from __future__ import annotations

import copy
from pathlib import Path

import yaml


class Config(dict):
    """dict with attribute access; raises AttributeError for missing keys."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def copy(self):
        return Config(copy.deepcopy(dict(self)))


# TPU-specific defaults, overridable from YAML (section `tpu_options`).
TPU_DEFAULTS = {
    # Point-capacity buckets for the raw input level; a cloud is padded to
    # the smallest bucket that fits (variable-size 3DMatch clouds).
    "buckets": [4096, 8192, 16384, 32768],
    # Per-level capacity decay when `level_capacities` is not given.
    "capacity_factor": 0.5,
    # Optional explicit per-level capacities (list, level 0 ignored).
    "level_capacities": None,
    # Support-tile size for the streaming neighbor search.
    "neighbor_chunk": 1024,
    # approx_min_k worst-case recall guarantee for the brute neighbor path.
    # Conservative 0.95 by default: the guarantee is distribution-dependent,
    # so an untuned dataset keeps near-exact tables.  The 3DMatch preset/YAML
    # lowers this to 0.7 (measured 7x faster on v5e with actual recall 0.990
    # vs 0.997 on real scans, end-metric deltas quantified in RESULTS.md).
    "neighbor_recall": 0.95,
    # Spatially sort clouds at pyramid entry (gather locality; deterministic).
    "sort_input": True,
    # Transformer attention implementation: 'auto' (flash Pallas kernel on
    # TPU, XLA on CPU), 'pallas', 'pallas_interpret', or 'xla'.
    "attention_impl": "auto",
    # Compute dtype for matmul-heavy ops ("float32" or "bfloat16").
    "compute_dtype": "float32",
    # Deterministic seed for kernel-point dispositions.
    "kernel_seed": 0,
    # Data-parallel mesh axis name.
    "mesh_axis": "data",
}


def load_config(path) -> Config:
    """Load a two-level YAML config into a flat Config with TPU defaults."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = Config(TPU_DEFAULTS)
    for section, entries in raw.items():
        if not isinstance(entries, dict):
            raise ValueError(f"top-level key {section} must be a section dict")
        for k, v in entries.items():
            cfg[k] = v
    cfg["config_path"] = str(Path(path).resolve())
    return cfg


def make_config(**kwargs) -> Config:
    """Programmatic config (tests, demos): TPU defaults + overrides."""
    cfg = Config(TPU_DEFAULTS)
    cfg.update(kwargs)
    return cfg

