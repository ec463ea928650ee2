"""Programmatic config presets backed by the shipped YAMLs.

The YAML files under conf/ are the single source of truth for every
hyperparameter (reference schema: /root/reference/src/conf/*.yaml plus our
`tpu_options` section); these helpers load them for callers that want a
Config without knowing the file layout (tests, bench.py, the driver entry).
`tests/test_core.py::test_presets_match_yaml` pins the equivalence so bench
numbers always describe the trained configs.
"""
from __future__ import annotations

from pathlib import Path

from .config import Config, load_config

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"


def _load(name: str, **overrides) -> Config:
    cfg = load_config(CONF_DIR / f"{name}.yaml")
    cfg.update(overrides)
    return cfg


def threedmatch_config(**overrides) -> Config:
    return _load("3dmatch", **overrides)


def modelnet_config(**overrides) -> Config:
    return _load("modelnet", **overrides)


def tiny_config(**overrides) -> Config:
    """Small fast config for tests and multi-chip dry runs."""
    cfg = modelnet_config(
        first_feats_dim=64,
        d_embed=64,
        nhead=4,
        d_feedforward=128,
        num_encoder_layers=2,
        neighborhood_limits=[12, 12],
        overlap_loss_on=[1], feature_loss_on=[1], corr_loss_on=[1],
        capacity_factor=0.8,
        neighbor_chunk=256,
    )
    cfg.update(overrides)
    return cfg
