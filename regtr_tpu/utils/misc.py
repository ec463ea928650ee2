"""Small host-side helpers.

Equivalents of /root/reference/src/cvhelpers/torch_helpers.py:26-95
(all_to_device / to_numpy / all_isfinite / setup_seed) and
/root/reference/src/utils/misc.py:100-114 (metrics_to_string,
stack_lengths_to_batch_indices) for the JAX world.
"""
from __future__ import annotations

import random
from typing import Any

import numpy as np


def to_numpy(tree: Any):
    """Recursively convert arrays (jax or torch) in nested containers."""
    import jax

    def conv(x):
        if hasattr(x, "detach"):  # torch tensor
            return x.detach().cpu().numpy()
        if hasattr(x, "device_buffer") or hasattr(x, "addressable_data") or \
                type(x).__module__.startswith("jax"):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(conv, tree)


def all_to_device(tree: Any, device):
    """Move every array of a nested structure onto `device`."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device), tree
    )


def all_isfinite(tree: Any) -> bool:
    import jax

    return all(
        bool(np.all(np.isfinite(np.asarray(leaf))))
        for leaf in jax.tree_util.tree_leaves(tree)
        if np.asarray(leaf).dtype.kind == "f"
    )


def setup_seed(seed: int, cudnn_deterministic: bool = True):
    """Seed every host RNG (device-side randomness in JAX is explicit)."""
    random.seed(seed)
    np.random.seed(seed)


def metrics_to_string(metrics: dict, prefix: str = "") -> str:
    parts = []
    for k in sorted(metrics):
        v = metrics[k]
        arr = np.asarray(v)
        if arr.ndim == 0:
            parts.append(f"{k}: {float(arr):.4g}")
    return (prefix + " " if prefix else "") + " | ".join(parts)


def lengths_to_batch_indices(lengths) -> np.ndarray:
    """[3, 2] -> [0, 0, 0, 1, 1] (stack_lengths_to_batch_indices parity)."""
    return np.repeat(np.arange(len(lengths)), np.asarray(lengths))
