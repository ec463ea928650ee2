"""KPConv pyramid preprocessing: the jit-compiled, shape-static equivalent of
the reference's Preprocessor/PreprocessorGPU
(/root/reference/src/models/backbone_kpconv/kpconv.py:291-537).

The reference walks `cfg.architecture`, and at each "layer" (group of blocks
ending in a strided block) computes:
  * conv neighbor indices at radius r among the current level's points,
  * on stride: grid-subsampled next-level points at dl = 2 r / conv_radius,
    pool indices (next-level queries into current-level supports, radius r),
    and upsample indices (current-level queries into next-level supports,
    radius 2 r).
We reproduce that walk once at *trace time* (it depends only on config), and
emit fixed-shape dense arrays per level instead of packed ragged stacks.

Layout: every array carries a leading cloud-batch axis (2B clouds for B
pairs: sources then targets), each level has a static point capacity and a
static neighbor count K, and validity masks replace `stack_lengths`.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .neighbors import radius_neighbors_batch
from .subsample import grid_subsample_batch


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static shape/radius schedule for the preprocessing pyramid.

    All entries are per pyramid level (length = num_levels).
    """
    radii: tuple            # conv radius per level
    voxel_sizes: tuple      # subsample dl used to *produce* each level
                            # (level 0 entry = dataset's base resolution, unused)
    capacities: tuple       # static max points per level
    neighbor_ks: tuple      # static max neighbors per level

    @property
    def num_levels(self) -> int:
        return len(self.radii)


def count_pyramid_levels(architecture: Sequence[str]) -> int:
    levels = 1
    for block in architecture:
        if "global" in block or "upsample" in block:
            break
        if "pool" in block or "strided" in block:
            levels += 1
    return levels


def make_pyramid_spec(cfg, n0_capacity: int) -> PyramidSpec:
    """Build the static pyramid schedule from a flat config.

    Capacities: `cfg.level_capacities` if provided (list, level 0 entry is
    overridden by n0_capacity), else a geometric schedule with
    `cfg.capacity_factor` (default 0.5) per level.
    """
    num_levels = count_pyramid_levels(cfg["architecture"])
    r = float(cfg["first_subsampling_dl"]) * float(cfg["conv_radius"])
    radii, voxels = [], [float(cfg["first_subsampling_dl"])]
    for _ in range(num_levels):
        radii.append(r)
        voxels.append(2.0 * r / float(cfg["conv_radius"]))
        r *= 2.0
    voxels = voxels[:num_levels]

    if cfg.get("level_capacities"):
        caps = list(cfg["level_capacities"])
        if len(caps) != num_levels:
            raise ValueError(
                f"level_capacities has {len(caps)} entries, need {num_levels}"
            )
        caps[0] = n0_capacity
    else:
        factor = float(cfg.get("capacity_factor", 0.5))
        caps = [n0_capacity]
        for _ in range(num_levels - 1):
            caps.append(max(16, int(-(-caps[-1] * factor // 1))))
    # Round capacities up to a multiple of 8 for TPU-friendly tiling.
    caps = [((c + 7) // 8) * 8 for c in caps]
    caps[0] = n0_capacity

    limits = list(cfg["neighborhood_limits"])
    if len(limits) < num_levels:
        limits = limits + [limits[-1]] * (num_levels - len(limits))

    return PyramidSpec(
        radii=tuple(radii),
        voxel_sizes=tuple(voxels),
        capacities=tuple(caps),
        neighbor_ks=tuple(int(k) for k in limits[:num_levels]),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PyramidLevel:
    points: jnp.ndarray          # (B, N_l, 3)
    mask: jnp.ndarray            # (B, N_l) bool
    neighbors: jnp.ndarray       # (B, N_l, K_l) int32; shadow = N_l
    pools: Optional[jnp.ndarray] = None      # (B, N_{l+1}, K_l); shadow = N_l
    upsamples: Optional[jnp.ndarray] = None  # (B, N_l, K_l); shadow = N_{l+1}
    perm: Optional[jnp.ndarray] = None       # (B, N_l) input->sorted order
                                             # (level 0 only, when sorted)


def spatial_sort(points, mask, voxel_size):
    """Sort each cloud by voxel key (z-major spatial order).

    Downstream neighbor gathers then hit HBM with spatial locality: a query's
    neighbors sit in nearby rows, so gather transactions coalesce.  Masked
    points sort to the end (their key is the int32 sentinel) but keep their
    mask bit.  Deterministic (stable argsort over identical keys).
    """
    from .subsample import voxel_keys

    keys = jax.vmap(voxel_keys, (0, 0, None))(points, mask, voxel_size)
    perm = jnp.argsort(keys, axis=1).astype(jnp.int32)
    from .kpconv import batched_row_gather

    pts = batched_row_gather(points, perm)
    msk = jnp.take_along_axis(mask, perm, axis=1)
    return pts, msk, perm


def build_pyramid(points, mask, spec: PyramidSpec, chunk: int = 1024,
                  method: str = "brute", cell_cap: int = 32,
                  recall_target: float = 0.95, sort_input: bool = True,
                  ) -> List[PyramidLevel]:
    """Compute the full multi-level preprocessing pyramid on device.

    Args:
        points: (B, N0, 3) dense padded clouds (B = 2 * num_pairs).
        mask: (B, N0) validity.
        spec: static shape/radius schedule.
        sort_input: spatially sort the level-0 cloud first (levels >= 1 are
            already voxel-key-sorted by the subsampler).  The permutation is
            stored on level 0 as `perm` so callers can realign per-point
            labels (see RegTR.compute_loss).

    Returns:
        List of PyramidLevel, length spec.num_levels.  The last level has no
        pools/upsamples.
    """
    perm = None
    if sort_input:
        points, mask, perm = spatial_sort(points, mask, spec.voxel_sizes[0])
    levels: List[PyramidLevel] = []
    cur_pts, cur_mask = points, mask
    for li in range(spec.num_levels):
        r = spec.radii[li]
        k = spec.neighbor_ks[li]
        neigh = radius_neighbors_batch(
            cur_pts, cur_mask, cur_pts, cur_mask, r, k, chunk=chunk,
            method=method, cell_cap=cell_cap, recall_target=recall_target,
        )
        level = PyramidLevel(points=cur_pts, mask=cur_mask, neighbors=neigh,
                             perm=perm if li == 0 else None)

        if li + 1 < spec.num_levels:
            dl = spec.voxel_sizes[li + 1]
            nxt_pts, nxt_mask, _ = grid_subsample_batch(
                cur_pts, cur_mask, dl, spec.capacities[li + 1]
            )
            level.pools = radius_neighbors_batch(
                nxt_pts, nxt_mask, cur_pts, cur_mask, r, k, chunk=chunk,
                method=method, cell_cap=cell_cap, recall_target=recall_target,
            )
            level.upsamples = radius_neighbors_batch(
                cur_pts, cur_mask, nxt_pts, nxt_mask, 2.0 * r, k, chunk=chunk,
                method=method, cell_cap=cell_cap, recall_target=recall_target,
            )
            cur_pts, cur_mask = nxt_pts, nxt_mask

        levels.append(level)
    return levels


def compute_overlap_pyramid(overlap0, levels: List[PyramidLevel]):
    """Propagate per-point groundtruth overlap scores down the pyramid.

    Equivalent to /root/reference/src/models/backbone_kpconv/kpconv.py:540-566:
    average-pool the previous level's overlap over the pool indices, counting
    only valid (non-shadow) entries, then clamp to [0, 1].

    Args:
        overlap0: (B, N0) float overlap labels at the finest level.
        levels: pyramid from build_pyramid.

    Returns:
        List of (B, N_l) float arrays, one per level.
    """
    out = [overlap0]
    cur = overlap0
    for li in range(len(levels) - 1):
        pools = levels[li].pools                      # (B, N_next, K)
        n_cur = levels[li].points.shape[1]
        valid = pools < n_cur
        safe_idx = jnp.where(valid, pools, 0)
        b, n_next, k = pools.shape
        from .kpconv import batched_row_gather

        gathered = batched_row_gather(
            cur[..., None], safe_idx.reshape(b, n_next * k)
        ).reshape(b, n_next, k)
        gathered = jnp.where(valid, gathered, 0.0)
        denom = jnp.maximum(jnp.sum(valid, axis=-1), 1)
        nxt = jnp.clip(jnp.sum(gathered, axis=-1) / denom, 0.0, 1.0)
        nxt = jnp.where(levels[li + 1].mask, nxt, 0.0)
        out.append(nxt)
        cur = nxt
    return out
