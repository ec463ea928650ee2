"""KPConv encoder backbone: walks `cfg.architecture` and stacks blocks.

Functional equivalent of KPFEncoder (/root/reference/src/models/
backbone_kpconv/kpconv.py:22-88) and KPFDecoder (:91-164, unused by RegTR
but provided for parity), over the dense masked pyramid.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn

import jax.numpy as jnp

from .blocks import ResnetBottleneckBlock, SimpleBlock, UnaryBlock, UnaryBlock2
from ..ops.kpconv import closest_pool, global_average, max_pool


def encoder_plan(cfg) -> Tuple[list, list, list]:
    """Static walk of the architecture strings.

    Returns (blocks, skip_block_idxs, skip_dims) where each entry of
    `blocks` is (name, in_dim, out_dim, radius, layer_ind).  Channel/radius
    bookkeeping mirrors KPFEncoder.__init__ (kpconv.py:27-79): `simple`
    blocks output out_dim//2; strided blocks double radius and out_dim.
    """
    r = cfg["first_subsampling_dl"] * cfg["conv_radius"]
    in_dim = cfg["in_feats_dim"]
    out_dim = cfg["first_feats_dim"]
    layer_ind = 0

    blocks, skips, skip_dims = [], [], []
    for block_i, block in enumerate(cfg["architecture"]):
        if any(tag in block for tag in ("pool", "strided", "upsample", "global")):
            skips.append(block_i)
            skip_dims.append(in_dim)
        if "upsample" in block:
            break
        blocks.append((block, in_dim, out_dim, r, layer_ind))
        in_dim = out_dim // 2 if "simple" in block else out_dim
        if "pool" in block or "strided" in block:
            layer_ind += 1
            r *= 2.0
            out_dim *= 2
    else:
        block_i = len(cfg["architecture"]) - 1
    if "upsample" not in cfg["architecture"][min(block_i, len(cfg["architecture"]) - 1)]:
        skips.append(block_i)
        skip_dims.append(in_dim)
    return blocks, skips, skip_dims


def encoder_out_dim(cfg) -> int:
    _, _, skip_dims = encoder_plan(cfg)
    return skip_dims[-1]


class KPFEncoder(nn.Module):
    """Stacks Simple/Resnet blocks; returns final features + skip features."""
    cfg: Any

    @nn.compact
    def __call__(self, x, levels):
        plan, skips, _ = encoder_plan(self.cfg)
        # Geometry is computed lazily by the FIRST conv block touching each
        # (conv/pool, level) table — fused into that block's feature gather
        # (one merged gather instead of separate coordinate + feature
        # gathers; gathers cost ~2.3 ns/row independent of row width, so the
        # merge is free bandwidth).  Later blocks at the level reuse it.
        geoms: dict = {}
        # Rematerialize each block under grad: per-block residuals (gathered
        # neighbor features etc.) at 3DMatch scale otherwise push XLA temp
        # memory to ~11 GB and the schedule collapses.  The geometry escapes
        # the remat as an explicit block output (it is shared across blocks,
        # exactly like the precomputed-geometry design it replaces).
        remat = self.cfg.get("remat", True)
        simple_cls = nn.remat(SimpleBlock) if remat else SimpleBlock
        resnet_cls = (nn.remat(ResnetBottleneckBlock) if remat
                      else ResnetBottleneckBlock)
        skip_x: List = []
        for i, (name, in_dim, out_dim, r, li) in enumerate(plan):
            if i in skips:
                skip_x.append(x)
            key = ("pool" if "strided" in name else "conv", li)
            if "simple" in name:
                x, geom = simple_cls(name, in_dim, out_dim, r, li, self.cfg,
                                     name=f"block_{i}_{name}")(
                                         x, levels, geoms)
                if geom is not None:
                    geoms[key] = geom
            elif "resnetb" in name:
                x, geom = resnet_cls(name, in_dim, out_dim, r, li, self.cfg,
                                     name=f"block_{i}_{name}")(
                                         x, levels, geoms)
                if geom is not None:
                    geoms[key] = geom
            elif name == "unary":
                x = UnaryBlock(out_dim, self.cfg.get("use_batch_norm", True),
                               name=f"block_{i}_{name}")(x, levels[li].mask)
            elif name == "unary2":
                x = UnaryBlock2(out_dim, name=f"block_{i}_{name}")(x)
            elif "max_pool" in name:
                x = max_pool(x, levels[li].pools)
            elif name == "global_average":
                x = global_average(x, levels[li].mask)
            else:
                raise ValueError(f"unsupported encoder block {name}")
        return x, skip_x


class KPFDecoder(nn.Module):
    """Nearest-upsample decoder with skip concat (parity with kpconv.py:91-164;
    RegTR itself never upsamples)."""
    cfg: Any
    skip_dims: tuple

    @nn.compact
    def __call__(self, x, skip_x, levels):
        arch = self.cfg["architecture"]
        start = next(
            (i for i, b in enumerate(arch) if "upsample" in b), len(arch)
        )
        layer_ind = sum(
            1 for b in arch[:start] if ("pool" in b or "strided" in b)
        )
        out_dim = x.shape[-1]
        skip_x = list(skip_x)
        for j, block in enumerate(arch[start:]):
            if j > 0 and "upsample" in arch[start + j - 1]:
                x = jnp.concatenate([x, skip_x.pop()], axis=-1)
            if block == "unary":
                x = UnaryBlock(out_dim, self.cfg.get("use_batch_norm", True),
                               name=f"dec_{j}_unary")(x, levels[layer_ind].mask)
            elif "upsample" in block:
                x = closest_pool(x, levels[layer_ind - 1].upsamples)
                layer_ind -= 1
                out_dim = out_dim // 2
            else:
                raise ValueError(f"unsupported decoder block {block}")
        return x

