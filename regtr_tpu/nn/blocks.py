"""KPConv block zoo as flax modules over the dense masked layout.

Functional equivalents of /root/reference/src/models/backbone_kpconv/
kpconv_blocks.py:429-787 (block_decider, BatchNormBlock, UnaryBlock,
SimpleBlock, ResnetBottleneckBlock, pooling blocks), redesigned for
(B, N, C)+mask tensors instead of packed stacks.

Norm semantics: `use_batch_norm: True` in the reference actually applies
*per-cloud InstanceNorm1d* (no affine parameters) via stack-length slicing
(kpconv_blocks.py:510-519); here that is a masked instance norm.  With
use_batch_norm False it degrades to a learned bias.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.masking import masked_instance_norm
from ..ops.kpconv import (
    kpconv_apply, kpconv_deformable, kpconv_fused_gather, max_pool,
)
from ..utils.kernel_points import load_kernel_points


def _compute_dtype(cfg):
    return jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None

LEAKY_SLOPE = 0.1


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class NormBlock(nn.Module):
    """Masked per-cloud instance norm (use_bn) or learned bias."""
    dim: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, mask):
        if self.use_bn:
            return masked_instance_norm(x, mask)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return x + bias


class UnaryBlock2(nn.Module):
    """Plain 2-layer MLP block (reference kpconv_blocks.py:569-587)."""
    out_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.relu(nn.Dense(x.shape[-1], name="mlp0")(x))
        return nn.Dense(self.out_dim, name="mlp1")(h)


class UnaryBlock(nn.Module):
    """Linear (no bias) -> norm -> LeakyReLU(0.1)."""
    out_dim: int
    use_bn: bool = True
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_dim, use_bias=False, name="mlp")(x)
        x = NormBlock(self.out_dim, self.use_bn, name="norm")(x, mask)
        if not self.no_relu:
            x = leaky_relu(x)
        return x


class KPConvLayer(nn.Module):
    """The KPConv op with its trainable (P, Cin, Cout) weights and fixed
    deterministic kernel-point dispositions."""
    num_kernel_points: int
    in_dim: int
    out_dim: int
    extent: float
    radius: float
    influence: str = "linear"
    aggregation: str = "sum"
    fixed: str = "center"
    kernel_seed: int = 0
    compute_dtype: Any = None
    norm: str = "valid"     # "legacy" = reference's positive-feature-sum count
    deformable: bool = False
    modulated: bool = False
    kernel_method: str = "lloyd"      # or "repulsion" (reference layout)
    kernel_file: Optional[str] = None  # per-block dispositions npz override

    def _kernel_points(self):
        """Resolve this block's kernel disposition: explicit npz override
        (exported from a torch checkpoint for bit-exact conversion), else
        the deterministic generator."""
        if self.kernel_file:
            from ..utils.kernel_points import lookup_block_dispositions

            try:
                path = self.path
            except Exception:
                path = ()
            idx = next(
                (int(part.split("_")[1]) for part in path
                 if str(part).startswith("block_")), None,
            )
            if idx is not None:
                disp = lookup_block_dispositions(self.kernel_file, idx)
                if disp is not None:
                    return jnp.asarray(disp)   # stored pre-scaled by radius
        return jnp.asarray(load_kernel_points(
            self.radius, self.num_kernel_points, 3, self.fixed,
            self.kernel_seed, self.kernel_method,
        ))

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, geom=None, x_extra=None):
        """Returns (out, maxpool_of_x_extra_or_None, geom_or_None).

        With `geom` given, reuses the precomputed influence tensor (feature
        gather only).  Without it, runs the fused single-gather path
        (features + optional shortcut + coordinates in one gather,
        ops/kpconv.py kpconv_fused_gather) and returns the geometry for
        reuse by later blocks at the same level.
        """
        p = self.num_kernel_points
        # torch kaiming_uniform(a=sqrt(5)) on (P, Cin, Cout) gives
        # U(+-1/sqrt(Cin*Cout)); we use fan_in = P*Cin which is the
        # mathematically appropriate fan for this contraction.
        bound = 1.0 / np.sqrt(p * self.in_dim)
        weights = self.param(
            "weights",
            lambda key, shape: nn.initializers.uniform(scale=2 * bound)(
                key, shape
            ) - bound,
            (p, self.in_dim, self.out_dim),
        )
        if self.deformable:
            # Deformable kernels are per-query, so the shared rigid geometry
            # cannot be reused (kpconv_blocks.py:275-356).
            kp = self._kernel_points()
            offset_dim = (3 + int(self.modulated)) * p
            off_bound = 1.0 / np.sqrt(p * self.in_dim)
            offset_weights = self.param(
                "offset_weights",
                lambda key, shape: nn.initializers.uniform(
                    scale=2 * off_bound)(key, shape) - off_bound,
                (p, self.in_dim, offset_dim),
            )
            offset_bias = self.param(
                "offset_bias", nn.initializers.zeros, (offset_dim,)
            )
            out = kpconv_deformable(
                q_pts, s_pts, neighb_inds, x, kp, weights,
                offset_weights, offset_bias, self.extent,
                influence=self.influence, aggregation=self.aggregation,
                modulated=self.modulated, compute_dtype=self.compute_dtype,
                norm=self.norm,
            )
            pooled = (max_pool(x_extra, neighb_inds,
                               compute_dtype=self.compute_dtype)
                      if x_extra is not None else None)
            return out, pooled, None
        if geom is not None:
            infl, inv_n = geom
            out = kpconv_apply(
                infl, inv_n, neighb_inds, x, weights,
                compute_dtype=self.compute_dtype, norm=self.norm,
            )
            pooled = (max_pool(x_extra, neighb_inds,
                               compute_dtype=self.compute_dtype)
                      if x_extra is not None else None)
            return out, pooled, None
        kp = self._kernel_points()
        return kpconv_fused_gather(
            q_pts, s_pts, neighb_inds, x, x_extra, kp, weights, self.extent,
            influence=self.influence, aggregation=self.aggregation,
            compute_dtype=self.compute_dtype, norm=self.norm,
        )


class SimpleBlock(nn.Module):
    """KPConv(out/2) -> norm -> LeakyReLU.

    Mirrors kpconv_blocks.py:590-646 (output dim is out_dim//2; the
    follow-on block's in_dim accounting matches KPFEncoder)."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: Any

    @nn.compact
    def __call__(self, x, levels, geoms=None):
        cfg = self.cfg
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        strided = "strided" in self.block_name
        lvl = levels[self.layer_ind]
        if strided:
            q_lvl = levels[self.layer_ind + 1]
            q_pts, neigh, out_mask = q_lvl.points, lvl.pools, q_lvl.mask
        else:
            q_pts, neigh, out_mask = lvl.points, lvl.neighbors, lvl.mask
        key = ("pool" if strided else "conv", self.layer_ind)
        geom = None if geoms is None else geoms.get(key)
        out, _, new_geom = KPConvLayer(
            cfg["num_kernel_points"], self.in_dim, self.out_dim // 2,
            extent, self.radius,
            influence=cfg.get("KP_influence", "linear"),
            aggregation=cfg.get("aggregation_mode", "sum"),
            fixed=cfg.get("fixed_kernel_points", "center"),
            kernel_seed=cfg.get("kernel_seed", 0),
            compute_dtype=_compute_dtype(cfg),
            norm=cfg.get("kpconv_norm", "valid"),
            deformable="deform" in self.block_name,
            modulated=bool(cfg.get("modulated", False)),
            kernel_method=cfg.get("kernel_point_method", "lloyd"),
            kernel_file=cfg.get("kernel_dispositions_file"),
            name="kpconv",
        )(q_pts, lvl.points, neigh, x, geom=geom)
        out = NormBlock(self.out_dim // 2, cfg.get("use_batch_norm", True),
                        name="norm")(out, out_mask)
        return leaky_relu(out), new_geom


class ResnetBottleneckBlock(nn.Module):
    """unary(out/4) -> KPConv -> norm/relu -> unary(out) + shortcut.

    Mirrors kpconv_blocks.py:649-741."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: Any

    @nn.compact
    def __call__(self, x, levels, geoms=None):
        cfg = self.cfg
        use_bn = cfg.get("use_batch_norm", True)
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        strided = "strided" in self.block_name
        lvl = levels[self.layer_ind]
        in_mask = lvl.mask
        if strided:
            q_lvl = levels[self.layer_ind + 1]
            q_pts, neigh, out_mask = q_lvl.points, lvl.pools, q_lvl.mask
        else:
            q_pts, neigh, out_mask = lvl.points, lvl.neighbors, lvl.mask
        key = ("pool" if strided else "conv", self.layer_ind)
        geom = None if geoms is None else geoms.get(key)

        mid = self.out_dim // 4
        if self.in_dim != mid:
            h = UnaryBlock(mid, use_bn, name="unary1")(x, in_mask)
        else:
            h = x
        # Strided blocks fold the shortcut max_pool into the conv's gather
        # (same neighbor table; see kpconv_fused_gather).
        h, pooled, new_geom = KPConvLayer(
            cfg["num_kernel_points"], mid, mid, extent, self.radius,
            influence=cfg.get("KP_influence", "linear"),
            aggregation=cfg.get("aggregation_mode", "sum"),
            fixed=cfg.get("fixed_kernel_points", "center"),
            kernel_seed=cfg.get("kernel_seed", 0),
            compute_dtype=_compute_dtype(cfg),
            norm=cfg.get("kpconv_norm", "valid"),
            deformable="deform" in self.block_name,
            modulated=bool(cfg.get("modulated", False)),
            kernel_method=cfg.get("kernel_point_method", "lloyd"),
            kernel_file=cfg.get("kernel_dispositions_file"),
            name="kpconv",
        )(q_pts, lvl.points, neigh, h, geom=geom,
          x_extra=x if strided else None)
        h = NormBlock(mid, use_bn, name="norm_conv")(h, out_mask)
        h = leaky_relu(h)
        h = UnaryBlock(self.out_dim, use_bn, no_relu=True, name="unary2")(
            h, out_mask
        )

        shortcut = pooled if strided else x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(
                self.out_dim, use_bn, no_relu=True, name="unary_shortcut"
            )(shortcut, out_mask)
        return leaky_relu(h + shortcut), new_geom
