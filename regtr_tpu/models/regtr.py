"""RegTR: end-to-end point-cloud registration as one jit-compiled graph.

TPU-native rebuild of the flagship model (/root/reference/src/models/
regtr.py:22-294).  The whole forward — deterministic preprocessing pyramid,
KPConv encoder, cross-attention conditioning, correspondence decoding, and
the weighted Kabsch pose solve over all decoder layers and pairs — runs as a
single XLA program over the dense paired layout:

    points (2B, N0, 3), mask (2B, N0)
    with pairs interleaved: slot 2i = source of pair i, slot 2i+1 = target
    (see core/pairs.py for why this layout shards cleanly).

Outputs mirror the reference's contract (regtr.py:218-234): per-layer
conditioned features, predicted corresponding coordinates + overlap logits,
and poses (L, B, 3, 4).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.pairs import split_pairs
from ..core.se3 import compute_rigid_transform, se3_inv, se3_transform
from ..losses.corr import corr_loss
from ..losses.feature import InfoNCELoss, circle_loss, circle_loss_sampled
from ..losses.overlap import overlap_loss
from ..nn.backbone import KPFEncoder, encoder_out_dim
from ..nn.heads import CorrespondenceDecoder, CorrespondenceRegressor
from ..nn.pos_embed import PositionEmbeddingCoordsSine, PositionEmbeddingLearned
from ..nn.transformer import TransformerCrossEncoder
from ..ops.pyramid import PyramidSpec, build_pyramid, compute_overlap_pyramid


class RegTR(nn.Module):
    cfg: Any             # flat Config dict
    spec: PyramidSpec    # static pyramid shape schedule

    def setup(self):
        cfg = self.cfg
        self.backbone = KPFEncoder(cfg, name="kpf_encoder")
        self.feat_proj = nn.Dense(cfg["d_embed"], name="feat_proj")
        if cfg.get("pos_emb_type", "sine") == "sine":
            self.pos_embed = PositionEmbeddingCoordsSine(
                3, cfg["d_embed"], scale=cfg.get("pos_emb_scaling", 1.0),
                name="pos_embed",
            )
        else:
            self.pos_embed = PositionEmbeddingLearned(
                cfg["d_embed"], name="pos_embed"
            )
        self.transformer = TransformerCrossEncoder(
            d_model=cfg["d_embed"],
            nhead=cfg["nhead"],
            num_layers=cfg["num_encoder_layers"],
            d_feedforward=cfg["d_feedforward"],
            dropout=cfg.get("dropout", 0.0),
            activation=cfg.get("transformer_act", "relu"),
            pre_norm=cfg.get("pre_norm", True),
            sa_val_has_pos_emb=cfg.get("sa_val_has_pos_emb", True),
            ca_val_has_pos_emb=cfg.get("ca_val_has_pos_emb", True),
            attn_impl=cfg.get("attention_impl", "auto"),
            compute_dtype=(jnp.bfloat16
                           if cfg.get("compute_dtype") == "bfloat16"
                           else None),
            # Coarse-level activations are small (≈2k pts × d_embed), so
            # rematerializing the transformer buys little memory while
            # paying full recompute in backward; default it off
            # independently of the backbone remat.
            remat=cfg.get("remat_transformer", False),
            name="transformer_encoder",
        )
        if cfg.get("direct_regress_coor", False):
            self.head = CorrespondenceRegressor(cfg["d_embed"], name="head")
        else:
            self.head = CorrespondenceDecoder(
                cfg["d_embed"], cfg.get("corr_decoder_has_pos_emb", True),
                num_neighbors=int(cfg.get("corr_decoder_num_neighbors", 0)),
                name="head",
            )
        # Feature criteria hold trainable parameters (InfoNCE W), so they are
        # submodules even though they only act at loss time.
        if cfg.get("feature_loss_type", "infonce") == "infonce":
            self.feature_criterion = InfoNCELoss(
                cfg["d_embed"], cfg["r_p"], cfg["r_n"], name="feature_criterion"
            )
            self.feature_criterion_un = InfoNCELoss(
                cfg["d_embed"], cfg["r_p"], cfg["r_n"],
                name="feature_criterion_un",
            )
        else:
            self.feature_criterion = None
            self.feature_criterion_un = None

    def __call__(self, points, mask, deterministic: bool = True
                 ) -> Dict[str, Any]:
        """Forward pass.  points (2B, N0, 3); mask (2B, N0)."""
        cfg = self.cfg
        b2 = points.shape[0]
        b = b2 // 2

        levels = build_pyramid(
            points, mask, self.spec,
            chunk=int(cfg.get("neighbor_chunk", 1024)),
            method=cfg.get("neighbor_method", "brute"),
            cell_cap=int(cfg.get("cell_capacity", 32)),
            recall_target=float(cfg.get("neighbor_recall", 0.95)),
            sort_input=bool(cfg.get("sort_input", True)),
        )
        # When level 0 was spatially sorted, downstream consumers see the
        # sorted order; masks/points come from the pyramid so only external
        # per-point labels (overlap0 in compute_loss) need realigning.
        mask = levels[0].mask
        coarse = levels[-1]

        # Constant input feature (regtr.py:122), masked.
        feats0 = jnp.where(
            mask[..., None],
            jnp.ones(points.shape[:2] + (cfg.get("in_feats_dim", 1),),
                     points.dtype),
            0.0,
        )
        feats_enc, _ = self.backbone(feats0, levels)
        feats_un = self.feat_proj(feats_enc)               # (2B, Nc, D)

        pe = self.pos_embed(coarse.points)                 # (2B, Nc, D)
        pos = pe if cfg.get("transformer_encoder_has_pos_emb", True) else None
        feats_cond = self.transformer(
            feats_un, pos, coarse.mask, deterministic
        )                                                  # (L, 2B, Nc, D)

        corr, overlap_logits = self.head(
            feats_cond, coarse.points, pe, coarse.mask
        )                                                  # (L,2B,Nc,3)/(L,2B,Nc,1)

        # Pose solve: stack both directions' correspondences per pair
        # (regtr.py:184-203), batched over layers x pairs in one SVD call.
        src_xyz, tgt_xyz = split_pairs(coarse.points)
        src_mask, tgt_mask = split_pairs(coarse.mask)
        src_corr, tgt_corr = split_pairs(corr, axis=1)
        src_ovl, tgt_ovl = split_pairs(overlap_logits[..., 0], axis=1)
        src_ov = jax.nn.sigmoid(src_ovl) * src_mask
        tgt_ov = jax.nn.sigmoid(tgt_ovl) * tgt_mask
        # Optional hard threshold on the overlap weights before the pose
        # solve — the reference documents this as a slight inference boost
        # it leaves disabled (regtr.py:196-198); off by default here too.
        thresh = float(cfg.get("overlap_threshold", 0.0))
        if thresh > 0.0:
            src_ov = jnp.where(src_ov > thresh, src_ov, 0.0)
            tgt_ov = jnp.where(tgt_ov > thresh, tgt_ov, 0.0)

        num_pred = corr.shape[0]
        src_xyz_l = jnp.broadcast_to(src_xyz[None], (num_pred,) + src_xyz.shape)
        tgt_xyz_l = jnp.broadcast_to(tgt_xyz[None], (num_pred,) + tgt_xyz.shape)
        a = jnp.concatenate([src_xyz_l, tgt_corr], axis=2)   # (L,B,2Nc,3)
        bb = jnp.concatenate([src_corr, tgt_xyz_l], axis=2)
        w = jnp.concatenate([src_ov, tgt_ov], axis=2)        # (L,B,2Nc)
        pose = compute_rigid_transform(a, bb, w)             # (L,B,3,4)

        return {
            "levels": levels,
            "feats_un": feats_un,                 # (2B, Nc, D) unconditioned
            "feats_cond": feats_cond,             # (L, 2B, Nc, D)
            "kp": coarse.points,                  # (2B, Nc, 3)
            "kp_mask": coarse.mask,               # (2B, Nc)
            "corr": corr,                         # (L, 2B, Nc, 3)
            "overlap_logits": overlap_logits[..., 0],  # (L, 2B, Nc)
            "pose": pose,                         # (L, B, 3, 4)
        }

    def compute_loss(self, points, mask, pose_gt, overlap0,
                     deterministic: bool = False):
        """Forward + all training losses.

        Args:
            points/mask: dense paired clouds as in __call__.
            pose_gt: (B, 3, 4) src->tgt GT transforms.
            overlap0: (2B, N0) groundtruth overlap labels at the input level.

        Returns:
            (losses dict incl. 'total', outputs dict)

        Mirrors RegTR.compute_loss (regtr.py:237-294): BCE overlap loss on
        configured layers, InfoNCE on conditioned + unconditioned features,
        bidirectional overlap-weighted MAE correspondence loss.
        """
        cfg = self.cfg
        out = self(points, mask, deterministic=deterministic)
        b2 = points.shape[0]
        b = b2 // 2
        num_layers = cfg["num_encoder_layers"]

        losses: Dict[str, jnp.ndarray] = {}
        weights: Dict[str, float] = {}

        if out["levels"][0].perm is not None:
            # Level 0 was spatially sorted inside build_pyramid; realign the
            # per-point GT overlap labels to the sorted order.
            overlap0 = jnp.take_along_axis(
                overlap0, out["levels"][0].perm, axis=1
            )
        ov_pyr = compute_overlap_pyramid(overlap0, out["levels"])
        ov_c = ov_pyr[-1]                                  # (2B, Nc)
        src_ov_gt, tgt_ov_gt = split_pairs(ov_c)

        kp_mask = out["kp_mask"]
        src_kp, tgt_kp = split_pairs(out["kp"])
        src_mask, tgt_mask = split_pairs(kp_mask)

        # --- overlap BCE ---------------------------------------------------
        for i in cfg.get("overlap_loss_on", [num_layers - 1]):
            losses[f"overlap_{i}"] = overlap_loss(
                out["overlap_logits"][i], ov_c, kp_mask
            )
            weights[f"overlap_{i}"] = cfg.get("wt_overlap", 1.0)

        # --- feature losses ------------------------------------------------
        src_kp_gt_warped = se3_transform(pose_gt, src_kp)  # GT-aligned src kp
        feat_type = cfg.get("feature_loss_type", "infonce")

        def feature_loss(criterion, f_src, f_tgt, salt):
            if feat_type == "infonce":
                return criterion(
                    f_src, f_tgt, src_kp_gt_warped, tgt_kp, src_mask, tgt_mask
                )
            if feat_type == "circle_sampled":
                bits = jax.lax.bitcast_convert_type(
                    jnp.sum(src_kp_gt_warped, dtype=jnp.float32), jnp.int32
                )
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(17), bits), salt
                )
                return circle_loss_sampled(
                    f_src, f_tgt, src_kp_gt_warped, tgt_kp,
                    src_mask, tgt_mask, cfg["r_p"], cfg["r_n"], key=key,
                    n_sample=int(cfg.get("circle_n_sample", 256)),
                )
            return circle_loss(
                f_src, f_tgt, src_kp_gt_warped, tgt_kp, src_mask, tgt_mask,
                cfg["r_p"], cfg["r_n"],
            )

        for i in cfg.get("feature_loss_on", [num_layers - 1]):
            f_src, f_tgt = split_pairs(out["feats_cond"][i])
            losses[f"feature_{i}"] = feature_loss(
                self.feature_criterion, f_src, f_tgt, i
            )
            weights[f"feature_{i}"] = cfg.get("wt_feature", 0.1)
        fu_src, fu_tgt = split_pairs(out["feats_un"])
        losses["feature_un"] = feature_loss(
            self.feature_criterion_un, fu_src, fu_tgt, num_layers
        )
        weights["feature_un"] = cfg.get("wt_feature_un", 0.0)

        # --- correspondence loss (both directions) -------------------------
        pose_gt_inv = se3_inv(pose_gt)
        for i in cfg.get("corr_loss_on", [num_layers - 1]):
            corr_src, corr_tgt = split_pairs(out["corr"][i])
            src_l = corr_loss(
                src_kp, corr_src, pose_gt, src_ov_gt,
                metric=cfg.get("corr_metric", "mae"),
            )
            tgt_l = corr_loss(
                tgt_kp, corr_tgt, pose_gt_inv, tgt_ov_gt,
                metric=cfg.get("corr_metric", "mae"),
            )
            losses[f"corr_{i}"] = src_l + tgt_l
            weights[f"corr_{i}"] = cfg.get("wt_corr", 1.0)

        losses["total"] = sum(
            losses[k] * weights[k] for k in losses if k != "total"
        )
        return losses, out
