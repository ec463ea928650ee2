"""FULL-MODEL activation parity vs the reference torch implementation.

The strongest accuracy-parity proxy available in this environment (no real
3DMatch/ModelNet data): build the reference's own torch modules from
/root/reference/src (KPFEncoder, TransformerCrossEncoder, sine positional
embedding, correspondence regressor, weighted Kabsch), random-initialize
them, convert the state_dict with tools/convert_torch_ckpt.convert_state_dict,
and assert stage-by-stage activation agreement with our jax model on a fixed
input pair:

    encoder+proj features -> per-layer conditioned features -> predicted
    correspondences + overlap logits -> final pose.

Both sides consume the SAME deterministic preprocessing pyramid (ours,
converted to the reference's packed layout), the same kernel-point
dispositions (ours, copied into the torch KPConv buffers), and our model runs
with `kpconv_norm: legacy` to reproduce the reference's normalization quirk
(kpconv_blocks.py:409-412).

The reference modules import GPU-only third-party libraries at module scope
(MinkowskiEngine, pytorch3d — kpconv.py:6-10); those are stubbed since only
CPU-safe code paths are exercised here (the GPU preprocessor is never
called — its output contract is satisfied by our pyramid instead).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_SRC = "/root/reference/src"

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_torch_ckpt import convert_state_dict  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: fresh XLA compiles dominate



@pytest.fixture(scope="module")
def ref():
    """Import the reference torch modules with GPU-only deps stubbed."""
    for name in ("MinkowskiEngine", "pytorch3d", "pytorch3d.ops"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    ops = sys.modules["pytorch3d.ops"]
    for attr in ("ball_query", "packed_to_padded"):
        if not hasattr(ops, attr):
            setattr(ops, attr, None)
    sys.modules["pytorch3d"].ops = ops

    if REF_SRC not in sys.path:
        sys.path.append(REF_SRC)
    # Bypass the reference's models/__init__.py registry, which eagerly
    # imports every model module and with them nibabel/vtk/open3d
    # (models/__init__.py:11-21): synthesize the package with the right
    # __path__ so only the submodules we need are loaded.
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [str(Path(REF_SRC) / "models")]
        sys.modules["models"] = pkg
    import models.backbone_kpconv.kpconv as ref_kpconv
    import models.transformer.position_embedding as ref_pe
    import models.transformer.transformers as ref_tr
    import utils.se3_torch as ref_se3
    import utils.seq_manipulation as ref_seq

    ns = types.SimpleNamespace(
        kpconv=ref_kpconv, pe=ref_pe, tr=ref_tr, se3=ref_se3, seq=ref_seq
    )
    return ns


class RefCfg(dict):
    """dict with attribute access (stands in for EasyDict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def make_cfg():
    return RefCfg(
        model="regtr.RegTR",
        # --- kpconv backbone (2 levels) ---
        architecture=["simple", "resnetb", "resnetb_strided", "resnetb"],
        first_subsampling_dl=0.08,
        conv_radius=2.5,
        KP_extent=2.0,
        deform_radius=5.0,
        num_kernel_points=15,
        in_feats_dim=1,
        in_points_dim=3,
        first_feats_dim=32,
        fixed_kernel_points="center",
        KP_influence="linear",
        aggregation_mode="sum",
        use_batch_norm=True,
        batch_norm_momentum=0.02,
        modulated=False,
        neighborhood_limits=[16, 16],
        # --- transformer ---
        d_embed=32,
        nhead=2,
        d_feedforward=64,
        dropout=0.0,
        transformer_act="relu",
        pre_norm=True,
        sa_val_has_pos_emb=True,
        ca_val_has_pos_emb=True,
        attention_type="dot_prod",
        pos_emb_type="sine",
        pos_emb_scaling=1.0,
        transformer_encoder_has_pos_emb=True,
        num_encoder_layers=2,
        direct_regress_coor=True,
        corr_decoder_has_pos_emb=True,
        # --- losses (needed by init_model_params) ---
        r_p=0.09,
        r_n=0.18,
        # --- ours-only knobs ---
        kpconv_norm="legacy",   # reproduce reference normalization exactly
        remat=False,
        sort_input=False,       # keep input point order
        capacity_factor=1.0,    # generous level-1 capacity
        neighbor_method="brute",
        attention_impl="xla",
    )


def make_clouds(seed=0, n_src=230, n_tgt=250):
    rng = np.random.RandomState(seed)
    src = rng.rand(n_src, 3).astype(np.float32)
    tgt = rng.rand(n_tgt, 3).astype(np.float32)
    return src, tgt


def build_our_levels(cfg, src, tgt, n0):
    """Run OUR deterministic pyramid exactly as the model does in forward."""
    from regtr_tpu.ops.pyramid import build_pyramid, make_pyramid_spec

    pts = np.zeros((2, n0, 3), np.float32)
    mask = np.zeros((2, n0), bool)
    pts[0, : len(src)] = src
    mask[0, : len(src)] = True
    pts[1, : len(tgt)] = tgt
    mask[1, : len(tgt)] = True

    spec = make_pyramid_spec(cfg, n0)
    levels = build_pyramid(
        jnp.asarray(pts), jnp.asarray(mask), spec,
        chunk=int(cfg.get("neighbor_chunk", 1024)),
        method=cfg.get("neighbor_method", "brute"),
        cell_cap=int(cfg.get("cell_capacity", 32)),
        recall_target=float(cfg.get("neighbor_recall", 0.95)),
        sort_input=bool(cfg.get("sort_input", True)),
    )
    return pts, mask, levels


def to_packed_meta(levels):
    """Convert our dense masked pyramid to the reference's packed layout
    (kpconv.py:529-535): points (SumN, 3), neighbors/pools (SumN, K) with
    shadow = SumN_total, stack_lengths per cloud.

    Relies on valid rows being contiguous at the start of each cloud's slot
    (subsampled levels are voxel-key sorted with masked rows at the end)."""
    meta = {"points": [], "neighbors": [], "pools": [], "stack_lengths": []}
    lens, offsets, totals = [], [], []
    for lvl in levels:
        m = np.asarray(lvl.mask)
        ns = m.sum(1)
        assert all(m[b, : ns[b]].all() for b in range(m.shape[0])), \
            "valid rows must be contiguous"
        lens.append(ns)
        offsets.append(np.concatenate([[0], np.cumsum(ns)[:-1]]))
        totals.append(int(ns.sum()))

    def remap(inds_np, lvl_idx, query_lens):
        """Per-row neighbor table -> packed indices (shadow = total)."""
        cap = levels[lvl_idx].points.shape[1]
        out_rows = []
        for b in range(inds_np.shape[0]):
            rows = inds_np[b, : query_lens[b]].astype(np.int64)
            shadow = rows >= lens[lvl_idx][b]  # capacity padding OR >= n_b
            rows = rows + offsets[lvl_idx][b]
            rows[shadow] = totals[lvl_idx]
            out_rows.append(rows)
        del cap
        return np.concatenate(out_rows, axis=0)

    for li, lvl in enumerate(levels):
        pts = np.asarray(lvl.points)
        m = np.asarray(lvl.mask)
        packed = np.concatenate(
            [pts[b, m[b]] for b in range(pts.shape[0])], axis=0
        )
        meta["points"].append(torch.from_numpy(packed.astype(np.float32)))
        meta["stack_lengths"].append(
            torch.from_numpy(lens[li].astype(np.int32))
        )
        meta["neighbors"].append(torch.from_numpy(
            remap(np.asarray(lvl.neighbors), li, lens[li])
        ))
        if lvl.pools is not None:
            meta["pools"].append(torch.from_numpy(
                remap(np.asarray(lvl.pools), li, lens[li + 1])
            ))
    return meta


class TorchCorrRegressor(torch.nn.Module):
    """Mirror of the reference CorrespondenceRegressor (regtr.py:399-443)
    with identical state_dict naming."""

    def __init__(self, d):
        super().__init__()
        self.coor_mlp = torch.nn.Sequential(
            torch.nn.Linear(d, d), torch.nn.ReLU(),
            torch.nn.Linear(d, d), torch.nn.ReLU(),
            torch.nn.Linear(d, 3),
        )
        self.conf_logits_decoder = torch.nn.Linear(d, 1)


class TorchCorrDecoder(torch.nn.Module):
    """Mirror of the reference CorrespondenceDecoder's math
    (regtr.py:297-351: q/k projections only, value = raw partner xyz) with
    identical state_dict naming.  q_norm exists in the reference ctor but is
    never applied in its forward — kept for state_dict shape parity."""

    def __init__(self, d):
        super().__init__()
        self.q_norm = torch.nn.LayerNorm(d)
        self.q_proj = torch.nn.Linear(d, d)
        self.k_proj = torch.nn.Linear(d, d)
        self.conf_logits_decoder = torch.nn.Linear(d, 1)

    def attend(self, query_feats, key_feats, value_xyz, key_mask):
        """query/key feats: (L, N, D) with pos-emb added; value (Nk, 3);
        key_mask: (Nk,) bool True=masked.  B=1 collapsed."""
        import math

        q = self.q_proj(query_feats) / math.sqrt(query_feats.shape[-1])
        k = self.k_proj(key_feats)
        attn = torch.einsum("lqd,lsd->lqs", q, k)
        attn = attn.masked_fill(key_mask[None, None, :], float("-inf"))
        attn = torch.softmax(attn, dim=-1)
        return torch.einsum("lqs,sc->lqc", attn, value_xyz)


def build_torch_shell(cfg, ref):
    """Assemble the reference's submodules under the reference RegTR's
    attribute names (regtr.py:26-73) so state_dict() matches the converter's
    expected naming."""

    class Shell(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.kpf_encoder = ref.kpconv.KPFEncoder(cfg, cfg.d_embed)
            self.feat_proj = torch.nn.Linear(
                self.kpf_encoder.encoder_skip_dims[-1], cfg.d_embed, bias=True
            )
            self.pos_embed = ref.pe.PositionEmbeddingCoordsSine(
                3, cfg.d_embed, scale=cfg.pos_emb_scaling
            )
            layer = ref.tr.TransformerCrossEncoderLayer(
                cfg.d_embed, cfg.nhead, cfg.d_feedforward, cfg.dropout,
                activation=cfg.transformer_act,
                normalize_before=cfg.pre_norm,
                sa_val_has_pos_emb=cfg.sa_val_has_pos_emb,
                ca_val_has_pos_emb=cfg.ca_val_has_pos_emb,
                attention_type=cfg.attention_type,
            )
            norm = torch.nn.LayerNorm(cfg.d_embed) if cfg.pre_norm else None
            self.transformer_encoder = ref.tr.TransformerCrossEncoder(
                layer, cfg.num_encoder_layers, norm, return_intermediate=True
            )
            if cfg.get("direct_regress_coor", False):
                self.correspondence_decoder = TorchCorrRegressor(cfg.d_embed)
            else:
                self.correspondence_decoder = TorchCorrDecoder(cfg.d_embed)

    torch.manual_seed(0)
    shell = Shell().eval()

    # Align kernel dispositions: overwrite the torch KPConvs' randomized
    # kernel points (kernel_points.py:432-461) with our deterministic ones.
    from regtr_tpu.nn.backbone import encoder_plan
    from regtr_tpu.utils.kernel_points import load_kernel_points

    plan, _, _ = encoder_plan(cfg)
    for i, (_name, _i, _o, r, _li) in enumerate(plan):
        kp = load_kernel_points(
            r, cfg.num_kernel_points, 3, cfg.fixed_kernel_points,
            cfg.get("kernel_seed", 0),
        )
        shell.kpf_encoder.encoder_blocks[i].KPConv.kernel_points.data = \
            torch.from_numpy(np.asarray(kp, np.float32))
    return shell


def torch_forward(shell, ref, cfg, meta):
    """Drive the reference forward pipeline (regtr.py:104-235) for B=1."""
    seq, se3 = ref.seq, ref.se3
    with torch.no_grad():
        slens_c = meta["stack_lengths"][-1]
        feats0 = torch.ones_like(meta["points"][0][:, :1])
        feats_un, _ = shell.kpf_encoder(feats0, meta)
        both_un = shell.feat_proj(feats_un)
        src_un, tgt_un = seq.split_src_tgt(both_un, slens_c)
        src_xyz_c, tgt_xyz_c = seq.split_src_tgt(meta["points"][-1], slens_c)
        src_pe, tgt_pe = seq.split_src_tgt(
            shell.pos_embed(meta["points"][-1]), slens_c
        )
        src_pe_p, _, _ = seq.pad_sequence(src_pe)
        tgt_pe_p, _, _ = seq.pad_sequence(tgt_pe)
        src_p, src_pad_mask, _ = seq.pad_sequence(
            src_un, require_padding_mask=True
        )
        tgt_p, tgt_pad_mask, _ = seq.pad_sequence(
            tgt_un, require_padding_mask=True
        )
        src_cond, tgt_cond = shell.transformer_encoder(
            src_p, tgt_p,
            src_key_padding_mask=src_pad_mask,
            tgt_key_padding_mask=tgt_pad_mask,
            src_pos=src_pe_p, tgt_pos=tgt_pe_p,
        )  # each (L, N_pad, 1, D)

        head = shell.correspondence_decoder
        if cfg.get("direct_regress_coor", False):
            src_corr = head.coor_mlp(src_cond)
            tgt_corr = head.coor_mlp(tgt_cond)
        else:
            # reference decoder path (regtr.py:383-394): q/k over
            # pos-embedded conditioned feats, value = raw partner xyz
            src_f2 = (src_cond + src_pe_p[None])[:, :, 0, :]
            tgt_f2 = (tgt_cond + tgt_pe_p[None])[:, :, 0, :]
            no_mask_src = torch.zeros(src_f2.shape[1], dtype=torch.bool)
            no_mask_tgt = torch.zeros(tgt_f2.shape[1], dtype=torch.bool)
            src_corr = head.attend(
                src_f2, tgt_f2, tgt_xyz_c[0], no_mask_tgt
            )[:, :, None, :]
            tgt_corr = head.attend(
                tgt_f2, src_f2, src_xyz_c[0], no_mask_src
            )[:, :, None, :]
        src_ov = head.conf_logits_decoder(src_cond)
        tgt_ov = head.conf_logits_decoder(tgt_cond)

        num_pred = src_cond.shape[0]
        sc = src_corr[:, :, 0, :]            # (L, Ns, 3)   B=1
        tc = tgt_corr[:, :, 0, :]
        corr_all = torch.cat([
            torch.cat([src_xyz_c[0].expand(num_pred, -1, -1), sc], dim=2),
            torch.cat([tc, tgt_xyz_c[0].expand(num_pred, -1, -1)], dim=2),
        ], dim=1)
        overlap_prob = torch.cat([
            torch.sigmoid(src_ov[:, :, 0, 0]),
            torch.sigmoid(tgt_ov[:, :, 0, 0]),
        ], dim=1)
        pose = se3.compute_rigid_transform(
            corr_all[..., :3], corr_all[..., 3:], overlap_prob
        )  # (L, 3, 4)
    return {
        "src_un": src_un[0].numpy(), "tgt_un": tgt_un[0].numpy(),
        "src_cond": src_cond[:, :, 0, :].numpy(),
        "tgt_cond": tgt_cond[:, :, 0, :].numpy(),
        "src_corr": sc.numpy(), "tgt_corr": tc.numpy(),
        "src_ov": src_ov[:, :, 0, 0].numpy(),
        "tgt_ov": tgt_ov[:, :, 0, 0].numpy(),
        "pose": pose.numpy(),
    }


def merge_params(init, conv):
    out = {}
    for k, v in init.items():
        if k in conv:
            out[k] = merge_params(v, conv[k]) if isinstance(v, dict) \
                else jnp.asarray(conv[k])
        else:
            out[k] = v
    return out


def _run_parity(ref, cfg):
        src, tgt = make_clouds()
        n0 = 256
        pts, mask, levels = build_our_levels(cfg, src, tgt, n0)
        meta = to_packed_meta(levels)

        shell = build_torch_shell(cfg, ref)
        want = torch_forward(shell, ref, cfg, meta)

        # ---- our side, with converted weights ----
        from regtr_tpu.models import create_model, init_model_params

        converted = convert_state_dict(shell.state_dict(), cfg)
        model = create_model(cfg, n0)
        variables = init_model_params(model, jax.random.PRNGKey(0))
        params = merge_params(variables["params"], converted)
        out = model.apply(
            {"params": params}, jnp.asarray(pts), jnp.asarray(mask)
        )

        kp_mask = np.asarray(out["kp_mask"])
        n_src = int(kp_mask[0].sum())
        n_tgt = int(kp_mask[1].sum())
        assert n_src == want["src_un"].shape[0]
        assert n_tgt == want["tgt_un"].shape[0]

        # stage 1: encoder + projection (pins KPConv chain + instance norms)
        feats_un = np.asarray(out["feats_un"])
        np.testing.assert_allclose(
            feats_un[0, :n_src], want["src_un"], rtol=1e-4, atol=2e-4,
            err_msg="unconditioned src features (encoder+proj)",
        )
        np.testing.assert_allclose(
            feats_un[1, :n_tgt], want["tgt_un"], rtol=1e-4, atol=2e-4,
            err_msg="unconditioned tgt features (encoder+proj)",
        )

        # stage 2: every transformer layer's conditioned output
        feats_cond = np.asarray(out["feats_cond"])   # (L, 2, Nc, D)
        L = feats_cond.shape[0]
        assert L == want["src_cond"].shape[0] == cfg["num_encoder_layers"]
        for layer in range(L):
            np.testing.assert_allclose(
                feats_cond[layer, 0, :n_src], want["src_cond"][layer, :n_src],
                rtol=1e-4, atol=3e-4, err_msg=f"src_cond layer {layer}",
            )
            np.testing.assert_allclose(
                feats_cond[layer, 1, :n_tgt], want["tgt_cond"][layer, :n_tgt],
                rtol=1e-4, atol=3e-4, err_msg=f"tgt_cond layer {layer}",
            )

        # stage 3: correspondence + overlap heads
        corr = np.asarray(out["corr"])               # (L, 2, Nc, 3)
        ovl = np.asarray(out["overlap_logits"])      # (L, 2, Nc)
        np.testing.assert_allclose(
            corr[:, 0, :n_src], want["src_corr"][:, :n_src],
            rtol=1e-4, atol=3e-4, err_msg="src corr",
        )
        np.testing.assert_allclose(
            corr[:, 1, :n_tgt], want["tgt_corr"][:, :n_tgt],
            rtol=1e-4, atol=3e-4, err_msg="tgt corr",
        )
        np.testing.assert_allclose(
            ovl[:, 0, :n_src], want["src_ov"][:, :n_src],
            rtol=1e-4, atol=3e-4, err_msg="src overlap logits",
        )
        np.testing.assert_allclose(
            ovl[:, 1, :n_tgt], want["tgt_ov"][:, :n_tgt],
            rtol=1e-4, atol=3e-4, err_msg="tgt overlap logits",
        )

        # stage 4: final pose (weighted Kabsch over both directions)
        pose = np.asarray(out["pose"])[:, 0]         # (L, 3, 4)
        np.testing.assert_allclose(
            pose, want["pose"], rtol=1e-3, atol=1e-3, err_msg="pose",
        )


class TestFullModelParity:
    def test_forward_activations_match(self, ref):
        """Config-default head (MLP regressor, direct_regress_coor=True)."""
        _run_parity(ref, make_cfg())

    def test_forward_activations_match_attention_decoder(self, ref):
        """Attention-decoder head variant (direct_regress_coor=False,
        regtr.py:297-396) — covers the converter's q_proj/k_proj branch."""
        cfg = make_cfg()
        cfg["direct_regress_coor"] = False
        _run_parity(ref, cfg)

    def test_legacy_norm_differs_from_valid(self, ref):
        """Sanity: the legacy normalization option actually changes deep
        activations (i.e. the parity above is non-trivial)."""
        cfg = make_cfg()
        src, tgt = make_clouds(seed=1)
        n0 = 256
        pts, mask, _ = build_our_levels(cfg, src, tgt, n0)

        from regtr_tpu.models import create_model, init_model_params

        model_a = create_model(cfg, n0)
        variables = init_model_params(model_a, jax.random.PRNGKey(0))
        out_a = model_a.apply(
            {"params": variables["params"]}, jnp.asarray(pts),
            jnp.asarray(mask),
        )
        cfg_b = RefCfg(cfg, kpconv_norm="valid")
        model_b = create_model(cfg_b, n0)
        out_b = model_b.apply(
            {"params": variables["params"]}, jnp.asarray(pts),
            jnp.asarray(mask),
        )
        diff = np.abs(
            np.asarray(out_a["feats_un"]) - np.asarray(out_b["feats_un"])
        ).max()
        assert np.isfinite(diff)
