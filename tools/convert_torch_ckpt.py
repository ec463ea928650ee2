"""Convert a reference (torch) RegTR checkpoint into this framework's params.

Maps the reference's state_dict naming (model saved by /root/reference/src/
cvhelpers/torch_helpers.py:130-143 as {'state_dict': ...}) onto the flax
param tree.  The weight-mapping contract (packed MultiheadAttention <->
separate q/k/v projections, Linear transposition, InfoNCE W) is pinned by
tests/test_parity.py.

Caveat (documented): the reference randomizes each KPConv's kernel-point
disposition at init and stores it in the checkpoint
(kernels/kernel_points.py:432-461).  This framework uses one deterministic
disposition per radius, so converted models are weight-faithful but not
bit-exact; use --kernel_points to also export the checkpoint's dispositions
for exact-parity analysis.

Usage:
    python tools/convert_torch_ckpt.py ckpt.pth --config conf/3dmatch.yaml \
        --out params.npz
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def convert_state_dict(sd: dict, cfg) -> dict:
    """torch state_dict -> nested flax params dict."""
    from regtr_tpu.nn.backbone import encoder_plan

    params: dict = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def get(name):
        return sd[name].detach().cpu().numpy() if hasattr(sd[name], "detach") \
            else np.asarray(sd[name])

    # --- KPConv encoder ----------------------------------------------------
    plan, _, _ = encoder_plan(cfg)
    for i, (name, _in, _out, _r, _li) in enumerate(plan):
        src = f"kpf_encoder.encoder_blocks.{i}"
        dst = f"block_{i}_{name}"
        if f"{src}.KPConv.offset_conv.weights" in sd:
            # deformable branch (kpconv_blocks.py:275-356)
            put(["kpf_encoder", dst, "kpconv", "offset_weights"],
                get(f"{src}.KPConv.offset_conv.weights"))
            put(["kpf_encoder", dst, "kpconv", "offset_bias"],
                get(f"{src}.KPConv.offset_bias"))
        if "simple" in name:
            put(["kpf_encoder", dst, "kpconv", "weights"],
                get(f"{src}.KPConv.weights"))
        elif "resnetb" in name:
            if f"{src}.unary1.mlp.weight" in sd:
                put(["kpf_encoder", dst, "unary1", "mlp", "kernel"],
                    _t(get(f"{src}.unary1.mlp.weight")))
            put(["kpf_encoder", dst, "kpconv", "weights"],
                get(f"{src}.KPConv.weights"))
            put(["kpf_encoder", dst, "unary2", "mlp", "kernel"],
                _t(get(f"{src}.unary2.mlp.weight")))
            if f"{src}.unary_shortcut.mlp.weight" in sd:
                put(["kpf_encoder", dst, "unary_shortcut", "mlp", "kernel"],
                    _t(get(f"{src}.unary_shortcut.mlp.weight")))

    # --- projection + transformer -----------------------------------------
    put(["feat_proj", "kernel"], _t(get("feat_proj.weight")))
    put(["feat_proj", "bias"], get("feat_proj.bias"))

    d = cfg["d_embed"]
    for layer in range(cfg["num_encoder_layers"]):
        src = f"transformer_encoder.layers.{layer}"
        dst = ["transformer_encoder", f"layer_{layer}"]
        for attn, mine in (("self_attn", "self_attn"),
                           ("multihead_attn", "cross_attn")):
            w = get(f"{src}.{attn}.in_proj_weight")
            b = get(f"{src}.{attn}.in_proj_bias")
            put(dst + [mine, "q_proj", "kernel"], _t(w[:d]))
            put(dst + [mine, "q_proj", "bias"], b[:d])
            put(dst + [mine, "k_proj", "kernel"], _t(w[d:2 * d]))
            put(dst + [mine, "k_proj", "bias"], b[d:2 * d])
            put(dst + [mine, "v_proj", "kernel"], _t(w[2 * d:]))
            put(dst + [mine, "v_proj", "bias"], b[2 * d:])
            put(dst + [mine, "out_proj", "kernel"],
                _t(get(f"{src}.{attn}.out_proj.weight")))
            put(dst + [mine, "out_proj", "bias"],
                get(f"{src}.{attn}.out_proj.bias"))
        for lin in ("linear1", "linear2"):
            put(dst + [lin, "kernel"], _t(get(f"{src}.{lin}.weight")))
            put(dst + [lin, "bias"], get(f"{src}.{lin}.bias"))
        for norm in ("norm1", "norm2", "norm3"):
            put(dst + [norm, "scale"], get(f"{src}.{norm}.weight"))
            put(dst + [norm, "bias"], get(f"{src}.{norm}.bias"))
    if "transformer_encoder.norm.weight" in sd:
        put(["transformer_encoder", "norm_final", "scale"],
            get("transformer_encoder.norm.weight"))
        put(["transformer_encoder", "norm_final", "bias"],
            get("transformer_encoder.norm.bias"))

    # --- correspondence head ----------------------------------------------
    if "correspondence_decoder.coor_mlp.0.weight" in sd:
        for j, mine in ((0, "coor_mlp0"), (2, "coor_mlp1"), (4, "coor_mlp2")):
            put(["head", mine, "kernel"],
                _t(get(f"correspondence_decoder.coor_mlp.{j}.weight")))
            put(["head", mine, "bias"],
                get(f"correspondence_decoder.coor_mlp.{j}.bias"))
    else:  # attention decoder variant
        for proj in ("q_proj", "k_proj"):
            put(["head", proj, "kernel"],
                _t(get(f"correspondence_decoder.{proj}.weight")))
            put(["head", proj, "bias"],
                get(f"correspondence_decoder.{proj}.bias"))
    put(["head", "conf_logits", "kernel"],
        _t(get("correspondence_decoder.conf_logits_decoder.weight")))
    put(["head", "conf_logits", "bias"],
        get("correspondence_decoder.conf_logits_decoder.bias"))

    # --- loss criteria -----------------------------------------------------
    if "feature_criterion.W" in sd:
        put(["feature_criterion", "W"], get("feature_criterion.W"))
    if "feature_criterion_un.W" in sd:
        put(["feature_criterion_un", "W"], get("feature_criterion_un.W"))

    return params


def extract_kernel_points(sd: dict) -> dict:
    """Per-block kernel-point dispositions stored in the checkpoint."""
    return {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in sd.items() if k.endswith("kernel_points")
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", type=str)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="output .npz")
    p.add_argument("--kernel_points", type=str,
                   help="also dump kernel dispositions to this .npz")
    opt = p.parse_args(argv)

    import torch

    from regtr_tpu.config import load_config

    raw = torch.load(opt.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    cfg = load_config(opt.config)
    params = convert_state_dict(sd, cfg)

    flat = {}

    def flatten(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = v

    flatten(params, ())
    np.savez(opt.out, **flat)
    print(f"wrote {len(flat)} tensors to {opt.out}")
    if opt.kernel_points:
        np.savez(opt.kernel_points, **extract_kernel_points(sd))
        print(f"wrote kernel dispositions to {opt.kernel_points}")


if __name__ == "__main__":
    main()
