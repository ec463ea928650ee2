"""Checkpoint-converter round trip against a synthetic reference state_dict.

No trained reference checkpoint ships with the repo (trained_models/ holds
only a Readme), so the converter is validated structurally: a state_dict with
the reference's exact naming/shape scheme is synthesized from the
architecture walk, converted, and every produced tensor must slot into the
flax model's param tree with matching shapes.
"""
import numpy as np
import jax
import pytest
import torch

from regtr_tpu.models import create_model, init_model_params
from regtr_tpu.nn.backbone import encoder_plan
from regtr_tpu.presets import tiny_config

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_torch_ckpt import convert_state_dict  # noqa: E402


def synth_reference_state_dict(cfg):
    """Build a state_dict with the reference's naming + shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def add(name, *shape):
        sd[name] = torch.from_numpy(
            rng.randn(*shape).astype(np.float32) * 0.1
        )

    p = cfg["num_kernel_points"]
    plan, _, _ = encoder_plan(cfg)
    for i, (name, in_dim, out_dim, _r, _li) in enumerate(plan):
        src = f"kpf_encoder.encoder_blocks.{i}"
        if "simple" in name:
            add(f"{src}.KPConv.weights", p, in_dim, out_dim // 2)
            add(f"{src}.KPConv.kernel_points", p, 3)
        elif "resnetb" in name:
            mid = out_dim // 4
            if in_dim != mid:
                add(f"{src}.unary1.mlp.weight", mid, in_dim)
            add(f"{src}.KPConv.weights", p, mid, mid)
            add(f"{src}.KPConv.kernel_points", p, 3)
            add(f"{src}.unary2.mlp.weight", out_dim, mid)
            if in_dim != out_dim:
                add(f"{src}.unary_shortcut.mlp.weight", out_dim, in_dim)

    from regtr_tpu.nn.backbone import encoder_out_dim

    d = cfg["d_embed"]
    add("feat_proj.weight", d, encoder_out_dim(cfg))
    add("feat_proj.bias", d)
    for layer in range(cfg["num_encoder_layers"]):
        src = f"transformer_encoder.layers.{layer}"
        for attn in ("self_attn", "multihead_attn"):
            add(f"{src}.{attn}.in_proj_weight", 3 * d, d)
            add(f"{src}.{attn}.in_proj_bias", 3 * d)
            add(f"{src}.{attn}.out_proj.weight", d, d)
            add(f"{src}.{attn}.out_proj.bias", d)
        add(f"{src}.linear1.weight", cfg["d_feedforward"], d)
        add(f"{src}.linear1.bias", cfg["d_feedforward"])
        add(f"{src}.linear2.weight", d, cfg["d_feedforward"])
        add(f"{src}.linear2.bias", d)
        for norm in ("norm1", "norm2", "norm3"):
            add(f"{src}.{norm}.weight", d)
            add(f"{src}.{norm}.bias", d)
    add("transformer_encoder.norm.weight", d)
    add("transformer_encoder.norm.bias", d)
    for j in (0, 2, 4):
        out = 3 if j == 4 else d
        add(f"correspondence_decoder.coor_mlp.{j}.weight", out, d)
        add(f"correspondence_decoder.coor_mlp.{j}.bias", out)
    add("correspondence_decoder.conf_logits_decoder.weight", 1, d)
    add("correspondence_decoder.conf_logits_decoder.bias", 1)
    add("feature_criterion.W", d, d)
    add("feature_criterion_un.W", d, d)
    return sd


def test_converter_covers_model_params():
    cfg = tiny_config()
    sd = synth_reference_state_dict(cfg)
    converted = convert_state_dict(sd, cfg)

    model = create_model(cfg, 96)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    target = variables["params"]

    # every converted tensor must exist in the model tree with same shape
    def walk(conv_node, tgt_node, path):
        for k, v in conv_node.items():
            assert k in tgt_node, f"converted key {path + [k]} not in model"
            if isinstance(v, dict):
                walk(v, tgt_node[k], path + [k])
            else:
                assert v.shape == tuple(tgt_node[k].shape), \
                    (path + [k], v.shape, tgt_node[k].shape)

    walk(converted, target, [])

    # coverage: all trainable dense/attention/kpconv weights are mapped
    n_converted = len(jax.tree_util.tree_leaves(converted))
    n_target = len(jax.tree_util.tree_leaves(target))
    # model has extra params the reference lacks none of; converter skips
    # nothing except biases the reference doesn't have (none here)
    assert n_converted >= 0.9 * n_target, (n_converted, n_target)


def test_converted_params_run():
    """Model runs with converted params substituted in."""
    import jax.numpy as jnp

    cfg = tiny_config()
    sd = synth_reference_state_dict(cfg)
    converted = convert_state_dict(sd, cfg)
    model = create_model(cfg, 96)
    variables = init_model_params(model, jax.random.PRNGKey(0))

    # merge converted over initialized
    def merge(init, conv):
        out = {}
        for k, v in init.items():
            if k in conv:
                out[k] = merge(v, conv[k]) if isinstance(v, dict) else \
                    jnp.asarray(conv[k])
            else:
                out[k] = v
        return out

    params = merge(variables["params"], converted)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32) - 0.5)
    mask = jnp.ones((2, 96), bool)
    out = model.apply({"params": params}, pts, mask)
    assert np.all(np.isfinite(np.asarray(out["pose"])))


def test_converted_npz_loads_via_cli_path(tmp_path):
    """The converter's .npz output loads through load_params_npz (the
    test.py/demo.py --params flow) and the model runs with it.  Missing
    entries (params the torch model lacks) keep init values."""
    import jax.numpy as jnp

    from regtr_tpu.train.checkpoints import load_params_npz, save_params_npz

    cfg = tiny_config()
    sd = synth_reference_state_dict(cfg)
    converted = convert_state_dict(sd, cfg)

    # write exactly like tools/convert_torch_ckpt.py main()
    flat = {}

    def flatten(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = v

    flatten(converted, ())
    npz = tmp_path / "conv.npz"
    np.savez(npz, **flat)

    model = create_model(cfg, 96)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    params = load_params_npz(npz, variables["params"])

    # loaded tensors replaced init values
    got = np.asarray(params["feat_proj"]["kernel"])
    np.testing.assert_array_equal(got, converted["feat_proj"]["kernel"])

    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32) - 0.5)
    out = model.apply({"params": params}, pts, jnp.ones((2, 96), bool))
    assert np.all(np.isfinite(np.asarray(out["pose"])))

    # save/load roundtrip in the same format
    rt = tmp_path / "rt.npz"
    save_params_npz(rt, params)
    back = load_params_npz(rt, variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_params_npz_tool(tmp_path):
    """tools/export_params_npz.py: orbax ckpt -> flat npz -> --params load."""
    import shutil

    import yaml

    from export_params_npz import main as export_main
    from regtr_tpu.train.checkpoints import CheckpointManager, load_params_npz
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState

    cfg = tiny_config()
    model = create_model(cfg, 96)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(cfg),
    )
    ckpt_dir = tmp_path / "ckpts"
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(3, state, score=0.5)
    mgr.close()
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"flat": dict(cfg)}, f)

    out = tmp_path / "exported.npz"
    export_main([str(ckpt_dir), "--config", str(tmp_path / "config.yaml"),
                 "--out", str(out)])
    params = load_params_npz(out, variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    del shutil
