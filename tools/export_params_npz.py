"""Export a trained orbax checkpoint's params to a flat .npz.

Completes the interchange loop: tools/convert_torch_ckpt.py brings reference
torch checkpoints IN; this takes trained params OUT in the same 'a/b/c'
flat-key format, loadable anywhere via numpy or back through
`test.py/demo.py --params` (train/checkpoints.py load_params_npz).

Usage:
    python tools/export_params_npz.py <ckpt_dir> --config conf/X.yaml \
        --out params.npz [--latest]
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir", type=str, help="orbax checkpoint directory")
    p.add_argument("--config", type=str, default=None,
                   help="Config YAML (default: config.yaml next to ckpt)")
    p.add_argument("--out", type=str, required=True, help="output .npz")
    p.add_argument("--latest", action="store_true",
                   help="restore the latest step instead of the best score")
    opt = p.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from regtr_tpu.config import load_config
    from regtr_tpu.models import create_model, init_model_params
    from regtr_tpu.train.checkpoints import (
        CheckpointManager, save_params_npz,
    )
    from regtr_tpu.train.optim import make_optimizer
    from regtr_tpu.train.steps import TrainState

    cfg_path = opt.config or str(Path(opt.ckpt_dir).parent / "config.yaml")
    if not Path(cfg_path).exists():
        cfg_path = str(Path(opt.ckpt_dir) / "config.yaml")
    cfg = load_config(cfg_path)

    model = create_model(cfg, max(cfg["buckets"]))
    variables = init_model_params(model, jax.random.PRNGKey(0))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(cfg),
    )
    state, step = CheckpointManager(opt.ckpt_dir).restore(
        state, best=not opt.latest
    )
    save_params_npz(opt.out, state.params)
    n = len(jax.tree_util.tree_leaves(state.params))
    print(f"wrote {n} tensors (step {step}) to {opt.out}")


if __name__ == "__main__":
    main()
