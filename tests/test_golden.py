"""Golden regression: fixed seed + fixed input -> previously recorded outputs.

Guards the full forward (pyramid, KPConv, transformer, heads, Kabsch)
against silent numerical regressions.  Regenerate deliberately with the
snippet in the git history when an INTENTIONAL numerics change lands.
"""
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from regtr_tpu.models import create_model, init_model_params
from regtr_tpu.presets import tiny_config

GOLDEN = Path(__file__).parent / "golden_tiny.npz"


def test_forward_matches_golden():
    data = np.load(GOLDEN)
    cfg = tiny_config()
    model = create_model(cfg, 96)
    variables = init_model_params(model, jax.random.PRNGKey(42))
    out = model.apply(
        {"params": variables["params"]},
        jnp.asarray(data["points"]), jnp.asarray(data["mask"]),
    )
    np.testing.assert_allclose(
        np.asarray(out["pose"]), data["pose"], rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["overlap_logits"]), data["overlap_logits"],
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["corr"]), data["corr"], rtol=1e-3, atol=2e-4
    )
