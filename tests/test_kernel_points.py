"""Kernel-point disposition generation tests.

Covers the seeded Lloyd default, the reference-style repulsion optimizer
(/root/reference/src/models/backbone_kpconv/kernels/kernel_points.py:245-384),
the .ply disposition cache format, and the per-block npz override used for
bit-exact converted checkpoints.
"""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from regtr_tpu.utils.kernel_points import (
    kernel_dispositions,
    load_kernel_points,
    lookup_block_dispositions,
    read_dispositions_ply,
    repulsion_dispositions,
    write_dispositions_ply,
)

pytestmark = pytest.mark.slow  # compile-heavy: fresh XLA compiles dominate


class TestRepulsion:
    def test_layout_properties(self):
        k = 15
        disp = repulsion_dispositions(k, 3, "center", seed=0)
        assert disp.shape == (k, 3)
        np.testing.assert_allclose(disp[0], 0.0, atol=1e-7)  # fixed center
        r = np.linalg.norm(disp[1:], axis=-1)
        # rescaled so the free points sit at mean radius 0.66
        np.testing.assert_allclose(r.mean(), 0.66, rtol=1e-5)
        # repulsion separates points: no two closer than a sane floor
        d = np.linalg.norm(disp[:, None] - disp[None], axis=-1)
        d[np.eye(k, dtype=bool)] = np.inf
        assert d.min() > 0.25

    def test_deterministic_and_seed_sensitive(self):
        a = repulsion_dispositions(15, 3, "center", seed=0)
        b = repulsion_dispositions.__wrapped__(15, 3, "center", seed=0)
        np.testing.assert_array_equal(a, b)
        c = repulsion_dispositions(15, 3, "center", seed=1)
        assert np.abs(a - c).max() > 1e-3

    def test_verticals_fixed(self):
        disp = repulsion_dispositions(15, 3, "verticals", seed=0)
        np.testing.assert_allclose(disp[0], 0.0, atol=1e-7)
        # points 1/2 stay on the vertical axis
        np.testing.assert_allclose(disp[1, :2], 0.0, atol=1e-6)
        np.testing.assert_allclose(disp[2, :2], 0.0, atol=1e-6)

    def test_load_method_dispatch(self):
        rep = load_kernel_points(2.0, 15, method="repulsion")
        llo = load_kernel_points(2.0, 15, method="lloyd")
        np.testing.assert_allclose(
            rep, repulsion_dispositions(15, 3, "center", 0) * 2.0
        )
        np.testing.assert_allclose(
            llo, kernel_dispositions(15, 3, "center", 0) * 2.0
        )
        assert np.abs(rep - llo).max() > 1e-3

    def test_model_runs_with_repulsion(self):
        from regtr_tpu.models import create_model, init_model_params
        from regtr_tpu.presets import tiny_config

        cfg = tiny_config(kernel_point_method="repulsion")
        model = create_model(cfg, 96)
        variables = init_model_params(model, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32) - 0.5)
        mask = jnp.ones((2, 96), bool)
        out = model.apply({"params": variables["params"]}, pts, mask)
        assert np.all(np.isfinite(np.asarray(out["pose"])))


class TestDispositionIO:
    def test_ply_roundtrip(self, tmp_path):
        disp = repulsion_dispositions(15, 3, "center", seed=0)
        path = tmp_path / "k_015_center_3D.ply"
        write_dispositions_ply(path, disp)
        back = read_dispositions_ply(path)
        np.testing.assert_allclose(back, disp, rtol=1e-6)

    def test_npz_block_override(self, tmp_path):
        """kernel_dispositions_file makes each block use the checkpoint's
        own dispositions (converter --kernel_points output)."""
        from regtr_tpu.models import create_model, init_model_params
        from regtr_tpu.nn.backbone import encoder_plan
        from regtr_tpu.presets import tiny_config

        cfg = tiny_config()
        plan, _, _ = encoder_plan(cfg)
        rng = np.random.RandomState(0)
        table = {
            f"kpf_encoder.encoder_blocks.{i}.KPConv.kernel_points":
                (rng.rand(cfg["num_kernel_points"], 3).astype(np.float32)
                 - 0.5) * r
            for i, (_n, _i, _o, r, _li) in enumerate(plan)
        }
        npz = tmp_path / "kp.npz"
        np.savez(npz, **table)

        assert lookup_block_dispositions(str(npz), 1) is not None
        assert lookup_block_dispositions(str(npz), 99) is None

        n0 = 96
        model_a = create_model(cfg, n0)
        variables = init_model_params(model_a, jax.random.PRNGKey(0))
        rng2 = np.random.RandomState(1)
        pts = jnp.asarray(rng2.rand(2, n0, 3).astype(np.float32) - 0.5)
        mask = jnp.ones((2, n0), bool)
        out_a = model_a.apply({"params": variables["params"]}, pts, mask)

        cfg_b = tiny_config(kernel_dispositions_file=str(npz))
        model_b = create_model(cfg_b, n0)
        out_b = model_b.apply({"params": variables["params"]}, pts, mask)

        # different dispositions -> different activations
        diff = np.abs(
            np.asarray(out_a["feats_un"]) - np.asarray(out_b["feats_un"])
        ).max()
        assert diff > 1e-5
