"""Loss-function unit tests + end-to-end eval-protocol test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regtr_tpu.core import se3_np
from regtr_tpu.losses.corr import corr_loss
from regtr_tpu.losses.feature import circle_loss
from regtr_tpu.losses.overlap import bce_with_logits, overlap_loss


class TestOverlapLoss:
    def test_matches_manual_bce(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(2, 8).astype(np.float32)
        labels = (rng.rand(2, 8) > 0.5).astype(np.float32)
        mask = np.ones((2, 8), bool)
        mask[1, 5:] = False
        got = float(overlap_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)
        ))
        p = 1.0 / (1.0 + np.exp(-logits))
        ref_elt = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
        ref = ref_elt[mask].mean()
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_extreme_logits_stable(self):
        logits = jnp.asarray([[100.0, -100.0]])
        labels = jnp.asarray([[1.0, 0.0]])
        out = bce_with_logits(logits, labels)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)


class TestCorrLoss:
    def test_zero_when_perfect(self):
        rng = np.random.RandomState(1)
        kp = rng.rand(2, 10, 3).astype(np.float32)
        pose = np.stack([
            se3_np.se3_init(se3_np.sample_uniform_rotation(rng),
                            rng.randn(3).astype(np.float32))
            for _ in range(2)
        ])
        warped = np.einsum("bij,bnj->bni", pose[:, :, :3], kp) + \
            pose[:, None, :, 3]
        w = np.ones((2, 10), np.float32)
        out = corr_loss(jnp.asarray(kp), jnp.asarray(warped),
                        jnp.asarray(pose), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_weights_zero_padding(self):
        rng = np.random.RandomState(2)
        kp = rng.rand(1, 6, 3).astype(np.float32)
        pose = se3_np.se3_init(np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32))[None]
        pred = kp.copy()
        pred[0, 3:] += 100.0  # corrupt padded points
        w = np.array([[1, 1, 1, 0, 0, 0]], np.float32)
        out = float(corr_loss(jnp.asarray(kp), jnp.asarray(pred),
                              jnp.asarray(pose), jnp.asarray(w)))
        np.testing.assert_allclose(out, 0.0, atol=1e-5)


class TestCircleLoss:
    def test_finite_and_positive(self):
        rng = np.random.RandomState(3)
        fa = rng.randn(2, 20, 8).astype(np.float32)
        fb = rng.randn(2, 24, 8).astype(np.float32)
        xa = rng.rand(2, 20, 3).astype(np.float32)
        xb = rng.rand(2, 24, 3).astype(np.float32)
        ma = np.ones((2, 20), bool)
        mb = np.ones((2, 24), bool)
        ma[0, 15:] = False
        out = float(circle_loss(
            jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(xa),
            jnp.asarray(xb), jnp.asarray(ma), jnp.asarray(mb),
            r_p=0.2, r_n=0.4,
        ))
        assert np.isfinite(out) and out > 0

    def test_grad_flows(self):
        rng = np.random.RandomState(4)
        fa = jnp.asarray(rng.randn(1, 12, 8).astype(np.float32))
        fb = jnp.asarray(rng.randn(1, 12, 8).astype(np.float32))
        xa = jnp.asarray(rng.rand(1, 12, 3).astype(np.float32))
        xb = jnp.asarray(np.asarray(xa) + rng.randn(1, 12, 3).astype(np.float32) * 0.05)
        m = jnp.ones((1, 12), bool)

        g = jax.grad(lambda f: circle_loss(f, fb, xa, xb, m, m, 0.2, 0.4))(fa)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestEvalProtocol:
    def test_run_test_synthetic(self, tmp_path):
        """Full test protocol on the synthetic modelnet-contract dataset."""
        from regtr_tpu.data import get_dataloader
        from regtr_tpu.evaluation import run_test
        from regtr_tpu.models import create_model, init_model_params
        from regtr_tpu.presets import tiny_config

        cfg = tiny_config(dataset="synthetic", synthetic_items=4,
                          num_points=256, test_batch_size=2, buckets=[192])
        loader = get_dataloader(cfg, "test", num_workers=0)
        model = create_model(cfg, 192)
        variables = init_model_params(model, jax.random.PRNGKey(0))
        results = run_test(cfg, model, variables["params"], loader, tmp_path)
        assert "chamfer_dist" in results
        assert np.isfinite(results["chamfer_dist"])
        assert (tmp_path / "pred_transforms.npy").exists()
        poses = np.load(tmp_path / "pred_transforms.npy")
        assert poses.shape[-2:] == (3, 4)


class TestDataLoader:
    def test_prefetch_early_break_no_leak(self):
        import threading

        from functools import partial

        from regtr_tpu.data.collate import collate_pairs
        from regtr_tpu.data.prefetch import DataLoader
        from regtr_tpu.data.synthetic import SyntheticShapeDataset
        from regtr_tpu.data.modelnet_transforms import get_transforms
        from regtr_tpu.presets import tiny_config

        cfg = tiny_config(num_points=128)
        _, test_t = get_transforms("crop", num_points=128,
                                   predator_compat=False)
        ds = SyntheticShapeDataset(cfg, n_items=32, n_points=256,
                                   transform=test_t)
        loader = DataLoader(ds, batch_size=2,
                            collate_fn=partial(collate_pairs, buckets=[128]),
                            num_workers=2, prefetch=2)
        before = threading.active_count()
        for i, (batch, meta) in enumerate(loader):
            if i == 1:
                break  # early exit mid-epoch
        import time

        time.sleep(1.0)
        assert threading.active_count() <= before + 1

    def test_sharding_partitions_indices(self):
        from functools import partial

        from regtr_tpu.data.collate import collate_pairs
        from regtr_tpu.data.prefetch import DataLoader

        class Identity:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return i

        collate = lambda xs: xs
        a = DataLoader(Identity(), 2, collate, shard=(0, 2), num_workers=0)
        b = DataLoader(Identity(), 2, collate, shard=(1, 2), num_workers=0)
        got_a = [i for batch in a for i in batch]
        got_b = [i for batch in b for i in batch]
        assert sorted(got_a + got_b) == list(range(10))
        assert not set(got_a) & set(got_b)
