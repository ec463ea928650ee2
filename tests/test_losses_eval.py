"""Loss-function unit tests + end-to-end eval-protocol test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regtr_tpu.core import se3_np
from regtr_tpu.losses.corr import corr_loss
from regtr_tpu.losses.feature import (
    circle_loss, circle_loss_sampled, sample_correspondences,
)
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

    def test_core_matches_numpy_oracle(self):
        """circle_loss on fully-valid inputs == an independent numpy
        implementation of the published circle-loss formula (the shared math
        of the reference's CircleLoss.get_circle_loss,
        feature_loss.py:86-126)."""
        from scipy.special import logsumexp as np_lse

        rng = np.random.RandomState(7)
        b, na, nb = 2, 15, 18
        fa = rng.randn(b, na, 6).astype(np.float32)
        fb = rng.randn(b, nb, 6).astype(np.float32)
        xa = rng.rand(b, na, 3).astype(np.float32)
        xb = rng.rand(b, nb, 3).astype(np.float32)
        r_p, r_n, ls, pm, nm = 0.25, 0.5, 10.0, 0.1, 1.4

        got = float(circle_loss(
            jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(xa),
            jnp.asarray(xb), jnp.ones((b, na), bool), jnp.ones((b, nb), bool),
            r_p, r_n, log_scale=ls, pos_margin=pm, neg_margin=nm,
        ))

        coords = np.sqrt(
            np.sum((xa[:, :, None] - xb[:, None, :]) ** 2, -1) + 1e-12)
        fd = np.sqrt(
            np.sum((fa[:, :, None] - fb[:, None, :]) ** 2, -1) + 1e-12)
        pos_mask = coords < r_p
        neg_mask = coords > r_n
        row_sel = pos_mask.any(-1) & neg_mask.any(-1)
        col_sel = pos_mask.any(-2) & neg_mask.any(-2)
        pos = fd - 1e5 * (~pos_mask)
        pos_w = np.maximum(pos - pm, 0)
        neg = fd + 1e5 * (~neg_mask)
        neg_w = np.maximum(nm - neg, 0)
        lr = np.log1p(np.exp(
            np_lse(ls * (pos - pm) * pos_w, axis=-1)
            + np_lse(ls * (nm - neg) * neg_w, axis=-1))) / ls
        lc = np.log1p(np.exp(
            np_lse(ls * (pos - pm) * pos_w, axis=-2)
            + np_lse(ls * (nm - neg) * neg_w, axis=-2))) / ls
        want = (lr[row_sel].mean() + lc[col_sel].mean()) / 2
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestSampledCircleLoss:
    """Sampled variant (reference CircleLoss, feature_loss.py:52-157 — note
    its forward calls an undefined `radius_search` and is dead code there;
    ours is a working implementation of the documented intent)."""

    def _data(self, seed=0, b=2, na=40, nb=44):
        rng = np.random.RandomState(seed)
        xa = rng.rand(b, na, 3).astype(np.float32)
        # ensure plenty of correspondences: xb starts as perturbed xa
        xb = np.concatenate([
            xa + rng.randn(b, na, 3).astype(np.float32) * 0.01,
            rng.rand(b, nb - na, 3).astype(np.float32) + 2.0,
        ], axis=1)
        fa = rng.randn(b, na, 8).astype(np.float32)
        fb = rng.randn(b, nb, 8).astype(np.float32)
        ma = np.ones((b, na), bool)
        mb = np.ones((b, nb), bool)
        ma[1, na - 5:] = False
        return fa, fb, xa, xb, ma, mb

    def test_samples_are_valid_correspondences(self):
        _, _, xa, xb, ma, mb = self._data()
        r_p = 0.125
        ia, ib, valid = sample_correspondences(
            jax.random.PRNGKey(0), jnp.asarray(xa), jnp.asarray(xb),
            jnp.asarray(ma), jnp.asarray(mb), r_p, 64,
        )
        ia, ib, valid = map(np.asarray, (ia, ib, valid))
        assert valid.all()
        for b in range(xa.shape[0]):
            d = np.linalg.norm(xa[b, ia[b]] - xb[b, ib[b]], axis=-1)
            assert np.all(d < r_p - 1e-3)
            assert ma[b, ia[b]].all() and mb[b, ib[b]].all()

    def test_without_replacement_when_enough(self):
        _, _, xa, xb, ma, mb = self._data()
        ia, ib, _ = sample_correspondences(
            jax.random.PRNGKey(1), jnp.asarray(xa), jnp.asarray(xb),
            jnp.asarray(ma), jnp.asarray(mb), 0.125, 16,
        )
        flat = np.asarray(ia) * xb.shape[1] + np.asarray(ib)
        for b in range(xa.shape[0]):
            assert len(np.unique(flat[b])) == 16

    def test_no_candidates_gives_zero(self):
        rng = np.random.RandomState(2)
        xa = rng.rand(1, 10, 3).astype(np.float32)
        xb = xa + 100.0  # nothing within r_p
        fa = rng.randn(1, 10, 4).astype(np.float32)
        m = np.ones((1, 10), bool)
        out = float(circle_loss_sampled(
            jnp.asarray(fa), jnp.asarray(fa), jnp.asarray(xa),
            jnp.asarray(xb), jnp.asarray(m), jnp.asarray(m),
            0.1, 0.2, key=jax.random.PRNGKey(0), n_sample=8,
        ))
        assert out == 0.0

    def test_finite_deterministic_and_grads(self):
        fa, fb, xa, xb, ma, mb = self._data(3)
        args = (jnp.asarray(xa), jnp.asarray(xb),
                jnp.asarray(ma), jnp.asarray(mb))

        def f(feats):
            return circle_loss_sampled(
                feats, jnp.asarray(fb), *args, 0.125, 0.25,
                key=jax.random.PRNGKey(5), n_sample=32,
            )

        v1, v2 = float(f(jnp.asarray(fa))), float(f(jnp.asarray(fa)))
        assert np.isfinite(v1) and v1 > 0 and v1 == v2
        g = jax.grad(f)(jnp.asarray(fa))
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

    def test_run_test_grouped_matches_ungrouped(self, tmp_path, monkeypatch):
        """Size-grouped test batching regroups batches by bucket (and thus
        changes batch emission order), but every ordered protocol artifact
        must still be in dataset order: grouped vs ungrouped runs agree."""
        import regtr_tpu.data as data_mod
        from regtr_tpu.data import get_dataloader, get_dataset
        from regtr_tpu.evaluation import run_test
        from regtr_tpu.models import create_model, init_model_params
        from regtr_tpu.presets import tiny_config

        # neighbor_method='scan' (the exact oracle): this test isolates the
        # regrouping bookkeeping, and only the exact search is strictly
        # invariant to the padded bucket size — approx_min_k's reduction
        # shape follows N, so near-tied candidates can resolve differently
        # at bucket 128 vs 192 (data-dependent; the round-5 generator's
        # planar room scenes trip it where the old blob shapes did not).
        cfg = tiny_config(dataset="synthetic", synthetic_items=6,
                          num_points=256, test_batch_size=2,
                          buckets=[128, 192], neighbor_method="scan")
        base = get_dataset(cfg, "test")
        # Alternate sample sizes so buckets interleave in dataset order and
        # ungrouped batching would mix buckets within a batch.
        sizes = [100, 180, 110, 170, 105, 175]

        class Varied:
            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                s = dict(base[i])
                n = sizes[i]
                for k in ("src_xyz", "src_overlap"):
                    s[k] = s[k][:n]
                for k in ("tgt_xyz", "tgt_overlap"):
                    s[k] = s[k][:n]
                return s

        monkeypatch.setattr(data_mod, "get_dataset", lambda c, p: Varied())

        model = create_model(cfg, 192)
        variables = init_model_params(model, jax.random.PRNGKey(0))

        outs = {}
        for grouped in (False, True):
            cfg["bucket_grouped_test"] = grouped
            loader = get_dataloader(cfg, "test", num_workers=0)
            out_dir = tmp_path / ("grouped" if grouped else "plain")
            results = run_test(cfg, model, variables["params"], loader,
                               out_dir)
            outs[grouped] = (
                np.load(out_dir / "pred_transforms.npy"), results
            )

        poses_plain, res_plain = outs[False]
        poses_grouped, res_grouped = outs[True]
        np.testing.assert_allclose(poses_grouped, poses_plain,
                                   rtol=0, atol=1e-5)
        for k in res_plain:
            np.testing.assert_allclose(res_grouped[k], res_plain[k],
                                       rtol=1e-5, atol=1e-6)


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

    def test_shard_pad_equalizes_batch_counts(self):
        """shard_pad wraps short shards so every process yields the same
        number of batches (collective val loops would hang otherwise)."""
        from regtr_tpu.data.prefetch import DataLoader

        class Identity:
            def __init__(self, n):
                self.n = n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return i

        collate = lambda xs: xs
        # 9 samples over 2 ranks, batch 2: unpadded would be 3 vs 2 batches
        loaders = [
            DataLoader(Identity(9), 2, collate, shard=(r, 2),
                       shard_pad=True, num_workers=0)
            for r in range(2)
        ]
        counts = [len(list(ld)) for ld in loaders]
        assert counts[0] == counts[1] == len(loaders[0])
        # every original sample still appears at least once
        seen = {i for ld in loaders for batch in ld for i in batch}
        assert seen == set(range(9))
        # a rank with an empty raw shard still yields batches
        tiny = DataLoader(Identity(1), 2, collate, shard=(1, 2),
                          shard_pad=True, num_workers=0)
        assert len(list(tiny)) == 1

    def test_group_key_batches_are_single_bucket(self):
        """Size-grouped batching: every batch is single-key, the sample
        multiset is unchanged, and it works identically with and without
        worker threads (streaming grouped path)."""
        from regtr_tpu.data.prefetch import DataLoader

        sizes = [100, 900, 120, 130, 950, 140, 990, 105, 115, 920, 30]

        class Sized:
            def __len__(self):
                return len(sizes)

            def __getitem__(self, i):
                return {"i": i, "n": sizes[i]}

        key = lambda s: 128 if s["n"] <= 128 else 1024
        collate = lambda xs: xs
        for nw in (0, 2):
            loader = DataLoader(Sized(), 3, collate, num_workers=nw,
                                group_key=key)
            batches = list(loader)
            # each batch is single-bucket
            for b in batches:
                assert len({key(s) for s in b}) == 1
            # multiset of samples preserved
            got = sorted(s["i"] for b in batches for s in b)
            assert got == list(range(len(sizes)))
            # full batches except at most one remainder per bucket
            short = [b for b in batches if len(b) < 3]
            assert len(short) <= 2
