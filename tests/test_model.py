"""Model-level tests: forward contract, loss/grads, invariances, sharding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regtr_tpu.core import se3_np
from regtr_tpu.core.pairs import interleave_pairs, split_pairs, swap_pairs
from regtr_tpu.models import create_model, init_model_params
from regtr_tpu.presets import tiny_config


N0 = 96
B = 2


@pytest.fixture(scope="module")
def model_and_params():
    model = create_model(tiny_config(), N0)
    variables = init_model_params(model, jax.random.PRNGKey(0))
    return model, variables["params"]


def synthetic_batch(seed=0, n_pairs=B):
    rng = np.random.RandomState(seed)
    src = rng.rand(n_pairs, N0, 3).astype(np.float32) - 0.5
    poses = np.stack(
        [se3_np.se3_init(se3_np.sample_uniform_rotation(rng, max_deg=30.0),
                         rng.randn(3).astype(np.float32) * 0.1)
         for _ in range(n_pairs)]
    )
    tgt = np.einsum("bij,bnj->bni", poses[:, :, :3], src) + poses[:, None, :, 3]
    pts = np.empty((2 * n_pairs, N0, 3), np.float32)
    pts[0::2], pts[1::2] = src, tgt
    mask = np.ones((2 * n_pairs, N0), bool)
    overlap0 = np.ones((2 * n_pairs, N0), np.float32)
    return {
        "points": jnp.asarray(pts),
        "mask": jnp.asarray(mask),
        "pose": jnp.asarray(poses),
        "overlap0": jnp.asarray(overlap0),
    }


class TestPairs:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(3, 5, 2))
        tgt = jnp.asarray(rng.randn(3, 5, 2))
        both = interleave_pairs(src, tgt)
        s2, t2 = split_pairs(both)
        np.testing.assert_array_equal(s2, src)
        np.testing.assert_array_equal(t2, tgt)
        swapped = swap_pairs(both)
        s3, t3 = split_pairs(swapped)
        np.testing.assert_array_equal(s3, tgt)
        np.testing.assert_array_equal(t3, src)

    def test_axis1(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(4, 6, 3))
        sw = swap_pairs(x, axis=1)
        np.testing.assert_array_equal(sw[:, 0], x[:, 1])
        np.testing.assert_array_equal(sw[:, 5], x[:, 4])


class TestForward:
    def test_output_contract(self, model_and_params):
        model, params = model_and_params
        batch = synthetic_batch()
        out = model.apply({"params": params}, batch["points"], batch["mask"])
        L = model.cfg["num_encoder_layers"]
        nc = model.spec.capacities[-1]
        assert out["pose"].shape == (L, B, 3, 4)
        assert out["corr"].shape == (L, 2 * B, nc, 3)
        assert out["overlap_logits"].shape == (L, 2 * B, nc)
        assert out["feats_cond"].shape == (L, 2 * B, nc, model.cfg["d_embed"])
        for k in ("pose", "corr", "overlap_logits", "feats_cond", "feats_un"):
            assert bool(jnp.all(jnp.isfinite(out[k]))), k

    def test_rotation_valid(self, model_and_params):
        model, params = model_and_params
        batch = synthetic_batch()
        out = model.apply({"params": params}, batch["points"], batch["mask"])
        rot = np.asarray(out["pose"][..., :3])
        rtr = np.einsum("lbij,lbkj->lbik", rot, rot)
        np.testing.assert_allclose(
            rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-4
        )
        det = np.linalg.det(rot)
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_padding_invariance(self, model_and_params):
        """Growing the padding region must not change valid outputs."""
        model, params = model_and_params
        batch = synthetic_batch()
        mask2 = np.asarray(batch["mask"]).copy()
        mask2[:, 80:] = False
        out_a = model.apply(
            {"params": params}, batch["points"], jnp.asarray(mask2)
        )
        pts_b = np.asarray(batch["points"]).copy()
        pts_b[:, 80:] = 7.7  # garbage in padding
        out_b = model.apply(
            {"params": params}, jnp.asarray(pts_b), jnp.asarray(mask2)
        )
        np.testing.assert_allclose(
            np.asarray(out_a["pose"]), np.asarray(out_b["pose"]),
            atol=2e-4,
        )

    def test_loss_and_grads_finite(self, model_and_params):
        model, params = model_and_params
        batch = synthetic_batch()

        def loss_fn(p):
            losses, _ = model.apply(
                {"params": p}, batch["points"], batch["mask"],
                batch["pose"], batch["overlap0"], method=model.compute_loss,
            )
            return losses["total"], losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        assert np.isfinite(float(total))
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # InfoNCE W receives gradient
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        w_grads = [g for p, g in flat if any("criterion" in str(k) for k in p)]
        assert any(float(jnp.abs(g).max()) > 0 for g in w_grads)


class TestTrainStep:
    def test_loss_decreases(self, model_and_params):
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState, make_train_step

        model, params = model_and_params
        cfg = model.cfg.copy()
        cfg["base_lr"] = 1e-3
        cfg["scheduler"] = "none"
        tx = make_optimizer(cfg)
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx
        )
        step = make_train_step(model, donate=False)
        batch = synthetic_batch()
        first = None
        for i in range(8):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["total"])
        last = float(metrics["total"])
        assert np.isfinite(last)
        assert last < first, (first, last)

    def test_sharded_train_step_on_mesh(self, model_and_params):
        """Full train step over the virtual 8-device mesh."""
        from regtr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState, make_train_step

        model, params = model_and_params
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev)
        tx = make_optimizer(model.cfg)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(model, mesh=mesh, donate=False)
        batch = shard_batch(synthetic_batch(n_pairs=n_dev), mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["total"]))

    def test_sharded_matches_single_device(self, model_and_params):
        """Data-parallel step computes the same loss as unsharded."""
        from regtr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState, make_train_step

        model, params = model_and_params
        n_dev = len(jax.devices())
        batch = synthetic_batch(n_pairs=n_dev)

        tx = make_optimizer(model.cfg)
        s0 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        step0 = make_train_step(model, donate=False)
        _, m0 = step0(s0, batch)

        mesh = make_mesh(n_dev)
        s1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        s1 = jax.device_put(s1, replicated(mesh))
        step1 = make_train_step(model, mesh=mesh, donate=False)
        _, m1 = step1(s1, shard_batch(batch, mesh))
        np.testing.assert_allclose(
            float(m0["total"]), float(m1["total"]), rtol=2e-4
        )

    def test_sharded_pallas_kernels_match_xla(self):
        """Pallas custom kernels (flash attention + sorted segsum backward)
        partition correctly under the data-parallel mesh: the sharded train
        step with pallas impls is bitwise-equal to sharded XLA impls.

        The sorted segsum is opt-in (REGTR_SEGSUM_IMPL=pallas /
        set_segsum_impl; auto resolves to XLA on every backend), so this
        test exercises that explicit combination under the mesh — the
        xla-default CPU dryrun would otherwise never cover it."""
        from regtr_tpu.ops import kpconv as K
        from regtr_tpu.parallel.mesh import make_mesh, replicated, shard_batch
        from regtr_tpu.train.optim import make_optimizer
        from regtr_tpu.train.steps import TrainState, make_train_step

        n_dev = len(jax.devices())
        batch = synthetic_batch(n_pairs=n_dev)
        mesh = make_mesh(n_dev)

        def run(attn, seg):
            model = create_model(tiny_config(attention_impl=attn), N0)
            variables = init_model_params(model, jax.random.PRNGKey(0))
            tx = make_optimizer(model.cfg)
            s = TrainState.create(
                apply_fn=model.apply, params=variables["params"], tx=tx
            )
            s = jax.device_put(s, replicated(mesh))
            step = make_train_step(model, mesh=mesh, donate=False)
            try:
                K.set_segsum_impl(seg)
                _, m = step(s, shard_batch(dict(batch), mesh))
                return float(m["total"]), float(m["grad_norm"])
            finally:
                K.set_segsum_impl("auto")

        ref = run("xla", "xla")
        got = run("pallas_interpret", "pallas")
        # flash attention reorders the softmax reduction, so equality is
        # tight-tolerance, not bitwise; a mispartition would be O(1) off.
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestDecoderHeadVariant:
    def test_attention_decoder_path(self):
        """direct_regress_coor=False: the single-head attention decoder whose
        values are the partner cloud's coordinates (regtr.py:297-396)."""
        model = create_model(
            tiny_config(direct_regress_coor=False), N0
        )
        variables = init_model_params(model, jax.random.PRNGKey(0))
        batch = synthetic_batch()
        out = model.apply(
            {"params": variables["params"]}, batch["points"], batch["mask"]
        )
        corr = np.asarray(out["corr"])
        assert np.all(np.isfinite(corr))
        # attention output is a convex combination of partner coordinates ->
        # predictions lie inside the partner cloud's bounding box
        pts = np.asarray(batch["points"])
        for b in range(2 * B):
            partner = pts[b + 1 if b % 2 == 0 else b - 1]
            lo, hi = partner.min(0) - 1e-4, partner.max(0) + 1e-4
            valid = np.asarray(out["kp_mask"][b])
            c = corr[:, b][:, valid]
            assert np.all(c >= lo) and np.all(c <= hi), b

    def test_decoder_topk_neighbor_masking(self):
        """corr_decoder_num_neighbors=k restricts attention to the k
        highest-scoring partner points (intent of reference
        regtr.py:341-348).  k=1 must output exactly the argmax partner
        point; k >= N must equal the unmasked decoder."""
        from regtr_tpu.nn.heads import CorrespondenceDecoder

        rng = np.random.RandomState(0)
        L, b2, n, d = 2, 4, 12, 16
        feats = jnp.asarray(rng.randn(L, b2, n, d).astype(np.float32))
        xyz = jnp.asarray(rng.rand(b2, n, 3).astype(np.float32))
        mask = np.ones((b2, n), bool)
        mask[1, 9:] = False
        mask = jnp.asarray(mask)

        def run(k):
            dec = CorrespondenceDecoder(d, use_pos_emb=False, num_neighbors=k)
            variables = dec.init(
                jax.random.PRNGKey(1), feats, xyz, None, mask
            )
            return dec.apply(variables, feats, xyz, None, mask)

        corr_full, _ = run(0)
        corr_big, _ = run(n + 5)
        np.testing.assert_allclose(
            np.asarray(corr_full), np.asarray(corr_big), rtol=1e-6
        )

        corr_k1, _ = run(1)
        # with k=1 the softmax collapses to one partner point: every output
        # must coincide with some (valid) partner coordinate
        from regtr_tpu.core.pairs import swap_pairs
        partner_xyz = np.asarray(swap_pairs(xyz))
        partner_mask = np.asarray(swap_pairs(mask))
        c = np.asarray(corr_k1)
        for bi in range(b2):
            cand = partner_xyz[bi][partner_mask[bi]]
            dists = np.linalg.norm(
                c[:, bi, :, None, :] - cand[None, None, :, :], axis=-1
            ).min(-1)
            np.testing.assert_allclose(dists, 0.0, atol=1e-5)

        cfg_model = create_model(
            tiny_config(direct_regress_coor=False,
                        corr_decoder_num_neighbors=3), N0
        )
        variables = init_model_params(cfg_model, jax.random.PRNGKey(0))
        batch = synthetic_batch()
        out = cfg_model.apply(
            {"params": variables["params"]}, batch["points"], batch["mask"]
        )
        assert np.all(np.isfinite(np.asarray(out["corr"])))

    def test_decoder_grads(self):
        model = create_model(
            tiny_config(direct_regress_coor=False), N0
        )
        variables = init_model_params(model, jax.random.PRNGKey(0))
        batch = synthetic_batch()

        def loss_fn(p):
            losses, _ = model.apply(
                {"params": p}, batch["points"], batch["mask"],
                batch["pose"], batch["overlap0"], method=model.compute_loss,
            )
            return losses["total"]

        g = jax.grad(loss_fn)(variables["params"])
        assert all(
            bool(jnp.all(jnp.isfinite(x)))
            for x in jax.tree_util.tree_leaves(g)
        )


def test_circle_sampled_feature_loss_path():
    """feature_loss_type=circle_sampled trains end-to-end: finite loss,
    finite grads, deterministic across calls (data-derived sampling key)."""
    model = create_model(
        tiny_config(feature_loss_type="circle_sampled",
                    circle_n_sample=32, wt_feature=1.0), N0
    )
    variables = init_model_params(model, jax.random.PRNGKey(0))
    batch = synthetic_batch()

    def loss_fn(p):
        losses, _ = model.apply(
            {"params": p}, batch["points"], batch["mask"],
            batch["pose"], batch["overlap0"], method=model.compute_loss,
        )
        return losses["total"], losses

    (v1, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    (v2, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(v1)) and float(v1) == float(v2)
    assert np.isfinite(float(losses["feature_1"]))
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g)
    )


def test_register_public_api():
    """Top-level regtr_tpu.register() on a small cloud pair."""
    import regtr_tpu

    rng = np.random.RandomState(0)
    src = rng.rand(300, 3).astype(np.float32) - 0.5
    pose = se3_np.se3_init(
        se3_np.sample_uniform_rotation(rng, max_deg=20.0),
        rng.randn(3).astype(np.float32) * 0.1,
    )
    tgt = se3_np.se3_transform(pose, src)
    out = regtr_tpu.register(src, tgt, cfg=tiny_config(buckets=[320]))
    assert out["pose"].shape == (3, 4)
    rot = out["pose"][:, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
    assert out["src_kp"].shape[1] == 3
    assert out["src_overlap"].min() >= 0 and out["src_overlap"].max() <= 1


def test_overlap_threshold_option():
    """overlap_threshold zeroes sub-threshold pose-solve weights (the
    reference documents this inference option but ships it disabled,
    regtr.py:196-198).  Thresholded weights change the pose unless all
    weights already exceed the threshold."""
    model_a = create_model(tiny_config(), N0)
    variables = init_model_params(model_a, jax.random.PRNGKey(0))
    batch = synthetic_batch()
    out_a = model_a.apply(
        {"params": variables["params"]}, batch["points"], batch["mask"]
    )
    model_b = create_model(tiny_config(overlap_threshold=0.5), N0)
    out_b = model_b.apply(
        {"params": variables["params"]}, batch["points"], batch["mask"]
    )
    assert np.all(np.isfinite(np.asarray(out_b["pose"])))
    # random-init overlap probs straddle 0.5, so some weights were zeroed
    # and the solved pose differs
    assert np.abs(
        np.asarray(out_a["pose"]) - np.asarray(out_b["pose"])
    ).max() > 1e-6
