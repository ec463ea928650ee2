"""Unit tests for regtr_tpu.core: SE(3) ops, Kabsch, masking utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regtr_tpu.core import se3, se3_np, masking


def random_pose(rng):
    rot = se3_np.sample_uniform_rotation(rng)
    trans = rng.randn(3).astype(np.float32)
    return se3_np.se3_init(rot, trans)


class TestSE3:
    def test_cat_inv_roundtrip(self):
        rng = np.random.RandomState(0)
        a = jnp.asarray(random_pose(rng))
        out = se3.se3_cat(a, se3.se3_inv(a))
        np.testing.assert_allclose(out, np.eye(3, 4), atol=1e-5)

    def test_transform_matches_numpy(self):
        rng = np.random.RandomState(1)
        pose = random_pose(rng)
        xyz = rng.randn(50, 3).astype(np.float32)
        ref = se3_np.se3_transform(pose, xyz)
        out = se3.se3_transform(jnp.asarray(pose), jnp.asarray(xyz))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_compare_zero_for_same(self):
        rng = np.random.RandomState(2)
        pose = jnp.asarray(random_pose(rng))
        err = se3.se3_compare(pose, pose)
        assert float(err["rot_deg"]) < 0.1
        assert float(err["trans"]) < 1e-5

    def test_so3_exp_log_roundtrip(self):
        rng = np.random.RandomState(3)
        omega = jnp.asarray(rng.randn(10, 3).astype(np.float32) * 0.5)
        rot = se3.so3_exp(omega)
        back = se3.so3_log(rot)
        np.testing.assert_allclose(back, omega, atol=1e-4)


class TestKabsch:
    def test_recovers_known_pose(self):
        rng = np.random.RandomState(4)
        pose = random_pose(rng)
        a = rng.randn(100, 3).astype(np.float32)
        b = se3_np.se3_transform(pose, a)
        est = se3.compute_rigid_transform(jnp.asarray(a), jnp.asarray(b))
        err = se3.se3_compare(est, jnp.asarray(pose))
        assert float(err["rot_deg"]) < 0.1
        assert float(err["trans"]) < 1e-3

    def test_weighted_ignores_zero_weight_outliers(self):
        rng = np.random.RandomState(5)
        pose = random_pose(rng)
        a = rng.randn(80, 3).astype(np.float32)
        b = se3_np.se3_transform(pose, a)
        # corrupt half the points but zero their weights
        b_bad = b.copy()
        b_bad[40:] += rng.randn(40, 3) * 10
        w = np.ones(80, np.float32)
        w[40:] = 0.0
        est = se3.compute_rigid_transform(
            jnp.asarray(a), jnp.asarray(b_bad), jnp.asarray(w)
        )
        err = se3.se3_compare(est, jnp.asarray(pose))
        assert float(err["rot_deg"]) < 0.1
        assert float(err["trans"]) < 1e-3

    def test_batched_and_jittable(self):
        rng = np.random.RandomState(6)
        poses = np.stack([random_pose(rng) for _ in range(6)]).reshape(2, 3, 3, 4)
        a = rng.randn(2, 3, 64, 3).astype(np.float32)
        b = np.einsum("lbij,lbnj->lbni", poses[..., :3], a) + poses[..., None, :, 3]
        est = jax.jit(se3.compute_rigid_transform)(
            jnp.asarray(a), jnp.asarray(b)
        )
        err = se3.se3_compare(est, jnp.asarray(poses))
        assert float(jnp.max(err["rot_deg"])) < 0.2

    def test_grad_flows(self):
        rng = np.random.RandomState(7)
        a = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        w = jnp.ones(30)

        def loss(w):
            t = se3.compute_rigid_transform(a, b, w)
            return jnp.sum(t ** 2)

        g = jax.grad(loss)(w)
        assert np.all(np.isfinite(g))

    def test_degenerate_weights_no_nan(self):
        a = jnp.zeros((10, 3))
        b = jnp.zeros((10, 3))
        w = jnp.zeros(10)
        t = se3.compute_rigid_transform(a, b, w)
        assert np.all(np.isfinite(np.asarray(t)))


class TestMasking:
    def test_masked_mean_matches_slice(self):
        rng = np.random.RandomState(8)
        x = rng.randn(4, 16, 8).astype(np.float32)
        lens = np.array([16, 3, 8, 1])
        mask = masking.lengths_to_mask(jnp.asarray(lens), 16)
        out = masking.masked_mean(
            jnp.asarray(x), np.asarray(mask)[..., None], axis=1
        )
        for b in range(4):
            np.testing.assert_allclose(
                out[b], x[b, : lens[b]].mean(0), rtol=1e-5, atol=1e-6
            )

    def test_instance_norm_matches_unmasked(self):
        rng = np.random.RandomState(9)
        x = rng.randn(2, 12, 4).astype(np.float32)
        lens = np.array([12, 5])
        mask = masking.lengths_to_mask(jnp.asarray(lens), 12)
        out = np.asarray(masking.masked_instance_norm(jnp.asarray(x), mask))
        for b, l in enumerate(lens):
            seg = x[b, :l]
            ref = (seg - seg.mean(0)) / np.sqrt(seg.var(0) + 1e-5)
            np.testing.assert_allclose(out[b, :l], ref, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(out[b, l:], 0.0)

    def test_masked_softmax_rows(self):
        logits = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 1.0, 1.0]])
        mask = jnp.asarray([[True, True, False], [False, False, False]])
        out = np.asarray(masking.masked_softmax(logits, mask))
        np.testing.assert_allclose(out[0, :2].sum(), 1.0, rtol=1e-6)
        assert out[0, 2] == 0.0
        np.testing.assert_allclose(out[1], 0.0)

    def test_masked_logsumexp(self):
        logits = jnp.asarray([[1.0, 2.0, 100.0]])
        mask = jnp.asarray([[True, True, False]])
        out = float(masking.masked_logsumexp(logits, mask)[0])
        ref = np.log(np.exp(1.0) + np.exp(2.0))
        np.testing.assert_allclose(out, ref, rtol=1e-5)


class TestRowGatherVJP:
    def test_custom_bwd_matches_autodiff(self):
        """segment_sum backward == the mathematical gather transpose."""
        from regtr_tpu.ops.kpconv import batched_row_gather, _row_gather_fwd_impl

        rng = np.random.RandomState(20)
        x = jnp.asarray(rng.randn(3, 16, 5).astype(np.float32))
        inds = jnp.asarray(rng.randint(0, 16, (3, 20)).astype(np.int32))
        g = jnp.asarray(rng.randn(3, 20, 5).astype(np.float32))

        def loss_custom(x):
            return jnp.sum(batched_row_gather(x, inds) * g)

        def loss_plain(x):
            return jnp.sum(_row_gather_fwd_impl(x, inds) * g)

        d_custom = jax.grad(loss_custom)(x)
        d_plain = jax.grad(loss_plain)(x)
        np.testing.assert_allclose(
            np.asarray(d_custom), np.asarray(d_plain), rtol=1e-5, atol=1e-6
        )


def test_xlsx_writer_roundtrip(tmp_path):
    """Dependency-free xlsx writer: valid zip structure + value round-trip."""
    import zipfile

    from regtr_tpu.utils.xlsx import read_xlsx, write_xlsx

    rows = [
        ["scene", "src", "tgt", "error", "flag"],
        ["7-scenes-redkitchen", 0, 3, 0.0421, True],
        ["sun3d <&> tricky", 12, 59, 1.5, False],
    ]
    path = tmp_path / "errs.xlsx"
    write_xlsx(path, rows, sheet_name="individual_errors")

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names

    back = read_xlsx(path)
    assert back[0] == rows[0]
    assert back[1] == ["7-scenes-redkitchen", 0.0, 3.0, 0.0421, True]
    assert back[2][0] == "sun3d <&> tricky"  # XML escaping survives
    assert back[2][4] is False
