"""SO3/SE3 Lie-group class tests."""
import numpy as np
import pytest

from regtr_tpu.core.lie import SE3, SO3


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    omega = rng.randn(5, 3).astype(np.float32) * 0.7
    rot = SO3.exp(omega)
    np.testing.assert_allclose(rot.log(), omega, atol=1e-4)


def test_so3_inv_compose():
    r = SO3.sample_uniform(np.random.RandomState(1))
    eye = (r * r.inv()).as_matrix()
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(2)
    xi = rng.randn(4, 6).astype(np.float32) * 0.5
    t = SE3.exp(xi)
    np.testing.assert_allclose(t.log(), xi, atol=1e-4)


def test_se3_transform_and_inverse():
    rng = np.random.RandomState(3)
    t = SE3.sample_uniform(rng=rng)
    pts = rng.randn(20, 3).astype(np.float32)
    back = t.inv() * (t * pts)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_se3_compare_identity():
    t = SE3.sample_uniform(rng=np.random.RandomState(4))
    err = t.compare(t)
    assert float(err["rot_deg"]) < 0.1
    assert float(err["trans"]) < 1e-5


def test_sample_small_is_small():
    rng = np.random.RandomState(5)
    errs = [
        SE3.sample_small(std=0.05, rng=rng).compare(SE3.identity().data)
        for _ in range(50)
    ]
    rots = [float(e["rot_deg"]) for e in errs]
    assert np.mean(rots) < 10.0


def test_quaternion_unit():
    q = SO3.sample_uniform(np.random.RandomState(6)).as_quaternion()
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)


def test_4x4():
    t = SE3.sample_uniform(rng=np.random.RandomState(7))
    m = t.as_matrix_4x4()
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])


class TestAnalyticJacobians:
    """pexp + the three SE3 jacobians (reference cvhelpers/lie/torch/
    se3.py:114-278), validated against finite differences of our exp.
    Layout: rows = column-major flatten of the 3x4 matrix; eps = (omega, v).
    """

    @staticmethod
    def _flat_cm(mat34):
        return np.asarray(mat34).T.reshape(-1)  # columns stacked

    def _fd_jac(self, f, eps=1e-3):
        # SE3 stores float32; eps balances truncation O(eps^2) against fp32
        # rounding O(1e-7/eps) — both ~1e-4 at 1e-3.
        cols = []
        for i in range(6):
            d = np.zeros(6, np.float32)
            d[i] = eps
            cols.append((f(d) - f(-d)) / (2 * eps))
        return np.stack(cols, axis=-1)  # (12, 6)

    def test_pexp(self):
        xi = np.array([0.3, -0.2, 0.5, 1.0, -2.0, 0.5], np.float32)
        out = SE3.pexp(xi)
        np.testing.assert_allclose(out.trans, xi[3:], atol=1e-7)
        np.testing.assert_allclose(
            out.rot.as_matrix(), SO3.exp(xi[:3]).as_matrix(), atol=1e-6
        )

    def test_jacob_expeD_de(self):
        rng = np.random.RandomState(0)
        D = SE3.sample_uniform(rng=rng)
        want = self._fd_jac(
            lambda e: self._flat_cm((SE3.exp(e) * D).data)
        )
        got = SE3.jacob_expeD_de(D)
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_jacob_Dexpe_de(self):
        rng = np.random.RandomState(1)
        D = SE3.sample_uniform(rng=rng)
        want = self._fd_jac(
            lambda e: self._flat_cm((D * SE3.exp(e)).data)
        )
        got = SE3.jacob_Dexpe_de(D)
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_jacob_dAexpeD_de(self):
        rng = np.random.RandomState(2)
        A = SE3.sample_uniform(rng=rng)
        D = SE3.sample_uniform(rng=rng)
        want = self._fd_jac(
            lambda e: self._flat_cm((A * SE3.exp(e) * D).data)
        )
        got = SE3.jacob_dAexpeD_de(A, D)
        np.testing.assert_allclose(got, want, atol=5e-3)
        # compact block form carries the same five non-zero blocks
        compact = SE3.jacob_dAexpeD_de(A, D, full_matrix=False)
        np.testing.assert_allclose(compact[:3], got[9:12, 3:6], atol=1e-6)
        for col in range(4):
            np.testing.assert_allclose(
                compact[3 * (col + 1): 3 * (col + 2)],
                got[3 * col: 3 * col + 3, 0:3], atol=1e-6,
            )
