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
