"""Deformable / modulated KPConv tests.

Covers the reference's deformable branch (/root/reference/src/models/
backbone_kpconv/kpconv_blocks.py:275-356), which no shipped config uses but
is reference capability: offsets predicted by a rigid KPConv deform the
kernel-point positions per query; `modulated` adds a 2*sigmoid gain per
kernel point.  Verified against (a) the rigid op when offsets are zero and
(b) an independent numpy oracle for nonzero offsets.
"""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from regtr_tpu.ops.kpconv import kpconv, kpconv_deformable

pytestmark = pytest.mark.slow  # compile-heavy: fresh XLA compiles dominate



def _rigid_oracle(q, s, inds, x, kp, w, extent):
    """Per-query rigid KPConv, direct loops (linear influence, sum agg,
    valid-count normalization)."""
    ns = len(s)
    s_pad = np.vstack([s, np.full((1, 3), 1e6, np.float32)])
    x_pad = np.vstack([x, np.zeros((1, x.shape[1]), np.float32)])
    out = np.zeros((len(q), w.shape[-1]), np.float64)
    for i, row in enumerate(inds):
        nb = s_pad[row] - q[i]                               # (K, 3)
        d = np.linalg.norm(nb[:, None, :] - kp[None], axis=-1)   # (K, P)
        infl = np.clip(1.0 - d / extent, 0.0, None)
        fx = x_pad[row]                                      # (K, C)
        wf = infl.T @ fx                                     # (P, C)
        o = sum(wf[p] @ w[p] for p in range(w.shape[0]))
        out[i] = o / max(int((row < ns).sum()), 1)
    return out.astype(np.float32)


def _deformable_oracle(q, s, inds, x, kp, w, ow, ob, extent, modulated):
    p = kp.shape[0]
    off = _rigid_oracle(q, s, inds, x, kp, ow, extent) + ob  # (Nq, odim)
    ns = len(s)
    s_pad = np.vstack([s, np.full((1, 3), 1e6, np.float32)])
    x_pad = np.vstack([x, np.zeros((1, x.shape[1]), np.float32)])
    out = np.zeros((len(q), w.shape[-1]), np.float64)
    for i, row in enumerate(inds):
        offsets = off[i, : 3 * p].reshape(p, 3) * extent
        dkp = kp + offsets
        nb = s_pad[row] - q[i]
        d = np.linalg.norm(nb[:, None, :] - dkp[None], axis=-1)
        infl = np.clip(1.0 - d / extent, 0.0, None)
        wf = infl.T @ x_pad[row]                             # (P, C)
        if modulated:
            gain = 2.0 / (1.0 + np.exp(-off[i, 3 * p:]))     # (P,)
            wf = wf * gain[:, None]
        o = sum(wf[k] @ w[k] for k in range(p))
        out[i] = o / max(int((row < ns).sum()), 1)
    return out.astype(np.float32)


def _setup(seed=0, nq=12, ns=20, k=6, p=5, cin=4, cout=7):
    rng = np.random.RandomState(seed)
    q = rng.rand(nq, 3).astype(np.float32)
    s = rng.rand(ns, 3).astype(np.float32)
    x = rng.randn(ns, cin).astype(np.float32)
    kp = (rng.rand(p, 3).astype(np.float32) - 0.5) * 0.4
    w = rng.randn(p, cin, cout).astype(np.float32) * 0.2
    d = np.linalg.norm(q[:, None] - s[None], axis=-1)
    inds = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    inds[0, -2:] = ns  # some shadow neighbors
    return q, s, inds, x, kp, w


class TestDeformableKPConv:
    def test_zero_offsets_equal_rigid(self):
        q, s, inds, x, kp, w = _setup()
        p, cin, _ = w.shape
        ow = np.zeros((p, cin, 3 * p), np.float32)
        ob = np.zeros((3 * p,), np.float32)
        rigid = kpconv(
            jnp.asarray(q[None]), jnp.asarray(s[None]), jnp.asarray(inds[None]),
            jnp.asarray(x[None]), jnp.asarray(kp), jnp.asarray(w), 0.3,
        )
        deform = kpconv_deformable(
            jnp.asarray(q[None]), jnp.asarray(s[None]), jnp.asarray(inds[None]),
            jnp.asarray(x[None]), jnp.asarray(kp), jnp.asarray(w),
            jnp.asarray(ow), jnp.asarray(ob), 0.3,
        )
        np.testing.assert_allclose(
            np.asarray(deform), np.asarray(rigid), rtol=1e-5, atol=1e-5
        )

    def test_modulated_identity_gain(self):
        """Zero offset weights -> gain = 2*sigmoid(0) = 1 -> equals rigid."""
        q, s, inds, x, kp, w = _setup(1)
        p, cin, _ = w.shape
        ow = np.zeros((p, cin, 4 * p), np.float32)
        ob = np.zeros((4 * p,), np.float32)
        rigid = kpconv(
            jnp.asarray(q[None]), jnp.asarray(s[None]), jnp.asarray(inds[None]),
            jnp.asarray(x[None]), jnp.asarray(kp), jnp.asarray(w), 0.3,
        )
        deform = kpconv_deformable(
            jnp.asarray(q[None]), jnp.asarray(s[None]), jnp.asarray(inds[None]),
            jnp.asarray(x[None]), jnp.asarray(kp), jnp.asarray(w),
            jnp.asarray(ow), jnp.asarray(ob), 0.3, modulated=True,
        )
        np.testing.assert_allclose(
            np.asarray(deform), np.asarray(rigid), rtol=1e-5, atol=1e-5
        )

    def test_matches_numpy_oracle(self):
        q, s, inds, x, kp, w = _setup(2)
        p, cin, _ = w.shape
        rng = np.random.RandomState(3)
        for modulated in (False, True):
            odim = (3 + int(modulated)) * p
            ow = rng.randn(p, cin, odim).astype(np.float32) * 0.1
            ob = rng.randn(odim).astype(np.float32) * 0.1
            want = _deformable_oracle(q, s, inds, x, kp, w, ow, ob, 0.3,
                                      modulated)
            got = kpconv_deformable(
                jnp.asarray(q[None]), jnp.asarray(s[None]),
                jnp.asarray(inds[None]), jnp.asarray(x[None]),
                jnp.asarray(kp), jnp.asarray(w),
                jnp.asarray(ow), jnp.asarray(ob), 0.3, modulated=modulated,
            )
            np.testing.assert_allclose(
                np.asarray(got)[0], want, rtol=2e-4, atol=2e-4,
                err_msg=f"modulated={modulated}",
            )

    def test_deformable_architecture_trains(self):
        """'resnetb_deformable' blocks build, run, and backprop through the
        full model; offset params exist in the tree."""
        from regtr_tpu.models import create_model, init_model_params
        from regtr_tpu.presets import tiny_config

        cfg = tiny_config(
            architecture=["simple", "resnetb_deformable",
                          "resnetb_deformable_strided", "resnetb"],
            modulated=True,
        )
        n0 = 96
        model = create_model(cfg, n0)
        variables = init_model_params(model, jax.random.PRNGKey(0))
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert any("offset_weights" in n for n in names)
        assert any("offset_bias" in n for n in names)

        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(2, n0, 3).astype(np.float32) - 0.5)
        mask = jnp.ones((2, n0), bool)
        pose = jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4))
        ov = jnp.ones((2, n0), jnp.float32)

        def loss_fn(p):
            losses, _ = model.apply(
                {"params": p}, pts, mask, pose, ov,
                method=model.compute_loss,
            )
            return losses["total"]

        val, g = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(val))
        assert all(
            bool(jnp.all(jnp.isfinite(x)))
            for x in jax.tree_util.tree_leaves(g)
        )
