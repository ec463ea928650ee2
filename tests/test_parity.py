"""Numerical parity vs torch reference semantics.

These tests pin the weight-mapping contract used by the checkpoint converter:
torch's packed MultiheadAttention <-> separate q/k/v projections, per-cloud
InstanceNorm1d <-> masked instance norm, KPConv math vs the numpy oracle,
and the InfoNCE formula vs an independent torch implementation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from regtr_tpu.core.masking import masked_instance_norm
from regtr_tpu.nn.transformer import MultiHeadAttention
from regtr_tpu.utils.kernel_points import load_kernel_points

from .oracles import kpconv_oracle


class TestMHAParityWithTorch:
    def test_matches_torch_multihead(self):
        """Our separate-projection MHA == torch packed MHA under the
        converter's weight mapping."""
        d, h, b, n = 32, 4, 2, 10
        rng = np.random.RandomState(0)
        torch_mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
        torch_mha.eval()

        x = rng.randn(b, n, d).astype(np.float32)
        key_mask = np.zeros((b, n), bool)
        key_mask[1, 7:] = True  # torch: True = masked OUT

        with torch.no_grad():
            ref, _ = torch_mha(
                torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                key_padding_mask=torch.from_numpy(key_mask),
            )

        # Converter mapping: in_proj_weight rows [0:d]=q, [d:2d]=k, [2d:3d]=v;
        # flax Dense kernel = torch weight transposed.
        w = torch_mha.in_proj_weight.detach().numpy()
        bias = torch_mha.in_proj_bias.detach().numpy()
        params = {
            "q_proj": {"kernel": w[:d].T, "bias": bias[:d]},
            "k_proj": {"kernel": w[d:2 * d].T, "bias": bias[d:2 * d]},
            "v_proj": {"kernel": w[2 * d:].T, "bias": bias[2 * d:]},
            "out_proj": {
                "kernel": torch_mha.out_proj.weight.detach().numpy().T,
                "bias": torch_mha.out_proj.bias.detach().numpy(),
            },
        }
        mha = MultiHeadAttention(d, h)
        out = mha.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            jnp.asarray(~key_mask),  # ours: True = valid
        )
        valid = ~key_mask
        np.testing.assert_allclose(
            np.asarray(out)[valid], ref.numpy()[valid], atol=2e-5
        )


class TestInstanceNormParity:
    def test_matches_torch_instancenorm(self):
        rng = np.random.RandomState(1)
        lens = [12, 7]
        n, c = 12, 6
        x = rng.randn(2, n, c).astype(np.float32)
        mask = np.zeros((2, n), bool)
        for i, l in enumerate(lens):
            mask[i, :l] = True
        out = np.asarray(
            masked_instance_norm(jnp.asarray(x), jnp.asarray(mask))
        )
        norm = torch.nn.InstanceNorm1d(c)
        for i, l in enumerate(lens):
            seg = torch.from_numpy(x[i, :l]).T[None]     # (1, C, L)
            ref = norm(seg)[0].T.numpy()
            np.testing.assert_allclose(out[i, :l], ref, atol=1e-5)


class TestKPConvOracle:
    def test_matches_numpy_oracle(self):
        from regtr_tpu.ops.kpconv import kpconv

        rng = np.random.RandomState(2)
        nq = ns = 50
        k, p, cin, cout = 8, 15, 6, 5
        extent = 0.12
        q = rng.rand(nq, 3).astype(np.float32)
        x = rng.randn(ns, cin).astype(np.float32)
        kp = load_kernel_points(0.15, p, 3, "center", 0)
        w = rng.randn(p, cin, cout).astype(np.float32) * 0.1
        idx = rng.randint(0, ns + 1, (nq, k)).astype(np.int32)

        ref = kpconv_oracle(q, q, idx, x, kp, w, extent)
        got = np.asarray(kpconv(
            jnp.asarray(q[None]), jnp.asarray(q[None]),
            jnp.asarray(idx[None]), jnp.asarray(x[None]),
            jnp.asarray(kp), jnp.asarray(w), extent,
        ))[0]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)

    def test_fused_gather_grad_parity(self):
        """The merged-gather path stops gradients through the influence
        geometry (coordinates are data); grads w.r.t. features and weights
        must be identical to the unfused kpconv path, and the forward plus
        shortcut max-pool must match their unfused equivalents."""
        import jax

        from regtr_tpu.ops.kpconv import kpconv, kpconv_fused_gather, max_pool

        rng = np.random.RandomState(7)
        nq, ns, k, p, cin, ce, cout = 20, 50, 8, 15, 6, 4, 5
        extent = 0.12
        q = jnp.asarray(rng.rand(1, nq, 3).astype(np.float32))
        s = jnp.asarray(rng.rand(1, ns, 3).astype(np.float32))
        x = jnp.asarray(rng.randn(1, ns, cin).astype(np.float32))
        xe = jnp.asarray(rng.randn(1, ns, ce).astype(np.float32))
        kp = jnp.asarray(load_kernel_points(0.15, p, 3, "center", 0))
        w = jnp.asarray(rng.randn(p, cin, cout).astype(np.float32) * 0.1)
        idx = jnp.asarray(rng.randint(0, ns + 1, (1, nq, k)).astype(np.int32))

        def fused(x_, xe_, w_):
            out, pooled, _ = kpconv_fused_gather(
                q, s, idx, x_, xe_, kp, w_, extent
            )
            return jnp.sum(out * out) + jnp.sum(pooled), (out, pooled)

        def plain(x_, xe_, w_):
            out = kpconv(q, s, idx, x_, kp, w_, extent)
            pooled = max_pool(xe_, idx)
            return jnp.sum(out * out) + jnp.sum(pooled), (out, pooled)

        (vf, (of, pf)), gf = jax.value_and_grad(
            fused, argnums=(0, 1, 2), has_aux=True)(x, xe, w)
        (vp, (op, pp)), gp = jax.value_and_grad(
            plain, argnums=(0, 1, 2), has_aux=True)(x, xe, w)
        np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pp),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestInfoNCEParity:
    def test_matches_torch_formula(self):
        """Dense masked InfoNCE == the reference formula computed in torch
        (independent reimplementation of feature_loss.py:268-296 semantics)."""
        from regtr_tpu.losses.feature import InfoNCELoss

        rng = np.random.RandomState(3)
        d, na, npos = 16, 30, 32
        r_p, r_n = 0.3, 0.6
        af = rng.randn(1, na, d).astype(np.float32)
        pf = rng.randn(1, npos, d).astype(np.float32)
        ax = rng.rand(1, na, 3).astype(np.float32)
        px = rng.rand(1, npos, 3).astype(np.float32)
        w = rng.randn(d, d).astype(np.float32) * 0.1

        loss_mod = InfoNCELoss(d, r_p, r_n)
        got = float(loss_mod.apply(
            {"params": {"W": jnp.asarray(w)}},
            jnp.asarray(af), jnp.asarray(pf), jnp.asarray(ax), jnp.asarray(px),
            jnp.ones((1, na), bool), jnp.ones((1, npos), bool),
        ))

        # independent torch computation
        tw = torch.from_numpy(w)
        wsym = torch.triu(tw) + torch.triu(tw).T
        logits = torch.einsum(
            "ic,cd,jd->ij", torch.from_numpy(af[0]), wsym,
            torch.from_numpy(pf[0]),
        )
        dist = torch.cdist(torch.from_numpy(ax[0]), torch.from_numpy(px[0]))
        d1, idx1 = dist.topk(k=1, dim=-1, largest=False)
        match = d1[:, 0] < r_p
        ignore = dist < r_n
        ignore.scatter_(-1, idx1, False)
        masked_logits = logits.masked_fill(ignore, -float("inf"))
        loss = -torch.gather(masked_logits, -1, idx1)[:, 0] + \
            torch.logsumexp(masked_logits, dim=-1)
        ref = float(loss[match].sum() / match.sum())
        np.testing.assert_allclose(got, ref, rtol=1e-4)


class TestSchedulerParity:
    def test_warmup_schedule_values(self):
        """optax warmup schedule == WarmUpScheduler.compute_lr
        (warmup.py:49-57)."""
        import math

        from regtr_tpu.train.optim import make_schedule

        cfg = {"base_lr": 1e-3, "scheduler": "warmup",
               "scheduler_param": [100, 1000, 0.5]}
        sched = make_schedule(cfg)
        gamma = math.exp(math.log(0.5) / 1000)
        for step in [0, 10, 50, 99, 100, 500, 1500]:
            ref = (
                min(step / 100, 1.0) * 1e-3 if step < 100
                else (gamma ** (step - 100)) * 1e-3
            )
            np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-5)

    def test_step_schedule_values(self):
        from regtr_tpu.train.optim import make_schedule

        cfg = {"base_lr": 1e-4, "scheduler": "step",
               "scheduler_param": [1000, 0.5]}
        sched = make_schedule(cfg)
        np.testing.assert_allclose(float(sched(999)), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000)), 5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(sched(2500)), 2.5e-5, rtol=1e-6)
