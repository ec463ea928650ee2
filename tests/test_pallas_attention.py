"""Tests for the flash masked-attention Pallas kernel (interpret mode on the
virtual-CPU test backend; the compiled path is exercised by bench/profile
runs on real TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regtr_tpu.ops.pallas.attention import (NEG_BIAS, _xla_reference,
                                            flash_masked_attention)


def _rand(shapes, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(*s), dtype) for s in shapes]


class TestFlashMaskedAttention:
    @pytest.mark.parametrize("bh,nq,nk,d", [
        (4, 256, 256, 32),     # block-aligned
        (2, 200, 328, 32),     # unaligned -> padding path
        (3, 96, 96, 64),       # small N < one block
    ])
    def test_matches_xla_reference(self, bh, nq, nk, d):
        q, k, v = _rand([(bh, nq, d), (bh, nk, d), (bh, nk, d)], seed=nq)
        rng = np.random.RandomState(nq + 1)
        mask = rng.rand(bh, nk) > 0.2
        mask[:, :4] = True  # no fully-masked rows in the parity check
        bias = jnp.where(jnp.asarray(mask), 0.0, NEG_BIAS).astype(jnp.float32)
        scale = 1.0 / d ** 0.5

        out = flash_masked_attention(q, k, v, bias, scale,
                                     block_q=128, block_k=128,
                                     interpret=True)
        ref = _xla_reference(q, k, v, bias, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_parity(self):
        q, k, v = _rand([(2, 256, 32)] * 3, seed=7, dtype=jnp.bfloat16)
        bias = jnp.zeros((2, 256), jnp.float32)
        out = flash_masked_attention(q, k, v, bias, 0.17, interpret=True)
        ref = _xla_reference(q, k, v, bias, 0.17)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_fully_masked_rows_are_finite(self):
        q, k, v = _rand([(1, 128, 32)] * 3, seed=3)
        bias = jnp.full((1, 128), NEG_BIAS, jnp.float32)  # everything masked
        out = flash_masked_attention(q, k, v, bias, 0.2, interpret=True)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_grads_flow_and_match_reference(self):
        q, k, v = _rand([(2, 128, 32)] * 3, seed=11)
        rng = np.random.RandomState(12)
        mask = jnp.asarray(rng.rand(2, 128) > 0.3)
        bias = jnp.where(mask, 0.0, NEG_BIAS).astype(jnp.float32)
        scale = 0.25

        def loss_flash(q, k, v):
            o = flash_masked_attention(q, k, v, bias, scale, interpret=True)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = _xla_reference(q, k, v, bias, scale)
            return jnp.sum(o * o)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize("bh,nq,nk,d", [
        (2, 256, 256, 32),     # multi-block, aligned
        (2, 200, 328, 32),     # unaligned -> padding rows in both kernels
    ])
    def test_kernel_backward_multiblock(self, bh, nq, nk, d):
        """The tiled Pallas backward (dq/dk/dv/dbias kernels) matches the
        XLA autodiff reference across block boundaries and padding."""
        q, k, v = _rand([(bh, nq, d), (bh, nk, d), (bh, nk, d)], seed=31)
        rng = np.random.RandomState(32)
        mask = rng.rand(bh, nk) > 0.3
        mask[:, :4] = True
        bias = jnp.where(jnp.asarray(mask), 0.0, NEG_BIAS).astype(jnp.float32)
        scale = 1.0 / d ** 0.5
        # A non-uniform cotangent via a weighted sum keeps the check sharp.
        w = jnp.asarray(np.random.RandomState(33).randn(bh, nq, d),
                        jnp.float32)

        def loss_flash(q, k, v, bias):
            o = flash_masked_attention(q, k, v, bias, scale,
                                       block_q=128, block_k=128,
                                       interpret=True)
            return jnp.sum(o * w)

        def loss_ref(q, k, v, bias):
            return jnp.sum(_xla_reference(q, k, v, bias, scale) * w)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkvb", g_flash, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
                err_msg=f"grad mismatch for {name}")

    def test_kernel_backward_bf16(self):
        """bf16 operands: backward runs the kernels and grads stay close to
        the fp32 reference (fp32 accumulation inside)."""
        q32, k32, v32 = _rand([(2, 192, 32)] * 3, seed=41)
        bias = jnp.zeros((2, 192), jnp.float32)
        scale = 0.2

        def loss(fn, q, k, v):
            return jnp.sum(jnp.square(
                fn(q, k, v).astype(jnp.float32)))

        g_fl = jax.grad(
            lambda q, k, v: loss(
                lambda *a: flash_masked_attention(
                    *(x.astype(jnp.bfloat16) for x in a), bias, scale,
                    block_q=128, block_k=128, interpret=True),
                q, k, v),
            argnums=(0, 1, 2))(q32, k32, v32)
        g_ref = jax.grad(
            lambda q, k, v: loss(
                lambda *a: _xla_reference(*a, bias, scale), q, k, v),
            argnums=(0, 1, 2))(q32, k32, v32)
        for a, b in zip(g_fl, g_ref):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=5e-2, rtol=5e-2)

    def test_pallas_path_attention_maps_on_request(self):
        """apply(..., mutable=['intermediates']) returns attention maps on
        the flash path too (recomputed explicitly), matching the XLA path's
        sow — the reference's get_attentions capability without leaving
        attn_impl=auto."""
        from regtr_tpu.nn.transformer import MultiHeadAttention

        q, k, v = _rand([(2, 96, 64)] * 3, seed=51)
        mask = jnp.asarray(np.random.RandomState(52).rand(2, 96) > 0.2)
        mod_x = MultiHeadAttention(64, 4, 0.0, attn_impl="xla")
        params = mod_x.init(jax.random.PRNGKey(0), q, k, v, mask)
        _, inter_x = mod_x.apply(params, q, k, v, mask,
                                 mutable=["intermediates"])
        mod_p = MultiHeadAttention(64, 4, 0.0, attn_impl="pallas_interpret")
        _, inter_p = mod_p.apply(params, q, k, v, mask,
                                 mutable=["intermediates"])
        a_x = inter_x["intermediates"]["attn"][0]
        a_p = inter_p["intermediates"]["attn"][0]
        assert a_p.shape == a_x.shape == (2, 4, 96, 96)
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                                   atol=1e-6, rtol=1e-6)

    def test_model_attention_module_pallas_path(self):
        """MultiHeadAttention with attn_impl='pallas_interpret' equals the
        XLA path through the full flax module (projections included)."""
        from regtr_tpu.nn.transformer import MultiHeadAttention

        q, k, v = _rand([(2, 96, 64)] * 3, seed=21)
        mask = jnp.asarray(np.random.RandomState(22).rand(2, 96) > 0.2)
        mod_x = MultiHeadAttention(64, 4, 0.0, attn_impl="xla")
        params = mod_x.init(jax.random.PRNGKey(0), q, k, v, mask)
        out_x = mod_x.apply(params, q, k, v, mask)
        mod_p = MultiHeadAttention(64, 4, 0.0, attn_impl="pallas_interpret")
        out_p = mod_p.apply(params, q, k, v, mask)
        # the kernel path runs its operands in bf16 (fp32 accumulation)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=3e-2, rtol=3e-2)
