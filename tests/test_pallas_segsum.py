"""Sorted segment-sum kernel (ops/pallas/segsum.py): correctness vs the XLA
oracle (interpret mode on the CPU mesh) and grad parity through KPConv.

The kernel replaces XLA's scatter in the backward of every padded neighbor
gather (ops/kpconv.py batched_row_gather_padded); exactness must hold for
arbitrary id distributions — local runs, uniform scatter (exercises the
second window and the sequential fallback), empty segments, all-pad chunks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regtr_tpu.ops import kpconv as K
from regtr_tpu.ops.pallas.segsum import (
    padded_segment_sum_reference, sorted_padded_segment_sum,
)


def _check(ids, c, nseg, stride, seed=1, atol=3e-4):
    rng = np.random.RandomState(seed)
    g = rng.randn(len(ids), c).astype(np.float32)
    got = np.asarray(sorted_padded_segment_sum(
        jnp.asarray(g), jnp.asarray(ids), nseg, stride, interpret=True,
    ))
    want = np.asarray(padded_segment_sum_reference(
        jnp.asarray(g), jnp.asarray(ids), nseg, stride,
    ))
    np.testing.assert_allclose(got, want, rtol=0, atol=atol)


class TestSortedSegmentSum:
    def test_local_runs_with_shadow(self):
        """Neighbor-table-like ids: local clusters + a big shadow block."""
        rng = np.random.RandomState(0)
        b, n = 2, 513
        ids = []
        for bb in range(b):
            loc = np.clip((np.arange(6000) // 40)
                          + rng.randint(-20, 20, 6000), 0, n - 2)
            sh = np.full(2500, n - 1)
            ids.append(bb * n + np.concatenate([loc, sh]))
        ids = np.concatenate(ids).astype(np.int32)
        rng.shuffle(ids)
        _check(ids, 33, b * n, n)

    @pytest.mark.parametrize("c", [32, 128, 166])
    def test_uniform_ids_all_windows_and_fallback(self, c):
        """Uniformly random ids defeat the window locality — the second
        window and the per-row fallback must keep the result exact."""
        rng = np.random.RandomState(2)
        b, n = 3, 700
        ids = rng.randint(0, b * n, 5000).astype(np.int32)
        _check(ids, c, b * n, n)

    def test_tiny_and_all_pad(self):
        rng = np.random.RandomState(3)
        b, n = 3, 700
        _check(rng.randint(0, b * n, 37).astype(np.int32), 32, b * n, n)
        _check(np.full(2000, n - 1, np.int32), 32, b * n, n)

    def test_kpconv_grads_bitwise_match_xla_backward(self):
        """The padded-gather custom VJP with the pallas impl produces the
        same gradients as the segment-sum backward through a real KPConv."""
        rng = np.random.RandomState(0)
        b, ns, nq, k, cin, cout, p = 2, 300, 280, 12, 16, 24, 15
        x = jnp.asarray(rng.randn(b, ns, cin).astype(np.float32))
        q = jnp.asarray(rng.randn(b, nq, 3).astype(np.float32))
        s = jnp.asarray(rng.randn(b, ns, 3).astype(np.float32))
        inds = jnp.asarray(
            rng.randint(0, ns + 1, (b, nq, k)).astype(np.int32)
        )
        kp = jnp.asarray(rng.randn(p, 3).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(p, cin, cout).astype(np.float32) * 0.05)

        def loss(xx, ww):
            out = K.kpconv(q, s, inds, xx, kp, ww, 0.12)
            return jnp.sum(out * out)

        try:
            K.set_segsum_impl("xla")
            gx_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(x, w)
            K.set_segsum_impl("pallas")
            gx_p, gw_p = jax.grad(loss, argnums=(0, 1))(x, w)
        finally:
            K.set_segsum_impl("auto")
        np.testing.assert_array_equal(np.asarray(gx_p), np.asarray(gx_ref))
        np.testing.assert_array_equal(np.asarray(gw_p), np.asarray(gw_ref))

    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_n_grad_cols_drops_inert_columns(self, impl):
        """n_grad_cols: gradient equals the full backward when the dropped
        columns' cotangent is zero (the fused-gather coordinate contract)."""
        rng = np.random.RandomState(4)
        b, n, r, c, cg = 2, 90, 400, 12, 8
        x = jnp.asarray(rng.randn(b, n + 1, c).astype(np.float32))
        inds = jnp.asarray(rng.randint(0, n + 1, (b, r)).astype(np.int32))

        def loss(xx, n_grad_cols):
            out = K.batched_row_gather_padded(xx, inds, n_grad_cols)
            # only the first cg columns participate -> coord-column
            # cotangents are structurally zero, as in kpconv_fused_gather
            return jnp.sum(out[..., :cg] ** 2)

        try:
            K.set_segsum_impl(impl)
            g_full = jax.grad(loss)(x, None)
            g_cut = jax.grad(loss)(x, cg)
        finally:
            K.set_segsum_impl("auto")
        np.testing.assert_array_equal(np.asarray(g_cut), np.asarray(g_full))
        if impl == "pallas":
            # the pallas kernel additionally zeroes the pad row in-kernel
            # (the xla path leaves it for the caller to discard)
            assert not np.any(np.asarray(g_cut)[:, n, :])
