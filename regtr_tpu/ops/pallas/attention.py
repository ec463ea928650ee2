"""Flash-style masked attention kernel (Pallas TPU).

Replaces the XLA dot-product attention inside the cross-attention
transformer (nn/transformer.py; reference semantics:
/root/reference/src/models/transformer/transformers.py:121-258 via
torch.nn.MultiheadAttention with key_padding_mask).

Why a kernel: at 3DMatch scale the transformer runs 12 masked attentions of
(2B=8 clouds, 8 heads, ~1900, ~1900) per forward; XLA materializes every
(N, N) probability matrix to HBM (~21 GB of traffic per forward — measured
as most of the 45 ms transformer stage).  The kernel computes the same
attention with an online softmax over key tiles, so nothing quadratic ever
leaves VMEM.

Backward: custom VJP that recomputes the attention with standard XLA ops and
differentiates that — the same work the pre-existing remat path did, so
training keeps its memory/compute profile while the forward (and the forward
half of every training step) gets the flash win.  Forward-vs-backward
recompute may differ by bf16 rounding, as with any remat schedule.

Numerics follow the flash-attention recipe: fp32 running max / sum / output
accumulator, finite mask bias (-1e9, never -inf).  Fully-masked rows behave
like the XLA path: the finite bias means the softmax still normalizes over
the masked keys, so those rows emit attention-weighted garbage, NOT zeros —
callers must mask padded rows downstream (they all do).  The l == 0 guard
in the final division only protects a hypothetical all-underflow tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
            m_ref, l_ref, acc_ref, *, sm_scale, nk_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                        # (bq, d)
    k = k_ref[0]                        # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                   # (bq, bk)
    s = s * sm_scale + bias_ref[0].astype(jnp.float32)  # (1, bk) broadcast

    m_prev = m_ref[:, :1]               # (bq, 1)
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

    v = v_ref[0]                        # (bk, d)
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ik == nk_blocks - 1)
    def _store():
        l = l_ref[:, :1]
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k, interpret):
    """q: (BH, Nq, d); k/v: (BH, Nk, d); bias: (BH, Nk) additive."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, _round_up(nq, 128))
    bk = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, bq)
    nk_pad = _round_up(nk, bk)

    q = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    bias = jnp.pad(bias, ((0, 0), (0, nk_pad - nk)),
                   constant_values=NEG_BIAS)
    # (BH, 1, Nk): a (1, 1, bk) block then satisfies the (8, 128)-divisible
    # tiling rule (its second-to-last dim equals the full array dim).
    bias = bias[:, None, :]

    nq_blocks = nq_pad // bq
    nk_blocks = nk_pad // bk
    grid = (bh, nq_blocks, nk_blocks)

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, nk_blocks=nk_blocks),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, iq, ik: (b, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :nq]


def _xla_reference(q, k, v, bias, sm_scale):
    """Standard masked attention in XLA ops (used for the backward pass and
    as the correctness oracle in tests)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = s + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_masked_attention(q, k, v, bias, sm_scale,
                           block_q=512, block_k=512, interpret=False):
    """Masked flash attention: softmax(q @ k^T * sm_scale + bias) @ v.

    Args:
        q: (BH, Nq, d); k, v: (BH, Nk, d); bias: (BH, Nk) additive key bias
            (0 for valid keys, NEG_BIAS for masked).
        sm_scale: static python float.
        interpret: run the kernel in interpreter mode (CPU tests).

    Returns (BH, Nq, d) in q.dtype.
    """
    return _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k,
                           interpret)


def _fwd(q, k, v, bias, sm_scale, block_q, block_k, interpret):
    out = _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k,
                          interpret)
    return out, (q, k, v, bias)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _xla_reference(q_, k_, v_, b_, sm_scale),
        q, k, v, bias,
    )
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db


flash_masked_attention.defvjp(_fwd, _bwd)
