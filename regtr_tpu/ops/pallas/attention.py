"""Flash-style masked attention kernels (Pallas TPU), forward AND backward.

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

Backward (flash-v2 recipe): the forward stores the per-row softmax
normalizer lse = m + log(l); the backward recomputes the probability tiles
from (q, k, bias, lse) inside two tiled kernels —
  * dK/dV/dbias: grid over key blocks, accumulating over query blocks
    (dV += P^T dO;  dS = P (dO V^T - delta);  dK += dS^T Q * scale), and
  * dQ: grid over query blocks, accumulating over key blocks
    (dQ += dS K * scale),
with delta = rowsum(dO * O) precomputed in XLA (linear traffic).  Like the
forward, nothing quadratic touches HBM, which is what makes the training
step faster than the previous XLA-recompute backward.

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


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *refs,
            sm_scale, nk_blocks):
    if len(refs) == 4:
        lse_ref, m_ref, l_ref, acc_ref = refs
    else:  # inference-only call: no lse output declared
        lse_ref = None
        m_ref, l_ref, acc_ref = refs
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
        if lse_ref is not None:
            # Softmax normalizer for the backward recompute.  l >= 1 whenever
            # a tile was processed (the row max contributes exp(0)); the
            # guard covers the impossible-all-underflow case only.
            lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-30))


def _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k, interpret,
                    want_lse=True):
    """q: (BH, Nq, d); k/v: (BH, Nk, d); bias: (BH, Nk) additive.

    Returns (out (BH, Nq, d), lse (BH, Nq_pad, 128) fp32 lane-broadcast).
    With want_lse=False (inference-only: the normalizer is needed solely by
    the backward recompute) the kernel declares a single output — pallas_call
    outputs are not DCE'd, so the flag saves the (BH, Nq_pad, 128) fp32
    HBM write (~8 MB per 3DMatch-scale call) — and lse is returned as None.
    """
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

    out_shape = [jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                              memory_space=pltpu.VMEM)]
    if want_lse:
        # lse is stored lane-broadcast (last dim 128) so the backward
        # kernels read a natively-tiled block and slice column 0 —
        # avoids any (1, n) -> (n, 1) relayout inside the kernels.  At
        # 3DMatch scale this is ~8 MB of extra HBM, noise next to the
        # quadratic tensors the kernels keep out of HBM.
        out_shape.append(
            jax.ShapeDtypeStruct((bh, nq_pad, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, bq, 128), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, nk_blocks=nk_blocks),
        out_shape=tuple(out_shape),
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
        out_specs=tuple(out_specs),
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
    if want_lse:
        out, lse = res
        return out[:, :nq], lse
    return res[0][:, :nq], None


def _recompute_p_ds(q, k, v, do, bias_row, lse, delta, sm_scale):
    """Shared backward-tile math: probabilities p and logit cotangent ds.

    q/do: (bq, d); k/v: (bk, d); bias_row: (1, bk); lse/delta: (bq, 1) fp32.
    Returns (p, ds), both (bq, bk) fp32.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * sm_scale + bias_row.astype(jnp.float32)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    return p, ds


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, db_ref, dk_acc, dv_acc, db_acc,
                    *, sm_scale, nq_blocks):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        db_acc[:] = jnp.zeros_like(db_acc)

    q = q_ref[0]
    do = do_ref[0]
    p, ds = _recompute_p_ds(
        q, k_ref[0], v_ref[0], do, bias_ref[0],
        lse_ref[0][:, :1], delta_ref[0][:, :1], sm_scale,
    )
    # Padded q rows contribute nothing: dO is zero-padded so dp = 0 and
    # delta = 0, hence ds = 0 there; p^T dO is likewise zero.
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    db_acc[:] += jnp.broadcast_to(
        jnp.sum(ds, axis=0, keepdims=True), db_acc.shape
    )

    @pl.when(iq == nq_blocks - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
        db_ref[0] = db_acc[:1].astype(db_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_acc, *, sm_scale, nk_blocks):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    k = k_ref[0]
    _, ds = _recompute_p_ds(
        q_ref[0], k, v_ref[0], do_ref[0], bias_ref[0],
        lse_ref[0][:, :1], delta_ref[0][:, :1], sm_scale,
    )
    dq_acc[:] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ) * sm_scale

    @pl.when(ik == nk_blocks - 1)
    def _store():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, bias, o, lse, g, sm_scale, block_q, block_k,
                    interpret):
    """Tiled flash backward.  Shapes as in _flash_fwd_impl; g = dOut."""
    bh, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, _round_up(nq, 128))
    bk = min(block_k, _round_up(nk, 128))
    nq_pad = _round_up(nq, bq)
    nk_pad = _round_up(nk, bk)

    # delta = rowsum(dO * O): linear traffic, XLA fuses it.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, nq_pad - nq)))
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))

    q_p = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, nq_pad - nq), (0, 0)))
    k_p = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    v_p = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    bias_p = jnp.pad(bias, ((0, 0), (0, nk_pad - nk)),
                     constant_values=NEG_BIAS)[:, None, :]
    # lse comes from the forward already padded to a multiple of the
    # forward's block_q; re-pad if the backward uses a larger nq_pad.
    if lse.shape[1] < nq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, nq_pad - lse.shape[1]), (0, 0)))
    else:
        lse = lse[:, :nq_pad]

    nq_blocks = nq_pad // bq
    nk_blocks = nk_pad // bk

    q_spec = pl.BlockSpec((1, bq, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    dk, dv, db3 = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale,
                          nq_blocks=nq_blocks),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), v.dtype),
            jax.ShapeDtypeStruct((bh, 1, nk_pad), jnp.float32),
        ),
        grid=(bh, nk_blocks, nq_blocks),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            q_spec,       # dO tiles like q
            row_spec,     # lse
            row_spec,     # delta
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((8, bk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, bias_p, g_p, lse, delta)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale,
                          nk_blocks=nk_blocks),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        grid=(bh, nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, bias_p, g_p, lse, delta)

    return (dq[:, :nq], dk[:, :nk], dv[:, :nk], db3[:, 0, :nk])


def _xla_reference(q, k, v, bias, sm_scale):
    """Standard masked attention in XLA ops (correctness oracle in tests)."""
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    s = s + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_masked_attention(q, k, v, bias, sm_scale,
                           block_q=1024, block_k=1024, interpret=False):
    """Masked flash attention: softmax(q @ k^T * sm_scale + bias) @ v.

    Args:
        q: (BH, Nq, d); k, v: (BH, Nk, d); bias: (BH, Nk) additive key bias
            (0 for valid keys, NEG_BIAS for masked).
        sm_scale: static python float.
        interpret: run the kernels in interpreter mode (CPU tests).

    Returns (BH, Nq, d) in q.dtype.
    """
    out, _ = _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k,
                             interpret, want_lse=False)
    return out


def _fwd(q, k, v, bias, sm_scale, block_q, block_k, interpret):
    out, lse = _flash_fwd_impl(q, k, v, bias, sm_scale, block_q, block_k,
                               interpret)
    return out, (q, k, v, bias, out, lse)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, bias, o, lse = res
    dq, dk, dv, db = _flash_bwd_impl(
        q, k, v, bias, o, lse, g, sm_scale, block_q, block_k, interpret
    )
    return dq, dk, dv, db.astype(bias.dtype)


flash_masked_attention.defvjp(_fwd, _bwd)
