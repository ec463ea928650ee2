"""Cross-attention transformer encoder over paired point clouds.

TPU-native redesign of TransformerCrossEncoder{,Layer}
(/root/reference/src/models/transformer/transformers.py:18-258, DETR-derived).

Key structural insight exploited here: the reference applies the *same*
self-attention, cross-attention, FFN and norm weights to both clouds of a
pair.  With the interleaved paired layout (2B clouds: slot 2i = source of
pair i, slot 2i+1 = target) that means:
  * self-attention runs over the full 2B batch in one fused call;
  * cross-attention is the same batched attention with keys/values taken
    from the *partner* cloud — i.e. the batch with adjacent slots swapped,
    a device-local reshape even under data-parallel sharding.
No per-cloud Python loops, no separate src/tgt module calls; XLA sees one
big masked attention per stage.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..core.masking import NEG_INF
from ..core.pairs import swap_pairs
from ..ops.pallas import flash_masked_attention


def _resolve_attn_impl(impl: str, dropout: float, deterministic: bool) -> str:
    """'auto' -> flash kernel on TPU, XLA elsewhere.

    The flash path has no attention-probability tensor; attention dropout
    therefore requires the XLA path.  Attention-map analysis works on BOTH:
    the flash path recomputes probabilities when the caller requests
    intermediates (see MultiHeadAttention.__call__).
    """
    if impl == "auto":
        # The Pallas kernel is Mosaic-TPU-specific: only select it when the
        # backend really is TPU; GPU/CPU/other accelerators take the XLA
        # path (which also keeps the sow('intermediates','attn') hook alive).
        dd = jax.config.jax_default_device
        on_tpu = (jax.default_backend() == "tpu"
                  and (dd is None or dd.platform == "tpu"))
        impl = "pallas" if on_tpu else "xla"
    if impl == "pallas" and dropout > 0.0 and not deterministic:
        impl = "xla"
    return impl


class MultiHeadAttention(nn.Module):
    """Masked multi-head dot-product attention, (B, N, D) layout.

    Separate q/k/v/out projections (equivalent math to torch's packed
    MultiheadAttention; the checkpoint converter splits the packed weights).

    attn_impl: 'auto' (flash Pallas kernel on TPU, XLA elsewhere), 'pallas',
    'pallas_interpret' (kernel in interpreter mode — CPU tests), or 'xla'.
    """
    d_model: int
    nhead: int
    dropout: float = 0.0
    attn_impl: str = "auto"
    compute_dtype: Any = None   # bf16 flash operands only when requested

    @nn.compact
    def __call__(self, q, k, v, key_mask, deterministic=True):
        d_head = self.d_model // self.nhead
        b, nq, _ = q.shape
        nk = k.shape[1]

        def heads(x, name):
            y = nn.Dense(self.d_model, name=name)(x)
            return y.reshape(b, -1, self.nhead, d_head)

        qh = heads(q, "q_proj")
        kh = heads(k, "k_proj")
        vh = heads(v, "v_proj")
        scale = 1.0 / float(d_head) ** 0.5

        impl = _resolve_attn_impl(self.attn_impl, self.dropout, deterministic)
        if impl in ("pallas", "pallas_interpret"):
            # Operand dtype follows compute_dtype (bf16 halves HBM traffic;
            # fp32 kept exact when the config asks for it); the kernel
            # always uses fp32 softmax statistics + accumulation.
            op_dtype = self.compute_dtype or qh.dtype

            def fold(x):
                return jnp.transpose(x, (0, 2, 1, 3)).reshape(
                    b * self.nhead, -1, d_head).astype(op_dtype)

            bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
            bias = jnp.broadcast_to(
                bias[:, None, :], (b, self.nhead, nk)
            ).reshape(b * self.nhead, nk)
            o = flash_masked_attention(
                fold(qh), fold(kh), fold(vh), bias, scale,
                interpret=(impl == "pallas_interpret"),
            )
            out = jnp.transpose(
                o.reshape(b, self.nhead, nq, d_head), (0, 2, 1, 3)
            ).reshape(b, nq, self.d_model)
            # Analysis-hook parity with the XLA path (reference:
            # get_attentions, transformers.py:61-81): the kernel never
            # materializes probabilities, so when the caller explicitly
            # requests them — apply(..., mutable=["intermediates"]) — they
            # are recomputed here.  Costs one (N, N) materialization in
            # analysis runs only; normal forward/training pays nothing.
            if (not self.is_initializing()
                    and self.is_mutable_collection("intermediates")):
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", qh, kh,
                    preferred_element_type=jnp.float32,
                ) * scale
                logits = jnp.where(
                    key_mask[:, None, None, :], logits,
                    jnp.asarray(NEG_INF, logits.dtype),
                )
                self.sow("intermediates", "attn",
                         nn.softmax(logits, axis=-1))
            return nn.Dense(self.d_model, name="out_proj")(out)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(
            key_mask[:, None, None, :], logits, jnp.asarray(NEG_INF, logits.dtype)
        )
        attn = nn.softmax(logits, axis=-1)
        # Analysis hook (reference: get_attentions, transformers.py:61-81):
        # fetch with apply(..., mutable=["intermediates"]).
        self.sow("intermediates", "attn", attn)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32
        ).reshape(b, nq, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class CrossEncoderLayer(nn.Module):
    """One self-attn + cross-attn + FFN stage with shared src/tgt weights.

    Pre-norm (`normalize_before=True`, the shipped-config path) and post-norm
    variants mirror transformers.py:121-244.
    """
    d_model: int
    nhead: int
    d_feedforward: int = 1024
    dropout: float = 0.0
    activation: str = "relu"
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = True
    ca_val_has_pos_emb: bool = True
    attn_impl: str = "auto"
    compute_dtype: Any = None

    def _act(self, x):
        return {"relu": nn.relu, "gelu": nn.gelu}[self.activation](x)

    @nn.compact
    def __call__(self, x, pos, mask, deterministic=True):
        """x: (2B, N, D) paired features; pos: (2B, N, D) or None;
        mask: (2B, N) validity."""
        sa = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                self.attn_impl, self.compute_dtype,
                                name="self_attn")
        ca = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                self.attn_impl, self.compute_dtype,
                                name="cross_attn")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        norm3 = nn.LayerNorm(name="norm3")
        lin1 = nn.Dense(self.d_feedforward, name="linear1")
        lin2 = nn.Dense(self.d_model, name="linear2")
        drop = (lambda y: y) if (self.dropout == 0.0 or deterministic) else (
            lambda y: nn.Dropout(self.dropout, deterministic=False)(y)
        )

        def with_pos(t):
            return t if pos is None else t + pos

        if self.pre_norm:
            # Self attention
            x2 = norm1(x)
            qk = with_pos(x2)
            v = qk if self.sa_val_has_pos_emb else x2
            x = x + drop(sa(qk, qk, v, mask, deterministic))
            # Cross attention: keys/values from the partner cloud
            x2 = norm2(x)
            x2_w_pos = with_pos(x2)
            kv = swap_pairs(x2)
            kv_w_pos = swap_pairs(x2_w_pos)
            kv_mask = swap_pairs(mask)
            v = kv_w_pos if self.ca_val_has_pos_emb else kv
            x = x + drop(ca(x2_w_pos, kv_w_pos, v, kv_mask, deterministic))
            # FFN
            x2 = norm3(x)
            x = x + drop(lin2(drop(self._act(lin1(x2)))))
        else:
            qk = with_pos(x)
            v = qk if self.sa_val_has_pos_emb else x
            x = norm1(x + drop(sa(qk, qk, v, mask, deterministic)))
            x_w_pos = with_pos(x)
            kv = swap_pairs(x)
            kv_w_pos = swap_pairs(x_w_pos)
            kv_mask = swap_pairs(mask)
            v = kv_w_pos if self.ca_val_has_pos_emb else kv
            x = norm2(x + drop(ca(x_w_pos, kv_w_pos, v, kv_mask, deterministic)))
            x = norm3(x + drop(lin2(drop(self._act(lin1(x))))))
        return x


class TransformerCrossEncoder(nn.Module):
    """Stack of cross-encoder layers returning all per-layer intermediates
    (N_layers, 2B, N, D), final-norm applied when pre-norm (matches
    transformers.py:35-59 with return_intermediate=True)."""
    d_model: int
    nhead: int
    num_layers: int
    d_feedforward: int = 1024
    dropout: float = 0.0
    activation: str = "relu"
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = True
    ca_val_has_pos_emb: bool = True
    attn_impl: str = "auto"
    compute_dtype: Any = None

    remat: bool = True

    @nn.compact
    def __call__(self, x, pos, mask, deterministic=True):
        final_norm = nn.LayerNorm(name="norm_final") if self.pre_norm else None
        # Recompute attention in the backward pass instead of storing the
        # (B, H, N, N) probability tensors for every layer.
        layer_cls = (nn.remat(CrossEncoderLayer, static_argnums=(3,))
                     if self.remat else CrossEncoderLayer)
        intermediates = []
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.nhead, self.d_feedforward, self.dropout,
                self.activation, self.pre_norm,
                self.sa_val_has_pos_emb, self.ca_val_has_pos_emb,
                self.attn_impl, self.compute_dtype,
                name=f"layer_{i}",
            )(x, pos, mask, deterministic)
            intermediates.append(final_norm(x) if final_norm is not None else x)
        return jnp.stack(intermediates, axis=0)
