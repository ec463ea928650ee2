"""Kernel-point convolution as dense batched einsum (MXU-friendly).

TPU-native reimplementation of the KPConv operator
(/root/reference/src/models/backbone_kpconv/kpconv_blocks.py:175-420,
non-deformable path used by all shipped configs).

Math per query point q with neighbors n (shadow neighbors point at an
appended pad row with coordinates 1e6 and zero features):
    d[n, p]   = || (x_n - x_q) - kernel_p ||
    w[n, p]   = influence(d)              (linear: relu(1 - d / extent))
    f[p, c]   = sum_n w[n, p] * feat[n, c]
    out[c']   = sum_{p, c} f[p, c] * W[p, c, c']   / n_valid_neighbors
The (p, c) contraction is reshaped into a single (N, P*C) @ (P*C, C') matmul
so the MXU does the heavy lifting.

Normalization note: the reference divides by the number of neighbors whose
*feature sums* are positive (kpconv_blocks.py:409-412) — a quirk that equals
the true neighbor count only at the first layer (all-ones features).  By
default we normalize by the count of non-shadow neighbors (the mathematically
intended behavior); `norm="legacy"` reproduces the reference quirk exactly,
which converted reference checkpoints need for bit-faithful activations
(config key: `kpconv_norm: legacy`).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

SHADOW_COORD = 1e6

# Backward implementation for the padded row gathers (the gather transpose).
#   "xla"    — jax.ops.segment_sum (scatter; ~13-16 ns/row measured on v5e)
#   "pallas" — sort-by-segment + windowed one-hot MXU reduction
#              (ops/pallas/segsum.py; no scatter)
#   "auto"   — xla.  The sorted kernel loses to the scatter on v5e both
#              in isolation (44-53 vs 13.7-14.4 ns/row, 3 reps, round 5)
#              and inside the full train program (608 vs 342 ms/step at
#              3DMatch scale — the sort+permute prologue and the
#              sequential grid serialize against work XLA otherwise
#              overlaps; RESULTS.md "Gather/scatter strategy").  Kept as
#              a correct opt-in for future shapes/hardware.
_SEGSUM_IMPL = os.environ.get("REGTR_SEGSUM_IMPL", "auto")
if _SEGSUM_IMPL not in ("auto", "xla", "pallas"):
    raise ValueError(
        f"REGTR_SEGSUM_IMPL={_SEGSUM_IMPL!r} is not one of auto/xla/pallas"
    )


def set_segsum_impl(impl: str):
    """Select the gather-transpose implementation ("auto"/"xla"/"pallas")."""
    global _SEGSUM_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _SEGSUM_IMPL = impl


def _use_sorted_segsum() -> bool:
    return _SEGSUM_IMPL == "pallas"


@jax.custom_vjp
def batched_row_gather(x, inds):
    """Gather rows per batch element via ONE flat 1-D gather.

    x: (B, N, C); inds: (B, R) int32 in [0, N) -> (B, R, C).

    XLA lowers a flat `take` ~4x faster than batched take_along_axis on TPU
    (the batched gather hits a slow per-row path), so every gather in the
    framework funnels through this helper.

    Custom VJP: autodiff's gather-transpose is a serialized scatter-add
    (~140 ns/row — it made the 3DMatch-scale train step 15 s); the backward
    here uses jax.ops.segment_sum instead, which lowers ~10x faster.
    """
    return _row_gather_fwd_impl(x, inds)


def _row_gather_fwd_impl(x, inds):
    b, n, c = x.shape
    flat = x.reshape(b * n, c)
    offs = (jnp.arange(b, dtype=inds.dtype) * n)[:, None]
    out = jnp.take(flat, (inds + offs).reshape(-1), axis=0)
    return out.reshape(b, inds.shape[1], c)


def _row_gather_fwd(x, inds):
    return _row_gather_fwd_impl(x, inds), (inds, x.shape)


def _row_gather_bwd(res, g):
    inds, (b, n, c) = res
    offs = (jnp.arange(b, dtype=inds.dtype) * n)[:, None]
    flat_idx = (inds + offs).reshape(-1)
    # Accumulate in fp32 even when the forward gathers bf16 rows: each
    # support row sums up to hundreds of cotangent contributions, and an
    # 8-bit mantissa accumulator silently degrades bf16 training gradients.
    dx = jax.ops.segment_sum(
        g.reshape(-1, g.shape[-1]).astype(jnp.float32),
        flat_idx, num_segments=b * n,
    )
    return dx.reshape(b, n, c).astype(g.dtype), None


batched_row_gather.defvjp(_row_gather_fwd, _row_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _row_gather_padded_impl(x, inds, n_grad_cols):
    return _row_gather_fwd_impl(x, inds)


def batched_row_gather_padded(x, inds, n_grad_cols=None):
    """batched_row_gather for operands whose LAST row per cloud is a pad
    (shadow) row whose gradient the caller discards.

    Every KPConv/pool caller appends a zero/sentinel pad row and gathers
    with shadow index = Ns, then slices the pad row's gradient away.  This
    variant encodes that contract so the backward can drop pad-row
    cotangents (30-40% of all rows at level 0) and can opt into the
    scatter-free sorted segment-sum kernel (ops/pallas/segsum.py,
    REGTR_SEGSUM_IMPL=pallas; default stays on XLA's scatter — see the
    measured comparison at _SEGSUM_IMPL above).  Forward is identical
    to batched_row_gather.

    n_grad_cols: if given, only the first n_grad_cols columns receive a
    gradient; the rest get zeros.  The merged KPConv gather rides inert
    coordinate columns along with the features (kpconv_fused_gather) whose
    cotangent is structurally zero (stop_gradient downstream) — slicing
    them out of the backward skips their segment-sum traffic and keeps the
    pallas accumulator lane-packed at a power-of-two width.
    """
    return _row_gather_padded_impl(x, inds, n_grad_cols)


def _row_gather_padded_fwd(x, inds, n_grad_cols):
    return _row_gather_fwd_impl(x, inds), (inds, x.shape)


def _row_gather_padded_bwd(n_grad_cols, res, g):
    inds, (b, n, c) = res
    offs = (jnp.arange(b, dtype=inds.dtype) * n)[:, None]
    flat_idx = (inds + offs).reshape(-1)
    cg = c if n_grad_cols is None else int(n_grad_cols)
    gflat = g.reshape(-1, c)[:, :cg]
    if _use_sorted_segsum():
        from .pallas.segsum import sorted_padded_segment_sum

        dx = sorted_padded_segment_sum(
            gflat, flat_idx, num_segments=b * n, seg_stride=n,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        # fp32 accumulation: see _row_gather_bwd.
        dx = jax.ops.segment_sum(
            gflat.astype(jnp.float32), flat_idx, num_segments=b * n,
        )
    if cg != c:
        dx = jnp.concatenate(
            [dx, jnp.zeros((b * n, c - cg), dx.dtype)], axis=1
        )
    return dx.reshape(b, n, c).astype(g.dtype), None


_row_gather_padded_impl.defvjp(_row_gather_padded_fwd,
                               _row_gather_padded_bwd)


def _influence_from_rel(rel, neighb_inds, ns, kernel_pts, kp_extent,
                        influence="linear", aggregation="sum",
                        compute_dtype=None):
    """Influence tensor from relative neighbor offsets.

    rel: (B, Nq, K, 3) neighbor-minus-query offsets (fp32).
    Returns (infl (B, Nq, K, P), inv_n_valid (B, Nq)) — see kpconv_geometry.
    """
    p = kernel_pts.shape[0]
    if compute_dtype is not None:
        rel = rel.astype(compute_dtype)
        kernel_pts = kernel_pts.astype(compute_dtype)
    # ||rel - kp||^2 via the matmul expansion: avoids materializing the
    # (B,Nq,K,P,3) difference tensor (HBM bandwidth) and runs on the MXU.
    rel_sq = jnp.sum(rel * rel, axis=-1)                       # (B,Nq,K)
    dots = jnp.einsum(
        "bqkc,pc->bqkp", rel, kernel_pts,
        preferred_element_type=rel.dtype,
    )
    kp_sq = jnp.sum(kernel_pts * kernel_pts, axis=-1)          # (P,)
    sq_d = jnp.maximum(rel_sq[..., None] - 2.0 * dots + kp_sq, 0.0)

    if influence == "linear":
        infl = jnp.maximum(1.0 - jnp.sqrt(sq_d) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        infl = jnp.exp(-sq_d / (2.0 * sigma * sigma + 1e-9))
    elif influence == "constant":
        infl = jnp.ones_like(sq_d)
    else:
        raise ValueError(f"unknown influence {influence}")

    if aggregation == "closest":
        closest = jnp.argmin(sq_d, axis=-1)                     # (B,Nq,K)
        infl = infl * jax.nn.one_hot(closest, p, dtype=infl.dtype)
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation {aggregation}")

    n_valid = jnp.sum(neighb_inds < ns, axis=-1)                # (B,Nq)
    inv_n_valid = 1.0 / jnp.maximum(n_valid, 1).astype(jnp.float32)
    return infl, inv_n_valid


def kpconv_geometry(
    q_pts,        # (B, Nq, 3)
    s_pts,        # (B, Ns, 3)
    neighb_inds,  # (B, Nq, K) int32, shadow = Ns
    kernel_pts,   # (P, 3)
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
    compute_dtype=None,
):
    """Neighborhood geometry shared by every KPConv block at a level.

    The influence tensor depends only on (points, neighbor table, kernel
    disposition) — not on features or weights — so blocks operating on the
    same pyramid level reuse one geometry instead of re-gathering coordinates
    (gathers are the dominant cost on TPU).

    Precision note: the coordinate gather and the neighbor-minus-query
    subtraction run in fp32 (absolute room-scale coordinates need it), but
    `rel` is a small relative offset (|rel| <= conv radius), so with
    compute_dtype=bfloat16 everything after the subtraction — including the
    large (B,Nq,K,P) intermediates — runs and materializes in bf16
    (<=0.4% relative error on distances, well under the kernel extent).

    Returns (infl (B, Nq, K, P), inv_n_valid (B, Nq)).
    """
    b, ns, _ = s_pts.shape
    _, nq, k = neighb_inds.shape

    s_pts_pad = jnp.concatenate(
        [s_pts, jnp.full((b, 1, 3), SHADOW_COORD, s_pts.dtype)], axis=1
    )
    flat_inds = neighb_inds.reshape(b, nq * k)
    neighbors = batched_row_gather(s_pts_pad, flat_inds).reshape(b, nq, k, 3)

    # Geometry is a function of point coordinates only — training data, never
    # a differentiated leaf — so cut autodiff here.  Without this, reverse
    # mode materializes a dead d_infl -> d_rel chain of (B,Nq,K,P) tensors in
    # the backward of every block that consumes the influence tensor.
    rel = jax.lax.stop_gradient(
        neighbors - q_pts[:, :, None, :]                       # (B,Nq,K,3)
    )
    return _influence_from_rel(
        rel, neighb_inds, ns, kernel_pts, kp_extent,
        influence, aggregation, compute_dtype,
    )


def kpconv_apply(
    infl,         # (B, Nq, K, P) from kpconv_geometry
    inv_n_valid,  # (B, Nq)
    neighb_inds,  # (B, Nq, K)
    x,            # (B, Ns, Cin)
    weights,      # (P, Cin, Cout)
    compute_dtype=None,
    norm: str = "valid",
):
    """Feature path of KPConv given precomputed geometry."""
    b, ns, cin = x.shape
    _, nq, k = neighb_inds.shape
    p = infl.shape[-1]

    if cin == 1:
        # First-block fast path: input features are a constant 1 per valid
        # point (regtr.py:122), so the neighbor gather + contraction reduce
        # to a masked sum of influences — no gather at all.
        valid = (neighb_inds < ns).astype(infl.dtype)
        weighted = jnp.einsum(
            "bqkp,bqk->bqp", infl, valid,
            preferred_element_type=jnp.float32,
        )[..., None]                                        # (B,Nq,P,1)
        if compute_dtype is not None:
            weighted = weighted.astype(compute_dtype)
            weights = weights.astype(compute_dtype)
        out = jnp.einsum(
            "bqz,zo->bqo",
            weighted.reshape(b, nq, p * cin),
            weights.reshape(p * cin, -1),
            preferred_element_type=jnp.float32,
        )
        return out * inv_n_valid[..., None].astype(out.dtype)

    # Cast BEFORE the gather: the neighbor gather is the dominant HBM cost
    # of the backbone (measured), and moving bf16 rows halves its traffic.
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x_pad = jnp.concatenate([x, jnp.zeros((b, 1, cin), x.dtype)], axis=1)
    flat_inds = neighb_inds.reshape(b, nq * k)
    neighb_x = batched_row_gather_padded(x_pad, flat_inds).reshape(b, nq, k, cin)
    return _apply_from_gathered(infl, inv_n_valid, neighb_x, weights,
                                compute_dtype, norm)


def _apply_from_gathered(infl, inv_n_valid, neighb_x, weights, compute_dtype,
                         norm: str = "valid"):
    """KPConv contraction given already-gathered neighbor features."""
    b, nq, k, cin = neighb_x.shape
    p = infl.shape[-1]
    if norm == "legacy":
        # Reference quirk (kpconv_blocks.py:409-412): count gathered rows
        # whose channel sum is > 0 (shadow rows gathered zeros).
        n = jnp.sum(
            jnp.sum(neighb_x.astype(jnp.float32), axis=-1) > 0.0, axis=-1
        )
        inv_n_valid = 1.0 / jnp.maximum(n, 1).astype(jnp.float32)
    elif norm != "valid":
        raise ValueError(f"unknown kpconv norm {norm}")
    if compute_dtype is not None:
        infl = infl.astype(compute_dtype)
        neighb_x = neighb_x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    # (B,Nq,K,P) x (B,Nq,K,C) -> (B,Nq,P,C); then one big matmul on (P*C, C').
    weighted = jnp.einsum(
        "bqkp,bqkc->bqpc", infl, neighb_x,
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "bqz,zo->bqo",
        weighted.reshape(b, nq, p * cin),
        weights.reshape(p * cin, -1),
        preferred_element_type=jnp.float32,
    )
    return out * inv_n_valid[..., None].astype(out.dtype)


def kpconv(
    q_pts, s_pts, neighb_inds, x, kernel_pts, weights,
    kp_extent: float, influence: str = "linear", aggregation: str = "sum",
    compute_dtype=None, norm: str = "valid",
):
    """Batched KPConv (geometry + apply in one call). (B, Nq, Cout)."""
    infl, inv_n = kpconv_geometry(
        q_pts, s_pts, neighb_inds, kernel_pts, kp_extent,
        influence, aggregation, compute_dtype=compute_dtype,
    )
    return kpconv_apply(
        infl, inv_n, neighb_inds, x, weights, compute_dtype, norm
    )


def _pack_f32_as_bf16(x):
    """Bit-split (B, N, C) fp32 into (B, N, 2C) bf16 halves (lossless)."""
    b, n, c = x.shape
    return jax.lax.bitcast_convert_type(x, jnp.bfloat16).reshape(b, n, 2 * c)


def _unpack_bf16_to_f32(h):
    """Inverse of _pack_f32_as_bf16 on gathered rows: (.., 2C) -> (.., C)."""
    shape = h.shape[:-1] + (h.shape[-1] // 2, 2)
    return jax.lax.bitcast_convert_type(h.reshape(shape), jnp.float32)


def kpconv_fused_gather(
    q_pts, s_pts, neighb_inds, x, x_extra, kernel_pts, weights,
    kp_extent: float, influence: str = "linear", aggregation: str = "sum",
    compute_dtype=None, norm: str = "valid",
):
    """KPConv that computes its own geometry via ONE merged gather.

    On this hardware the neighbor gather costs ~2.3 ns/row regardless of row
    width up to ~512 B (measured, tools/exp_geom.py), so gathering
    [conv features | optional shortcut features | support coordinates] as a
    single wide row costs the same as any one of the three separate gathers.
    Coordinates are bit-split into bf16 halves (lossless) so the merged row
    has a single dtype; they are reassembled to fp32 before the geometry
    subtraction.

    Args:
        x: (B, Ns, Cin) conv-path features.
        x_extra: optional (B, Ns, Ce) features to max-pool over the same
            neighbor table (the strided resnet shortcut).

    Returns:
        (conv_out (B, Nq, Cout),
         maxpool_out (B, Nq, Ce) or None,
         (infl, inv_n_valid) — reusable by later blocks at this level)
    """
    b, ns, _ = s_pts.shape
    _, nq, k = neighb_inds.shape
    cin = x.shape[-1]
    ce = 0 if x_extra is None else x_extra.shape[-1]
    gdtype = compute_dtype if compute_dtype is not None else x.dtype

    parts = [x.astype(gdtype)]
    if x_extra is not None:
        parts.append(x_extra.astype(gdtype))
    if compute_dtype is not None:
        parts.append(_pack_f32_as_bf16(s_pts.astype(jnp.float32)))
        ccoord = 6
        pad_coord = _pack_f32_as_bf16(
            jnp.full((b, 1, 3), SHADOW_COORD, jnp.float32))
    else:
        parts.append(s_pts)
        ccoord = 3
        pad_coord = jnp.full((b, 1, 3), SHADOW_COORD, s_pts.dtype)
    cat = jnp.concatenate(parts, axis=-1)
    pad_row = jnp.concatenate(
        [jnp.zeros((b, 1, cin + ce), gdtype), pad_coord.astype(gdtype)],
        axis=-1,
    )
    cat = jnp.concatenate([cat, pad_row], axis=1)

    flat_inds = neighb_inds.reshape(b, nq * k)
    # Coordinate columns are inert in the backward (stop_gradient below);
    # n_grad_cols drops their cotangents from the gather transpose.
    g = batched_row_gather_padded(
        cat, flat_inds, n_grad_cols=cin + ce,
    ).reshape(b, nq, k, cin + ce + ccoord)

    neighb_x = g[..., :cin]
    if compute_dtype is not None:
        neighbors = _unpack_bf16_to_f32(g[..., cin + ce:])
    else:
        neighbors = g[..., cin + ce:]
    # The coordinate columns ride through the (differentiable) merged gather,
    # which makes the influence geometry LOOK differentiable to autodiff even
    # though point coordinates are data, never trained.  stop_gradient prunes
    # the dead backward chain (a d_infl einsum transpose per consuming block
    # plus the sqrt/relu geometry backward over (B,Nq,K,P) tensors); the
    # cotangent flowing into the gather's coordinate columns becomes zero and
    # gradients w.r.t. features/weights are bitwise unchanged (tested:
    # tests/test_parity.py grad-parity vs the unfused path).
    rel = jax.lax.stop_gradient(neighbors - q_pts[:, :, None, :])
    infl, inv_n = _influence_from_rel(
        rel, neighb_inds, ns, kernel_pts, kp_extent,
        influence, aggregation, compute_dtype,
    )
    out = _apply_from_gathered(infl, inv_n, neighb_x, weights, compute_dtype,
                               norm)

    pooled = None
    if x_extra is not None:
        # Shadow rows gathered zeros, matching max_pool's zero pad row.
        pooled = jnp.max(g[..., cin:cin + ce], axis=2)
    return out, pooled, (infl, inv_n)


def kpconv_deformable(
    q_pts, s_pts, neighb_inds, x, kernel_pts, weights,
    offset_weights, offset_bias, kp_extent: float,
    influence: str = "linear", aggregation: str = "sum",
    modulated: bool = False, compute_dtype=None, norm: str = "valid",
):
    """Deformable (and optionally modulated) KPConv.

    Equivalent of the deformable branch at /root/reference/src/models/
    backbone_kpconv/kpconv_blocks.py:275-356: a rigid KPConv predicts
    per-query kernel-point offsets (scaled by the extent), the main
    convolution then measures neighbor distances against the *deformed*
    kernel points; `modulated` additionally predicts a per-kernel-point
    gain of 2*sigmoid(.).  The reference's in-range neighbor pruning
    (:329-356) is a dynamic-shape compute optimization, not a semantic one
    (out-of-range neighbors have zero linear influence) — it is omitted
    here because dynamic shapes defeat XLA; the dense masked form costs one
    more (B,Nq,K,P) contraction, which the MXU absorbs.

    Args:
        offset_weights: (P, Cin, P*3 [+P if modulated]) rigid-conv weights
            for the offset prediction.
        offset_bias: (P*3 [+P],) bias added to the offset features.

    Returns (B, Nq, Cout).
    """
    b, ns, _ = s_pts.shape
    _, nq, k = neighb_inds.shape
    p = kernel_pts.shape[0]

    # Offsets via a rigid KPConv over the same neighborhood (:296-298).
    off = kpconv(
        q_pts, s_pts, neighb_inds, x, kernel_pts, offset_weights,
        kp_extent, influence, aggregation, compute_dtype=compute_dtype,
        norm=norm,
    ) + offset_bias
    unscaled = off[..., : 3 * p].reshape(b, nq, p, 3)
    offsets = unscaled.astype(jnp.float32) * kp_extent
    modulations = None
    if modulated:
        modulations = 2.0 * jax.nn.sigmoid(off[..., 3 * p:])   # (B,Nq,P)
    deformed_kp = kernel_pts[None, None] + offsets             # (B,Nq,P,3)

    # Neighbor offsets relative to each query (shadow rows at 1e6).
    s_pts_pad = jnp.concatenate(
        [s_pts, jnp.full((b, 1, 3), SHADOW_COORD, s_pts.dtype)], axis=1
    )
    flat_inds = neighb_inds.reshape(b, nq * k)
    neighbors = batched_row_gather(s_pts_pad, flat_inds).reshape(b, nq, k, 3)
    # Coordinates are data (see kpconv_geometry); offset gradients still flow
    # through deformed_kp in the dots/kp_sq terms below.
    rel = jax.lax.stop_gradient(neighbors - q_pts[:, :, None, :])

    if compute_dtype is not None:
        rel = rel.astype(compute_dtype)
        deformed_kp = deformed_kp.astype(compute_dtype)
    rel_sq = jnp.sum(rel * rel, axis=-1)                       # (B,Nq,K)
    dots = jnp.einsum(
        "bqkc,bqpc->bqkp", rel, deformed_kp,
        preferred_element_type=rel.dtype,
    )
    kp_sq = jnp.sum(deformed_kp * deformed_kp, axis=-1)        # (B,Nq,P)
    sq_d = jnp.maximum(
        rel_sq[..., None] - 2.0 * dots + kp_sq[:, :, None, :], 0.0
    )

    if influence == "linear":
        infl = jnp.maximum(1.0 - jnp.sqrt(sq_d) / kp_extent, 0.0)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        infl = jnp.exp(-sq_d / (2.0 * sigma * sigma + 1e-9))
    elif influence == "constant":
        infl = jnp.ones_like(sq_d)
    else:
        raise ValueError(f"unknown influence {influence}")
    if aggregation == "closest":
        closest = jnp.argmin(sq_d, axis=-1)
        infl = infl * jax.nn.one_hot(closest, p, dtype=infl.dtype)
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation {aggregation}")

    n_valid = jnp.sum(neighb_inds < ns, axis=-1)
    inv_n = 1.0 / jnp.maximum(n_valid, 1).astype(jnp.float32)

    cin = x.shape[-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x_pad = jnp.concatenate([x, jnp.zeros((b, 1, cin), x.dtype)], axis=1)
    neighb_x = batched_row_gather_padded(x_pad, flat_inds).reshape(b, nq, k, cin)
    if norm == "legacy":
        n = jnp.sum(
            jnp.sum(neighb_x.astype(jnp.float32), axis=-1) > 0.0, axis=-1
        )
        inv_n = 1.0 / jnp.maximum(n, 1).astype(jnp.float32)

    if compute_dtype is not None:
        infl = infl.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    weighted = jnp.einsum(
        "bqkp,bqkc->bqpc", infl, neighb_x,
        preferred_element_type=jnp.float32,
    )
    if modulations is not None:
        weighted = weighted * modulations[..., None].astype(weighted.dtype)
    out = jnp.einsum(
        "bqz,zo->bqo",
        weighted.reshape(b, nq, p * cin),
        weights.reshape(p * cin, -1),
        preferred_element_type=jnp.float32,
    )
    return out * inv_n[..., None].astype(out.dtype)


def max_pool(x, pool_inds, compute_dtype=None):
    """Max-pool features over (pool) neighbor indices.

    Mirrors /root/reference/src/models/backbone_kpconv/kpconv_blocks.py:
    127-143: shadow neighbors contribute a zero row, so outputs are >= 0
    clamped implicitly when all-shadow — matching reference semantics.

    x: (B, Ns, C); pool_inds: (B, Nq, K) with shadow = Ns -> (B, Nq, C)
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)  # halve gather traffic (see kpconv_apply)
    b, ns, c = x.shape
    _, nq, k = pool_inds.shape
    x_pad = jnp.concatenate([x, jnp.zeros((b, 1, c), x.dtype)], axis=1)
    flat = pool_inds.reshape(b, nq * k)
    gathered = batched_row_gather_padded(x_pad, flat)
    return jnp.max(gathered.reshape(b, nq, k, c), axis=2)


def closest_pool(x, inds):
    """Pool features from the first (nearest) neighbor column.

    Mirrors kpconv_blocks.py:112-124.  Our neighbor tables are sorted by
    distance, so column 0 is the true nearest neighbor.
    x: (B, Ns, C); inds: (B, Nq, K) -> (B, Nq, C)
    """
    b, ns, c = x.shape
    x_pad = jnp.concatenate([x, jnp.zeros((b, 1, c), x.dtype)], axis=1)
    return batched_row_gather_padded(x_pad, inds[:, :, 0])


def global_average(x, mask):
    """Masked mean over points: (B, N, C), (B, N) -> (B, C).

    Mirrors kpconv_blocks.py:146-165."""
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
