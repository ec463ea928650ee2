"""Sorted segment-sum kernel (Pallas TPU): the gather-transpose without
XLA's scatter.

Why: the backward of every neighbor-feature gather is a segment-sum of
cotangent rows over the neighbor table (ops/kpconv.py batched_row_gather).
Measured on real 3DMatch level-0 tables (tools/exp_bwd_gather*.py, RESULTS):
XLA lowers scatter/segment-sum at ~13-16 ns/row regardless of row width
(~80x below HBM bandwidth), while argsort costs 1.37 ns/row, a permutation
gather 3.8, and a cumsum 2.35.  So sorting the rows by segment id is cheap —
the only missing piece is reducing SORTED runs without a scatter.  This
kernel does that:

  * rows arrive sorted by segment id; a grid step processes S rows;
  * each chunk packs its rows into a (S, 128) lane-packed block (P4 = 128/C
    consecutive segments share a VMEM row, each in its own lane block — this
    also keeps narrow-C accumulators from wasting 4x VMEM on lane padding);
  * a windowed one-hot (WDp, S) is built on the VPU from the sorted ids and
    one MXU matmul produces the window's packed partial sums, accumulated
    into a VMEM-resident dx with a single dynamic windowed add;
  * sortedness makes the window tight; a second window (predicated, usually
    skipped) catches chunks whose ids straddle a gap (e.g. the empty padding
    segments at a cloud boundary), and a per-row sequential fallback
    (almost always empty) guarantees exactness for arbitrary id runs;
  * rows whose id is a per-cloud PAD row (id % seg_stride == seg_stride-1,
    the shadow-neighbor row appended by every KPConv/pool caller) are
    dropped by contract — their gradient is discarded by the caller anyway,
    and they are 30-40%% of all rows at level 0.

The equivalent machinery in the reference is torch's scatter_add backward of
index_select on CUDA (used by gather_neighbors,
/root/reference/src/models/backbone_kpconv/kpconv_blocks.py:77-109).

Status (round 5, measured on v5e, 3 reps each): the kernel LOSES to XLA's
scatter both in the isolated microbench (44-53 vs 13.7-14.4 ns/row on the
real 3.28M-row L0 table, tools/exp_pallas_segsum.py) and inside the full
train program (608 vs 342 ms/step at 3DMatch scale) — the argsort+permute
prologue plus the sequential 1-D grid (rows/1024 steps, one small MXU
matmul each) serialize where XLA's scatter overlaps with independent
work.  It is kept OPT-IN (REGTR_SEGSUM_IMPL=pallas) as a correct,
hardware-exact scatter-free alternative for future shapes; the production
default is XLA's segment_sum.

Determinism: fixed reduction order (MXU matmul within a chunk, chunks in
grid order) — bit-stable across runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ids_sub_ref, ids_lane_ref, g_ref, dxp_ref, gp_ref, *,
            s_rows, c, p4, wdp, nsegp_rows, seg_stride):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        dxp_ref[:] = jnp.zeros_like(dxp_ref)

    ids_s = ids_sub_ref[0]                                   # (S, 1) int32
    ids_l = ids_lane_ref[0]                                  # (1, S) int32
    g = g_ref[:].astype(jnp.float32)                         # (S, C)

    pad_s = (ids_s % seg_stride) == (seg_stride - 1)         # (S, 1)
    pad_l = (ids_l % seg_stride) == (seg_stride - 1)         # (1, S)

    # Lane-pack: row i's channels go to lane block (ids[i] % P4) * C.
    if p4 > 1:
        blk = ids_s % p4                                     # (S, 1)
        parts = [jnp.where(blk == k, g, 0.0) for k in range(p4)]
        gp = jnp.concatenate(parts, axis=1)                  # (S, P4*C)
    else:
        gp = g
    if gp.shape[1] < 128:
        gp = jnp.concatenate(
            [gp, jnp.zeros((s_rows, 128 - gp.shape[1]), jnp.float32)],
            axis=1,
        )
    gp = jnp.where(pad_s, 0.0, gp)                           # drop pad rows
    gp_ref[:] = gp                # scratch: fallback rows read from here

    rowp_s = ids_s // p4                                     # (S, 1)
    rowp_l = ids_l // p4                                     # (1, S)
    big = jnp.int32(nsegp_rows)

    def window_add(sel_s, sel_l):
        """One-hot matmul + windowed add for the selected rows; returns the
        selector minus the rows this window covered."""
        base = jnp.min(jnp.where(sel_s, rowp_s, big))
        base = jnp.minimum(base, jnp.int32(nsegp_rows - wdp))
        base = jnp.maximum((base // 8) * 8, 0)
        wp_l = rowp_l - base                                 # (1, S)
        in_l = sel_l & (wp_l >= 0) & (wp_l < wdp)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wdp, s_rows), 0)
        oh = ((iota_w == wp_l) & in_l).astype(jnp.float32)   # (WDp, S)
        # precision=HIGHEST: at TPU default matmul precision the fp32
        # operands are rounded through bf16 passes, which measured a
        # 5.9e-2 max error vs the XLA oracle on randn inputs (round-4
        # hardware log).  A one-hot matmul only selects+adds rows, so
        # full fp32 multiplication makes the kernel exact on hardware.
        delta = jax.lax.dot(oh, gp_ref[:],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        dxp_ref[pl.ds(base, wdp), :] += delta
        wp_s = rowp_s - base
        in_s = sel_s & (wp_s >= 0) & (wp_s < wdp)
        return sel_s & ~in_s, sel_l & ~in_l

    out_s, out_l = window_add(~pad_s, ~pad_l)
    n_out = jnp.sum(out_s.astype(jnp.int32))

    @pl.when(n_out > 0)
    def _more_windows():
        # Sortedness makes one window cover a chunk in the common case; a
        # chunk straddling a gap (empty padding segments at a cloud
        # boundary) or pathological id spreads take more — loop the same
        # vectorized window until every selected row is covered (each pass
        # retires >=1 row, so it terminates; real tables take <=2 passes).
        # Carry int32 masks: Mosaic cannot legalize scf.yield over
        # vector<i1> loop carriers (measured failure on the real backend).
        def cond(carry):
            sel_s, _ = carry
            return jnp.sum(sel_s) > 0

        def body(carry):
            ns, nl = window_add(carry[0] != 0, carry[1] != 0)
            return ns.astype(jnp.int32), nl.astype(jnp.int32)

        jax.lax.while_loop(
            cond, body,
            (out_s.astype(jnp.int32), out_l.astype(jnp.int32)))


def _sorted_segment_sum_slab(gs, sids_sub, sids_lane, num_segments,
                             seg_stride, s_rows, wdp, interpret):
    rpad, c = gs.shape
    t = rpad // s_rows
    p4 = max(1, 128 // c)
    nsegp_rows = _round_up(max(_round_up(num_segments, p4) // p4, wdp), 8)

    kernel = functools.partial(
        _kernel, s_rows=s_rows, c=c, p4=p4, wdp=wdp,
        nsegp_rows=nsegp_rows, seg_stride=seg_stride,
    )
    dxp = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nsegp_rows, 128), jnp.float32),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, s_rows, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_rows), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nsegp_rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_rows, 128), jnp.float32)],
        interpret=interpret,
    )(sids_sub, sids_lane, gs)

    lanes = p4 * c
    dx = dxp[:, :lanes].reshape(nsegp_rows * p4, c)
    return dx[:num_segments]


def _pick_slabs(c: int, num_segments: int,
                vmem_budget: int = 13 * 2 ** 20):
    """Split C into channel slabs so the packed accumulator fits VMEM."""
    slabs = []
    rem = c
    while rem > 0:
        w = min(rem, 128)
        while w > 8:
            p4 = max(1, 128 // w)
            rows = _round_up(num_segments, p4) // p4
            if rows * 128 * 4 <= vmem_budget:
                break
            w //= 2
        slabs.append(w)
        rem -= w
    return slabs


def sorted_padded_segment_sum(g, flat_ids, num_segments, seg_stride,
                              block_rows: int = 1024, window_rows: int = 128,
                              interpret: bool = False):
    """Segment-sum of ``g`` (R, C) over ``flat_ids`` (R,) int32, where ids
    with ``id % seg_stride == seg_stride - 1`` are per-cloud PAD rows whose
    sums are dropped (returned as zeros).

    Exact (every non-pad row lands in its segment regardless of id
    distribution) and deterministic.  Returns (num_segments, C) float32.
    """
    r, c = g.shape
    order = jnp.argsort(flat_ids).astype(jnp.int32)
    sids = jnp.take(flat_ids, order).astype(jnp.int32)
    gs = jnp.take(g, order, axis=0)

    rpad = _round_up(max(r, block_rows), block_rows)
    if rpad != r:
        # pad ids with a PAD-row id so padded rows are dropped in-kernel
        pad_id = jnp.full((rpad - r,), seg_stride - 1, sids.dtype)
        sids = jnp.concatenate([sids, pad_id])
        gs = jnp.concatenate(
            [gs, jnp.zeros((rpad - r, c), gs.dtype)], axis=0
        )
    t = rpad // block_rows
    sids_sub = sids.reshape(t, block_rows, 1)
    sids_lane = sids.reshape(t, 1, block_rows)

    outs = []
    c0 = 0
    for w in _pick_slabs(c, num_segments):
        outs.append(_sorted_segment_sum_slab(
            gs[:, c0:c0 + w], sids_sub, sids_lane, num_segments,
            seg_stride, block_rows, window_rows, interpret,
        ))
        c0 += w
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def padded_segment_sum_reference(g, flat_ids, num_segments, seg_stride):
    """XLA oracle: plain segment-sum with pad-row sums zeroed."""
    dx = jax.ops.segment_sum(
        g.astype(jnp.float32), flat_ids, num_segments=num_segments
    )
    seg = jnp.arange(num_segments, dtype=jnp.int32)
    keep = (seg % seg_stride) != (seg_stride - 1)
    return dx * keep[:, None].astype(dx.dtype)
