"""Pallas TPU kernels.

Only kernels with a measured win over the XLA lowering live here; several
candidates were prototyped and rejected because XLA already wins on this
hardware (see git log / RESULTS.md):
  * windowed one-hot gather for KPConv — neighbor index spreads on real
    scans (~5k per 128-query tile even after spatial sorting) put the
    required window past the FLOP break-even vs the 2.3 ns/row XLA gather;
  * in-kernel radius-search top-k — Mosaic has no vectorized dynamic
    gather along sublanes, and per-row selection loops lose to
    jax.lax.approx_min_k.
"""
from .attention import flash_masked_attention

__all__ = ["flash_masked_attention"]
