"""Hardware probe for the sorted Pallas segment-sum (ops/pallas/segsum.py).

Compiles the kernel with the REAL Mosaic compiler (not interpret mode) and
checks its output numerically against the XLA segment-sum oracle at
tol 1e-4.  Exit code 0 iff both pass — run this on the TPU before relying
on REGTR_SEGSUM_IMPL=pallas (CPU interpret-mode tests cannot catch Mosaic
legalization failures or hardware matmul-precision effects; both happened:
vector<i1> loop carriers failed to legalize, and the one-hot dot at TPU
default precision measured 5.9e-2 error until precision=HIGHEST).

Usage: python tools/probe_segsum.py [n0=20480] [k=40] [b=4] [c=32]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-4


def main():
    import jax
    import jax.numpy as jnp
    from exp_bwd_gather import real_table
    from regtr_tpu.ops.pallas.segsum import (
        padded_segment_sum_reference, sorted_padded_segment_sum,
    )

    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    c = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    inds1 = real_table(n0, k)
    rng = np.random.RandomState(0)
    rows = b * n0 * k
    stride = n0 + 1
    nseg = b * stride
    print(f"probe table: b={b} n0={n0} k={k} c={c} rows={rows/1e6:.2f}M "
          f"backend={jax.default_backend()}", flush=True)

    offs = (np.arange(b, dtype=np.int64) * stride)[:, None]
    flat_ids = (np.tile(inds1.reshape(1, -1), (b, 1)) + offs).reshape(-1)
    ids = jnp.asarray(flat_ids.astype(np.int32))
    g32 = jnp.asarray(rng.randn(rows, c).astype(np.float32))

    f = jax.jit(lambda gg, ii: sorted_padded_segment_sum(
        gg, ii, num_segments=nseg, seg_stride=stride))
    t0 = time.time()
    f.lower(g32, ids).compile()
    print(f"COMPILE OK in {time.time() - t0:.1f}s", flush=True)

    got = np.asarray(f(g32, ids))
    want = np.asarray(jax.jit(
        lambda gg, ii: padded_segment_sum_reference(gg, ii, nseg, stride)
    )(g32, ids))
    err = float(np.abs(got - want).max())
    ok = err <= TOL
    print(f"NUMERIC {'OK' if ok else 'FAIL'}: max abs err vs XLA oracle "
          f"{err:.3e} (tol {TOL:g})", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
