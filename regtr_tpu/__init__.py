"""regtr_tpu: TPU-native point-cloud registration (RegTR capabilities).

Public convenience surface:
    register(src_xyz, tgt_xyz, params, cfg) -> dict with pose etc.
(the minimal API the reference's demo.py defines implicitly —
/root/reference/src/demo.py:178-189).
"""
from __future__ import annotations

__version__ = "0.1.0"


def register(src_xyz, tgt_xyz, params=None, cfg=None, bucket=None):
    """Register one pair of raw point clouds.

    Args:
        src_xyz / tgt_xyz: (N, 3) arrays (any count; padded to a bucket).
        params: model parameter pytree (random-init if None — useful only
            for pipeline checks).
        cfg: flat Config; defaults to the 3DMatch preset for big clouds and
            the ModelNet preset for small ones.
        bucket: override the padded capacity.

    Returns:
        dict with 'pose' (3, 4) src->tgt, 'src_overlap'/'tgt_overlap'
        (valid-point overlap probabilities), 'src_kp'/'tgt_kp' (coarse
        keypoints), 'src_kp_warped'/'tgt_kp_warped' (predicted
        correspondences), matching the reference demo contract.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data.collate import pick_bucket
    from .models import create_model, init_model_params
    from .presets import modelnet_config, threedmatch_config

    src_xyz = np.asarray(src_xyz, np.float32)
    tgt_xyz = np.asarray(tgt_xyz, np.float32)
    n_max = max(len(src_xyz), len(tgt_xyz))
    if cfg is None:
        cfg = threedmatch_config() if n_max > 4096 else modelnet_config()
    n0 = bucket or pick_bucket(n_max, cfg["buckets"])
    model = create_model(cfg, n0)
    if params is None:
        params = init_model_params(model, jax.random.PRNGKey(0))["params"]

    def pad(c):
        out = np.zeros((n0, 3), np.float32)
        out[: len(c)] = c[:n0]
        m = np.zeros(n0, bool)
        m[: min(len(c), n0)] = True
        return out, m

    ps, ms = pad(src_xyz)
    pt, mt = pad(tgt_xyz)
    out = jax.jit(lambda p, x, m: model.apply({"params": p}, x, m))(
        params, jnp.asarray(np.stack([ps, pt])), jnp.asarray(np.stack([ms, mt]))
    )
    kp_mask = np.asarray(out["kp_mask"])
    ov = np.asarray(jax.nn.sigmoid(out["overlap_logits"][-1]))
    corr = np.asarray(out["corr"][-1])
    kp = np.asarray(out["kp"])
    return {
        "pose": np.asarray(out["pose"][-1, 0]),
        "src_kp": kp[0][kp_mask[0]],
        "tgt_kp": kp[1][kp_mask[1]],
        "src_kp_warped": corr[0][kp_mask[0]],
        "tgt_kp_warped": corr[1][kp_mask[1]],
        "src_overlap": ov[0][kp_mask[0]],
        "tgt_overlap": ov[1][kp_mask[1]],
    }
