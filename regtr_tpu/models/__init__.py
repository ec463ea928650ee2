"""Model registry: string -> model class, plus construction helpers.

Equivalent of the dynamic registry at /root/reference/src/models/
__init__.py:11-30 (`model: regtr.RegTR` in the YAML selects the class).
"""
from __future__ import annotations

from ..ops.pyramid import make_pyramid_spec
from .regtr import RegTR

_REGISTRY = {
    "regtr.RegTR": RegTR,
    "RegTR": RegTR,
}


def register_model(name: str, cls):
    _REGISTRY[name] = cls


def get_model(name: str):
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def create_model(cfg, n0_capacity: int):
    """Build the model named by cfg['model'] with a pyramid spec sized for
    `n0_capacity` input points per cloud."""
    cls = get_model(cfg.get("model", "regtr.RegTR"))
    spec = make_pyramid_spec(cfg, n0_capacity)
    return cls(cfg=cfg, spec=spec)


def init_model_params(model, rng, batch_pairs: int = 1):
    """Initialize the full parameter pytree (including loss-criterion params,
    which only materialize through the loss path).

    Parameter shapes depend only on the architecture config, not on the
    pyramid capacities, so initialization runs through a tiny-capacity clone
    of the model — flax's eager init over full-size activations would be
    needlessly slow (especially against a remote device).  For the same
    reason, when a CPU backend is available alongside an accelerator, the
    init computation runs on CPU and only the resulting params move over."""
    import contextlib

    import numpy as np
    import jax
    import jax.numpy as jnp

    n0 = min(64, model.spec.capacities[0])
    tiny = type(model)(cfg=model.cfg, spec=make_pyramid_spec(model.cfg, n0))
    rnd = np.random.RandomState(0)

    default = jax.devices()[0]
    ctx = contextlib.nullcontext()
    if default.platform != "cpu":
        try:
            ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            pass
    with ctx:
        pts = jnp.asarray(rnd.rand(2 * batch_pairs, n0, 3).astype(np.float32))
        mask = jnp.ones((2 * batch_pairs, n0), bool)
        pose = jnp.broadcast_to(jnp.eye(3, 4), (batch_pairs, 3, 4))
        ov = jnp.ones((2 * batch_pairs, n0), jnp.float32)
        # jit the init: eager flax init dispatches thousands of small ops
        # (42 s vs 19 s cold for the 3DMatch config, measured on this host;
        # with JAX_COMPILATION_CACHE_DIR the jit compile is cached across
        # processes, so repeat cold-starts drop to ~1 s).
        variables = jax.jit(
            lambda k: tiny.init(k, pts, mask, pose, ov,
                                method=tiny.compute_loss)
        )(rng)
        variables = jax.block_until_ready(variables)
    if default.platform != "cpu":
        variables = jax.device_put(variables, default)
    return variables
