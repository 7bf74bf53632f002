"""Unified GAN train state: one pytree carrying both networks, their mutable
collections, optimizers, and the EMA copy.

Replaces the reference's scattered state (separate ``G.optim``/``D.optim``
embedded in the modules, the ``ema`` object, the ``state_dict`` dict —
``BigGAN_PyTorch/trainer.py:130-183``) with a single jittable structure that
checkpoints as one pytree (SURVEY.md §5.4 TPU plan).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class GANTrainState:
    step: jax.Array  # int32 scalar
    g_params: Any
    d_params: Any
    g_state: Any  # {"batch_stats": ..., "sn": ...}
    d_state: Any  # {"sn": ...}
    g_ema_params: Any
    g_ema_state: Any
    g_opt_state: Any
    d_opt_state: Any

    @classmethod
    def create(cls, g_vars, d_vars, g_tx, d_tx):
        g_params = g_vars["params"]
        d_params = d_vars["params"]
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            # jnp.copy, not identity: EMA must own distinct buffers so the
            # whole state can be donated to the jitted step.
            g_ema_params=jax.tree.map(jnp.copy, g_params),
            g_ema_state=jax.tree.map(jnp.copy, g_state),
            g_opt_state=g_tx.init(g_params),
            d_opt_state=d_tx.init(d_params),
        )


def make_optimizer(lr: float, b1: float = 0.0, b2: float = 0.999,
                   eps: float = 1e-6) -> optax.GradientTransformation:
    """Adam with BigGAN's defaults (G_lr 5e-5 / D_lr 2e-4, β=(0, 0.999),
    eps 1e-6 — reference argparse defaults, ``BigGAN_PyTorch/utils.py``)."""
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)


def ema_update(ema_params, params, decay):
    """``ema = decay * ema + (1-decay) * params`` with decay forced to 0 before
    ``ema_start`` (ref ``utils.py:1039-1067``: copies source until start itr).
    ``decay`` may be a traced scalar."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def scrub_grads(grads):
    """Replace NaN/±Inf gradient entries before the optimizer update
    (reference ``training_loop.py:517-521``: ``nan_to_num(grad, nan=0,
    posinf=1e5, neginf=-1e5)``). One bad bf16 microbatch must not poison
    Adam moments and the EMA irrecoverably.

    Returns ``(clean_grads, nonfinite_count)`` where the count is a scalar
    metric (0 on healthy steps) cheap enough to log every step.
    """
    leaves = jax.tree.leaves(grads)
    nonfinite = sum(
        jnp.sum(~jnp.isfinite(g)).astype(jnp.float32) for g in leaves
    )
    clean = jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
    )
    return clean, nonfinite
