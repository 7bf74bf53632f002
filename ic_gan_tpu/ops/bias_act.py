"""Fused bias + activation + gain + clamp.

Reference: ``stylegan2_ada_pytorch/torch_utils/ops/bias_act.{py,cu}`` — a CUDA
kernel fusing ``clamp(gain * act(x + b))`` with hand-written first/second-order
gradients for nine activations.

On TPU none of that machinery is needed: this is a pure elementwise chain, XLA
fuses it into the producing matmul/conv automatically, and JAX differentiates
it to any order (R1 / path-length regularizers take grad-of-grad through this
function and just work).  We therefore keep only the semantic surface: the
activation table with its default gains (``bias_act.py:26-99``) and the clamp.
A Pallas twin exists in ``ops/pallas/bias_act.py`` for cases where fusing into
a custom kernel is profitable.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Callable, Optional

import jax
import jax.numpy as jnp


class _Act(NamedTuple):
    fn: Callable
    def_gain: float


activation_funcs = {
    "linear": _Act(lambda x: x, 1.0),
    "relu": _Act(lambda x: jnp.maximum(x, 0.0), math.sqrt(2.0)),
    "lrelu": _Act(lambda x: jnp.where(x >= 0, x, x * 0.2), math.sqrt(2.0)),
    "tanh": _Act(jnp.tanh, 1.0),
    "sigmoid": _Act(jax.nn.sigmoid, 1.0),
    "elu": _Act(jax.nn.elu, 1.0),
    "selu": _Act(jax.nn.selu, 1.0),
    "softplus": _Act(jax.nn.softplus, 1.0),
    "swish": _Act(jax.nn.swish, math.sqrt(2.0)),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """``clamp(gain * act(x + b))`` along channel ``axis`` (NHWC → axis=-1).

    Matches reference ``bias_act()`` (``bias_act.py:131-162``): ``gain`` and
    ``clamp`` default to the activation's ``def_gain`` and no clamping.
    """
    spec = activation_funcs[act]
    if gain is None:
        gain = spec.def_gain
    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape)
    if act == "lrelu" and alpha is not None:
        x = jnp.where(x >= 0, x, x * alpha)
    else:
        x = spec.fn(x)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
