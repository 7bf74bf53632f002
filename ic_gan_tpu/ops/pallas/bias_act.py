"""Pallas TPU kernel: fused bias + activation + gain + clamp.

Parity twin of ``ops/bias_act.py`` (reference CUDA kernel:
``torch_utils/ops/bias_act.cu``).  XLA already fuses this elementwise chain
into the producing conv in the standard path, so the kernel exists for
composition into larger hand-written kernels and as the deterministic-clamp
variant.  Differentiation uses ``jax.custom_jvp`` with tangents computed from
the (mathematically identical) XLA formulation — arbitrary-order, as the
R1/path-length regularizers require.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ic_gan_tpu.ops.bias_act import activation_funcs, bias_act as bias_act_xla

LANES = 128


def _apply_chain(x, act, gain, clamp):
    x = activation_funcs[act].fn(x)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def _kernel_bias(x_ref, b_ref, out_ref, *, act, gain, clamp):
    out_ref[...] = _apply_chain(
        x_ref[...] + b_ref[...], act, gain, clamp
    ).astype(out_ref.dtype)


def _kernel_nobias(x_ref, out_ref, *, act, gain, clamp):
    out_ref[...] = _apply_chain(x_ref[...], act, gain, clamp).astype(
        out_ref.dtype
    )


def bias_act_fused(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    act: str = "linear",
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
):
    """Fused ``clamp(gain·act(x + b))`` over the channel-minor axis.

    x: (..., C) with C a multiple of 128 (falls back to the XLA formulation
    otherwise); b: (C,) or None.  Differentiable to any order: the primal
    runs the Pallas kernel, tangents run the XLA formulation (custom_jvp —
    supports the grad-of-grad that R1/PPL take, unlike custom_vjp).
    """
    if b is None:
        return _fused_nobias(x, act, gain, clamp)
    return _fused_bias(x, b, act, gain, clamp)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def _fused_nobias(x, act, gain, clamp):
    return _forward(x, None, act, gain, clamp)


@_fused_nobias.defjvp
def _fused_nobias_jvp(act, gain, clamp, primals, tangents):
    (x,) = primals
    (dx,) = tangents
    # Recursive call keeps the custom rule attached at higher orders — the
    # raw pallas_call is never differentiated directly.
    primal_out = _fused_nobias(x, act, gain, clamp)
    _, tangent_out = jax.jvp(
        lambda x: bias_act_xla(x, None, act=act, gain=gain, clamp=clamp),
        (x,), (dx,),
    )
    return primal_out, tangent_out


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4))
def _fused_bias(x, b, act, gain, clamp):
    return _forward(x, b, act, gain, clamp)


@_fused_bias.defjvp
def _fused_bias_jvp(act, gain, clamp, primals, tangents):
    x, b = primals
    dx, db = tangents
    primal_out = _fused_bias(x, b, act, gain, clamp)
    _, tangent_out = jax.jvp(
        lambda x, b: bias_act_xla(x, b, act=act, gain=gain, clamp=clamp),
        (x, b), (dx, db),
    )
    return primal_out, tangent_out


def _forward(x, b, act, gain, clamp):
    spec = activation_funcs[act]
    g = spec.def_gain if gain is None else gain
    C = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    if C % LANES != 0 or n % 8 != 0:
        return bias_act_xla(x, b, act=act, gain=gain, clamp=clamp)

    x2 = x.reshape(n, C)
    rows = min(n, 1024)
    while n % rows:
        rows //= 2
    rows = max(rows, 8)
    grid = (n // rows,)
    has_bias = b is not None
    args = [x2] + ([b.reshape(1, C)] if has_bias else [])
    in_specs = [pl.BlockSpec((rows, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_kernel_bias if has_bias else _kernel_nobias,
                          act=act, gain=g, clamp=clamp),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, C), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return out.reshape(x.shape)


