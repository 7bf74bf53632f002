"""Pallas TPU kernel: fused SA-GAN attention (softmax(θφᵀ)·g in one pass).

The SA-GAN non-local block (reference ``BigGAN_PyTorch/layers.py:206-244``)
is, at 256² sampling, the generator's single most expensive non-conv op: at
the 64×64 stage the logits tensor is (N, 4096, 1024) — with XLA the
``θφᵀ → softmax → ·g`` chain materializes it to HBM between the two dots and
burns VPU time on a fused-but-HBM-bound exp pass (~30 % of end-to-end
sampling time at batch 128, README "cliffs").

This kernel computes the whole block per (batch, q-tile) grid step entirely
in VMEM: one MXU dot for the (BQ, Lk) logit tile, an exact row max / exp /
row sum on the VPU (Lk always fits — it is HW/4 ≤ 4096 for every BigGAN
geometry), a second MXU dot against ``g``, and one divide — the logits never
touch HBM.  Unlike streaming flash attention there is no online-softmax
rescaling: the full key axis is resident, so the softmax is exact in one
shot.  BigGAN attention is unscaled (no 1/√d) and non-causal.

Autodiff: ``sagan_attention`` carries a ``jax.custom_vjp``.  The backward is
a second Pallas kernel (flash-style: recompute the logit tile in VMEM, form
dp/ds there, accumulate dφ/dg across q-tiles in the revisited output block)
— the (N, Lq, Lk) probability tensor never exists in HBM in either pass.
This matters for *training* throughput: at mb128/128² the XLA backward
materialized multi-GB f32 logits and attention was 44 % of the whole
training step (measured r3; see README).  BigGAN needs first-order grads
only (D/G steps; ortho reg acts on params, not activations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(theta_ref, phi_ref, g_ref, o_ref):
    theta = theta_ref[0]  # (BQ, d)
    phi = phi_ref[0]      # (Lk, d)
    g = g_ref[0]          # (Lk, dv)
    logits = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Lk) f32, MXU accumulates in f32
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(g.dtype), g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, dv)
    o_ref[0] = (o / s).astype(o_ref.dtype)


def _attention_fwd_impl(theta, phi, g, interpret: bool = False):
    N, Lq, d = theta.shape
    Lk, dv = g.shape[1], g.shape[2]
    BQ = min(512, Lq)
    # BigGAN geometries give Lq = HW ∈ {256..4096} and Lk = HW/4 — all
    # multiples of the 128-lane tile and of BQ; keep a hard check rather
    # than silent padding (callers fall back to XLA for odd shapes).
    assert Lq % BQ == 0 and Lk % 128 == 0, (Lq, Lk)
    out = pl.pallas_call(
        _attn_kernel,
        grid=(N, Lq // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda n, q: (n, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, dv), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, dv), lambda n, q: (n, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Lq, dv), g.dtype),
        interpret=interpret,
    )(theta, phi, g)
    return out


def _attn_bwd_kernel(theta_ref, phi_ref, g_ref, do_ref,
                     dtheta_ref, dphi_ref, dg_ref):
    """One (n, q-tile) grid step of the backward.  dφ/dg accumulate across
    q-tiles in their (revisited) output blocks — grid iteration on TPU is
    sequential, so read-modify-write is safe."""
    q = pl.program_id(1)
    theta = theta_ref[0]   # (BQ, d)
    phi = phi_ref[0]       # (Lk, d)
    g = g_ref[0]           # (Lk, dv)
    do = do_ref[0]         # (BQ, dv)

    logits = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Lk) f32
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s  # exact softmax, full key axis resident

    do32 = do.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dp = jax.lax.dot_general(
        do32, g32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Lk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dtheta_ref[0] = jax.lax.dot_general(
        ds, phi.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtheta_ref.dtype)  # (BQ, d)

    dphi_tile = jax.lax.dot_general(
        ds, theta.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lk, d)
    dg_tile = jax.lax.dot_general(
        p, do32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lk, dv)

    @pl.when(q == 0)
    def _init():
        dphi_ref[0] = dphi_tile
        dg_ref[0] = dg_tile

    @pl.when(q != 0)
    def _acc():
        dphi_ref[0] += dphi_tile
        dg_ref[0] += dg_tile


def _attention_bwd_impl(theta, phi, g, do, interpret: bool = False):
    N, Lq, d = theta.shape
    Lk, dv = g.shape[1], g.shape[2]
    BQ = min(512, Lq)
    assert Lq % BQ == 0 and Lk % 128 == 0, (Lq, Lk)
    dtheta, dphi, dg = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(N, Lq // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda n, q: (n, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, d), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, dv), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, dv), lambda n, q: (n, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, d), lambda n, q: (n, q, 0),
                         memory_space=pltpu.VMEM),
            # dφ/dg: same block revisited across q — f32 accumulators.
            pl.BlockSpec((1, Lk, d), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, dv), lambda n, q: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Lq, d), theta.dtype),
            jax.ShapeDtypeStruct((N, Lk, d), jnp.float32),
            jax.ShapeDtypeStruct((N, Lk, dv), jnp.float32),
        ],
        interpret=interpret,
    )(theta, phi, g, do)
    return dtheta, dphi.astype(phi.dtype), dg.astype(g.dtype)


def _attention_xla(theta, phi, g):
    """Reference XLA formulation (f32 softmax) — backward + fallback path."""
    logits = jnp.einsum("nqc,nkc->nqk", theta, phi,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nqk,nkc->nqc", p.astype(g.dtype), g,
                      preferred_element_type=jnp.float32).astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sagan_attention(theta, phi, g, interpret: bool = False):
    """softmax(θ·φᵀ)·g, fused on-chip.  θ (N,Lq,d), φ (N,Lk,d), g (N,Lk,dv).

    Replaces reference ``layers.py:238-241`` (two bmm + softmax).  Unscaled,
    non-causal.  Forward runs the Pallas kernel; first-order VJP provided.
    """
    return _attention_fwd_impl(theta, phi, g, interpret)


def _sagan_fwd(theta, phi, g, interpret):
    return _attention_fwd_impl(theta, phi, g, interpret), (theta, phi, g)


def _sagan_bwd(interpret, res, do):
    theta, phi, g = res
    N, Lq, d = theta.shape
    Lk, dv = g.shape[1], g.shape[2]
    if supported(Lq, Lk, d, dv):
        return _attention_bwd_impl(theta, phi, g, do, interpret)
    # XLA fallback for shapes the kernel doesn't tile (materializes p).
    logits = jnp.einsum("nqc,nkc->nqk", theta, phi,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)  # (N, Lq, Lk) f32
    do32 = do.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dp = jnp.einsum("nqc,nkc->nqk", do32, g32)
    dg = jnp.einsum("nqk,nqc->nkc", p, do32).astype(g.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dtheta = jnp.einsum("nqk,nkc->nqc", ds, phi.astype(jnp.float32))
    dphi = jnp.einsum("nqk,nqc->nkc", ds, theta.astype(jnp.float32))
    return dtheta.astype(theta.dtype), dphi.astype(phi.dtype), dg


sagan_attention.defvjp(_sagan_fwd, _sagan_bwd)


def supported(Lq: int, Lk: int, d: int = 128, dv: int = 128) -> bool:
    """Shapes the kernel handles (all BigGAN attn stages; bench-pinned at
    production widths d=24/48, dv=96/192 on real TPU — see
    ``benchmarks/bench_attention.py``).

    Checks Lq/Lk tile alignment plus a VMEM-footprint bound: Mosaic pads the
    minor dim to the 128-lane tile, so the resident blocks cost
    (BQ+2·Lk)·pad(d,dv) inputs + BQ·Lk f32 logits + BQ·pad(dv) output; keep
    that under ~12 MB of the ~16 MB VMEM."""
    if not (Lq % min(512, Lq) == 0 and Lq % 128 == 0 and Lk % 128 == 0):
        return False
    pad = lambda x: max(128, -(-x // 128) * 128)
    BQ = min(512, Lq)
    # Backward is the larger footprint (the same gate serves both passes):
    # θ/do/dθ tiles + φ/g + f32 dφ/dg accumulators + ~3 live (BQ,Lk) f32
    # intermediates (logits/p/dp).
    vmem = 4 * (
        2 * BQ * pad(d) + 2 * BQ * pad(dv)      # θ, dθ, do, out tiles
        + 2 * Lk * pad(d) + 2 * Lk * pad(dv)    # φ, dφ, g, dg blocks
        + 3 * BQ * Lk                           # f32 logit/p/dp tiles
    )
    return vmem <= 12 * 1024 * 1024
