"""In-tree benchmark: ADA geometric warp engines on the real TPU chip.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ada_warp.py

Measures, at the real ADA working shape (batch 32, 128² images → 432² padded
2×-upsampled warp canvas):
  - grid-sample bilinear (exact per-pixel gather — the reference's
    grid_sampler_2d semantics);
  - Catmull-Smith two-pass warp with XLA shifts (vmapped dynamic_slice);
  - the same warp with the Pallas row-shift kernel (ops/pallas/row_shift);
and the end-to-end 'bgc' AugmentPipe fast vs exact.

Timing: K iterations chained inside one jit (data dependency), single host
sync — the relay backend adds ~25 ms per host round trip otherwise.

Measured 2026-08-18 (v5e 1 chip, post planar-layout + rectangular-shift
rewrite; canonical numbers live in benchmarks/results/ada_warp.json):
    warp  XLA shifts   274.2 ms   |  PALLAS shifts   5.0 ms   (54x)
    bgc pipe EXACT     161.6 ms   |  bgc pipe FAST   4.6 ms   (35x)
    parity XLA vs Pallas shift engines: fwd/grad max|Δ| = 0.0 (bit-exact)
    SG2 128² step      195.4 ms no-aug  |  192.5 ms with bgc  (0.99x)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import os

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()


def bench(f, arg, k=10, iters=3):
    @jax.jit
    def rep(a):
        def body(i, a):
            out = f(a, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return a * (1.0 + 0.0 * jnp.sum(out))

        return jax.lax.fori_loop(0, k, body, a)

    o = rep(arg)
    float(jnp.sum(o))
    t0 = time.time()
    for _ in range(iters):
        o = rep(o)
    float(jnp.sum(o))
    return (time.time() - t0) / (iters * k) * 1000


def main():
    from ic_gan_tpu.data import fast_warp as fw
    from ic_gan_tpu.data.ada import AugmentPipe

    N, R, L = 32, 128, 432
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randn(N, L, L, 3).astype(np.float32))
    small = jnp.asarray(rng.randn(N, R, R, 3).astype(np.float32))
    theta = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    s = np.exp(rng.randn(N).astype(np.float32) * 0.2)
    A = jnp.asarray(
        np.stack(
            [np.stack([np.cos(theta) * s, -np.sin(theta)], -1),
             np.stack([np.sin(theta), np.cos(theta) * s], -1)], 1
        ).astype(np.float32)
    )
    t = jnp.asarray(rng.randn(N, 2).astype(np.float32) * 5)

    from _results import record

    # Parity pin on the COMPILED kernel (pytest runs the Pallas interpreter
    # on CPU; Mosaic's pltpu.roll barrel shifter is only exercised here).
    # Both engines run the identical Catmull-Smith math — only the row-shift
    # primitive differs — so hardware deltas must sit at f32 epsilon.
    w_x, w_p = (jax.jit(lambda a: fw.affine_warp(a, A, t, use_pallas=up))(big)
                for up in (False, True))
    fwd_err = float(jnp.max(jnp.abs(w_x - w_p)))
    gx, gp = (jax.jit(jax.grad(lambda a: jnp.sum(
        jnp.sin(fw.affine_warp(a, A, t, use_pallas=up)))))(big)
        for up in (False, True))
    grad_err = float(jnp.max(jnp.abs(gx - gp)))
    print(f"parity XLA vs Pallas shifts: fwd max|Δ|={fwd_err:.3e}, "
          f"grad max|Δ|={grad_err:.3e}")
    assert fwd_err < 1e-4, fwd_err
    assert grad_err < 1e-4, grad_err

    ms_x = bench(lambda a, _: fw.affine_warp(a, A, t, use_pallas=False), big)
    ms_p = bench(lambda a, _: fw.affine_warp(a, A, t, use_pallas=True), big)
    print(f"affine_warp 432² XLA shifts:    {ms_x:7.1f} ms")
    print(f"affine_warp 432² PALLAS shifts: {ms_p:7.1f} ms   ({ms_x / ms_p:.1f}x)")

    pf = AugmentPipe.from_spec("bgc", geom_impl="fast")
    pe = AugmentPipe.from_spec("bgc", geom_impl="exact")
    ms_pf = bench(lambda a, kk: pf(kk, a, 0.5), small)
    ms_pe = bench(lambda a, kk: pe(kk, a, 0.5), small, k=3, iters=2)
    print(f"bgc pipe 128²  EXACT (gather):  {ms_pe:7.1f} ms")
    print(f"bgc pipe 128²  FAST (pallas):   {ms_pf:7.1f} ms   ({ms_pe / ms_pf:.1f}x)")
    record("ada_warp",
           affine_warp_432_xla_ms=ms_x, affine_warp_432_pallas_ms=ms_p,
           affine_warp_speedup=ms_x / ms_p,
           bgc128_exact_ms=ms_pe, bgc128_fast_ms=ms_pf,
           bgc128_speedup=ms_pe / ms_pf,
           parity_fwd_maxerr=fwd_err, parity_grad_maxerr=grad_err)


if __name__ == "__main__":
    main()
