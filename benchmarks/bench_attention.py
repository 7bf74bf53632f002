"""Microbench: SA-GAN attention — XLA chain vs fused Pallas kernel.

Shapes are the BigGAN-256 ch96 generator's 64×64 attention stage at the
bench batch (theta (N,4096,48), phi (N,1024,48), g (N,1024,192)); also runs
the 128²-model stage (d=24, dv=96).  Timing follows the relay-backend rules
(CLAUDE.md): chained iterations through a data dependency + one host fetch.
"""

import time

import jax
import jax.numpy as jnp
import os

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()

from ic_gan_tpu.ops.pallas.attention import sagan_attention, _attention_xla


def timeit(fn, *args, iters=20):
    out = fn(*args)
    chk = jnp.sum(out[0, ::37, ::7])
    float(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(args[0] + 0.0 * chk.astype(args[0].dtype), *args[1:])
        chk = jnp.sum(out[0, ::37, ::7])
    float(chk)
    return (time.perf_counter() - t0) / iters


def main():
    from _results import record

    out = {}
    print("default_backend:", jax.default_backend(),
          "device_kind:", jax.devices()[0].device_kind,
          "platform:", jax.devices()[0].platform)
    for (N, Lq, Lk, d, dv) in [(128, 4096, 1024, 48, 192),
                               (64, 4096, 1024, 24, 96)]:
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        theta = jax.random.normal(k[0], (N, Lq, d), jnp.bfloat16)
        phi = jax.random.normal(k[1], (N, Lk, d), jnp.bfloat16)
        g = jax.random.normal(k[2], (N, Lk, dv), jnp.bfloat16)

        xla = jax.jit(_attention_xla)
        pal = jax.jit(lambda t, p, v: sagan_attention(t, p, v))

        a = xla(theta, phi, g)
        b = pal(theta, phi, g)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        t_x = timeit(xla, theta, phi, g)
        t_p = timeit(pal, theta, phi, g)
        flops = 2 * N * Lq * Lk * (d + dv)
        print(f"N={N} Lq={Lq} Lk={Lk} d={d} dv={dv}: "
              f"xla {t_x*1e3:.2f} ms, pallas {t_p*1e3:.2f} ms "
              f"({t_x/t_p:.2f}x), max|Δ|={err:.3e}, "
              f"pallas {flops/t_p/1e12:.1f} TFLOP/s")
        key = f"N{N}_Lq{Lq}_d{d}"
        out[f"{key}_xla_ms"] = t_x * 1e3
        out[f"{key}_pallas_ms"] = t_p * 1e3
        out[f"{key}_speedup"] = t_x / t_p

    # Numerics pin at production geometry on the REAL compiled kernel (the
    # pytest suite runs the Pallas interpreter on CPU — Mosaic's handling of
    # the unaligned minor dims d=24/48, dv=96/192 is only exercised here).
    # f32 inputs so the XLA oracle differs only by reduction order: fwd and
    # grad deltas must sit at f32-epsilon scale, not bf16 scale.  The oracle
    # needs `highest` matmul precision — TPU's default lowers f32 einsums to
    # bf16 MXU passes, and with unit-normal inputs the |logits| ≈ 30 tails
    # turn that into ~1e-2 fwd / ~0.3 grad deltas through the softmax (the
    # Pallas kernel's dot_generals accumulate in f32 regardless).
    jax.config.update("jax_default_matmul_precision", "highest")
    for (Lq, Lk, d, dv) in [(4096, 1024, 48, 192), (4096, 1024, 24, 96)]:
        N = 4
        k = jax.random.split(jax.random.PRNGKey(1), 3)
        theta = jax.random.normal(k[0], (N, Lq, d), jnp.float32)
        phi = jax.random.normal(k[1], (N, Lk, d), jnp.float32)
        g = jax.random.normal(k[2], (N, Lk, dv), jnp.float32)

        def loss_pal(t, p, v):
            return jnp.sum(jnp.sin(sagan_attention(t, p, v)))

        def loss_xla(t, p, v):
            return jnp.sum(jnp.sin(_attention_xla(t, p, v)))

        fwd_err = float(jnp.max(jnp.abs(
            jax.jit(sagan_attention)(theta, phi, g)
            - jax.jit(_attention_xla)(theta, phi, g))))
        g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))(theta, phi, g)
        g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(theta, phi, g)
        grad_err = max(
            float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_pal, g_xla)
        )
        print(f"parity d={d} dv={dv} (f32): fwd max|Δ|={fwd_err:.3e}, "
              f"grad max|Δ|={grad_err:.3e}")
        assert fwd_err < 1e-4, fwd_err
        assert grad_err < 1e-3, grad_err
        out[f"parity_d{d}_fwd_maxerr"] = fwd_err
        out[f"parity_d{d}_grad_maxerr"] = grad_err
    record("attention", **out)


if __name__ == "__main__":
    main()
