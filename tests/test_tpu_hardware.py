"""Hardware numerics pins: compiled Mosaic kernels on the real TPU chip.

The regular pytest suite runs the Pallas kernels through the CPU
interpreter only — a Mosaic lowering regression (alignment, roll semantics,
accumulator dtype) would slip through CI and surface as a silent numerics
drift in a perf run.  This module promotes the exact asserts from
``benchmarks/bench_attention.py`` / ``bench_ada_warp.py`` into tests so a
kernel regression fails a test run on the chip:

    ICGAN_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_tpu_hardware.py -m tpu -q

Without ``ICGAN_TPU_TESTS=1`` (conftest forces the CPU backend) or on a
box without the chip the tests skip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() in ("cpu",):
        pytest.skip("real TPU backend required (run with ICGAN_TPU_TESTS=1)")
    # The oracles need `highest` matmul precision — TPU's default lowers f32
    # einsums to bf16 MXU passes (see bench_attention.py:74-77); the Pallas
    # kernels accumulate in f32 regardless.
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old or "default")


# --- fused SA-GAN attention (ops/pallas/attention.py) -----------------------
# Production widths: the 256² ch96 generator's 64×64 stage (d=48, dv=192)
# and the 128² model's (d=24, dv=96) — both minor dims unaligned to the
# 128-lane MXU tile, the exact geometry Mosaic has to pad/handle.


@pytest.mark.parametrize("d,dv", [(48, 192), (24, 96)])
def test_attention_compiled_parity(d, dv):
    from ic_gan_tpu.ops.pallas.attention import _attention_xla, sagan_attention

    N, Lq, Lk = 4, 4096, 1024
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    theta = jax.random.normal(k[0], (N, Lq, d), jnp.float32)
    phi = jax.random.normal(k[1], (N, Lk, d), jnp.float32)
    g = jax.random.normal(k[2], (N, Lk, dv), jnp.float32)

    fwd_err = float(jnp.max(jnp.abs(
        jax.jit(sagan_attention)(theta, phi, g)
        - jax.jit(_attention_xla)(theta, phi, g))))

    def loss(fn):
        return lambda t, p, v: jnp.sum(jnp.sin(fn(t, p, v)))

    g_pal = jax.jit(jax.grad(loss(sagan_attention), argnums=(0, 1, 2)))(
        theta, phi, g)
    g_xla = jax.jit(jax.grad(loss(_attention_xla), argnums=(0, 1, 2)))(
        theta, phi, g)
    grad_err = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_pal, g_xla))

    # f32 inputs: deltas vs the XLA oracle must sit at f32-epsilon scale
    # (reduction-order only), not bf16 scale.
    assert fwd_err < 1e-4, fwd_err
    assert grad_err < 1e-3, grad_err


# --- Pallas row-shift warp engine (ops/pallas/row_shift.py) -----------------
# The ADA working shape: batch 32 × 128² images → 432² padded 2×-upsampled
# warp canvas.  Both engines run identical Catmull-Smith math — only the
# row-shift primitive differs — so hardware deltas must sit at f32 epsilon.


def test_ada_warp_compiled_parity():
    from ic_gan_tpu.data import fast_warp as fw

    N, L = 32, 432
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randn(N, L, L, 3).astype(np.float32))
    theta = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    s = np.exp(rng.randn(N).astype(np.float32) * 0.2)
    A = jnp.asarray(
        np.stack(
            [np.stack([np.cos(theta) * s, -np.sin(theta)], -1),
             np.stack([np.sin(theta), np.cos(theta) * s], -1)], 1
        ).astype(np.float32))
    t = jnp.asarray(rng.randn(N, 2).astype(np.float32) * 5)

    w_x, w_p = (jax.jit(
        lambda a, up=up: fw.affine_warp(a, A, t, use_pallas=up))(big)
        for up in (False, True))
    fwd_err = float(jnp.max(jnp.abs(w_x - w_p)))
    gx, gp = (jax.jit(jax.grad(lambda a, up=up: jnp.sum(
        jnp.sin(fw.affine_warp(a, A, t, use_pallas=up)))))(big)
        for up in (False, True))
    grad_err = float(jnp.max(jnp.abs(gx - gp)))

    assert fwd_err < 1e-4, fwd_err
    assert grad_err < 1e-4, grad_err


# --- fused bias_act (ops/pallas/bias_act.py) --------------------------------


def test_bias_act_compiled_parity():
    from ic_gan_tpu.ops.bias_act import bias_act
    from ic_gan_tpu.ops.pallas.bias_act import bias_act_fused

    k = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(k[0], (8, 64, 64, 128), jnp.float32) * 4
    b = jax.random.normal(k[1], (128,), jnp.float32)

    for act, gain, clamp in [("lrelu", np.sqrt(2.0), 256.0),
                             ("linear", 1.0, None)]:
        ref = jax.jit(lambda x, b: bias_act(
            x, b, act=act, gain=gain, clamp=clamp))(x, b)
        fused = jax.jit(lambda x, b: bias_act_fused(
            x, b, act=act, gain=gain, clamp=clamp))(x, b)
        err = float(jnp.max(jnp.abs(ref - fused)))
        assert err < 1e-5, (act, err)

        gr = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(bias_act(
            x, b, act=act, gain=gain, clamp=clamp)))))(x)
        gf = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(bias_act_fused(
            x, b, act=act, gain=gain, clamp=clamp)))))(x)
        gerr = float(jnp.max(jnp.abs(gr - gf)))
        assert gerr < 1e-5, (act, gerr)
