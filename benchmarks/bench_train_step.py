"""IC-GAN BigGAN training-step throughput on the real chip.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_train_step.py

Reference point (BASELINE.md): the reference's shipped 8×V100 log
(``BigGAN_ch96_bs256x8.jsonl``) runs 128² ch96 at 0.0896 itr/s × 2048
img/itr ≈ 23 img/s per V100.  Here: one jitted train step (D step + G step,
scan microbatch accumulation, EMA, SN updates inside) at the reference's
128² ch96 geometry, microbatch sized for one v5e chip.

Measured on the chip (2026-08-17, after the Pallas attention backward):
mb128 → 471 img/s at 46% MFU (was 332 img/s / 33% with the XLA attention
backward; mb32 → 275, mb64 → 303 before) — pick the largest microbatch
that fits when accumulating to the reference's 2048 global batch.
"""

import time

import numpy as np

import os

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()

from __graft_entry__ import _fast_variables


def run_geometry(resolution=128, ch=96, mb=128, deep=False):
    from ic_gan_tpu.train.state import GANTrainState
    from ic_gan_tpu.train.step import TrainConfig, make_train_step

    if deep:
        from ic_gan_tpu.models.biggan_deep import (
            BigGANDeepConfig, Discriminator, Generator,
        )

        cfg = BigGANDeepConfig(
            resolution=resolution, G_ch=ch, D_ch=ch, G_attn="64",
            D_attn="64", dtype=jnp.bfloat16,
            class_cond=False, instance_cond=True,  # the IC-GAN deep variant
        )
    else:
        from ic_gan_tpu.models.biggan import (
            BigGANConfig, Discriminator, Generator,
        )

        cfg = BigGANConfig(
            resolution=resolution, G_ch=ch, D_ch=ch, G_attn="64",
            D_attn="64", dtype=jnp.bfloat16,
        )
    tcfg = TrainConfig(num_D_steps=1, num_D_accumulations=1,
                       num_G_accumulations=1, ema_start=0)
    g, d = Generator(cfg), Discriminator(cfg)
    z = jnp.zeros((mb, cfg.effective_dim_z))
    feats = jnp.zeros((mb, cfg.instance_sz))
    x = jnp.zeros((mb, resolution, resolution, 3))
    g_vars = _fast_variables(g, z, None, feats, train=True)
    d_vars = _fast_variables(d, x, None, feats, train=True)
    state = GANTrainState.create(
        g_vars, d_vars, tcfg.g_optimizer(), tcfg.d_optimizer()
    )
    step = jax.jit(make_train_step(g.apply, d.apply, tcfg,
                                   cfg.effective_dim_z), donate_argnums=0)

    rng = np.random.RandomState(0)
    batch = {
        "x": jnp.asarray(rng.randn(1, mb, resolution, resolution, 3), jnp.float32),
        "feats": jnp.asarray(rng.randn(1, mb, cfg.instance_sz), jnp.float32),
        "gen_feats": jnp.asarray(rng.randn(2, mb, cfg.instance_sz), jnp.float32),
    }
    flops_total = None
    try:
        flops_total = (step.lower(state, batch, jax.random.PRNGKey(0))
                       .compile().cost_analysis()["flops"])
    except Exception:
        pass
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    float(metrics["G_loss"])

    iters = 10
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
        float(metrics["G_loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    # img/s counts dataset (D-real) images per second, the reference's metric.
    mfu = ""
    if flops_total:
        tflops = flops_total / best / 1e12
        mfu = f", {tflops:.1f} TFLOP/s = {tflops/197*100:.0f}% of v5e bf16 peak"
    print(f"biggan {resolution}^2 ch{ch} train: {mb/best:8.1f} img/s "
          f"({best*1e3:.1f} ms/step @ microbatch {mb}{mfu})")
    tflops = (flops_total or 0) / best / 1e12
    return {
        "microbatch": mb,
        "img_s": mb / best,
        "ms_per_step": best * 1e3,
        "tflops": tflops,
        "mfu_pct": tflops / 197 * 100,
    }


def main():
    from _results import record

    out = {"ch": 96}
    # 128² = the reference's shipped-log geometry (23 img/s per V100) —
    # microbatch sweep (mb256 backs the README plateau claim: +2.5% over
    # mb128, i.e. the step is shape-limited, not batch-starved);
    # 256² = the flagship IC-GAN config (icgan_biggan_imagenet_res256).
    for resolution, mbs in ((128, (128, 256)), (256, (32,))):
        for mb in mbs:
            r = run_geometry(resolution=resolution, mb=mb)
            prefix = (f"r{resolution}_" if mb == mbs[0]
                      else f"r{resolution}_mb{mb}_")
            for k, v in r.items():
                out[f"{prefix}{k}"] = v
    # BigGAN-deep (the reference's deep variant, ~2× blocks per stage;
    # bottleneck 1×1s are thinner than the base model's 3×3s, so sweep the
    # microbatch — the deep step needs more batch to fill the MXU).
    for mb in (64, 128, 256):
        r = run_geometry(resolution=128, mb=mb, deep=True)
        prefix = "deep128_" if mb == 64 else f"deep128_mb{mb}_"
        for k, v in r.items():
            out[f"{prefix}{k}"] = v
    record("train_step", **out)


if __name__ == "__main__":
    main()
