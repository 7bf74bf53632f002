"""StyleGAN2-ADA training-step throughput on the real chip, 128² and 256².

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sg2_train.py

Reference points (BASELINE.md, ``stylegan2_ada_pytorch/README.md:279-298``):
128² 1×V100 = 12.8–13.7 s/kimg; 256² 1×V100 = 21.6–24.2 s/kimg.  Measures
the unconditional config (h_dim=0, auto-cfg fmaps) with full 'bgc' ADA via
the fast (Pallas row-shift) geometric path, main phase + lazy-reg phases
amortized like the reference's tick loop (R1 every 16 D-steps, PL every 4
G-steps → measure each phase and blend).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()


def timeit_step(step, state, batch, iters=8):
    flops = None
    try:
        flops = (step.lower(state, batch, jax.random.PRNGKey(0))
                 .compile().cost_analysis()["flops"])
    except Exception:
        pass
    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["G_loss"])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        float(m["G_loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, flops


def main():
    from _results import record

    out = {}
    from ic_gan_tpu.data.ada import AugmentPipe
    from ic_gan_tpu.models import stylegan2 as sg2
    from ic_gan_tpu.train.stylegan2_step import (
        SG2TrainConfig,
        SG2TrainState,
        make_sg2_train_step,
    )

    for res, mb in ((128, 32), (256, 16)):
        # channel_base 16384 = the reference's benchmark configs ('auto'/
        # 'paper256' use fmaps=0.5 below 512², train.py:180-198) — the same
        # geometry behind the 12.8-13.7 / 21.6-24.2 s/kimg README numbers.
        cfg = sg2.StyleGAN2Config(
            img_resolution=res, z_dim=512, c_dim=0, h_dim=0, w_dim=512,
            channel_base=16384, channel_max=512,
        )
        tcfg = SG2TrainConfig()
        g, d = sg2.Generator(cfg), sg2.Discriminator(cfg)
        z = jnp.zeros((mb, cfg.z_dim))
        x = jnp.zeros((mb, res, res, 3))
        rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        g_vars = jax.jit(lambda: g.init(rngs, z, None, None))()
        d_vars = jax.jit(lambda: d.init(rngs, x, None, None))()
        state = SG2TrainState.create(g_vars, d_vars, tcfg)
        pipe = AugmentPipe.from_spec("bgc", geom_impl="fast")
        aug = lambda rng, img, p: pipe(rng, img, p)
        rng = np.random.RandomState(0)
        batch = {
            "x": jnp.asarray(rng.randn(mb, res, res, 3), jnp.float32) * 0.3,
        }
        times = {}
        for name, (do_pl, do_r1) in (
            ("main", (False, False)), ("reg", (True, True)),
        ):
            step = jax.jit(make_sg2_train_step(
                g, d, tcfg, cfg.z_dim, do_pl=do_pl, do_r1=do_r1,
                augment_fn=aug,
            ))
            times[name], flops = timeit_step(step, state, batch)
            tfl = (flops or 0) / times[name] / 1e12
            out[f"r{res}_{name}_tflops"] = tfl
            out[f"r{res}_{name}_mfu_pct"] = tfl / 197 * 100
            print(f"  {res}^2 {name} phase: {tfl:.1f} TFLOP/s "
                  f"({tfl/197*100:.0f}% v5e bf16 peak)")
        # Reference lazy-reg cadence: D-reg every 16 steps, G-reg every 4 —
        # approximate the blended cost with the full-reg phase at 1/4 weight.
        blended = 0.75 * times["main"] + 0.25 * times["reg"]
        s_per_kimg = blended / mb * 1000
        print(
            f"sg2 {res}^2 bs{mb} +bgc ADA: main {times['main']*1e3:.1f} ms, "
            f"reg {times['reg']*1e3:.1f} ms -> {s_per_kimg:.1f} s/kimg "
            f"({mb/blended:.1f} img/s)"
        )
        out[f"r{res}_main_ms"] = times["main"] * 1e3
        out[f"r{res}_reg_ms"] = times["reg"] * 1e3
        out[f"r{res}_s_per_kimg"] = s_per_kimg
        out[f"r{res}_img_s"] = mb / blended
    record("sg2_train", **out)


if __name__ == "__main__":
    main()
