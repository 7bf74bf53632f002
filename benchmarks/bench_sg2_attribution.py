"""Where the SG2 256² training step spends its time (per-component ablation).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sg2_attribution.py

The per-phase MFU bench (``bench_sg2_train.py``) shows 128² at 56-59 % MFU
but 256² at only 36-37 %.  This bench attributes the gap: it times the main
training-step phase with and without the ADA pipe, plus each constituent
(G forward, G forward+backward, D forward, D forward+backward, the ADA pipe
alone, a raw 3×3 conv at the 256-resolution block geometry) so the sink is
measured rather than guessed.  Results → ``benchmarks/results/sg2_attribution.json``.
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


def timeit(fn, *args, iters=8):
    """Median-of-best wall time of a jitted fn; serialize via host fetch."""
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def flops_of(fn, *args):
    try:
        return fn.lower(*args).compile().cost_analysis()["flops"]
    except Exception:
        return None


def main():
    from _results import record
    from ic_gan_tpu.data.ada import AugmentPipe
    from ic_gan_tpu.models import stylegan2 as sg2
    from ic_gan_tpu.train.stylegan2_step import (
        SG2TrainConfig, SG2TrainState, make_sg2_train_step,
    )

    res, mb = 256, 16
    out = {"resolution": res, "microbatch": mb}

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
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(mb, res, res, 3), jnp.float32) * 0.3
    batch = {"x": imgs}
    key = jax.random.PRNGKey(0)

    # ---- full main step, with and without ADA ----
    pipe = AugmentPipe.from_spec("bgc", geom_impl="fast")
    for name, aug in (("ada", lambda r, i, p: pipe(r, i, p)), ("noada", None)):
        step = jax.jit(make_sg2_train_step(
            g, d, tcfg, cfg.z_dim, do_pl=False, do_r1=False, augment_fn=aug,
        ))
        t = timeit(lambda s: step(s, batch, key)[1]["G_loss"], state)
        fl = flops_of(step, state, batch, key)
        out[f"step_{name}_ms"] = t * 1e3
        if fl:
            out[f"step_{name}_tflops"] = fl / t / 1e12
        print(f"main step [{name}]: {t*1e3:.1f} ms"
              + (f"  ({fl/t/1e12:.1f} TFLOP/s)" if fl else ""))

    # ---- constituents ----
    zr = jnp.asarray(rng.randn(mb, cfg.z_dim), jnp.float32)

    def g_fwd(params):
        return g.apply({"params": params, **{k: v for k, v in g_vars.items()
                                             if k != "params"}},
                       zr, None, None, rngs={"noise": jax.random.PRNGKey(2)})

    def g_loss(params):
        return jnp.sum(jnp.square(g_fwd(params)))

    def d_fwd(params, im):
        return d.apply({"params": params}, im)

    def d_loss(params, im):
        return jnp.sum(jax.nn.softplus(d_fwd(params, im)))

    probes = {
        "g_fwd": (jax.jit(g_fwd), (state.g_params,)),
        "g_fwdbwd": (jax.jit(jax.grad(g_loss)), (state.g_params,)),
        "d_fwd": (jax.jit(d_fwd), (state.d_params, imgs)),
        "d_fwdbwd": (jax.jit(jax.grad(d_loss)), (state.d_params, imgs)),
        "ada_fwd": (jax.jit(lambda r, i: pipe(r, i, 0.5)), (key, imgs)),
        "ada_fwdbwd": (
            jax.jit(jax.grad(
                lambda i, r: jnp.sum(jnp.square(pipe(r, i, 0.5))))),
            (imgs, key),
        ),
    }
    for name, (fn, args) in probes.items():
        t = timeit(fn, *args)
        fl = flops_of(fn, *args)
        out[f"{name}_ms"] = t * 1e3
        if fl:
            out[f"{name}_tflops"] = fl / t / 1e12
        print(f"{name}: {t*1e3:.2f} ms"
              + (f"  ({fl/t/1e12:.1f} TFLOP/s)" if fl else ""))

    # ---- raw-conv ceilings at the two hottest block geometries ----
    for cname, (h, ci, co) in (
        ("conv256_64_64", (256, 64, 64)),      # b256 conv1 (lane-starved: O=64)
        ("conv128_128_128", (128, 128, 128)),  # b128 conv1 (full lanes)
    ):
        xc = jnp.asarray(rng.randn(mb, h, h, ci), jnp.bfloat16)
        wc = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
        conv = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        t = timeit(conv, xc, wc, iters=20)
        tf = 2 * 9 * ci * co * h * h * mb / t / 1e12
        out[f"{cname}_tflops"] = tf
        print(f"raw 3x3 {cname}: {t*1e3:.2f} ms = {tf:.1f} TFLOP/s "
              f"({tf/197*100:.0f}% peak)")

    record("sg2_attribution", **out)


if __name__ == "__main__":
    main()
