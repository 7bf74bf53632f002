"""Training-step time attribution on the real chip: full step vs SN power
iteration disabled vs BN batch-moments disabled (running stats) vs both.

The deltas attribute the MFU gap (VERDICT r2: training 27-33% vs eval 50.7%)
between the two suspects named by the roofline analysis: dozens of
sequential tiny SN matvecs, and per-layer BN moment reductions.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_train_attribution.py
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


def build_step(mb, resolution=128, ch=96):
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
    from ic_gan_tpu.train.state import GANTrainState
    from ic_gan_tpu.train.step import TrainConfig, make_train_step

    cfg = BigGANConfig(
        resolution=resolution, G_ch=ch, D_ch=ch, G_attn="64", D_attn="64",
        dtype=jnp.bfloat16,
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
    return step, state, batch


def timeit(step, state, batch, iters=8):
    flops = None
    try:
        flops = (step.lower(state, batch, jax.random.PRNGKey(0))
                 .compile().cost_analysis()["flops"])
    except Exception:
        pass
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    float(metrics["G_loss"])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
        float(metrics["G_loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, flops


def patch_sn_off():
    """Power iteration replaced by identity normalization (w_bar = w)."""
    from ic_gan_tpu.ops import spectral_norm as sn_mod

    orig = sn_mod.spectral_normalize

    def no_sn(w, u, update=True, num_itrs=1, eps=1e-6, transpose=False):
        svs = jnp.ones((u.shape[0],), jnp.float32)
        return w, u, svs

    sn_mod.spectral_normalize = no_sn
    # layers.py imported the symbol directly — patch there too.
    from ic_gan_tpu.models import layers as layers_mod
    layers_mod.spectral_normalize = no_sn
    return lambda: (setattr(sn_mod, "spectral_normalize", orig),
                    setattr(layers_mod, "spectral_normalize", orig))


def patch_bn_eval():
    """BN normalizes with stored stats even in train mode (no batch moments)."""
    from ic_gan_tpu.models import layers as layers_mod

    orig = layers_mod.CrossReplicaBatchNorm.__call__

    def eval_bn(self, x, train=False, standing=False):
        return orig(self, x, train=False, standing=False)

    layers_mod.CrossReplicaBatchNorm.__call__ = eval_bn
    return lambda: setattr(layers_mod.CrossReplicaBatchNorm, "__call__", orig)


def bench_phases(mb, resolution=128, ch=96, out=None):
    """Raw per-phase ceilings (the SG2-attribution methodology): G forward,
    D fwd+bwd on hinge, G fwd+bwd through D — each timed and rooflined
    standalone so the step-level MFU gap can be pinned to a phase."""
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
    from ic_gan_tpu.train import losses as losses_lib

    out = {} if out is None else out
    cfg = BigGANConfig(
        resolution=resolution, G_ch=ch, D_ch=ch, G_attn="64", D_attn="64",
        dtype=jnp.bfloat16,
    )
    g, d = Generator(cfg), Discriminator(cfg)
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(mb, cfg.effective_dim_z), jnp.float32)
    feats = jnp.asarray(rng.randn(mb, cfg.instance_sz), jnp.float32)
    x = jnp.asarray(rng.randn(mb, resolution, resolution, 3), jnp.float32)
    g_vars = _fast_variables(g, z, None, feats, train=True)
    d_vars = _fast_variables(d, x, None, feats, train=True)
    mut = ["sn", "batch_stats"]

    def g_fwd(gv, z, feats):
        fake, _ = g.apply(gv, z, None, feats, train=True, mutable=mut)
        return jnp.sum(fake[:, ::64, ::64, :])

    def d_fwdbwd(dp, gv_rest, x, fake, feats):
        def loss(p):
            dv = {"params": p, **gv_rest}
            real_out, _ = d.apply(dv, x, None, feats, train=True, mutable=mut)
            fake_out, _ = d.apply(dv, fake, None, feats, train=True, mutable=mut)
            lr, lf = losses_lib.D_LOSSES["hinge"](fake_out, real_out)
            return lr + lf
        grads = jax.grad(loss)(dp)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(grads)[:2])

    def g_fwdbwd(gp, g_rest, d_all, z, feats):
        def loss(p):
            fake, _ = g.apply({"params": p, **g_rest}, z, None, feats,
                              train=True, mutable=mut)
            fake_out, _ = d.apply(d_all, fake, None, feats, train=True,
                                  mutable=mut)
            return losses_lib.G_LOSSES["hinge"](fake_out)
        grads = jax.grad(loss)(gp)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(grads)[:2])

    d_rest = {k: v for k, v in d_vars.items() if k != "params"}
    g_rest = {k: v for k, v in g_vars.items() if k != "params"}
    fake = jnp.asarray(rng.randn(mb, resolution, resolution, 3), jnp.bfloat16)

    import functools

    def _t(fn, *args, label=""):
        jitted = jax.jit(fn)
        flops = None
        try:
            flops = jitted.lower(*args).compile().cost_analysis()["flops"]
        except Exception:
            pass
        o = jitted(*args)
        float(jnp.asarray(o, jnp.float32))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(6):
                o = jitted(*args)
            float(jnp.asarray(o, jnp.float32))
            best = min(best, (time.perf_counter() - t0) / 6)
        tfl = (flops or 0) / best / 1e12
        out[f"{label}_ms"] = best * 1e3
        if flops:
            out[f"{label}_tflops"] = tfl
        print(f"{label:>10}: {best*1e3:7.2f} ms"
              + (f"  {tfl:6.1f} TFLOP/s ({tfl/197*100:.0f}% v5e)" if flops else ""))
        return best

    _t(g_fwd, g_vars, z, feats, label="g_fwd")
    _t(functools.partial(d_fwdbwd), d_vars["params"], d_rest, x, fake, feats,
       label="d_fwdbwd")
    _t(functools.partial(g_fwdbwd), g_vars["params"], g_rest, d_vars, z, feats,
       label="g_fwdbwd")
    return out


def main(mb=128):
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    results = {}
    for name, patches in [
        ("full", []),
        ("no_sn", [patch_sn_off]),
        ("no_bn_moments", [patch_bn_eval]),
        ("no_sn_no_bn", [patch_sn_off, patch_bn_eval]),
    ]:
        undos = [p() for p in patches]
        try:
            step, state, batch = build_step(mb)
            t, flops = timeit(step, state, batch)
        finally:
            for u in undos:
                u()
        tfl = (flops or 0) / t / 1e12
        results[name] = t
        print(f"{name:>14}: {t*1e3:7.1f} ms/step  {mb/t:7.1f} img/s"
              + (f"  {tfl:.1f} TFLOP/s ({tfl/197*100:.0f}% v5e peak)"
                 if flops else ""))
    phases = bench_phases(mb)
    from _results import record

    record("train_attribution", microbatch=mb, **phases,
           **{f"{k}_ms": v * 1e3 for k, v in results.items()})
    f = results["full"]
    print(f"SN cost: {(f-results['no_sn'])*1e3:.1f} ms "
          f"({(f-results['no_sn'])/f*100:.0f}%)  "
          f"BN-moment cost: {(f-results['no_bn_moments'])*1e3:.1f} ms "
          f"({(f-results['no_bn_moments'])/f*100:.0f}%)  "
          f"combined: {(f-results['no_sn_no_bn'])*1e3:.1f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
