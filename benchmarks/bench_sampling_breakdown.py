"""Where does 256² sampling time go?  Attention share, batch scaling.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sampling_breakdown.py
"""

import time

import jax
import jax.numpy as jnp
import os

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache

enable_compile_cache()


def measure(cfg, batch, iters=12):
    from ic_gan_tpu.models.biggan import Generator
    from ic_gan_tpu.io.deploy import cast_params, fold_spectral_norm
    from __graft_entry__ import _fast_variables

    g = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, cfg.effective_dim_z))
    f = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.instance_sz))
    variables = _fast_variables(g, z[:1], None, f[:1], train=False)
    variables = cast_params(fold_spectral_norm(variables))

    @jax.jit
    def fwd(v, z, f):
        imgs = g.apply(v, z, None, f, train=False)
        return jnp.sum(imgs[:, ::64, ::64, :])

    chk = fwd(variables, z, f)
    float(chk)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            chk = fwd(variables, z + 0.0 * chk, f)
        float(chk)
        best = min(best, (time.perf_counter() - t0) / iters)
    return batch / best, best


def main():
    from _results import record

    from ic_gan_tpu.models.biggan import BigGANConfig

    out = {}
    base = dict(resolution=256, G_ch=96, dtype=jnp.bfloat16)
    for name, cfg, batch in [
        ("attn@64  b128", BigGANConfig(G_attn="64", **base), 128),
        ("no-attn  b128", BigGANConfig(G_attn="0", **base), 128),
        ("attn@64  b256", BigGANConfig(G_attn="64", **base), 256),
        ("attn@64  b512", BigGANConfig(G_attn="64", **base), 512),
    ]:
        try:
            rate, dt = measure(cfg, batch)
        except Exception as e:  # b512 exceeds HBM at 256² — report, continue
            print(f"{name}: failed ({type(e).__name__}: {str(e)[:120]}...)")
            continue
        print(f"{name}: {rate:8.1f} img/s  ({dt*1e3:.1f} ms/batch)")
        out[name.replace("  ", "_").replace(" ", "") + "_img_s"] = rate
    record("sampling_breakdown", **out)


if __name__ == "__main__":
    main()
