"""Batch-size sweep for the σ-folded 256² sampling headline (bench.py).

The headline bench fixes batch=128; this sweep checks whether that choice
leaves throughput on the table (HBM working-set pressure at large batches
vs amortization at small ones).  Writes benchmarks/results/batch_sweep.json.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache, record


def main():
    enable_compile_cache()
    from ic_gan_tpu.io.deploy import cast_params, fold_spectral_norm
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator

    from __graft_entry__ import _fast_variables

    cfg = BigGANConfig(resolution=256, G_ch=96, G_attn="64", dtype=jnp.bfloat16)
    g = Generator(cfg)
    z1 = jnp.zeros((1, cfg.effective_dim_z))
    f1 = jnp.zeros((1, cfg.instance_sz))
    variables = cast_params(fold_spectral_norm(
        _fast_variables(g, z1, None, f1, train=False)))

    def sample(v, z, f):
        imgs = g.apply(v, z, None, f, train=False)
        # Return (imgs, checksum) exactly like bench.py's headline fn so the
        # compiled work is identical across the sweep and the headline —
        # a checksum-only return lets XLA dead-code-eliminate part of the
        # final toRGB/tanh (measured ~1% flattering skew).
        return imgs, jnp.sum(imgs[:, ::64, ::64, :])

    fwd = jax.jit(sample)
    out = {}
    for batch in (64, 96, 128, 160, 192, 256):
        z = jax.random.normal(jax.random.PRNGKey(0), (batch, cfg.effective_dim_z))
        f = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.instance_sz))
        _, chk = fwd(variables, z, f)
        float(chk)  # force compile + first run
        n_iters = 10
        rate = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(n_iters):
                _, chk = fwd(variables, z + 0.0 * chk, f)
            float(chk)
            rate = max(rate, batch * n_iters / (time.perf_counter() - t0))
        out[f"b{batch}_img_s"] = rate
        print(f"batch {batch:4d}: {rate:8.1f} img/s", flush=True)

    record("batch_sweep", **out)


if __name__ == "__main__":
    main()
