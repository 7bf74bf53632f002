"""StyleGAN2 256² IC-GAN deployment-sampling throughput on one chip.

The serving story covers both backbones (``io/deploy.make_sampler`` +
``export_sampler``); bench.py's headline measures BigGAN — this records the
SG2 counterpart at the reference IC-GAN COCO geometry (cfg 'paper256':
fmaps 0.5 → channel_base 16384, ``train.py:180-198``; mapping h_dim 2048
instance conditioning).  noise_mode='const' (the deployment export mode).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sg2_sample.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _results import enable_compile_cache, record

enable_compile_cache()


def main():
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.models import stylegan2 as sg2

    cfg = sg2.StyleGAN2Config(
        img_resolution=256, z_dim=512, c_dim=0, h_dim=2048, w_dim=512,
        channel_base=16384, channel_max=512,
    )
    g = sg2.Generator(cfg)
    z0 = jnp.zeros((1, cfg.z_dim))
    h0 = jnp.zeros((1, cfg.h_dim))
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: g.init(rngs, z0, None, h0))()

    out = {"resolution": 256, "channel_base": cfg.channel_base,
           "h_dim": cfg.h_dim}
    rng = np.random.RandomState(0)
    for batch in (32, 64, 128):
        sampler = make_sampler(g, variables, batch_size=batch,
                               noise_mode="const")
        z = rng.randn(batch, cfg.z_dim).astype(np.float32)
        h = rng.randn(batch, cfg.h_dim).astype(np.float32)
        imgs = sampler(z, None, h, device_output=True)
        assert imgs.shape == (batch, 256, 256, 3), imgs.shape
        float(jnp.sum(imgs.astype(jnp.float32)))  # warm + sync
        iters = 8
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                imgs = sampler(z * (1.0 + 1e-6 * i), None, h,
                               device_output=True)
            # Scalar checksum fetch serializes the queue without pulling the
            # 100 MB image tensor through the relay (CLAUDE.md).
            float(jnp.sum(imgs.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        out[f"b{batch}_img_s"] = batch / best
        out[f"b{batch}_ms"] = best * 1e3
        print(f"sg2 256² sampling b{batch}: {batch/best:7.1f} img/s "
              f"({best*1e3:.1f} ms/batch)", flush=True)

    record("sg2_sample", **out)


if __name__ == "__main__":
    main()
