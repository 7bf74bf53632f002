"""int8 serving mode vs the bf16 deployment sampler (256² ch96, batch 128).

Measures the quantized sampler (``io/quant.quantize_variables`` — int8
convs with int32 MXU accumulation; raw int8 conv rate probed at 1.56-1.67×
bf16 in ``conv_ceiling`` geometries) against the σ-folded bf16 headline
path, plus the numeric cost: mean relative image drift and the FID between
the two modes' Inception pools on an identical z/feats stream (the same
convention ``bench_eval_fid.py`` uses for the bf16-vs-f32 Inception
trunk).  Weights are random (zero egress) — drift numbers pin the
machinery; perceptual quality on trained checkpoints must be validated by
the deployer.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_quant_sample.py
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

from __graft_entry__ import _fast_variables

BATCH = 128


def _time_sampler(sampler, z, f, iters=8):
    imgs = sampler(z, None, f, device_output=True)
    float(jnp.sum(imgs.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            imgs = sampler(z * (1.0 + 1e-6 * i), None, f, device_output=True)
        float(jnp.sum(imgs.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_deep():
    """BigGAN-deep int8 serving row (same convention, 256² ch96 deep:
    bottleneck 1×1s + channel-drop shortcuts through the quantized path —
    serving coverage for PARITY #17)."""
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.io.quant import quantize_variables
    from ic_gan_tpu.models.biggan_deep import BigGANDeepConfig, Generator

    cfg = BigGANDeepConfig(resolution=256, G_ch=96, G_attn="64",
                           class_cond=False, instance_cond=True,
                           dtype=jnp.bfloat16)
    g = Generator(cfg)
    z0 = jnp.zeros((1, cfg.effective_dim_z))
    f0 = jnp.zeros((1, cfg.instance_sz))
    variables = _fast_variables(g, z0, None, f0, train=False)
    # _fast_variables fills BN running vars with ~0.02 → rsqrt ≈ 7×
    # amplification per BN.  The base model's chain tolerates that in bf16;
    # the deep model's ~50-block chain overflows to inf (r5: "drift nan").
    # Neutral stats keep the chain finite, and damping each bottleneck's
    # output 1×1 keeps the residual stream inside tanh's responsive range so
    # the drift number measures the convs, not saturation.  Values only —
    # the timed graph is unchanged.
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        lambda p, a: (jnp.zeros_like(a)
                      if "mean" in jax.tree_util.keystr(p)
                      else jnp.ones_like(a)),
        variables["batch_stats"],
    )
    variables["params"] = jax.tree_util.tree_map_with_path(
        lambda p, a: (a * 0.05 if "conv4" in jax.tree_util.keystr(p) else a),
        variables["params"],
    )

    rng = np.random.RandomState(0)
    z = rng.randn(BATCH, cfg.effective_dim_z).astype(np.float32)
    f = rng.randn(BATCH, cfg.instance_sz).astype(np.float32)
    qv = quantize_variables(g, variables, jnp.asarray(z), None,
                            jnp.asarray(f), train=False)
    s_bf = make_sampler(g, variables, batch_size=BATCH, dtype=jnp.bfloat16)
    s_q = make_sampler(g, qv, batch_size=BATCH, dtype=jnp.bfloat16)
    t_bf = _time_sampler(s_bf, z, f)
    t_q = _time_sampler(s_q, z, f)
    a = np.asarray(s_bf(z, None, f)).astype(np.float64)
    b = np.asarray(s_q(z, None, f)).astype(np.float64)
    out = {
        "batch": BATCH, "resolution": 256, "model": "biggan_deep",
        "bf16_img_s": BATCH / t_bf, "bf16_ms": t_bf * 1e3,
        "int8_img_s": BATCH / t_q, "int8_ms": t_q * 1e3,
        "speedup": t_bf / t_q,
        "img_drift_rel": float(np.abs(a - b).mean() / np.abs(a).mean()),
    }
    print(f"deep bf16 sampler: {BATCH/t_bf:7.1f} img/s ({t_bf*1e3:.1f} ms)")
    print(f"deep int8 sampler: {BATCH/t_q:7.1f} img/s ({t_q*1e3:.1f} ms) "
          f"= {t_bf/t_q:.2f}x, drift {out['img_drift_rel']:.3e}", flush=True)
    record("quant_sample_deep", **out)


def main():
    from ic_gan_tpu.eval.fid import frechet_distance
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.io.quant import quantize_variables
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator

    cfg = BigGANConfig(resolution=256, G_ch=96, G_attn="64",
                       dtype=jnp.bfloat16)
    g = Generator(cfg)
    z0 = jnp.zeros((1, cfg.effective_dim_z))
    f0 = jnp.zeros((1, cfg.instance_sz))
    variables = _fast_variables(g, z0, None, f0, train=False)

    rng = np.random.RandomState(0)
    z = rng.randn(BATCH, cfg.effective_dim_z).astype(np.float32)
    f = rng.randn(BATCH, cfg.instance_sz).astype(np.float32)

    qv = quantize_variables(g, variables, jnp.asarray(z), None,
                            jnp.asarray(f), train=False)
    s_bf = make_sampler(g, variables, batch_size=BATCH, dtype=jnp.bfloat16)
    s_q = make_sampler(g, qv, batch_size=BATCH, dtype=jnp.bfloat16)

    t_bf = _time_sampler(s_bf, z, f)
    t_q = _time_sampler(s_q, z, f)
    out = {
        "batch": BATCH, "resolution": 256,
        "bf16_img_s": BATCH / t_bf, "bf16_ms": t_bf * 1e3,
        "int8_img_s": BATCH / t_q, "int8_ms": t_q * 1e3,
        "speedup": t_bf / t_q,
    }
    print(f"bf16 sampler: {BATCH/t_bf:7.1f} img/s ({t_bf*1e3:.1f} ms)")
    print(f"int8 sampler: {BATCH/t_q:7.1f} img/s ({t_q*1e3:.1f} ms) "
          f"= {t_bf/t_q:.2f}x", flush=True)

    # --- numeric cost on an identical stream ------------------------------
    a = np.asarray(s_bf(z, None, f)).astype(np.float64)
    b = np.asarray(s_q(z, None, f)).astype(np.float64)
    out["img_drift_rel"] = float(np.abs(a - b).mean() / np.abs(a).mean())

    ev = InceptionEvaluator(deploy_bf16=True)
    n_fid = 2560
    pools = {"bf16": [], "int8": []}
    for i in range(0, n_fid, BATCH):
        zi = np.random.RandomState(100 + i).randn(
            BATCH, cfg.effective_dim_z).astype(np.float32)
        fi = np.random.RandomState(200 + i).randn(
            BATCH, cfg.instance_sz).astype(np.float32)
        for tag, s in (("bf16", s_bf), ("int8", s_q)):
            im = s(zi, None, fi, device_output=True)
            pools[tag].append(np.asarray(ev(im, device_output=True)[0]))
    pa = np.concatenate(pools["bf16"]).astype(np.float64)
    pb = np.concatenate(pools["int8"]).astype(np.float64)
    out["fid_between_modes"] = frechet_distance(
        pa.mean(0), np.cov(pa, rowvar=False),
        pb.mean(0), np.cov(pb, rowvar=False))
    print(f"image drift {out['img_drift_rel']:.3e}; "
          f"FID(int8 pool, bf16 pool) over {n_fid} imgs = "
          f"{out['fid_between_modes']:.4f}")
    record("quant_sample", **out)


if __name__ == "__main__":
    if "--deep" in sys.argv:
        bench_deep()
    else:
        main()
