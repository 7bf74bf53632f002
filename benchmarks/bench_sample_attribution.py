"""Per-block accounting of the 256² ch96 deployment sampler (batch 128).

bench.py's headline (1135 img/s) is 77% of bf16 peak measured in
*effective* FLOPs — the reference graph's cost at our wall clock.  The
polyphase up-convs execute ~2× fewer real FLOPs, so the *executed* MXU
rate is lower and some stages may still have real headroom.  This bench
times every block of the sampling graph standalone (eval mode, ``sn``
collection stripped — the deployment configuration) and reports per-block
ms + executed TFLOP/s (XLA cost model), so the residual wall clock can be
attributed: which stages are MXU-bound near their op ceiling vs
bandwidth-bound, and whether Σ blocks ≈ the fused sampler batch time.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_sample_attribution.py

Measured conclusions (results/sample_attribution.json, 2026-08-19): the
fused sampler batch (113.8 ms) runs FASTER than Σ standalone blocks
(119.1 ms); the 16-64² stages sit at the 129-133 TFLOP/s conv ceiling;
the final 256² stage executes at 75.7 TFLOP/s because its polyphase
up-conv is four thin convs (Cout 96 < the 128 MXU lanes, measured 83
TFLOP/s bare).  Two exact-math alternatives were measured and REJECTED:
(1) fusing the four phase kernels into one lane-aligned 192→384 conv on a
1-padded input — 21.9 ms vs 15.4, the four overlapping (H+1, W+1) window
slices cost more HBM traffic than the alignment saves; (2) embedding the
2×2 phase kernels in a 3×3 SAME conv (no slicing) — burns the 2.25×
polyphase FLOP saving.  The headline is at its per-geometry op ceiling.
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

BATCH = 128
RES = 256
CH = 96


def _strip_sn(variables):
    return {k: v for k, v in variables.items() if k != "sn"}


def _bench_fwd(mod, args, kwargs, iters=8):
    variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *args,
                                         **kwargs))()
    variables = _strip_sn(variables)

    def fn(x, *rest):
        out = mod.apply(variables, x, *rest, **kwargs)
        return jnp.sum(out.astype(jnp.float32))

    x, rest = args[0], args[1:]

    def many(x, *rest):
        def body(c, _):
            out = fn(x * (1.0 + c.astype(x.dtype)), *rest)
            return out.astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    compiled = jax.jit(many).lower(x, *rest).compile()
    # Cost analysis counts the scan body once => already per-iteration flops.
    flops = compiled.cost_analysis()["flops"]
    float(np.asarray(compiled(x, *rest)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(x, *rest)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, flops


def main():
    from ic_gan_tpu.models.biggan import BigGANConfig, g_arch
    from ic_gan_tpu.models.layers import GBlock, SelfAttention

    cfg = BigGANConfig(resolution=RES, G_ch=CH, G_attn="64",
                       dtype=jnp.bfloat16)
    y_dim = cfg.shared_dim_feat + cfg.z_chunk_size  # instance-conditioned
    arch = g_arch(RES, CH)
    rng = np.random.RandomState(0)

    total_ms = 0.0
    rows = []
    for i, (cin, cout, res) in enumerate(
        zip(arch["in_channels"], arch["out_channels"], arch["resolution"])
    ):
        in_res = res // 2 if arch["upsample"][i] else res
        mod = GBlock(in_features=cin, out_features=cout,
                     upsample=arch["upsample"][i], dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(BATCH, in_res, in_res, cin), jnp.bfloat16)
        y = jnp.asarray(rng.randn(BATCH, y_dim), jnp.float32)
        t, fl = _bench_fwd(mod, (x, y), {"train": False})
        rows.append((f"G.block{i} {in_res}->{res} {cin}->{cout}", t, fl))
        total_ms += t * 1e3
        if arch["attention"][i]:
            amod = SelfAttention(cout, dtype=jnp.bfloat16)
            xa = jnp.asarray(rng.randn(BATCH, res, res, cout), jnp.bfloat16)
            t, fl = _bench_fwd(amod, (xa,), {"update_sn": False})
            rows.append((f"G.attn{res} {cout}ch", t, fl))
            total_ms += t * 1e3

    out = {"batch": BATCH, "resolution": RES, "ch": CH}
    for label, t, fl in rows:
        print(f"{label:32s} {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s "
              f"({fl/1e9:8.1f} GFLOP)")
        key = label.split()[0].replace(".", "_")
        out[f"{key}_ms"] = t * 1e3
        out[f"{key}_tflops"] = fl / t / 1e12

    # Fused sampler reference point, per 128-batch (bench.py's configuration).
    sample_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "batch_sweep.json")
    out["blocks_ms"] = total_ms
    print(f"\nΣ standalone blocks: {total_ms:.1f} ms per {BATCH}-batch "
          f"({BATCH/total_ms*1e3:.0f} img/s equivalent)")
    if os.path.exists(sample_path):
        import json

        with open(sample_path) as f:
            sw = json.load(f)
        k = "b128_img_s"
        if k in sw:
            fused_ms = BATCH / sw[k] * 1e3
            out["fused_ms"] = fused_ms
            print(f"fused sampler (batch_sweep {k}): {fused_ms:.1f} ms "
                  f"(tail = linear/toRGB/tanh + scheduling delta "
                  f"{fused_ms - total_ms:+.1f} ms)")
    record("sample_attribution", **out)


if __name__ == "__main__":
    main()
