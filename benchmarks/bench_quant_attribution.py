"""Per-block accounting of the int8 sampler vs the bf16 sampler (256² ch96).

The int8 conv probe (results/conv_ceiling.json) sustains 1.56-1.67× the
bf16 rate at the sampler's hot geometries, yet the end-to-end int8 sampler
(results/quant_sample.json) runs 1.29× — this bench attributes the decay.
Each G block (and the attention block) is timed standalone in BOTH serving
modes at its sampling geometry: the per-block speedup says which stages
realize the op-level win and which sink it (candidates: the unquantized
attention math, dequant→CBN→act elementwise chains between convs, the
thin-channel 256² output stage).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_quant_attribution.py
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


def _bench_variables(mod, variables, args, kwargs, iters=8):
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
    float(np.asarray(compiled(x, *rest)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(x, *rest)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from ic_gan_tpu.io.deploy import fold_spectral_norm
    from ic_gan_tpu.io.quant import quantize_variables
    from ic_gan_tpu.models.biggan import BigGANConfig, g_arch
    from ic_gan_tpu.models.layers import GBlock, SelfAttention

    cfg = BigGANConfig(resolution=RES, G_ch=CH, G_attn="64",
                       dtype=jnp.bfloat16)
    y_dim = cfg.shared_dim_feat + cfg.z_chunk_size
    arch = g_arch(RES, CH)
    rng = np.random.RandomState(0)

    out = {"batch": BATCH, "resolution": RES, "ch": CH}
    rows = []
    tot_bf = tot_q = 0.0

    def run_block(label, mod, args, kwargs):
        nonlocal tot_bf, tot_q
        t0 = time.time()
        variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), *args,
                                             **kwargs))()
        folded = fold_spectral_norm(variables)
        qv = quantize_variables(mod, variables, *args, **kwargs)
        t_bf = _bench_variables(mod, folded, args, kwargs)
        t_q = _bench_variables(mod, qv, args, kwargs)
        rows.append((label, t_bf, t_q))
        tot_bf += t_bf * 1e3
        tot_q += t_q * 1e3
        print(f"{label:32s} bf16 {t_bf*1e3:7.2f} ms  int8 {t_q*1e3:7.2f} ms "
              f"= {t_bf/t_q:4.2f}x   [{time.time()-t0:.0f}s incl. compiles]",
              flush=True)

    for i, (cin, cout, res) in enumerate(
        zip(arch["in_channels"], arch["out_channels"], arch["resolution"])
    ):
        in_res = res // 2 if arch["upsample"][i] else res
        mod = GBlock(in_features=cin, out_features=cout,
                     upsample=arch["upsample"][i], dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(BATCH, in_res, in_res, cin), jnp.bfloat16)
        y = jnp.asarray(rng.randn(BATCH, y_dim), jnp.float32)
        run_block(f"G.block{i} {in_res}->{res} {cin}->{cout}",
                  mod, (x, y), {"train": False})
        if arch["attention"][i]:
            amod = SelfAttention(cout, dtype=jnp.bfloat16)
            xa = jnp.asarray(rng.randn(BATCH, res, res, cout), jnp.bfloat16)
            run_block(f"G.attn{res} {cout}ch", amod, (xa,),
                      {"update_sn": False})

    for label, t_bf, t_q in rows:
        sp = t_bf / t_q
        key = label.split()[0].replace(".", "_")
        out[f"{key}_bf16_ms"] = t_bf * 1e3
        out[f"{key}_int8_ms"] = t_q * 1e3
        out[f"{key}_speedup"] = sp

    out["blocks_bf16_ms"] = tot_bf
    out["blocks_int8_ms"] = tot_q
    out["blocks_speedup"] = tot_bf / tot_q
    print(f"\nΣ blocks: bf16 {tot_bf:.1f} ms, int8 {tot_q:.1f} ms "
          f"= {tot_bf/tot_q:.2f}x", flush=True)
    record("quant_attribution", **out)


if __name__ == "__main__":
    main()
