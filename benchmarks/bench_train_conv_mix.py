"""Per-block accounting of the BigGAN 128² ch96 train step (mb128).

The step-level number (benchmarks/results/train_step.json: ~90 TFLOP/s by
XLA's own cost model, ~46% of the 197 TFLOP/s bf16 peak) sits well below
the 122-132 TFLOP/s a bare forward 3×3 conv sustains at the hot geometries
(conv_ceiling.json) — but a train step is not made of bare forward convs.
This bench measures the achievable step time as the sum of STANDALONE
times of the step's real compute units:

  1. instantiate every block the step executes — the actual flax modules
     (``models.layers.GBlock/DBlock/SelfAttention``), so the fused
     polyphase up-convs (2.25× fewer FLOPs than conv-at-output-res),
     strided down-convs, low-res shortcut convs, BN, SN scaling and
     activations are all included exactly as compiled in the step.  (A
     first cut of this bench enumerated naive 3×3 convs from the channel
     tables instead and over-counted the conv workload by ~1.75× — the
     model's op fusions are exactly why.)
  2. run each block standalone in the directions the step uses it:
     D phase = G fwd @mb (stop-gradient) + D fwd+full-bwd @2mb (concat);
     G phase = G fwd+full-bwd @mb + D fwd+input-grad @mb (D weight grads
     are dead in the G phase and XLA DCEs them);
  3. achievable step time = Σ standalone block times; compare with the
     measured fused-step time (train_step.json).  The residual covers the
     optimizer/EMA/ortho-reg/embedding/linear tail plus whatever XLA's
     whole-graph scheduling wins or loses vs running blocks back-to-back.

FLOP bookkeeping uses XLA's cost model (cost_analysis), the same
convention as train_step.json's MFU — not a hand formula.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_train_conv_mix.py
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_train_conv_mix.py --deep

``--deep`` runs the same accounting for the BigGAN-deep 128² ch96 step
(train_step.json ``deep128_mb128_*``: 447 img/s, 24% MFU) — the deep
variant's bottleneck blocks spend most FLOPs in 1×1 convs and ch/4-thin
3×3s, so the question the probe answers is whether 24% is a step
inefficiency or the per-op rate those geometries sustain standalone.
"""

import json
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

MB = 128
RES = 128
CH = 96
Y_DIM = 148  # shared_dim 128 + hier-z chunk 20 (BigGANConfig defaults)
# Deep conditioning vector: shared_dim_feat 512 + dim_z 128 concatenated once
# (biggan_deep.py:205-209, matching bench_train_step's instance-cond config).
Y_DIM_DEEP = 640


def _bench_unit(mod, x, extra, direction, apply_kw, mutable, iters=8):
    """Time one block standalone.  Returns (sec/iter, xla_flops/iter).

    The scan chains iterations through a data dependency on x (CLAUDE.md:
    block_until_ready is unreliable on the relay backend); the chain costs
    one elementwise pass over x per iteration, negligible vs a block.
    """
    variables = jax.jit(lambda: mod.init(
        jax.random.PRNGKey(0), x, *extra, **apply_kw))()
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, xx, *ex):
        out = mod.apply({"params": p, **rest}, xx, *ex, **apply_kw,
                        mutable=mutable)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32))

    if direction == "fwd":
        def fn(xx, *ex):
            return loss(params, xx, *ex)
    elif direction == "fwd_dgrad":
        g = jax.grad(loss, argnums=1)

        def fn(xx, *ex):
            return jnp.sum(g(params, xx, *ex).astype(jnp.float32))
    else:  # fwd_full
        g = jax.grad(loss, argnums=(0, 1))

        def fn(xx, *ex):
            dp, dx = g(params, xx, *ex)
            tot = jnp.sum(dx.astype(jnp.float32))
            for leaf in jax.tree.leaves(dp):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return tot

    def many(xx, *ex):
        def body(c, _):
            out = fn(xx * (1.0 + c.astype(xx.dtype)), *ex)
            return out.astype(jnp.float32) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    compiled = jax.jit(many).lower(x, *extra).compile()
    # XLA's cost analysis counts a scan body ONCE, not ×trip-count (verified:
    # a length-8 scan of a matmul reports 1.004× the single matmul's flops),
    # so the scan's reported flops already ARE per-iteration flops.
    flops = compiled.cost_analysis()["flops"]
    float(np.asarray(compiled(x, *extra)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(x, *extra)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, flops


def build_units():
    """(label, module, (res, cin), needs_y, [(phase_class, direction, n)])."""
    from ic_gan_tpu.models.biggan import d_arch, g_arch
    from ic_gan_tpu.models.layers import DBlock, GBlock, SelfAttention

    g = g_arch(RES, CH)
    d = d_arch(RES, CH)
    units = []
    g_dirs = [("g_fwd", "fwd", MB), ("g_fwdbwd", "fwd_full", MB)]
    d_dirs = [("d_fwdbwd", "fwd_full", 2 * MB), ("d_dgrad", "fwd_dgrad", MB)]
    for i, (cin, cout, res) in enumerate(
        zip(g["in_channels"], g["out_channels"], g["resolution"])
    ):
        mod = GBlock(in_features=cin, out_features=cout,
                     upsample=g["upsample"][i], dtype=jnp.bfloat16)
        in_res = res // 2 if g["upsample"][i] else res
        units.append((f"G.block{i}", mod, (in_res, cin), True, g_dirs))
        if g["attention"][i]:
            units.append((f"G.attn{res}",
                          SelfAttention(cout, dtype=jnp.bfloat16),
                          (res, cout), False, g_dirs))
    in_res = RES
    for i, (cin, cout) in enumerate(zip(d["in_channels"], d["out_channels"])):
        mod = DBlock(in_features=cin, out_features=cout, wide=True,
                     preactivation=i > 0, downsample=d["downsample"][i],
                     dtype=jnp.bfloat16)
        units.append((f"D.block{i}", mod, (in_res, cin), False, d_dirs))
        out_res = in_res // 2 if d["downsample"][i] else in_res
        if d["attention"][i]:
            units.append((f"D.attn{out_res}",
                          SelfAttention(cout, dtype=jnp.bfloat16),
                          (out_res, cout), False, d_dirs))
        in_res = out_res
    return units


def build_units_deep():
    """BigGAN-deep unit list: G_depth/D_depth=2 bottleneck blocks per stage
    (biggan_deep.py:222-248, 272-294), stem/linears left to the residual."""
    from ic_gan_tpu.models.biggan import g_arch
    from ic_gan_tpu.models.biggan_deep import (
        DeepDBlock, DeepGBlock, deep_d_arch,
    )
    from ic_gan_tpu.models.layers import SelfAttention

    g = g_arch(RES, CH)
    d = deep_d_arch(RES, CH)
    units = []
    g_dirs = [("g_fwd", "fwd", MB), ("g_fwdbwd", "fwd_full", MB)]
    d_dirs = [("d_fwdbwd", "fwd_full", 2 * MB), ("d_dgrad", "fwd_dgrad", MB)]
    for i, (cin, cout, res) in enumerate(
        zip(g["in_channels"], g["out_channels"], g["resolution"])
    ):
        in_res = res // 2 if g["upsample"][i] else res
        for gi in range(2):  # G_depth = 2
            mod = DeepGBlock(
                in_features=cin,
                out_features=cin if gi == 0 else cout,
                upsample=g["upsample"][i] and gi == 1,
                dtype=jnp.bfloat16,
            )
            units.append((f"G.block{i}.{gi}", mod, (in_res, cin), True, g_dirs))
        if g["attention"][i]:
            units.append((f"G.attn{res}",
                          SelfAttention(cout, dtype=jnp.bfloat16),
                          (res, cout), False, g_dirs))
    in_res = RES
    for i, (cin, cout) in enumerate(zip(d["in_channels"], d["out_channels"])):
        down = d["downsample"][i]
        out_res = in_res // 2 if down else in_res
        for di in range(2):  # D_depth = 2
            mod = DeepDBlock(
                in_features=cin if di == 0 else cout,
                out_features=cout,
                downsample=down and di == 0,
                dtype=jnp.bfloat16,
            )
            res_i = in_res if di == 0 else out_res
            units.append((f"D.block{i}.{di}", mod,
                          (res_i, cin if di == 0 else cout), False, d_dirs))
        if d["attention"][i]:
            units.append((f"D.attn{out_res}",
                          SelfAttention(cout, dtype=jnp.bfloat16),
                          (out_res, cout), False, d_dirs))
        in_res = out_res
    return units


def main(deep: bool = False):
    units = build_units_deep() if deep else build_units()
    y_dim = Y_DIM_DEEP if deep else Y_DIM
    by_class = {}
    total_ms, total_fl = 0.0, 0.0
    for label, mod, (res, cin), needs_y, dirs in units:
        for phase_class, direction, n in dirs:
            x = jnp.asarray(
                np.random.RandomState(0).randn(n, res, res, cin), jnp.bfloat16)
            extra = ((jnp.asarray(
                np.random.RandomState(1).randn(n, y_dim), jnp.float32),)
                if needs_y else ())
            apply_kw = ({"train": True} if needs_y else {"update_sn": True})
            mutable = ["batch_stats", "sn"] if needs_y else ["sn"]
            t, fl = _bench_unit(mod, x, extra, direction, apply_kw, mutable)
            print(f"{label:10s} {direction:>9} @n{n:3d} ({res:3d}² {cin:4d}ch): "
                  f"{t*1e3:7.2f} ms, {fl/t/1e12:6.1f} TFLOP/s", flush=True)
            c = by_class.setdefault(phase_class, [0.0, 0.0])
            c[0] += t
            c[1] += fl
            total_ms += t * 1e3
            total_fl += fl

    step_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results", "train_step.json")
    key = "deep128_mb128" if deep else "r128"
    step_ms = step_fl = None
    if os.path.exists(step_path):
        with open(step_path) as f:
            sj = json.load(f)
        step_ms = sj.get(f"{key}_ms_per_step")
        step_fl = (sj.get(f"{key}_tflops", 0) * step_ms / 1e3
                   if step_ms else None)

    print(f"\nachievable step (Σ standalone blocks): {total_ms:.1f} ms, "
          f"{total_fl/1e12:.2f} TFLOP "
          f"({total_fl/total_ms/1e9:.1f} TFLOP/s aggregate)")
    out = {
        "microbatch": MB, "resolution": RES, "ch": CH,
        "achievable_ms": total_ms,
        "achievable_flops_t": total_fl / 1e12,
        "achievable_tflops": total_fl / total_ms / 1e9,
    }
    for cls, (t, fl) in sorted(by_class.items()):
        print(f"  {cls:>9}: {t*1e3:6.1f} ms, {fl/1e12:6.2f} TFLOP "
              f"({fl/t/1e12:.1f} TFLOP/s)")
        out[f"{cls}_ms"] = t * 1e3
        out[f"{cls}_flops_t"] = fl / 1e12
    if step_ms:
        print(f"measured fused step: {step_ms:.1f} ms "
              f"(block residual {step_ms - total_ms:+.1f} ms = "
              f"{(step_ms - total_ms)/step_ms*100:.1f}% of the step: "
              f"optimizer/EMA/ortho/linears + scheduling delta)")
        out["step_ms"] = step_ms
        out["residual_ms"] = step_ms - total_ms
        out["step_vs_achievable"] = total_ms / step_ms
        if step_fl:
            out["step_flops_t"] = step_fl
    record("train_conv_mix_deep" if deep else "train_conv_mix", **out)


if __name__ == "__main__":
    main(deep="--deep" in sys.argv)
