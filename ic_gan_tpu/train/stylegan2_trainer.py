"""StyleGAN2-ADA trainer: tick-based loop with lazy-regularization phase
scheduling, ADA p-control, snapshots and FID-based early stopping.

Orchestration parity with ``training/training_loop.py:108-730``:

- phase schedule: Gmain every step, +PL every ``G_reg_interval``-th, Dmain
  every step, +R1 every ``D_reg_interval``-th (ref ``:319-345``) — realized
  as four statically-compiled step variants;
- ADA p adjustment every ``ada_interval`` steps from the real-sign EMA
  (ref ``:542-551``);
- tick reports (kimg, sec/kimg, augment p), snapshot + metric eval per tick,
  best-FID tracking and abort conditions (ref ``:563-686``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.ada import AugmentPipe
from ic_gan_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from ic_gan_tpu.models import stylegan2 as sg2
from ic_gan_tpu.train.stylegan2_step import (
    SG2TrainConfig,
    SG2TrainState,
    ada_update,
    make_sg2_train_step,
)
from ic_gan_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class SG2LoopConfig:
    experiment_name: str = "icgan_stylegan2"
    run_dir: str = "training-runs"
    total_kimg: int = 25000
    kimg_per_tick: int = 4
    snapshot_ticks: int = 50
    batch_size: int = 32
    ada_enabled: bool = True
    augment_spec: str = "bgc"
    augment_p_init: float = 0.0
    seed: int = 0
    early_stop_metric_ticks: Optional[int] = None  # FID patience in evals
    # TensorBoard event files next to stats.jsonl (ref
    # training_loop.py:389-396,698-715; native writer, no TF).
    enable_tb: bool = True
    # jax.profiler trace window (ref annotates every SG2 phase:
    # torch_utils/misc.py:136-142 @profiled_function and per-phase CUDA event
    # timing at training_loop.py:346-351).  When set, steps
    # [profile_start, profile_start + profile_steps) are captured to
    # profile_dir, each under a StepTraceAnnotation whose "phase" label says
    # which statically-compiled variant ran (main / pl / r1 / pl+r1).
    profile_dir: Optional[str] = None
    profile_start: int = 12
    profile_steps: int = 3


class SG2Trainer:
    def __init__(
        self,
        model_cfg: sg2.StyleGAN2Config,
        train_cfg: SG2TrainConfig,
        loop_cfg: SG2LoopConfig,
        dataset,
        eval_fn: Optional[Callable] = None,
    ):
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.cfg = loop_cfg
        self.dataset = dataset
        self.eval_fn = eval_fn

        self.g = sg2.Generator(model_cfg)
        self.d = sg2.Discriminator(model_cfg)

        augment_pipe = None
        if loop_cfg.ada_enabled or loop_cfg.augment_p_init > 0:
            augment_pipe = AugmentPipe.from_spec(loop_cfg.augment_spec)
        self.augment_pipe = augment_pipe
        aug_fn = (
            (lambda rng, img, p: augment_pipe(rng, img, p))
            if augment_pipe is not None
            else None
        )

        # Four statically-compiled phase variants (ref phases list :319-345).
        self.steps = {}
        for do_pl in (False, True):
            for do_r1 in (False, True):
                self.steps[(do_pl, do_r1)] = jax.jit(
                    make_sg2_train_step(
                        self.g, self.d, train_cfg, model_cfg.z_dim,
                        do_pl=do_pl, do_r1=do_r1, augment_fn=aug_fn,
                    ),
                    donate_argnums=(0,),
                )

        rngs = {"params": jax.random.PRNGKey(loop_cfg.seed),
                "noise": jax.random.PRNGKey(loop_cfg.seed + 1)}
        N = loop_cfg.batch_size
        z = jnp.zeros((N, model_cfg.z_dim))
        c = jnp.zeros((N, model_cfg.c_dim)) if model_cfg.c_dim else None
        h = jnp.zeros((N, model_cfg.h_dim)) if model_cfg.h_dim else None
        g_vars = self.g.init(rngs, z, c, h)
        x = jnp.zeros((N, model_cfg.img_resolution, model_cfg.img_resolution,
                       model_cfg.img_channels))
        d_vars = self.d.init(rngs, x, c, h)
        self.state = SG2TrainState.create(
            g_vars, d_vars,
            dataclasses.replace(train_cfg, augment_p=loop_cfg.augment_p_init),
        )

        self.run_dir = os.path.join(loop_cfg.run_dir, loop_cfg.experiment_name)
        os.makedirs(self.run_dir, exist_ok=True)
        self.stats_log = MetricsLogger(os.path.join(self.run_dir, "stats.jsonl"))
        self.metric_log = MetricsLogger(
            os.path.join(self.run_dir, "metric-fid.jsonl")
        )
        self.tb = None
        if loop_cfg.enable_tb:
            from ic_gan_tpu.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(os.path.join(self.run_dir, "tb"))
        self.best_fid = float("inf")
        self.evals_no_improvement = 0

    def make_batch(self):
        b = self.dataset.sample_batch(self.cfg.batch_size)
        batch = {"x": jnp.asarray(b.images)}
        # One joint instance draw: the generator's (label, feature) pairs must
        # come from the SAME instance (ref training_loop.py:448-455 samples
        # both from one dataset index), not two decoupled draws.
        gen_label = gen_h = None
        if self.mcfg.h_dim or self.mcfg.c_dim:
            gen_label, gen_h = self.dataset.sample_conditioning_instance_balance(
                self.cfg.batch_size
            )
        if self.mcfg.h_dim:
            batch["h"] = jnp.asarray(b.features)
            batch["gen_h"] = jnp.asarray(gen_h)
        if self.mcfg.c_dim:
            batch["c"] = jnp.asarray(b.labels)
            batch["gen_c"] = jnp.asarray(gen_label)
        return batch

    def run(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        t = self.tcfg
        step = 0
        tick = 0
        tick_start = time.time()
        tick_start_nimg = 0
        total_steps = (
            max_steps
            if max_steps is not None
            else cfg.total_kimg * 1000 // cfg.batch_size
        )
        while step < total_steps:
            if cfg.profile_dir and step == cfg.profile_start:
                jax.profiler.start_trace(cfg.profile_dir)
            batch = self.make_batch()
            do_pl = (step % t.G_reg_interval) == 0 and t.pl_weight != 0
            do_r1 = (step % t.D_reg_interval) == 0 and t.r1_gamma != 0
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), step)
            phase = "+".join(
                ["main"] + (["pl"] if do_pl else []) + (["r1"] if do_r1 else [])
            )
            with jax.profiler.StepTraceAnnotation(
                f"sg2_step/{phase}", step_num=step
            ):
                self.state, metrics = self.steps[(do_pl, do_r1)](
                    self.state, batch, rng
                )
            step += 1
            if (
                cfg.profile_dir
                and step == cfg.profile_start + cfg.profile_steps
            ):
                jax.tree.map(
                    lambda x: x.block_until_ready(), self.state.g_params
                )
                jax.profiler.stop_trace()
            if cfg.ada_enabled and step % t.ada_interval == 0:
                self.state = ada_update(self.state, t, cfg.batch_size)

            cur_nimg = int(self.state.cur_nimg)
            if cur_nimg >= (tick + 1) * cfg.kimg_per_tick * 1000 or step == total_steps:
                dt = time.time() - tick_start
                sec_per_kimg = dt / max((cur_nimg - tick_start_nimg) / 1000, 1e-8)
                rec = {
                    "kimg": cur_nimg / 1000,
                    "sec_per_kimg": sec_per_kimg,
                    "augment_p": float(self.state.ada_p),
                    **{k: float(v) for k, v in metrics.items()},
                }
                self.stats_log.log(rec)
                if self.tb:
                    # Reference tags events by nimg (training_loop.py:707).
                    self.tb.add_scalars(
                        {f"Progress/{k}": v for k, v in rec.items()}, cur_nimg
                    )
                print(
                    f"tick {tick} kimg {rec['kimg']:.1f} "
                    f"{sec_per_kimg:.1f}s/kimg p={rec['augment_p']:.3f} "
                    f"G={rec.get('G_loss', 0):.3f} D={rec.get('D_loss', 0):.3f}"
                )
                tick += 1
                tick_start = time.time()
                tick_start_nimg = cur_nimg

                if tick % cfg.snapshot_ticks == 0 or step == total_steps:
                    save_checkpoint(
                        self.run_dir, "network-snapshot", self.state,
                        config={"kimg": cur_nimg / 1000,
                                "best_fid": self.best_fid},
                    )
                    if self.eval_fn is not None:
                        m = self.eval_fn(self)
                        self.metric_log.log(
                            {"results": m, "snapshot_kimg": cur_nimg / 1000}
                        )
                        if self.tb:
                            self.tb.add_scalars(
                                {f"Metrics/{k}": v for k, v in m.items()},
                                cur_nimg,
                            )
                        fid = m.get("FID", float("inf"))
                        if fid < self.best_fid:
                            self.best_fid = fid
                            self.evals_no_improvement = 0
                            save_checkpoint(
                                self.run_dir, "best-network-snapshot",
                                self.state,
                                config={"best_fid": fid,
                                        "kimg": cur_nimg / 1000},
                            )
                        else:
                            self.evals_no_improvement += 1
                            if (
                                cfg.early_stop_metric_ticks is not None
                                and self.evals_no_improvement
                                >= cfg.early_stop_metric_ticks
                            ):
                                print("Early stopping on FID.")
                                return

    def sample_fn(self, n: int, rng, truncation_psi: float = 1.0):
        """EMA sampling with dataset conditioning (for eval) — jitted once
        per trainer (fixed truncation; fresh variables passed as args so no
        retrace across ticks)."""
        cache = getattr(self, "_eval_run_cache", None)
        if cache is None:
            cache = self._eval_run_cache = {}
        run = cache.get(truncation_psi)
        if run is None:
            # psi gates Python control flow in the mapping network, so it is
            # a static closure constant: one compiled executable per value.
            run = jax.jit(
                lambda variables, z, c, h: self.g.apply(
                    variables, z, c, h, truncation_psi=truncation_psi,
                    noise_mode="const",
                )
            )
            cache[truncation_psi] = run
        variables = {
            "params": self.state.g_ema_params, **self.state.g_ema_state
        }
        z = jax.random.normal(rng, (n, self.mcfg.z_dim))
        c = h = None
        if self.mcfg.h_dim or self.mcfg.c_dim:
            lab, feats = self.dataset.sample_conditioning_instance_balance(n)
            if self.mcfg.h_dim:
                h = jnp.asarray(feats)
            if self.mcfg.c_dim and lab is not None:
                c = jnp.asarray(lab)
        return run(variables, z, c, h), c, h
