"""Unified BigGAN/IC-GAN training step — one jitted function per design.

Reproduces the reference training dynamics exactly (``train_fns.py:28-193``):

  for D_step in range(num_D_steps):
    for acc in range(num_D_accumulations):
      fresh conditioning -> z; D(fake‖real) -> hinge loss / num_acc -> grad
    Adam(D)
  for acc in range(num_G_accumulations):
    fresh conditioning -> z; G loss / num_acc -> grad
  Adam(G); EMA update (gated on ema_start)

TPU-first structure: the accumulation loops are ``lax.scan``s over microbatch
slabs (compiled once, constant memory), the G/D alternation is statically
unrolled, and everything — both optimizers, EMA, spectral-norm state — lives
inside a single ``jit`` with donated state.  Data parallelism is pjit over a
1-D ``data`` mesh axis: batch arrays are sharded on their microbatch axis,
gradients/BN moments reduce with XLA-inserted psums over ICI, no hand-written
collectives (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ic_gan_tpu.data.augment import diff_augment
from ic_gan_tpu.train import losses as losses_lib
from ic_gan_tpu.train.state import (
    GANTrainState,
    ema_update,
    make_optimizer,
    scrub_grads,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference flag names)."""

    num_D_steps: int = 1
    num_D_accumulations: int = 1
    num_G_accumulations: int = 1
    G_lr: float = 5e-5
    D_lr: float = 2e-4
    G_B1: float = 0.0
    G_B2: float = 0.999
    D_B1: float = 0.0
    D_B2: float = 0.999
    adam_eps: float = 1e-6
    loss: str = "hinge"
    ema: bool = True
    ema_decay: float = 0.9999
    ema_start: int = 20000
    G_ortho: float = 0.0
    D_ortho: float = 0.0
    DiffAugment: str = ""  # e.g. "color,translation,cutout"
    z_var: float = 1.0
    class_cond: bool = False
    instance_cond: bool = True
    # Run D separately on fake and real instead of one concatenated batch
    # (ref BigGAN.py:679-687 via train_fns.py:95).
    split_D: bool = False

    def g_optimizer(self):
        return make_optimizer(self.G_lr, self.G_B1, self.G_B2, self.adam_eps)

    def d_optimizer(self):
        return make_optimizer(self.D_lr, self.D_B1, self.D_B2, self.adam_eps)


def ortho_grad_term(params, strength: float, blacklist_paths=()):
    """Modified orthogonal regularization applied as a gradient term (ref
    ``BigGAN_PyTorch/utils.py:1073-1099``): g += s·2·(WWᵀ∘(1−I))W on the
    (out, fan_in) matricization. Skips rank-<2 params and blacklisted
    module paths (G's class embedding)."""

    def term(path, w):
        if w.ndim < 2 or any(b in "/".join(str(p.key) for p in path)
                             for b in blacklist_paths):
            return jnp.zeros_like(w)
        mat = w.reshape(-1, w.shape[-1]).T  # (out, fan_in)
        wwt = mat @ mat.T
        wwt = wwt - jnp.diag(jnp.diag(wwt))
        g = 2.0 * (wwt @ mat)
        return strength * g.T.reshape(w.shape)

    return jax.tree_util.tree_map_with_path(term, params)


def make_train_step(
    g_apply: Callable,
    d_apply: Callable,
    cfg: TrainConfig,
    dim_z: int,
    debug_grads: bool = False,
):
    """Build the jittable train step.

    ``g_apply(variables, z, label, feats, train, mutable)`` and
    ``d_apply(variables, x, label, feats, train, mutable)`` are the Flax
    ``Module.apply`` of Generator/Discriminator.

    The step consumes a batch dict of slabs (leading axis = microbatch index):
      x            (nD·accD, mb, H, W, 3)   real images in [-1, 1]
      label        (nD·accD, mb)            int32 (present iff class_cond)
      feats        (nD·accD, mb, F)         real-instance features
      gen_label    (nD·accD + accG, mb)     fresh sampled conditioning
      gen_feats    (nD·accD + accG, mb, F)
    z is drawn on device from ``rng`` — one fresh draw per accumulation,
    matching the reference's fresh ``sample_conditionings()`` per microbatch.
    """
    g_tx = cfg.g_optimizer()
    d_tx = cfg.d_optimizer()
    d_loss_fn = losses_lib.D_LOSSES[cfg.loss]
    g_loss_fn = losses_lib.G_LOSSES[cfg.loss]
    nD = cfg.num_D_steps * cfg.num_D_accumulations

    def cond(batch_slab, prefix):
        label = batch_slab.get(f"{prefix}label") if cfg.class_cond else None
        feats = batch_slab.get(f"{prefix}feats") if cfg.instance_cond else None
        return label, feats

    def d_microbatch_loss(d_params, g_params, g_state, d_state, slab, z, aug_rng):
        gl, gf = cond(slab, "gen_")
        dl, df = cond(slab, "")
        x_real = slab["x"]
        # G forward in train mode (BN batch stats + SN updates), but gradients
        # stopped — mirrors torch.set_grad_enabled(False) around G
        # (BigGAN.py:670-672).
        fake, g_mut = g_apply(
            {"params": g_params, **g_state}, z, gl, gf, train=True,
            mutable=["batch_stats", "sn"],
        )
        fake = jax.lax.stop_gradient(fake)
        if cfg.split_D:
            # split_D: two D forwards (fake then real) instead of one concat
            # batch (ref BigGAN.py:679-687).  The real pass sees the SN
            # power-iteration state advanced by the fake pass — same
            # per-forward update order as the reference.  DiffAugment exists
            # only on the concat path upstream (BigGAN.py:698-704).
            d_fake, d_mut = d_apply(
                {"params": d_params, **d_state}, fake, gl, gf, train=True,
                mutable=["sn"],
            )
            d_real, d_mut = d_apply(
                {"params": d_params, **d_state, **d_mut}, x_real, dl, df,
                train=True, mutable=["sn"],
            )
        else:
            d_in = jnp.concatenate([fake, x_real], axis=0)
            d_lab = None if dl is None else jnp.concatenate([gl, dl], axis=0)
            d_fts = None if df is None else jnp.concatenate([gf, df], axis=0)
            if cfg.DiffAugment:
                d_in = diff_augment(aug_rng, d_in, cfg.DiffAugment)
            out, d_mut = d_apply(
                {"params": d_params, **d_state}, d_in, d_lab, d_fts, train=True,
                mutable=["sn"],
            )
            d_fake, d_real = jnp.split(out, [z.shape[0]], axis=0)
        loss_real, loss_fake = d_loss_fn(d_fake, d_real)
        loss = (loss_real + loss_fake) / float(cfg.num_D_accumulations)
        return loss, (g_mut, d_mut, loss_real, loss_fake)

    def g_microbatch_loss(g_params, d_params, g_state, d_state, slab, z, aug_rng):
        gl, gf = cond(slab, "gen_")
        fake, g_mut = g_apply(
            {"params": g_params, **g_state}, z, gl, gf, train=True,
            mutable=["batch_stats", "sn"],
        )
        d_in = fake
        # DiffAugment exists only on the concat path upstream (G_D.forward
        # applies it after the split_D early-return, BigGAN.py:679-704), so
        # split_D disables it in the G phase too — otherwise G would train
        # against augmented fakes D never saw augmented.
        if cfg.DiffAugment and not cfg.split_D:
            d_in = diff_augment(aug_rng, d_in, cfg.DiffAugment)
        out, d_mut = d_apply(
            {"params": d_params, **d_state}, d_in, gl, gf, train=True,
            mutable=["sn"],
        )
        loss = g_loss_fn(out) / float(cfg.num_G_accumulations)
        return loss, (g_mut, d_mut)

    def train_step(state: GANTrainState, batch: dict, rng: jax.Array):
        mb = batch["x"].shape[1]
        metrics = {}
        g_state, d_state = state.g_state, state.d_state
        d_params, g_params = state.d_params, state.g_params
        d_opt_state, g_opt_state = state.d_opt_state, state.g_opt_state

        d_grad_fn = jax.grad(d_microbatch_loss, argnums=0, has_aux=True)

        # ---- D phase: num_D_steps optimizer steps, each accumulating over
        # num_D_accumulations microbatches via scan. ----
        for d_step in range(cfg.num_D_steps):
            lo = d_step * cfg.num_D_accumulations

            def d_scan(carry, inp):
                grads_acc, g_st, d_st = carry
                slab, acc_rng = inp
                z_rng, a_rng = jax.random.split(acc_rng)
                z = jax.random.normal(z_rng, (mb, dim_z)) * jnp.sqrt(cfg.z_var)
                grads, (g_mut, d_mut, lr_, lf_) = d_grad_fn(
                    d_params, g_params, g_st, d_st, slab, z, a_rng
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, g_mut, d_mut), (lr_, lf_)

            slabs = jax.tree.map(
                lambda a: a[lo : lo + cfg.num_D_accumulations], batch
            )
            acc_rngs = jax.random.split(
                jax.random.fold_in(rng, d_step), cfg.num_D_accumulations
            )
            zero_grads = jax.tree.map(jnp.zeros_like, d_params)
            (grads, g_state, d_state), (lr_hist, lf_hist) = jax.lax.scan(
                d_scan, (zero_grads, g_state, d_state), (slabs, acc_rngs)
            )
            if cfg.D_ortho > 0.0:
                grads = jax.tree.map(
                    jnp.add, grads, ortho_grad_term(d_params, cfg.D_ortho)
                )
            grads, d_nonfinite = scrub_grads(grads)
            if debug_grads:
                # Raw (pre-optimizer) grads: Adam normalizes away scale, so
                # sharded-vs-single equivalence must be asserted here.
                metrics["d_grads"] = grads
            updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, updates)
            metrics["D_loss_real"] = jnp.mean(lr_hist)
            metrics["D_loss_fake"] = jnp.mean(lf_hist)
            metrics["D_grad_nonfinite"] = d_nonfinite

        # ---- G phase ----
        def g_scan(carry, inp):
            grads_acc, g_st, d_st = carry
            slab, acc_rng = inp
            z_rng, a_rng = jax.random.split(acc_rng)
            z = jax.random.normal(z_rng, (mb, dim_z)) * jnp.sqrt(cfg.z_var)
            (loss, (g_mut, d_mut)), grads = jax.value_and_grad(
                g_microbatch_loss, argnums=0, has_aux=True
            )(g_params, d_params, g_st, d_st, slab, z, a_rng)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, g_mut, d_mut), loss

        g_slabs = jax.tree.map(
            lambda a: a[nD : nD + cfg.num_G_accumulations],
            {k: v for k, v in batch.items() if k.startswith("gen_")},
        )
        g_rngs = jax.random.split(
            jax.random.fold_in(rng, 1000), cfg.num_G_accumulations
        )
        zero_grads = jax.tree.map(jnp.zeros_like, g_params)
        (g_grads, g_state, d_state), g_loss_hist = jax.lax.scan(
            g_scan, (zero_grads, g_state, d_state), (g_slabs, g_rngs)
        )
        metrics["G_loss"] = jnp.sum(g_loss_hist)
        if cfg.G_ortho > 0.0:
            # Blacklist the class embedding (ref train_fns.py:170-175).
            g_grads = jax.tree.map(
                jnp.add,
                g_grads,
                ortho_grad_term(g_params, cfg.G_ortho, blacklist_paths=("shared",)),
            )
        g_grads, g_nonfinite = scrub_grads(g_grads)
        metrics["G_grad_nonfinite"] = g_nonfinite
        if debug_grads:
            metrics["g_grads"] = g_grads
        updates, g_opt_state = g_tx.update(g_grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)

        # ---- EMA (decay gated on ema_start, ref utils.py:1055-1061) ----
        if cfg.ema:
            decay = jnp.where(state.step >= cfg.ema_start, cfg.ema_decay, 0.0)
            g_ema_params = ema_update(state.g_ema_params, g_params, decay)
            # BN running stats / SN state follow the live network (the
            # reference copies buffers with the same beta).
            g_ema_state = jax.tree.map(
                lambda e, p: e * decay + p * (1.0 - decay)
                if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                state.g_ema_state,
                g_state,
            )
        else:
            g_ema_params = state.g_ema_params
            g_ema_state = state.g_ema_state

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            g_ema_params=g_ema_params,
            g_ema_state=g_ema_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    return train_step
