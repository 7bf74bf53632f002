"""StyleGAN2-ADA training step (non-saturating loss, lazy R1 / path-length
regularization, ADA p-controller, EMA with ramp-up).

Reference semantics: ``training/loss.py:31-194`` (phase-dispatched
``accumulate_gradients``), ``training/training_loop.py:319-345`` (lazy-reg
optimizer scaling), ``:489-535`` (EMA ramp-up), ``:542-551`` (ADA heuristic).

TPU-first structure: the reference runs four phases as separate backward
passes with DDP sync juggling; here each phase is a pure ``jax.grad`` inside
one jitted step — regularizer phases are enabled statically (``do_pl`` /
``do_r1``), so the driver holds up to four compiled variants and picks by
``step % interval``, exactly like the reference's phase scheduler.  Grad-of-
grad (R1 / PL) needs no custom-op machinery — JAX differentiates the whole
synthesis stack (incl. upfirdn2d) to second order natively.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ic_gan_tpu.train.state import scrub_grads


@dataclasses.dataclass(frozen=True)
class SG2TrainConfig:
    """Reference flag surface (``train.py:220-365``)."""

    glr: float = 0.002
    dlr: float = 0.002
    beta2: float = 0.99
    adam_eps: float = 1e-8
    r1_gamma: float = 10.0
    style_mixing_prob: float = 0.9
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    pl_weight: float = 2.0
    G_reg_interval: int = 4
    D_reg_interval: int = 16
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = 0.05
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0
    augment_p: float = 0.0  # initial p; adjusted when ada is on
    freeze_d_layers: int = 0  # Freeze-D: first N discriminator layers
                              # (highest resolution first; ref 'freezed')

    def _lazy(self, lr: float, interval: int):
        """Lazy-regularization lr/beta scaling (ref training_loop.py:332-340)."""
        mb_ratio = interval / (interval + 1)
        return lr * mb_ratio, 0.0, self.beta2 ** mb_ratio

    def g_optimizer(self):
        lr, b1, b2 = self._lazy(self.glr, self.G_reg_interval)
        return optax.adam(lr, b1=b1, b2=b2, eps=self.adam_eps)

    def d_optimizer(self):
        lr, b1, b2 = self._lazy(self.dlr, self.D_reg_interval)
        return optax.adam(lr, b1=b1, b2=b2, eps=self.adam_eps)


@struct.dataclass
class SG2TrainState:
    step: jax.Array
    cur_nimg: jax.Array
    g_params: Any
    d_params: Any
    g_state: Any           # batch_stats (w_avg) + noise consts
    d_state: Any
    g_ema_params: Any
    g_ema_state: Any
    g_opt_state: Any
    d_opt_state: Any
    pl_mean: jax.Array     # scalar, path-length running mean
    ada_p: jax.Array       # scalar, ADA augmentation probability
    ada_sign_sum: jax.Array
    ada_count: jax.Array

    @classmethod
    def create(cls, g_vars, d_vars, cfg: SG2TrainConfig):
        g_params = g_vars["params"]
        d_params = d_vars["params"]
        g_state = {k: v for k, v in g_vars.items() if k != "params"}
        d_state = {k: v for k, v in d_vars.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            cur_nimg=jnp.zeros((), jnp.int64)
            if jax.config.jax_enable_x64
            else jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            # Distinct buffers (donation-safe), see GANTrainState.create.
            g_ema_params=jax.tree.map(jnp.copy, g_params),
            g_ema_state=jax.tree.map(jnp.copy, g_state),
            g_opt_state=cfg.g_optimizer().init(g_params),
            d_opt_state=cfg.d_optimizer().init(d_params),
            pl_mean=jnp.zeros(()),
            ada_p=jnp.asarray(cfg.augment_p, jnp.float32),
            ada_sign_sum=jnp.zeros(()),
            ada_count=jnp.zeros(()),
        )


def freeze_d_mask(d_params, freeze_layers: int):
    """Freeze-D gradient mask (True = trainable).

    Layer ordering mirrors the reference's ``trainable_gen``
    (``networks.py:819-830``): per resolution block, highest first —
    fromrgb, conv0, conv1, skip — with the first ``freeze_layers`` frozen.
    The 4×4 epilogue is always trainable (the reference never freezes it).
    """
    res_names = sorted(
        (k for k in d_params if k.startswith("b") and k[1:].isdigit()
         and k != "b4"),
        key=lambda s: -int(s[1:]),
    )
    frozen = set()
    idx = 0
    for rn in res_names:
        for layer in ("fromrgb", "conv0", "conv1", "skip"):
            if layer in d_params[rn]:
                if idx < freeze_layers:
                    frozen.add((rn, layer))
                idx += 1

    def mask_tree(node, path=()):
        if isinstance(node, dict):
            return {k: mask_tree(v, path + (k,)) for k, v in node.items()}
        return path[:2] not in frozen

    return mask_tree(d_params)


def make_sg2_train_step(
    generator,
    discriminator,
    cfg: SG2TrainConfig,
    z_dim: int,
    do_pl: bool,
    do_r1: bool,
    augment_fn: Optional[Callable] = None,
    batch_gpu: Optional[int] = None,
    debug_grads: bool = False,
):
    """Build one jitted training step.

    ``generator`` / ``discriminator`` are the Flax modules from
    ``models.stylegan2``.  ``augment_fn(rng, imgs, p) -> imgs`` is the ADA
    pipe (None = no augmentation).  The batch dict carries ``x`` (N,H,W,3)
    reals, optional ``c``/``gen_c`` one-hot labels and ``h``/``gen_h``
    instance features.
    """
    g_tx = cfg.g_optimizer()
    d_tx = cfg.d_optimizer()

    def map_ws(g_params, g_state, z, c, h, rng, update_w_avg):
        variables = {"params": g_params, **g_state}
        if update_w_avg:
            ws, mut = generator.apply(
                variables, z, c, h, train=True, method=generator.map_ws,
                mutable=["batch_stats"], rngs={"noise": rng},
            )
            new_state = {**g_state, "batch_stats": mut["batch_stats"]}
            return ws, new_state
        ws = generator.apply(
            variables, z, c, h, method=generator.map_ws, rngs={"noise": rng}
        )
        return ws, g_state

    def synthesize(g_params, g_state, ws, rng):
        return generator.apply(
            {"params": g_params, **g_state}, ws,
            method=generator.synthesize, rngs={"noise": rng},
        )

    def run_G(g_params, g_state, z, c, h, rng, update_w_avg=False):
        """Mapping + style mixing + synthesis (ref loss.py:58-76)."""
        r_map, r_mix, r_cut, r_z2, r_noise = jax.random.split(rng, 5)
        ws, g_state = map_ws(g_params, g_state, z, c, h, r_map, update_w_avg)
        if cfg.style_mixing_prob > 0:
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(r_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(r_mix) < cfg.style_mixing_prob, cutoff, num_ws
            )
            z2 = jax.random.normal(r_z2, z.shape)
            ws2, _ = map_ws(g_params, g_state, z2, c, h, r_map, False)
            idx = jnp.arange(num_ws)[None, :, None]
            ws = jnp.where(idx < cutoff, ws, ws2)
        img = synthesize(g_params, g_state, ws, r_noise)
        return img, ws, g_state

    def run_D(d_params, d_state, img, c, h, rng, ada_p):
        if augment_fn is not None:
            img = augment_fn(rng, img, ada_p)
        return discriminator.apply({"params": d_params, **d_state}, img, c, h)

    def train_step(state: SG2TrainState, batch: dict, rng: jax.Array):
        metrics = {}
        c = batch.get("c")
        h = batch.get("h")
        gen_c = batch.get("gen_c", c)
        gen_h = batch.get("gen_h", h)
        x_real = batch["x"]
        N = x_real.shape[0]
        rngs = jax.random.split(rng, 8)

        g_state, d_state = state.g_state, state.d_state
        ada_p = state.ada_p

        # ---- G phase: Gmain (+ Gpl when do_pl) ----
        z = jax.random.normal(rngs[0], (N, z_dim))

        def g_loss_fn(g_params):
            img, _ws, new_g_state = run_G(
                g_params, g_state, z, gen_c, gen_h, rngs[1], update_w_avg=True
            )
            logits = run_D(state.d_params, d_state, img, gen_c, gen_h, rngs[2],
                           ada_p)
            loss = jnp.mean(jax.nn.softplus(-logits))
            aux = {"G_loss": loss, "fake_scores": jnp.mean(logits)}
            total = loss
            new_pl_mean = state.pl_mean
            if do_pl and cfg.pl_weight != 0:
                nb = max(N // cfg.pl_batch_shrink, 1)
                z_pl = z[:nb]
                c_pl = None if gen_c is None else gen_c[:nb]
                h_pl = None if gen_h is None else gen_h[:nb]
                ws_pl, _ = map_ws(g_params, g_state, z_pl, c_pl, h_pl, rngs[3],
                                  False)

                def img_dot(ws_in, noise):
                    img_pl = synthesize(g_params, g_state, ws_in, rngs[4])
                    return jnp.sum(img_pl * noise), img_pl

                # Build pl noise from the image shape via eval_shape (static).
                img_shape = jax.eval_shape(
                    lambda w: synthesize(g_params, g_state, w, rngs[4]), ws_pl
                ).shape
                pl_noise = jax.random.normal(rngs[5], img_shape) / np.sqrt(
                    img_shape[1] * img_shape[2]
                )
                grads_ws = jax.grad(
                    lambda w: img_dot(w, pl_noise)[0]
                )(ws_pl)
                pl_lengths = jnp.sqrt(
                    jnp.mean(jnp.sum(jnp.square(grads_ws), axis=2), axis=1)
                )
                new_pl_mean = state.pl_mean + cfg.pl_decay * (
                    jnp.mean(pl_lengths) - state.pl_mean
                )
                pl_penalty = jnp.square(pl_lengths - new_pl_mean)
                loss_pl = jnp.mean(pl_penalty) * cfg.pl_weight
                aux["pl_penalty"] = jnp.mean(pl_penalty)
                # Reference multiplies the reg phase by its interval (gain).
                total = total + loss_pl * cfg.G_reg_interval
            return total, (aux, new_g_state, jax.lax.stop_gradient(new_pl_mean))

        (_, (g_aux, g_state, new_pl_mean)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        # NaN/Inf scrub before the update (ref training_loop.py:517-521).
        g_grads, g_nonfinite = scrub_grads(g_grads)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics.update(g_aux)
        metrics["G_grad_nonfinite"] = g_nonfinite
        if debug_grads:
            # Raw (pre-optimizer) grads for sharded-vs-single equivalence
            # checks — Adam normalizes away scale errors downstream.
            metrics["g_grads"] = g_grads

        # ---- D phase: Dmain (+ Dr1 when do_r1) ----
        z_d = jax.random.normal(rngs[6], (N, z_dim))

        def d_loss_fn(d_params):
            img_fake, _, _ = run_G(
                g_params, g_state, z_d, gen_c, gen_h, rngs[7], update_w_avg=False
            )
            img_fake = jax.lax.stop_gradient(img_fake)
            fake_logits = run_D(d_params, d_state, img_fake, gen_c, gen_h,
                                jax.random.fold_in(rng, 11), ada_p)
            loss_fake = jnp.mean(jax.nn.softplus(fake_logits))

            real_logits = run_D(d_params, d_state, x_real, c, h,
                                jax.random.fold_in(rng, 12), ada_p)
            loss_real = jnp.mean(jax.nn.softplus(-real_logits))
            aux = {
                "D_loss": loss_fake + loss_real,
                "real_scores": jnp.mean(real_logits),
                "real_signs": jnp.mean(jnp.sign(real_logits)),
            }
            total = loss_fake + loss_real
            if do_r1 and cfg.r1_gamma != 0:
                def real_score_sum(x_in):
                    return jnp.sum(
                        run_D(d_params, d_state, x_in, c, h,
                              jax.random.fold_in(rng, 12), ada_p)
                    )

                r1_grads = jax.grad(real_score_sum)(x_real)
                r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
                loss_r1 = jnp.mean(r1_penalty) * (cfg.r1_gamma / 2.0)
                aux["r1_penalty"] = jnp.mean(r1_penalty)
                total = total + loss_r1 * cfg.D_reg_interval
            return total, aux

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        if cfg.freeze_d_layers > 0:
            mask = freeze_d_mask(state.d_params, cfg.freeze_d_layers)
            d_grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), d_grads, mask
            )
        d_grads, d_nonfinite = scrub_grads(d_grads)
        if debug_grads:
            metrics["d_grads"] = d_grads
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics.update(d_aux)
        metrics["D_grad_nonfinite"] = d_nonfinite

        # ---- EMA with ramp-up (ref training_loop.py:527-535) ----
        cur_nimg = state.cur_nimg + N
        ema_nimg = cfg.ema_kimg * 1000.0
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * cfg.ema_rampup)
        ema_beta = 0.5 ** (N / jnp.maximum(ema_nimg, 1e-8))
        g_ema_params = jax.tree.map(
            lambda e, p: p + (e - p) * ema_beta, state.g_ema_params, g_params
        )
        g_ema_state = jax.tree.map(
            lambda e, p: p + (e - p) * ema_beta
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
            else p,
            state.g_ema_state,
            g_state,
        )

        # ---- ADA sign accumulation (the p update itself runs on the host
        # every ada_interval steps via `ada_update`; ref :542-551) ----
        ada_sign_sum = state.ada_sign_sum + d_aux["real_signs"] * N
        ada_count = state.ada_count + N

        new_state = state.replace(
            step=state.step + 1,
            cur_nimg=cur_nimg,
            g_params=g_params,
            d_params=d_params,
            g_state=g_state,
            d_state=d_state,
            g_ema_params=g_ema_params,
            g_ema_state=g_ema_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            pl_mean=new_pl_mean,
            ada_sign_sum=ada_sign_sum,
            ada_count=ada_count,
        )
        return new_state, metrics

    return train_step


def ada_update(state: SG2TrainState, cfg: SG2TrainConfig, batch_size: int):
    """ADA p-controller (ref training_loop.py:542-551): nudge p toward keeping
    E[sign(D(real))] at ``ada_target``.  Call every ``ada_interval`` steps."""
    mean_sign = state.ada_sign_sum / jnp.maximum(state.ada_count, 1.0)
    adjust = (
        jnp.sign(mean_sign - cfg.ada_target)
        * (batch_size * cfg.ada_interval)
        / (cfg.ada_kimg * 1000.0)
    )
    # Lower-clamp only: the reference controller lets p exceed 1 in the
    # saturated regime (training_loop.py:551 `(p + adjust).max(constant(0))`).
    new_p = jnp.maximum(state.ada_p + adjust, 0.0)
    return state.replace(
        ada_p=new_p,
        ada_sign_sum=jnp.zeros(()),
        ada_count=jnp.zeros(()),
    )
