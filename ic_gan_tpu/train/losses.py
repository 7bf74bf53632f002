"""GAN losses (reference ``BigGAN_PyTorch/losses.py`` and
``stylegan2_ada_pytorch/training/loss.py``).

All are tiny elementwise reductions; under pjit the means over a sharded batch
reduce with a psum over the mesh automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --- BigGAN-style (hinge is the default, ref losses.py:24-43) ---------------


def hinge_d_loss(d_fake: jax.Array, d_real: jax.Array):
    loss_real = jnp.mean(jax.nn.relu(1.0 - d_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + d_fake))
    return loss_real, loss_fake


def hinge_g_loss(d_fake: jax.Array):
    return -jnp.mean(d_fake)


def dcgan_d_loss(d_fake: jax.Array, d_real: jax.Array):
    loss_real = jnp.mean(jax.nn.softplus(-d_real))
    loss_fake = jnp.mean(jax.nn.softplus(d_fake))
    return loss_real, loss_fake


def dcgan_g_loss(d_fake: jax.Array):
    return jnp.mean(jax.nn.softplus(-d_fake))


D_LOSSES = {"hinge": hinge_d_loss, "dcgan": dcgan_d_loss}
G_LOSSES = {"hinge": hinge_g_loss, "dcgan": dcgan_g_loss}


# --- StyleGAN2-style (non-saturating logistic + regularizers,
#     ref training/loss.py:85-194) -------------------------------------------


def logistic_d_loss(d_fake: jax.Array, d_real: jax.Array):
    loss_real = jnp.mean(jax.nn.softplus(-d_real))
    loss_fake = jnp.mean(jax.nn.softplus(d_fake))
    return loss_real, loss_fake


def logistic_g_loss(d_fake: jax.Array):
    return jnp.mean(jax.nn.softplus(-d_fake))


def r1_penalty(d_apply, variables, x_real, *cond):
    """R1 gradient penalty: E[|∇_x D(x)|²] on reals (ref loss.py:177-194).

    JAX differentiates the discriminator to any order, so no conv2d_gradfix
    machinery is needed — this composes with jit and a later grad.
    """

    def score(x):
        return jnp.sum(d_apply(variables, x, *cond))

    g = jax.grad(score)(x_real)
    return jnp.sum(jnp.square(g)) / x_real.shape[0]


def path_length_penalty(g_apply, variables, z, *cond, rng=None, pl_mean=0.0,
                        decay: float = 0.01):
    """Path-length regularizer (ref loss.py:111-140): penalize the deviation
    of |J_wᵀ y| from its running mean, with y ~ N(0, I/√(HW)).

    Returns ``(penalty, new_pl_mean, pl_lengths)``; the caller carries the
    running mean as train-step state.
    """
    imgs = g_apply(variables, z, *cond)
    N, H, W, C = imgs.shape
    noise = jax.random.normal(rng, imgs.shape) / jnp.sqrt(H * W)

    def dot_out(zz):
        return jnp.sum(g_apply(variables, zz, *cond) * noise)

    grads = jax.grad(dot_out)(z)
    # Per-sample path lengths (ref loss.py:130-133: pl_lengths is [N], the
    # penalty is the mean of per-sample squared deviations — collapsing to a
    # scalar before penalizing would weaken the regularizer).
    lengths = jnp.sqrt(jnp.sum(jnp.square(grads), axis=-1))
    new_mean = pl_mean + decay * (jnp.mean(lengths) - pl_mean)
    penalty = jnp.mean(jnp.square(lengths - new_mean))
    return penalty, new_mean, lengths
