"""CLIP-guided IC-GAN sampling — the colab's flow, population-batched on TPU.

Reference: ``inference/icgan_colab.ipynb`` "Generate images with IC-GAN +
CLIP!": optimize the noise vector so CLIP's image embedding of the generated
image matches a text prompt, via CMA-ES (gradient-free), SGD/Adam (gradients
through generator+CLIP), or their interleaved/terminal combinations, with
random-crop augmentations and the truncation clamp.

TPU-first redesign: the colab loops Python-side over population members and
augmentations (one CUDA forward per member); here one jitted call evaluates
the whole population — generator on (pop, z) and CLIP on (pop·augs) crops —
and the random crop+resize is expressed as per-aug bilinear sampling
matrices (static shapes, MXU einsums) instead of dynamic slicing. CMA-ES
itself (``utils/cma_es.py``) is host-side numpy, trivial next to the device
batch.

    python -m ic_gan_tpu.cli.clip_guided --set prompt="A dragon" \
        checkpoint=... clip_weights=... bpe_path=... out=best.png
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax


def truncnorm_init(rng: np.random.RandomState, shape, truncation: float
                   ) -> np.ndarray:
    """Rejection-sampled N(0,1) truncated to ±2·truncation (the colab's
    ``truncnorm.rvs(-2t, 2t)``)."""
    out = rng.randn(*shape)
    bad = np.abs(out) > 2 * truncation
    while bad.any():
        out[bad] = rng.randn(int(bad.sum()))
        bad = np.abs(out) > 2 * truncation
    return out.astype(np.float32)


def crop_resize_bilinear(imgs: jax.Array, out_size: int, starts: jax.Array,
                         sizes: jax.Array) -> jax.Array:
    """Per-image crop + bilinear resize with static output shape.

    imgs (B, S, S, C); starts (B, 2) float top-left; sizes (B,) float window
    side. Equivalent to slicing ``[y:y+s, x:x+s]`` then
    ``F.interpolate(out_size, bilinear)`` (half-pixel grid), but built as two
    (out, S) interpolation matrices per image so shapes stay static under
    jit."""
    S = imgs.shape[1]
    idx_out = jnp.arange(out_size, dtype=jnp.float32)
    idx_in = jnp.arange(S, dtype=jnp.float32)

    def axis_matrix(start, size):
        scale = size / out_size
        src = start + (idx_out + 0.5) * scale - 0.5
        src = jnp.clip(src, start, start + size - 1)
        src = jnp.clip(src, 0.0, S - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - idx_in[None, :]))
        # rows always sum to 1 (two adjacent taps) except exactly-integer src
        return w / jnp.sum(w, axis=1, keepdims=True)

    def one(img, start, size):
        mh = axis_matrix(start[0], size)
        mw = axis_matrix(start[1], size)
        x = jnp.einsum("oh,hwc->owc", mh, img)
        return jnp.einsum("pw,owc->opc", mw, x)

    return jax.vmap(one)(imgs, starts, sizes)


def normality_loss(vec: jax.Array) -> jax.Array:
    """KL(N(μ,σ)‖N(0,1)) surrogate (colab's ``normality_loss``,
    arXiv:1903.00925): μ² + σ² − log σ² − 1."""
    mu2 = jnp.square(jnp.mean(vec))
    sigma2 = jnp.var(vec)
    return mu2 + sigma2 - jnp.log(sigma2) - 1.0


def clip_guided_search(
    generate: Callable[[jax.Array], jax.Array],
    encode_image: Callable[[jax.Array], jax.Array],
    text_features: jax.Array,
    z_dim: int,
    *,
    optimizer: str = "CMA-ES",
    pop_size: int = 50,
    iterations: int = 100,
    terminal_iterations: int = 100,
    truncation: float = 0.7,
    augmentations: int = 64,
    clip_res: int = 224,
    learning_rate: float = 0.1,
    noise_normality_weight: float = 0.0,
    loss_factor: float = 100.0,
    sigma0: float = 0.5,
    seed: Optional[int] = None,
    callback: Optional[Callable] = None,
) -> Dict:
    """Optimize z so CLIP(generate(z)) matches ``text_features``.

    ``generate``: (P, z_dim) → (P, S, S, 3) in [-1, 1] (clamping here).
    ``encode_image``: (N, clip_res, clip_res, 3) in [0, 1] → L2-normed (N, D).
    ``optimizer`` matches the colab menu: 'SGD', 'Adam', 'CMA-ES',
    'CMA-ES + {SGD,Adam} interleaved', 'CMA-ES + terminal {SGD,Adam}'.
    Returns dict with best_z / best_loss / best_image / history.
    """
    state = np.random.RandomState(seed)
    use_cma = "CMA" in optimizer
    grad_name = ("SGD" if "SGD" in optimizer
                 else "Adam" if "Adam" in optimizer else None)
    interleaved = grad_name is not None and "terminal" not in optimizer
    text_features = jnp.asarray(text_features)
    if text_features.ndim == 1:
        text_features = text_features[None]

    def losses_fn(z, key):
        z = jnp.clip(z, -2 * truncation, 2 * truncation)
        imgs = generate(z)  # (P, S, S, 3) in [-1, 1]
        P, S = imgs.shape[0], imgs.shape[1]
        n_aug = 1 if S <= clip_res else augmentations

        def cos_of(crops):  # (P, clip, clip, 3) → (P,) prompt-mean cosine
            emb = encode_image((crops + 1.0) / 2.0)
            return jnp.einsum("pd,td->p", emb,
                              text_features) / text_features.shape[0]

        if n_aug == 1:
            crops = crop_resize_bilinear(
                imgs, clip_res, jnp.zeros((P, 2)), jnp.full((P,), float(S)))
            cos = cos_of(crops)
        else:
            # One aug per scan step: peak memory is one (P, clip, clip, 3)
            # CLIP batch, not the colab-default P·A=3200 at once.
            def one_aug(acc, key_a):
                k1, k2 = jax.random.split(key_a)
                sizes = jax.random.uniform(k1, (P,), minval=0.7 * S,
                                           maxval=0.98 * S)
                offs = jax.random.uniform(k2, (P, 2)) * (S - sizes[:, None])
                crops = crop_resize_bilinear(imgs, clip_res, offs, sizes)
                return acc + cos_of(crops), None

            cos, _ = jax.lax.scan(one_aug, jnp.zeros((P,)),
                                  jax.random.split(key, n_aug))
            cos = cos / n_aug
        loss = loss_factor * (1.0 - cos)  # (P,)
        if noise_normality_weight:
            loss = loss + loss_factor * noise_normality_weight * normality_loss(z)
        return loss, imgs

    eval_jit = jax.jit(losses_fn)
    grad_jit = jax.jit(
        jax.grad(lambda z, key: jnp.sum(losses_fn(z, key)[0])))

    opt = None
    opt_state = None
    if grad_name is not None:
        opt = (optax.sgd(learning_rate, momentum=0.9) if grad_name == "SGD"
               else optax.adam(learning_rate))

    cmaes = None
    if use_cma:
        from ic_gan_tpu.utils.cma_es import CMAES

        cmaes = CMAES(np.zeros(z_dim), sigma0, popsize=pop_size,
                      seed=None if seed is None else seed + 1)

    z_pop = jnp.asarray(truncnorm_init(state, (pop_size, z_dim), truncation))
    key = jax.random.PRNGKey(0 if seed is None else seed)
    best = {"loss": np.inf, "z": None, "iteration": 0}
    history = []
    total = iterations + (terminal_iterations if "terminal" in optimizer else 0)

    for i in range(total):
        terminal_phase = use_cma and i >= iterations
        if use_cma and not terminal_phase:
            z_pop = jnp.asarray(cmaes.ask().astype(np.float32))
        if terminal_phase and i == iterations:
            # switch to pop 1 from the global best (colab's terminal hop)
            z_pop = jnp.asarray(best["z"][None])
            if opt is not None:
                opt_state = opt.init(z_pop)

        key, sub = jax.random.split(key)
        do_grad = grad_name is not None and (interleaved or terminal_phase
                                             or not use_cma)
        if do_grad:
            if opt_state is None:
                opt_state = opt.init(z_pop)
            g = grad_jit(z_pop, sub)
            updates, opt_state = opt.update(g, opt_state, z_pop)
            z_pop = optax.apply_updates(z_pop, updates)

        losses, _ = eval_jit(z_pop, sub)
        losses_np = np.asarray(losses)
        b = int(np.argmin(losses_np))
        if losses_np[b] < best["loss"]:
            best = {"loss": float(losses_np[b]),
                    "z": np.asarray(z_pop[b]), "iteration": i}
        if use_cma and not terminal_phase:
            cmaes.tell(np.asarray(z_pop), list(losses_np))
        history.append({"iteration": i, "best": float(losses_np[b]),
                        "mean": float(losses_np.mean())})
        if callback is not None:
            callback(i, losses_np, z_pop)

    z_best = jnp.clip(jnp.asarray(best["z"][None]),
                      -2 * truncation, 2 * truncation)
    best_image = np.asarray(generate(z_best)[0])
    return {"best_z": best["z"], "best_loss": best["loss"],
            "best_iteration": best["iteration"], "best_image": best_image,
            "history": history}


def main(argv=None):
    from ic_gan_tpu.cli.config import parse_args

    cfg = parse_args(argv)

    from ic_gan_tpu.cli.inference import load_generator
    from ic_gan_tpu.data.tokenizer import SimpleTokenizer, tokenize
    from ic_gan_tpu.models.clip import CLIP, load_clip_file

    clip_vars, clip_cfg = load_clip_file(cfg.get("clip_weights"))
    clip_net = CLIP(clip_cfg)
    tok = SimpleTokenizer.from_file(cfg.get("bpe_path"))
    tokens = tokenize(cfg["prompt"], tok, clip_cfg.context_length)
    text_features = clip_net.apply(clip_vars, jnp.asarray(tokens),
                                   method=clip_net.encode_text)

    gen, variables, model_cfg = load_generator(cfg)
    # Deployment mode: z-search never differentiates the weights, so fold
    # σ into the kernels — the SN-live eval graph is both slower and
    # pathologically slow to compile on the relay backend (CLAUDE.md).
    from ic_gan_tpu.io.deploy import fold_spectral_norm

    if "sn" in variables:
        variables = fold_spectral_norm(variables)
    feats = None
    if cfg.get("instance_features_npy"):
        bank = np.load(cfg["instance_features_npy"], allow_pickle=True).item()
        idx = cfg.get("input_feature_index", 0)
        feats = jnp.asarray(bank["instance_features"][idx:idx + 1])
    class_index = cfg.get("class_index")

    def generate(z):
        c = None
        if class_index is not None:
            c = jnp.full((z.shape[0],), class_index, jnp.int32)
        h = None
        if feats is not None:
            h = jnp.broadcast_to(feats, (z.shape[0], feats.shape[-1]))
        return gen.apply(variables, z, c, h, train=False)

    def encode_image(x01):
        return clip_net.apply(clip_vars, x01, method=clip_net.encode_image)

    out = clip_guided_search(
        generate, encode_image, text_features,
        z_dim=getattr(model_cfg, "effective_dim_z", model_cfg.dim_z),
        optimizer=cfg.get("optimizer", "CMA-ES"),
        pop_size=cfg.get("pop_size", 50),
        iterations=cfg.get("iterations", 100),
        terminal_iterations=cfg.get("terminal_iterations", 100),
        truncation=cfg.get("truncation", 0.7),
        augmentations=cfg.get("augmentations", 64),
        clip_res=clip_cfg.image_resolution,
        learning_rate=cfg.get("learning_rate", 0.1),
        noise_normality_weight=cfg.get("noise_normality_loss", 0.0),
        seed=cfg.get("seed"),
    )
    print({"best_loss": round(out["best_loss"], 3),
           "best_iteration": out["best_iteration"]})
    if cfg.get("out"):
        from PIL import Image

        img = np.uint8(np.clip((out["best_image"] + 1) * 127.5, 0, 255))
        Image.fromarray(img).save(cfg["out"])
    return out


if __name__ == "__main__":
    main()
