"""IC-GAN demo: generate variations of a user-provided image.

Reference: ``predict.py:43-307`` (the Replicate/cog demo) — extract instance
features from an input image with the frozen feature extractor, sample the
generator conditioned on them, and rank the samples by feature cosine
similarity to the input.

    python -m ic_gan_tpu.cli.demo --set input_image=photo.jpg \
        num_samples=16 out_path=variations.png ...model config...
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args
from ic_gan_tpu.cli.inference import load_model_inference, save_image_grid


def extract_features(image_path: str, weights_path=None, resolution: int = 224):
    """User image → L2-normalized 2048-d instance features (ref
    ``predict.py``: SwAV ResNet-50 at 224², bicubic)."""
    from PIL import Image

    from ic_gan_tpu.models.resnet import ResNet50, load_torch_resnet50, preprocess

    img = Image.open(image_path).convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    arr = np.asarray(img, np.float32) / 255.0

    net = ResNet50()
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        variables = load_torch_resnet50({k: v.numpy() for k, v in sd.items()})
    else:
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    x = preprocess(jnp.asarray(arr)[None], size=resolution)
    feats, _ = net.apply(variables, x)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return np.asarray(feats[0])


def rank_by_cosine(gen_feats: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Indices of generated samples sorted by cosine similarity to the target
    instance (best first; ref predict.py sample ranking)."""
    g = gen_feats / np.linalg.norm(gen_feats, axis=1, keepdims=True)
    t = target / np.linalg.norm(target)
    return np.argsort(-(g @ t))


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)
    feats = extract_features(
        cfg["input_image"], cfg.get("feature_extractor_weights"),
    )

    n = cfg.get("num_samples", 16)
    dim_z = getattr(model_cfg, "effective_dim_z", getattr(model_cfg, "z_dim", 128))
    z = jax.random.normal(jax.random.PRNGKey(cfg.get("seed", 0)), (n, dim_z))
    z = z * np.sqrt(cfg.get("z_var", 1.0))
    f = jnp.broadcast_to(jnp.asarray(feats)[None], (n, feats.shape[0]))
    imgs = np.asarray(apply_fn(z, None, f))

    # Rank by feature similarity using the same extractor.
    from ic_gan_tpu.models.resnet import ResNet50, preprocess

    net = ResNet50()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    gen_feats, _ = net.apply(variables, preprocess((jnp.asarray(imgs) + 1) / 2))
    order = rank_by_cosine(np.asarray(gen_feats), feats)
    imgs = imgs[order]

    out = cfg.get("out_path", "variations.png")
    save_image_grid(imgs, out, nrow=int(np.ceil(np.sqrt(n))))
    print(f"wrote {n} ranked variations to {out}")


if __name__ == "__main__":
    main()
