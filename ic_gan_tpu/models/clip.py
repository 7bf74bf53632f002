"""CLIP (ViT + text transformer) in Flax — the colab's guidance scorer.

The reference's CLIP-guided notebook (``inference/icgan_colab.ipynb``, cell
"Generate images with IC-GAN + CLIP!") steers IC-GAN sampling by maximizing
the cosine similarity between ``clip.encode_image(generated)`` and
``clip.encode_text(prompt)``. This module provides the same scorer natively:
OpenAI's ViT-B/32 architecture (quick-GELU transformer, packed-qkv attention,
EOT-token text pooling) with a mechanical converter from the OpenAI
``state_dict`` — weights env-gated (``$ICGAN_CLIP_WEIGHTS``; zero egress).

Geometry is configurable so oracle tests run at toy sizes; ``vit_b32()``
builds the published ViT-B/32 shape.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# CLIP's image normalization (the colab's `nom`, applied after resize).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPConfig:
    image_resolution: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8


def vit_b32() -> "CLIPConfig":
    return CLIPConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """Packed-qkv attention matching ``torch.nn.MultiheadAttention``
    (the layout OpenAI CLIP checkpoints store)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal: bool = False):
        B, L, D = x.shape
        qkv_w = self.param("in_proj_weight",
                           nn.initializers.xavier_uniform(), (3 * D, D))
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        q, k, v = jnp.split(x @ qkv_w.T + qkv_b, 3, axis=-1)
        hd = D // self.heads

        def heads_first(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if causal:
            mask = jnp.tril(jnp.ones((L, L), bool))
            logits = jnp.where(mask, logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MultiheadAttention(self.width, self.heads, name="attn")(
            y, causal=causal)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * self.width, name="c_fc")(y)
        y = quick_gelu(y)
        return x + nn.Dense(self.width, name="c_proj")(y)


class VisionTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3), CLIP-normalized. → (B, embed_dim) unprojected-norm
        free image features (caller normalizes for cosine similarity)."""
        c = self.cfg
        x = nn.Conv(c.vision_width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    padding="VALID", name="conv1")(x)
        B, gh, gw, D = x.shape
        x = x.reshape(B, gh * gw, D)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (D,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (gh * gw + 1, D))
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = ResidualBlock(D, c.vision_heads, name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (D, c.embed_dim))
        return x @ proj


class TextTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, L) int32 (L ≤ context_length; EOT = max id in each
        row, CLIP's argmax pooling). → (B, embed_dim)."""
        c = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.text_width))
        x = emb[tokens]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.context_length, c.text_width))
        x = x + pos[: x.shape[1]]
        for i in range(c.text_layers):
            x = ResidualBlock(c.text_width, c.text_heads,
                              name=f"resblocks_{i}")(x, causal=True)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.text_width, c.embed_dim))
        return x @ proj


class CLIP(nn.Module):
    cfg: CLIPConfig = field(default_factory=vit_b32)  # type: ignore[assignment]

    def setup(self):
        self.visual = VisionTransformer(self.cfg)
        self.text = TextTransformer(self.cfg)
        self.logit_scale = self.param("logit_scale",
                                      lambda k, s: jnp.full(s, np.log(1 / 0.07)),
                                      ())

    def encode_image(self, images):
        """images NHWC in [0, 1] at ``image_resolution`` → L2-normalized
        embeddings (B, embed_dim)."""
        x = (images - CLIP_MEAN) / CLIP_STD
        f = self.visual(x)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def encode_text(self, tokens):
        f = self.text(tokens)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def __call__(self, images, tokens):
        """→ (logits_per_image, logits_per_text) like the OpenAI module."""
        fi = self.encode_image(images)
        ft = self.encode_text(tokens)
        scale = jnp.exp(self.logit_scale)
        return scale * fi @ ft.T, scale * ft @ fi.T


# --------------------------------------------------------------------------
# Weight conversion (OpenAI ``clip`` state dict → these params)


def config_from_state_dict(sd: Dict) -> CLIPConfig:
    """Recover geometry from an OpenAI CLIP state dict (same probing the
    ``clip`` package does in ``build_model``)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vlayers = len({k.split(".")[3] for k in sd
                   if k.startswith("visual.transformer.resblocks.")})
    tlayers = len({k.split(".")[2] for k in sd
                   if k.startswith("transformer.resblocks.")})
    return CLIPConfig(
        image_resolution=grid * patch,
        patch_size=patch,
        vision_width=vision_width,
        vision_layers=vlayers,
        vision_heads=vision_width // 64,
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=sd["token_embedding.weight"].shape[1],
        text_layers=tlayers,
        text_heads=sd["token_embedding.weight"].shape[1] // 64,
    )


def _block_params(sd: Dict, prefix: str) -> Dict:
    def lin(name):
        return {"kernel": jnp.asarray(np.transpose(sd[f"{prefix}.{name}.weight"])),
                "bias": jnp.asarray(sd[f"{prefix}.{name}.bias"])}

    def ln(name):
        return {"scale": jnp.asarray(sd[f"{prefix}.{name}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.{name}.bias"])}

    return {
        "ln_1": ln("ln_1"), "ln_2": ln("ln_2"),
        "attn": {
            "in_proj_weight": jnp.asarray(sd[f"{prefix}.attn.in_proj_weight"]),
            "in_proj_bias": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"]),
            "out_proj": lin("attn.out_proj"),
        },
        "c_fc": lin("mlp.c_fc"),
        "c_proj": lin("mlp.c_proj"),
    }


def load_openai_clip(state_dict: Dict, cfg: Optional[CLIPConfig] = None
                     ) -> Tuple[Dict, CLIPConfig]:
    """OpenAI ``clip`` state dict (numpy values) → (Flax variables, config).

    ``cfg`` overrides the probed geometry (head counts aren't stored in the
    checkpoint — the standard width/64 rule is used unless given)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    cfg = cfg or config_from_state_dict(sd)

    def ln(key):
        return {"scale": jnp.asarray(sd[f"{key}.weight"]),
                "bias": jnp.asarray(sd[f"{key}.bias"])}

    visual = {
        "conv1": {"kernel": jnp.asarray(
            np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0)))},
        "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
        "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
        "ln_pre": ln("visual.ln_pre"),
        "ln_post": ln("visual.ln_post"),
        "proj": jnp.asarray(sd["visual.proj"]),
    }
    for i in range(cfg.vision_layers):
        visual[f"resblocks_{i}"] = _block_params(
            sd, f"visual.transformer.resblocks.{i}")

    text = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "ln_final": ln("ln_final"),
        "text_projection": jnp.asarray(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        text[f"resblocks_{i}"] = _block_params(sd, f"transformer.resblocks.{i}")

    params = {"visual": visual, "text": text,
              "logit_scale": jnp.asarray(sd["logit_scale"])}
    return {"params": params}, cfg


def load_clip_file(path: Optional[str] = None) -> Tuple[Dict, CLIPConfig]:
    """Load a local OpenAI CLIP checkpoint (torchscript ``.pt`` as shipped by
    ``clip.load``, or a plain state dict). Env-gated:
    ``$ICGAN_CLIP_WEIGHTS``."""
    import torch

    path = path or os.environ.get("ICGAN_CLIP_WEIGHTS")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "CLIP weights not found — set $ICGAN_CLIP_WEIGHTS to a local "
            "ViT-B/32 checkpoint (the colab downloads it; zero egress here).")
    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return load_openai_clip(sd)
