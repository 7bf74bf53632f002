"""ResNet-50 instance-feature extractor (Flax, NHWC, eval-mode).

Reference: ``data_utils/resnet.py:77-154`` — a torchvision-style ResNet-50
returning ``(pooled_features_or_logits, conv_features)``; IC-GAN conditions on
the 2048-d pooled features from either SwAV (self-supervised) or
ImageNet-classification weights.  Weight-loading shims mirror
``data_utils/utils.py:290-358``: SwAV checkpoints prefix modules with
``_feature_blocks.`` and classifier-balancing checkpoints wrap with
``module.``.

Eval-only: BN uses stored statistics (features are extracted with the frozen
net), so stats are plain params.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class _BN(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4x
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = jax.nn.relu(_BN(self.features, name="bn1")(y))
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(y)
        y = jax.nn.relu(_BN(self.features, name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = _BN(self.features * 4, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1),
                strides=(self.strides, self.strides), use_bias=False,
                name="downsample_conv",
            )(x)
            identity = _BN(self.features * 4, name="downsample_bn")(identity)
        return jax.nn.relu(y + identity)


class ResNet50(nn.Module):
    """Returns ``(pooled_or_logits, conv_features)`` like the reference
    (``resnet.py:82-99``): with ``classifier=True`` the first element is fc
    logits, otherwise the 2048-d pooled features."""

    classifier: bool = False
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = jax.nn.relu(_BN(64, name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        for layer_idx, (blocks, feats, stride) in enumerate(
            [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)], start=1
        ):
            for b in range(blocks):
                x = Bottleneck(
                    feats,
                    strides=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{layer_idx}_{b}",
                )(x)
        conv_feats = x
        pooled = jnp.mean(x, axis=(1, 2))  # (N, 2048)
        if self.classifier:
            logits = nn.Dense(self.num_classes, name="fc")(pooled)
            return logits, conv_feats
        return pooled, conv_feats


def preprocess(images_01: jax.Array, size: int = 224) -> jax.Array:
    """ImageNet normalization + bicubic resize to 224² (the reference extracts
    features at 224² bicubic — ``make_hdf5.py:232-243``). Input in [0, 1]."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = jax.image.resize(
        images_01,
        (images_01.shape[0], size, size, images_01.shape[3]),
        method="bicubic",
    )
    return (x - mean) / std


def load_torch_resnet50(state_dict, classifier: bool = False) -> dict:
    """torchvision/SwAV ResNet-50 state dict (numpy) → Flax params.

    Handles the reference's prefix shims (``data_utils/utils.py:322-355``):
    SwAV ``_feature_blocks.`` and DDP ``module.`` prefixes are stripped.
    """
    from flax.traverse_util import unflatten_dict

    def canon(key: str) -> str:
        for prefix in ("module.", "_feature_blocks."):
            if key.startswith(prefix):
                key = key[len(prefix):]
        return key

    sd = {canon(k): np.asarray(v) for k, v in state_dict.items()}
    flat = {}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] in ("conv1", "bn1"):
            if parts[0] == "conv1":
                flat[("conv1", "kernel")] = np.transpose(v, (2, 3, 1, 0))
            else:
                name = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[parts[1]]
                flat[("bn1", name)] = v
        elif parts[0] == "fc":
            if not classifier:
                continue
            flat[("fc", {"weight": "kernel", "bias": "bias"}[parts[1]])] = (
                np.transpose(v) if parts[1] == "weight" else v
            )
        elif parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "downsample":
                # downsample.0 = conv, downsample.1 = bn
                if rest[1] == "0":
                    flat[(block, "downsample_conv", "kernel")] = np.transpose(
                        v, (2, 3, 1, 0)
                    )
                else:
                    name = {"weight": "scale", "bias": "bias",
                            "running_mean": "mean", "running_var": "var"}[rest[2]]
                    flat[(block, "downsample_bn", name)] = v
            elif rest[0].startswith("conv"):
                flat[(block, rest[0], "kernel")] = np.transpose(v, (2, 3, 1, 0))
            elif rest[0].startswith("bn"):
                name = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[rest[1]]
                flat[(block, rest[0], name)] = v
        # projection heads (SwAV prototypes etc.) are dropped.
    flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return {"params": unflatten_dict(flat)}
