"""VGG16 + LPIPS perceptual distance, in Flax (NHWC).

The reference's PPL metric and projector score images with NVIDIA's
``vgg16.pt`` torchscript — a VGG16 trunk with the Zhang et al. LPIPS head
(``stylegan2_ada_pytorch/metrics/perceptual_path_length.py:112-116``,
``projector.py:68-76``): images arrive in **[0, 255]**, and
``return_lpips=True`` yields a feature vector whose squared L2 difference
*is* the LPIPS distance.

This module reimplements that contract natively:

- ``VGG16`` — the 13-conv torchvision ``features`` trunk (eval-only, NHWC),
  parameter names keyed by torchvision layer index so pretrained state dicts
  convert mechanically.
- LPIPS head — unit-normalize the five relu taps (relu1_2/2_2/3_3/4_3/5_3),
  weight channels by the learned ``lin`` 1×1 convs, average spatially, sum
  layers (Zhang et al. 2018, eq. 1 — the math NVIDIA's script executes).
- ``lpips_features`` folds √lin/√(H·W) into the normalized taps so
  ``sum((f0-f1)²)`` equals the distance — the ``return_lpips=True`` layout
  the reference differentiates through.

Weights are env-gated like the Inception/SwAV loaders (zero egress): any of
torchvision ``vgg16`` state dicts, richzhang ``lpips`` checkpoints, or
NVIDIA's ``vgg16.pt`` torchscript convert via ``load_vgg16_file``. Without a
file the net runs with random weights — self-consistent, not comparable.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg16.features layout: index → (out_channels); maxpool after
# each block. Conv indices double as parameter names (``features_{i}``).
_CONV_PLAN: Tuple[Tuple[int, int], ...] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
# Conv indices whose relu output feeds the LPIPS head (relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3).
_TAP_AFTER = (2, 7, 14, 21, 28)
_TAP_CHANNELS = (64, 128, 256, 512, 512)
# Block boundaries: a 2×2/2 maxpool runs before these convs.
_POOL_BEFORE = (5, 10, 17, 24)

# Zhang et al. ScalingLayer constants (input in [-1, 1]).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class VGG16(nn.Module):
    """Eval-mode VGG16 trunk with the LPIPS head.

    ``__call__`` mirrors the NVIDIA torchscript contract: NHWC float images
    in **[0, 255]**, returns the LPIPS feature vector (B, D). Use
    ``extract`` for the raw relu taps or ``lpips_distance`` for pairwise
    distances without materializing features.
    """

    def setup(self):
        for idx, ch in _CONV_PLAN:
            setattr(self, f"features_{idx}",
                    nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1))))
        # Learned LPIPS channel weights (the ``lin{i}`` 1×1 convs). Ones
        # when no LPIPS checkpoint is loaded (uniform weighting).
        self.lin_weights = [
            self.param(f"lin_{i}", nn.initializers.ones, (c,))
            for i, c in enumerate(_TAP_CHANNELS)
        ]

    def _taps(self, x: jax.Array) -> List[jax.Array]:
        # [0,255] → [-1,1] → Zhang scaling (what lpips.LPIPS does for
        # 255-range input; NVIDIA's script reproduces richzhang numerics).
        x = x / 127.5 - 1.0
        x = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        taps = []
        for idx, _ in _CONV_PLAN:
            if idx in _POOL_BEFORE:
                x = _maxpool2(x)
            x = getattr(self, f"features_{idx}")(x)
            x = jax.nn.relu(x)
            if idx in _TAP_AFTER:
                taps.append(x)
        return taps

    def _lin(self, i: int) -> jax.Array:
        # richzhang clamps lin weights to ≥0 in eval.
        return jax.nn.relu(self.lin_weights[i])

    @staticmethod
    def _unit_normalize(f: jax.Array) -> jax.Array:
        return f * jax.lax.rsqrt(jnp.sum(jnp.square(f), -1, keepdims=True) + 1e-10)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.lpips_features(x)

    def lpips_features(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [0,255] → (B, D) with ‖f0−f1‖² = LPIPS."""
        out = []
        for i, f in enumerate(self._taps(x)):
            f = self._unit_normalize(f)
            h, w = f.shape[1], f.shape[2]
            f = f * jnp.sqrt(self._lin(i) / (h * w))
            out.append(f.reshape(f.shape[0], -1))
        return jnp.concatenate(out, axis=-1)

    def extract(self, x: jax.Array) -> List[jax.Array]:
        """Raw relu taps (for feature-matching losses)."""
        return self._taps(x)

    def lpips_distance(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Pairwise LPIPS between two [0,255] NHWC batches → (B,)."""
        tx, ty = self._taps(x), self._taps(y)
        d = 0.0
        for i, (fx, fy) in enumerate(zip(tx, ty)):
            diff = jnp.square(self._unit_normalize(fx) - self._unit_normalize(fy))
            d = d + jnp.mean(jnp.sum(diff * self._lin(i), axis=-1), axis=(1, 2))
        return d


# --------------------------------------------------------------------------
# Weight conversion


def load_torchvision_vgg16(state_dict: Dict) -> Dict:
    """torchvision ``vgg16`` state dict (numpy values) → Flax params.

    ``features.{i}.weight`` (OIHW) → ``features_{i}/kernel`` (HWIO); the
    classifier is dropped (LPIPS never runs it). ``lin_*`` stay at ones
    unless merged from a LPIPS checkpoint via ``load_lpips_linear``.
    """
    params = {}
    for (idx, ch) in _CONV_PLAN:
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        assert w.shape[0] == ch, (idx, w.shape)
        params[f"features_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    for i, ch in enumerate(_TAP_CHANNELS):
        params[f"lin_{i}"] = jnp.ones((ch,), jnp.float32)
    return {"params": params}


def load_lpips_linear(state_dict: Dict, params: Dict) -> Dict:
    """Merge richzhang LPIPS ``lin{i}.model.1.weight`` (1,C,1,1) channel
    weights into converted VGG params."""
    params = jax.tree.map(lambda a: a, params)  # shallow copy
    for i, ch in enumerate(_TAP_CHANNELS):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"lin{i}.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key]).reshape(-1)
                assert w.shape[0] == ch, (key, w.shape)
                params["params"][f"lin_{i}"] = jnp.asarray(w)
                break
    return params


def _convert_by_shape(named_tensors) -> Dict:
    """Fallback for opaque checkpoints (NVIDIA's ``vgg16.pt`` torchscript):
    match the 13 trunk convs by their unique (O,I,3,3) shape sequence and the
    five LPIPS lin convs by (1,C,1,1)."""
    convs = [(k, v) for k, v in named_tensors if v.ndim == 4 and v.shape[2:] == (3, 3)]
    lins = [(k, v) for k, v in named_tensors
            if v.ndim == 4 and v.shape[0] == 1 and v.shape[2:] == (1, 1)]
    biases = {k: v for k, v in named_tensors if v.ndim == 1}

    params = {}
    want = [(o, ch) for (o, ch) in _CONV_PLAN]
    prev_ch = 3
    ci = 0
    for (idx, ch) in want:
        while ci < len(convs) and convs[ci][1].shape[:2] != (ch, prev_ch):
            ci += 1
        if ci >= len(convs):
            raise ValueError(f"no conv with shape ({ch},{prev_ch},3,3) for "
                             f"features_{idx}")
        name, w = convs[ci]
        ci += 1
        bias_key = name.rsplit(".", 1)[0] + ".bias"
        b = biases.get(bias_key)
        if b is None or b.shape[0] != ch:
            b = np.zeros((ch,), np.float32)
        params[f"features_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0))),
            "bias": jnp.asarray(np.asarray(b)),
        }
        prev_ch = ch
    li = 0
    for i, ch in enumerate(_TAP_CHANNELS):
        w = None
        for j in range(li, len(lins)):
            if lins[j][1].shape[1] == ch:
                w = np.asarray(lins[j][1]).reshape(-1)
                li = j + 1
                break
        params[f"lin_{i}"] = (jnp.asarray(w) if w is not None
                              else jnp.ones((ch,), jnp.float32))
    return {"params": params}


def load_vgg16_file(path: str) -> Dict:
    """Dispatch on checkpoint flavor: torchscript (NVIDIA ``vgg16.pt``),
    torchvision state dict, or richzhang LPIPS checkpoint."""
    import torch

    try:
        mod = torch.jit.load(path, map_location="cpu")
        named = [(k, v.detach().numpy()) for k, v in mod.state_dict().items()]
        return _convert_by_shape(named)
    except Exception:
        pass
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    if any(k.startswith("features.") for k in sd):
        return load_torchvision_vgg16(sd)
    if any("lin" in k for k in sd) and any(".slice" in k or "net." in k for k in sd):
        # richzhang lpips checkpoint: net.slice{n}.{i}.weight carries the
        # trunk (torchvision indices preserved inside each slice).
        trunk = {}
        for k, v in sd.items():
            if ".slice" not in k:
                continue
            # net.sliceN.<idx>.weight — idx is the torchvision features index
            parts = k.split(".")
            trunk[f"features.{parts[-2]}.{parts[-1]}"] = v
        params = load_torchvision_vgg16(trunk)
        return load_lpips_linear(sd, params)
    return _convert_by_shape(list(sd.items()))


class LPIPSEvaluator:
    """Jitted LPIPS feature extractor / distance, weights env-gated.

    ``weights_path`` (or ``$ICGAN_VGG16_WEIGHTS``) may point to any of the
    supported checkpoint flavors; without one the trunk runs with jitted
    random init (documented substitute — self-consistent ranks only).
    Images: NHWC in **[-1, 1]** (converted to the net's 255 range here, the
    same dynamic-range hop the reference does at
    ``perceptual_path_length.py:107``).
    """

    def __init__(self, weights_path: Optional[str] = None):
        weights_path = weights_path or os.environ.get("ICGAN_VGG16_WEIGHTS")
        self.net = VGG16()
        if weights_path and os.path.exists(weights_path):
            self.variables = load_vgg16_file(weights_path)
            self.pretrained = True
        else:
            self.variables = jax.jit(
                lambda: self.net.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))
            )()
            self.pretrained = False
        self._feat = jax.jit(
            lambda v, x: self.net.apply(v, x, method=self.net.lpips_features))
        self._dist = jax.jit(
            lambda v, x, y: self.net.apply(v, x, y,
                                           method=self.net.lpips_distance))

    def features(self, images: jax.Array) -> jax.Array:
        return self._feat(self.variables, (images + 1.0) * 127.5)

    def distance(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return self._dist(self.variables, (a + 1.0) * 127.5, (b + 1.0) * 127.5)

    def __call__(self, images: jax.Array) -> jax.Array:
        return self.features(images)
