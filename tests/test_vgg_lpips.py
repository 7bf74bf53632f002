"""VGG16-LPIPS parity vs a torch oracle of the Zhang et al. formulation.

The reference scores PPL / projection with NVIDIA's ``vgg16.pt`` (VGG16 trunk
+ LPIPS head; ``perceptual_path_length.py:112-116``, ``projector.py:68-76``).
No weight file exists offline, so the oracle here is the *formula*: a
manually-built torch VGG16 with random weights running the published LPIPS
math, against which the Flax net + converters must agree numerically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ic_gan_tpu.models.vgg import (  # noqa: E402
    _CONV_PLAN, _POOL_BEFORE, _TAP_AFTER, _TAP_CHANNELS,
    VGG16, _convert_by_shape, load_lpips_linear, load_torchvision_vgg16,
)


def _random_torchvision_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    prev = 3
    for idx, ch in _CONV_PLAN:
        sd[f"features.{idx}.weight"] = rng.randn(ch, prev, 3, 3).astype(np.float32) * 0.1
        sd[f"features.{idx}.bias"] = rng.randn(ch).astype(np.float32) * 0.1
        prev = ch
    return sd


def _torch_lpips(sd, x255, y255, lin=None):
    """Oracle: richzhang LPIPS distance on [0,255] NCHW inputs."""

    def taps(x):
        x = x / 127.5 - 1.0
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        x = (x - shift) / scale
        out = []
        for idx, _ in _CONV_PLAN:
            if idx in _POOL_BEFORE:
                x = F.max_pool2d(x, 2, 2)
            w = torch.from_numpy(sd[f"features.{idx}.weight"])
            b = torch.from_numpy(sd[f"features.{idx}.bias"])
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if idx in _TAP_AFTER:
                out.append(x)
        return out

    def unit(f):
        return f / torch.sqrt((f ** 2).sum(1, keepdim=True) + 1e-10)

    d = 0.0
    for i, (fx, fy) in enumerate(zip(taps(x255), taps(y255))):
        diff = (unit(fx) - unit(fy)) ** 2
        w = torch.ones(fx.shape[1]) if lin is None else torch.from_numpy(lin[i])
        d = d + (diff * w.view(1, -1, 1, 1)).sum(1).mean((1, 2))
    return d.numpy()


def test_lpips_distance_matches_torch_oracle():
    sd = _random_torchvision_sd()
    variables = load_torchvision_vgg16(sd)
    net = VGG16()

    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 255
    y = rng.rand(2, 32, 32, 3).astype(np.float32) * 255

    got = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(y),
                               method=net.lpips_distance))
    want = _torch_lpips(sd, torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(y).permute(0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_lpips_features_square_to_distance():
    """return_lpips contract: sum((f0-f1)²) == lpips_distance (how the
    reference differentiates PPL, ``perceptual_path_length.py:112-116``)."""
    sd = _random_torchvision_sd(2)
    variables = load_torchvision_vgg16(sd)
    # Non-trivial lin weights exercise the √lin folding.
    lins = [np.abs(np.random.RandomState(3 + i).randn(c)).astype(np.float32)
            for i, c in enumerate(_TAP_CHANNELS)]
    lpips_sd = {f"lin{i}.model.1.weight": w.reshape(1, -1, 1, 1)
                for i, w in enumerate(lins)}
    variables = load_lpips_linear(lpips_sd, variables)
    net = VGG16()

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 255)
    y = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 255)

    fx = net.apply(variables, x, method=net.lpips_features)
    fy = net.apply(variables, y, method=net.lpips_features)
    via_feats = np.asarray(jnp.sum(jnp.square(fx - fy), axis=-1))
    direct = np.asarray(net.apply(variables, x, y, method=net.lpips_distance))
    np.testing.assert_allclose(via_feats, direct, rtol=2e-4, atol=2e-6)

    # And both equal the torch oracle with the same lin weights.
    want = _torch_lpips(
        sd,
        torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2),
        torch.from_numpy(np.asarray(y)).permute(0, 3, 1, 2),
        lin=lins,
    )
    np.testing.assert_allclose(direct, want, rtol=2e-4, atol=2e-5)


def test_convert_by_shape_matches_torchvision_convert():
    """The opaque-checkpoint fallback (NVIDIA torchscript) recovers the same
    params as the name-based torchvision mapping."""
    sd = _random_torchvision_sd(5)
    named = [(k, v) for k, v in sd.items()]
    # Add NVIDIA-style lin convs (1,C,1,1) after the trunk.
    lins = [np.abs(np.random.RandomState(6 + i).randn(1, c, 1, 1)).astype(np.float32)
            for i, c in enumerate(_TAP_CHANNELS)]
    named += [(f"lpips.lin{i}.weight", w) for i, w in enumerate(lins)]

    got = _convert_by_shape(named)
    want = load_torchvision_vgg16(sd)
    for idx, _ in _CONV_PLAN:
        np.testing.assert_array_equal(
            got["params"][f"features_{idx}"]["kernel"],
            want["params"][f"features_{idx}"]["kernel"])
        np.testing.assert_array_equal(
            got["params"][f"features_{idx}"]["bias"],
            want["params"][f"features_{idx}"]["bias"])
    for i, w in enumerate(lins):
        np.testing.assert_array_equal(got["params"][f"lin_{i}"], w.reshape(-1))


def test_ppl_with_lpips_feature_fn():
    """ppl_w runs end-to-end with an LPIPS feature_fn (random weights)."""
    from ic_gan_tpu.eval.metrics import ppl_w
    from ic_gan_tpu.models.vgg import LPIPSEvaluator

    ev = LPIPSEvaluator()  # no weights file in this environment
    assert not ev.pretrained

    def g_synthesize(w):
        # toy "generator": map w (B, num_ws, 8) to a 16×16 image
        img = jnp.tanh(w[:, 0, :3])[:, None, None, :]
        return jnp.broadcast_to(img, (w.shape[0], 16, 16, 3))

    val = ppl_w(g_synthesize, lambda z: z[:, None, :], z_dim=8, num_samples=32,
                batch=16, feature_fn=ev.features, space="w")
    assert np.isfinite(val) and val >= 0
