"""CLIP guidance stack: tokenizer, CMA-ES, crop-resize, guided search.

Reference behavior: ``inference/icgan_colab.ipynb`` (CLIP-guided cell) — the
notebook's tokenize/CMA/crop/loss semantics, validated with synthetic
vocabularies, analytic objectives, a torch resize oracle, and toy
generator/CLIP pairs (no pretrained weights exist offline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.tokenizer import SimpleTokenizer, bytes_to_unicode, tokenize
from ic_gan_tpu.utils.cma_es import CMAES
from ic_gan_tpu.cli.clip_guided import (
    clip_guided_search, crop_resize_bilinear, normality_loss, truncnorm_init,
)


# --- tokenizer --------------------------------------------------------------


def _toy_tokenizer():
    # merges chosen so "hello" → he + ll + o</w>, "low" → low</w>
    merges = [("h", "e"), ("l", "l"), ("l", "o</w>"), ("lo</w>", "w</w>"),
              ("l", "o"), ("lo", "w</w>")]
    return SimpleTokenizer(merges)


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256


def test_bpe_merges_apply_in_rank_order():
    tok = _toy_tokenizer()
    assert tok.bpe("hello") == "he ll o</w>"
    assert tok.bpe("low") == "low</w>"


def test_encode_decode_roundtrip():
    tok = _toy_tokenizer()
    ids = tok.encode("hello low")
    assert tok.decode(ids) == "hello low"


def test_tokenize_frames_and_pads():
    tok = _toy_tokenizer()
    arr = tokenize(["hello"], tok, context_length=8)
    assert arr.shape == (1, 8)
    assert arr[0, 0] == tok.sot
    row = list(arr[0])
    assert tok.eot in row
    assert row[row.index(tok.eot) + 1:] == [0] * (7 - row.index(tok.eot))
    # SOT/EOT are the two largest ids → argmax pooling finds EOT... unless
    # SOT is later-indexed; CLIP orders SOT before EOT, as here:
    assert tok.eot > tok.sot
    assert int(np.argmax(arr[0])) == row.index(tok.eot)


def test_tokenize_truncates_with_eot():
    tok = _toy_tokenizer()
    arr = tokenize("hello " * 50, tok, context_length=10)
    assert arr[0, -1] == tok.eot


# --- CMA-ES -----------------------------------------------------------------


def test_cmaes_sphere_converges():
    target = np.array([1.5, -2.0, 0.5, 3.0])
    es = CMAES(np.zeros(4), 1.0, popsize=16, seed=0)
    for _ in range(120):
        xs = es.ask()
        es.tell(xs, [float(np.sum((x - target) ** 2)) for x in xs])
    best, f = es.result
    assert f < 1e-4
    np.testing.assert_allclose(best, target, atol=0.05)


def test_cmaes_rosenbrock_improves():
    def rosen(x):
        return float(np.sum(100 * (x[1:] - x[:-1] ** 2) ** 2
                            + (1 - x[:-1]) ** 2))

    es = CMAES(np.full(5, -1.0), 0.5, popsize=20, seed=1)
    first = None
    for i in range(150):
        xs = es.ask()
        fs = [rosen(x) for x in xs]
        if first is None:
            first = min(fs)
        es.tell(xs, fs)
    assert es.best_f < first / 100


def test_cmaes_bounds_respected():
    es = CMAES(np.zeros(3), 2.0, popsize=8, seed=2, bounds=(-1.0, 1.0))
    xs = es.ask()
    assert np.all(xs >= -1.0) and np.all(xs <= 1.0)


# --- crop/resize ------------------------------------------------------------


def test_crop_resize_full_window_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(crop_resize_bilinear(
        jnp.asarray(x), 24, jnp.zeros((2, 2)), jnp.full((2,), 32.0)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), 24,
                         mode="bilinear").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_resize_subwindow_matches_slice():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    # integer window [4:20, 6:22] (size 16) → resize 8
    got = np.asarray(crop_resize_bilinear(
        jnp.asarray(x), 8, jnp.asarray([[4.0, 6.0]]), jnp.asarray([16.0])))
    want = F.interpolate(
        torch.from_numpy(x[:, 4:20, 6:22]).permute(0, 3, 1, 2), 8,
        mode="bilinear").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normality_loss_zero_at_standard_normal_stats():
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(100000).astype(np.float32))
    assert float(normality_loss(v)) < 1e-3
    assert float(normality_loss(v * 3 + 1)) > 1.0


def test_truncnorm_init_bounds():
    rng = np.random.RandomState(3)
    z = truncnorm_init(rng, (50, 8), 0.7)
    assert np.all(np.abs(z) <= 1.4)


# --- guided search ----------------------------------------------------------


def _toy_problem(seed=0):
    """Toy generator (z → constant-color 32×32 image) + toy 'CLIP' (mean
    color projected and normalized). Optimum: image color matching target."""
    rng = np.random.RandomState(seed)
    proj = jnp.asarray(rng.randn(3, 8).astype(np.float32))

    def generate(z):
        color = jnp.tanh(z[:, :3])
        return jnp.broadcast_to(color[:, None, None, :],
                                (z.shape[0], 32, 32, 3))

    def encode_image(x01):
        f = jnp.mean(x01, axis=(1, 2)) @ proj
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    target_color = jnp.asarray([[0.9, 0.1, 0.4]])
    text = (target_color @ proj)
    text = text / jnp.linalg.norm(text)
    return generate, encode_image, text


@pytest.mark.parametrize("optimizer", ["CMA-ES", "Adam"])
def test_guided_search_reduces_loss(optimizer):
    generate, encode_image, text = _toy_problem()
    out = clip_guided_search(
        generate, encode_image, text, z_dim=6, optimizer=optimizer,
        pop_size=12, iterations=25, terminal_iterations=0,
        augmentations=1, clip_res=16, learning_rate=0.05, seed=0,
        loss_factor=100.0)
    first = out["history"][0]["best"]
    assert out["best_loss"] < first * 0.5
    assert out["best_image"].shape == (32, 32, 3)


def test_guided_search_terminal_mode_runs():
    generate, encode_image, text = _toy_problem(1)
    out = clip_guided_search(
        generate, encode_image, text, z_dim=6,
        optimizer="CMA-ES + terminal Adam", pop_size=8, iterations=10,
        terminal_iterations=5, augmentations=1, clip_res=16,
        learning_rate=0.05, seed=1)
    assert len(out["history"]) == 15
    assert np.isfinite(out["best_loss"])


def test_guided_search_crop_augmentations():
    generate, encode_image, text = _toy_problem(2)
    out = clip_guided_search(
        generate, encode_image, text, z_dim=6, optimizer="CMA-ES",
        pop_size=6, iterations=4, terminal_iterations=0,
        augmentations=3, clip_res=16, seed=2)
    assert np.isfinite(out["best_loss"])


def test_cmaes_diagonal_mode_converges():
    target = np.array([0.5, -1.0, 2.0])
    es = CMAES(np.zeros(3), 1.0, popsize=12, seed=7, diagonal=True)
    for _ in range(100):
        xs = es.ask()
        es.tell(xs, [float(np.sum((x - target) ** 2)) for x in xs])
    assert es.best_f < 1e-3


def test_cmaes_no_sigma_adaptation_keeps_sigma():
    es = CMAES(np.zeros(3), 0.8, popsize=8, seed=8, adapt_sigma=False)
    for _ in range(5):
        xs = es.ask()
        es.tell(xs, [float(np.sum(x ** 2)) for x in xs])
    assert es.sigma == 0.8
