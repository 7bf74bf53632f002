"""Metric registry: FID / KID / IS / PR / PPL — the StyleGAN2 metric suite.

Reference: ``stylegan2_ada_pytorch/metrics/*`` — registry via
``@register_metric`` (``metric_main.py:30-41``), kernel inception distance
(``kernel_inception_distance.py``), perceptual path length
(``perceptual_path_length.py``), precision/recall (``precision_recall.py``).

All distance math runs on device as matmuls; feature extraction goes through
``eval.pipeline.InceptionEvaluator``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

_METRICS: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    _METRICS[fn.__name__] = fn
    return fn


def is_valid_metric(name: str) -> bool:
    return name in _METRICS


def list_metrics():
    return list(_METRICS)


def calc_metric(metric: str, **kwargs) -> Dict[str, float]:
    """(ref ``metric_main.py:44-76``)."""
    assert is_valid_metric(metric), f"unknown metric {metric}"
    return _METRICS[metric](**kwargs)


# --- KID ---------------------------------------------------------------------


def kid_from_features(
    real: np.ndarray, fake: np.ndarray, num_subsets: int = 100,
    max_subset_size: int = 1000, seed: int = 0,
) -> float:
    """Kernel inception distance with the reference's polynomial kernel and
    subset averaging (``kernel_inception_distance.py:25-46``)."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    n = real.shape[1]
    m = min(min(real.shape[0], fake.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = fake[rng.choice(fake.shape[0], m, replace=False)]
        y = real[rng.choice(real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


# --- PPL ---------------------------------------------------------------------


def make_lpips_feature_fn(weights_path: Optional[str] = None) -> Callable:
    """LPIPS ``feature_fn`` for ``ppl_w`` / the projector.

    Returns a function mapping [-1,1] NHWC images to LPIPS feature vectors
    (squared L2 difference = LPIPS distance — the contract the reference's
    ``vgg16(..., return_lpips=True)`` provides,
    ``perceptual_path_length.py:112-116``). Weights env-gated via
    ``$ICGAN_VGG16_WEIGHTS`` (``models/vgg.py``)."""
    from ic_gan_tpu.models.vgg import LPIPSEvaluator

    ev = LPIPSEvaluator(weights_path)
    return ev.features


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation (ref ``perceptual_path_length.py:25-35``)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1, 1))
    c = b_n - d * a_n
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    return (a_n * jnp.cos(p) + c * jnp.sin(p)) * jnp.linalg.norm(
        a, axis=-1, keepdims=True
    )


def _ppl_prepare_images(img: jax.Array, crop: bool) -> jax.Array:
    """The reference's pre-LPIPS image conditioning
    (``perceptual_path_length.py:88-107``): optional center crop (rows
    ``3c:7c``, cols ``2c:6c`` with ``c = H//8``), mean-pool downsample,
    grayscale→RGB.  NHWC in [-1, 1] (the [0,255] dynamic-range hop
    happens inside ``LPIPSEvaluator``).

    The downsample factor is ``G.img_resolution // 256`` — the FULL generator
    resolution even after cropping shrank the image
    (``perceptual_path_length.py:92-104``): a cropped 512² image (→ 256²)
    still pools by 2 to 128²."""
    assert img.shape[1] == img.shape[2], img.shape
    g_resolution = img.shape[1]  # pre-crop = generator resolution
    if crop:
        c = img.shape[1] // 8
        img = img[:, c * 3 : c * 7, c * 2 : c * 6, :]
    factor = g_resolution // 256
    if factor > 1:
        b, h, w, ch = img.shape
        img = img.reshape(b, h // factor, factor, w // factor, factor, ch)
        img = img.mean(axis=(2, 4))
    if img.shape[-1] == 1:
        img = jnp.repeat(img, 3, axis=-1)
    return img


_warned_pixel_ppl = False


def compute_ppl(
    g_synthesize: Callable,
    map_ws: Callable,
    z_dim: int,
    num_samples: int = 1000,
    epsilon: float = 1e-4,
    space: str = "w",
    sampling: str = "end",
    crop: bool = False,
    batch: int = 16,
    feature_fn: Optional[Callable] = None,
    cond_sampler: Optional[Callable] = None,
    seed: int = 0,
) -> Dict[str, object]:
    """Perceptual path length (ref ``perceptual_path_length.py:40-170``).

    - ``space="w"``: map both endpoints, lerp in W; ``space="z"``: slerp in Z
      then map (``PPLSampler.forward``, ``:60-72``).
    - ``sampling="full"``: t ~ U(0, 1); ``"end"``: t = 0 (``:56-58``).
    - ``crop``: center crop rows 3c:7c / cols 2c:6c, c = H//8 (``:88-92``),
      then mean-pool to 256² (``:94-105``).
    - Result: mean of squared feature distances / ε² with the 1st/99th
      percentile tails rejected using the reference's lower/higher
      interpolation (``:166-170``).

    Distance features come from ``feature_fn`` (LPIPS when VGG16 weights are
    available).  Without one, squared **pixel**-space distance substitutes —
    NOT a perceptual metric; the returned ``"ppl_distance"`` field says which
    was used and a one-time warning fires (VERDICT r3 #9).

    ``g_synthesize(ws)`` may optionally accept ``rng=`` — when it does, a
    fresh key is passed per batch so the caller can re-randomize noise
    constants the way the reference re-draws ``.noise_const`` buffers every
    forward (``:75-78``).
    """
    assert space in ("z", "w"), space
    assert sampling in ("full", "end"), sampling
    import inspect

    try:
        synth_takes_rng = "rng" in inspect.signature(g_synthesize).parameters
    except (TypeError, ValueError):
        synth_takes_rng = False

    global _warned_pixel_ppl
    if feature_fn is None and not _warned_pixel_ppl:
        import warnings

        warnings.warn(
            "PPL without LPIPS weights ($ICGAN_VGG16_WEIGHTS): falling back "
            "to pixel-space distance — self-consistent but not a perceptual "
            "path length in the reference's sense.",
            stacklevel=2,
        )
        _warned_pixel_ppl = True

    dists = []
    rng = jax.random.PRNGKey(seed)
    done = 0
    while done < num_samples:
        b = min(batch, num_samples - done)
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        z0 = jax.random.normal(k1, (b, z_dim))
        z1 = jax.random.normal(k2, (b, z_dim))
        cond = cond_sampler(b) if cond_sampler is not None else {}
        if sampling == "full":
            t = jax.random.uniform(k3, (b, 1))
        else:
            t = jnp.zeros((b, 1))
        synth_kw = {"rng": k4} if synth_takes_rng else {}
        if space == "w":
            w0 = map_ws(z0, **cond)
            w1 = map_ws(z1, **cond)
            wt0 = w0 + (w1 - w0) * t[..., None]
            wt1 = w0 + (w1 - w0) * (t[..., None] + epsilon)
            img0 = g_synthesize(wt0, **synth_kw)
            img1 = g_synthesize(wt1, **synth_kw)
        else:
            zt0 = slerp(z0, z1, t)
            zt1 = slerp(z0, z1, t + epsilon)
            img0 = g_synthesize(map_ws(zt0, **cond), **synth_kw)
            img1 = g_synthesize(map_ws(zt1, **cond), **synth_kw)
        img0 = _ppl_prepare_images(img0, crop)
        img1 = _ppl_prepare_images(img1, crop)
        if feature_fn is not None:
            f0, f1 = feature_fn(img0), feature_fn(img1)
        else:
            f0 = img0.reshape(b, -1)
            f1 = img1.reshape(b, -1)
        d = jnp.sum(jnp.square(f0 - f1), axis=-1) / (epsilon ** 2)
        dists.append(np.asarray(d))
        done += b
    dist = np.concatenate(dists)
    # Reject tails with the reference's asymmetric interpolation (:166-170).
    lo = np.percentile(dist, 1, method="lower")
    hi = np.percentile(dist, 99, method="higher")
    keep = dist[(dist >= lo) & (dist <= hi)]
    return {
        "ppl": float(keep.mean()),
        "ppl_distance": "lpips" if feature_fn is not None else "pixel",
    }


def ppl_w(g_synthesize, map_ws, z_dim, sampling: str = "full", **kw) -> float:
    """Back-compat scalar wrapper over :func:`compute_ppl` (historic callers
    drew t ~ U(0,1), i.e. ``sampling="full"``)."""
    return compute_ppl(g_synthesize, map_ws, z_dim, sampling=sampling,
                       **kw)["ppl"]


# --- registry entries (ref metric_main.py:98-241) ---------------------------
#
# All 12 of the reference's registered metrics.  Primary (``:98-151``):
# fid50k_full, kid50k_full, pr50k3_full, ppl2_wend, is50k.  Legacy
# (``:155-241``): fid50k, kid50k, pr50k3, ppl_{z,w}{full,end}.  Each entry's
# ``max_real`` attribute mirrors the reference's real-side sample cap so the
# CLI can request the right number of cached real features (``None`` = the
# whole dataset / precomputed moments).


def _fake_pools(sample_fn, evaluator, num_images: int, batch: int) -> np.ndarray:
    """Generator-side Inception pool features for the feature-set metrics."""
    pools = []
    remaining = num_images
    while remaining > 0:
        b = min(batch, remaining)
        imgs, _ = sample_fn(b)
        p, _ = evaluator(jnp.asarray(imgs))
        pools.append(np.asarray(p))
        remaining -= b
    return np.concatenate(pools)


def _pr_entry(prefix, sample_fn, evaluator, real_features, num_images, batch,
              nearest_k):
    from ic_gan_tpu.eval.prdc import compute_prdc

    fake = _fake_pools(sample_fn, evaluator, num_images, batch)
    n = min(len(real_features), len(fake))
    out = compute_prdc(real_features[:n], fake[:n], nearest_k)
    return {f"{prefix}_precision": out["precision"],
            f"{prefix}_recall": out["recall"]}


def _ppl_entry(name, sampling, space, crop, g_synthesize, map_ws, z_dim, kw):
    out = compute_ppl(g_synthesize, map_ws, z_dim, sampling=sampling,
                      space=space, crop=crop, **kw)
    return {name: out["ppl"], "ppl_distance": out["ppl_distance"]}


@register_metric
def fid50k_full(sample_fn=None, evaluator=None, ref_mu=None, ref_sigma=None,
                num_images: int = 50000, **kw):
    """FID vs full-dataset precomputed moments (ref ``metric_main.py:98-104``:
    ``max_real=None``)."""
    from ic_gan_tpu.eval.pipeline import evaluate_generator

    out = evaluate_generator(sample_fn, evaluator, ref_mu, ref_sigma,
                             num_images=num_images, **kw)
    return {"fid50k_full": out["FID"]}


@register_metric
def fid50k(sample_fn=None, evaluator=None, real_features=None,
           num_images: int = 50000, batch: int = 64, **kw):
    """Legacy FID: real moments from ≤50k real features (ref
    ``metric_main.py:158-162``: ``max_real=50000``)."""
    from ic_gan_tpu.eval.fid import frechet_distance

    real = np.asarray(real_features[:50000], np.float64)
    fake = np.asarray(_fake_pools(sample_fn, evaluator, num_images, batch),
                      np.float64)
    fid = frechet_distance(
        fake.mean(0), np.cov(fake, rowvar=False),
        real.mean(0), np.cov(real, rowvar=False))
    return {"fid50k": fid}


@register_metric
def kid50k_full(sample_fn=None, evaluator=None, real_features=None,
                num_images: int = 50000, batch: int = 64, **kw):
    """(ref ``metric_main.py:107-112``: ``max_real=1000000``)."""
    fake = _fake_pools(sample_fn, evaluator, num_images, batch)
    return {"kid50k_full": kid_from_features(real_features, fake, **kw)}


@register_metric
def kid50k(sample_fn=None, evaluator=None, real_features=None,
           num_images: int = 50000, batch: int = 64, **kw):
    """(ref ``metric_main.py:165-170``: ``max_real=50000``)."""
    fake = _fake_pools(sample_fn, evaluator, num_images, batch)
    return {"kid50k": kid_from_features(real_features[:50000], fake, **kw)}


@register_metric
def is50k(sample_fn=None, evaluator=None, num_images: int = 50000,
          batch: int = 64, **kw):
    """(ref ``metric_main.py:144-148``)."""
    from ic_gan_tpu.eval.fid import inception_score

    logits = []
    remaining = num_images
    while remaining > 0:
        b = min(batch, remaining)
        imgs, _ = sample_fn(b)
        _, l = evaluator(jnp.asarray(imgs))
        logits.append(np.asarray(l))
        remaining -= b
    m, s = inception_score(np.concatenate(logits))
    return {"is50k_mean": m, "is50k_std": s}


@register_metric
def pr50k3(sample_fn=None, evaluator=None, real_features=None,
           num_images: int = 50000, batch: int = 64, nearest_k: int = 3, **kw):
    """(ref ``metric_main.py:173-184``: ``max_real=50000``, nhood 3)."""
    return _pr_entry("pr50k3", sample_fn, evaluator, real_features[:50000],
                     num_images, batch, nearest_k)


@register_metric
def pr50k3_full(sample_fn=None, evaluator=None, real_features=None,
                num_images: int = 50000, batch: int = 64, nearest_k: int = 3,
                **kw):
    """(ref ``metric_main.py:115-126``: ``max_real=200000``, nhood 3)."""
    return _pr_entry("pr50k3_full", sample_fn, evaluator, real_features,
                     num_images, batch, nearest_k)


@register_metric
def ppl2_wend(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    """(ref ``metric_main.py:129-141``: w space, end sampling, no crop)."""
    return _ppl_entry("ppl2_wend", "end", "w", False,
                      g_synthesize, map_ws, z_dim, kw)


@register_metric
def ppl_zfull(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    """(ref ``metric_main.py:187-199``: z space, full sampling, crop)."""
    return _ppl_entry("ppl_zfull", "full", "z", True,
                      g_synthesize, map_ws, z_dim, kw)


@register_metric
def ppl_wfull(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    """(ref ``metric_main.py:202-214``: w space, full sampling, crop)."""
    return _ppl_entry("ppl_wfull", "full", "w", True,
                      g_synthesize, map_ws, z_dim, kw)


@register_metric
def ppl_zend(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    """(ref ``metric_main.py:217-229``: z space, end sampling, crop)."""
    return _ppl_entry("ppl_zend", "end", "z", True,
                      g_synthesize, map_ws, z_dim, kw)


@register_metric
def ppl_wend(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    """(ref ``metric_main.py:232-241``: w space, end sampling, crop)."""
    return _ppl_entry("ppl_wend", "end", "w", True,
                      g_synthesize, map_ws, z_dim, kw)


# Real-side sample caps from the reference registrations (None = full
# dataset / precomputed moments); consumed by ``cli.calc_metrics``.
for _name, _cap in {
    "fid50k_full": None, "kid50k_full": 1000000, "pr50k3_full": 200000,
    "ppl2_wend": 0, "is50k": 0, "fid50k": 50000, "kid50k": 50000,
    "pr50k3": 50000, "ppl_zfull": 0, "ppl_wfull": 0, "ppl_zend": 0,
    "ppl_wend": 0,
}.items():
    _METRICS[_name].max_real = _cap
