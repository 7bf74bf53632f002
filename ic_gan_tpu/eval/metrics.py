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


def ppl_w(
    g_synthesize: Callable,
    map_ws: Callable,
    z_dim: int,
    num_samples: int = 1000,
    epsilon: float = 1e-4,
    batch: int = 16,
    feature_fn: Optional[Callable] = None,
    cond_sampler: Optional[Callable] = None,
    seed: int = 0,
    space: str = "w",
) -> float:
    """Perceptual path length in W (or Z) space.

    The reference uses LPIPS distances (``perceptual_path_length.py:40-92``);
    with no pretrained VGG available we default to pixel-space distance scaled
    like the reference's crop path, or a caller-provided ``feature_fn``.
    Endpoints: lerp in W (slerp in Z), step ``epsilon``; result is the
    filtered mean of squared distances / ε².
    """
    dists = []
    rng = jax.random.PRNGKey(seed)
    done = 0
    while done < num_samples:
        b = min(batch, num_samples - done)
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        z0 = jax.random.normal(k1, (b, z_dim))
        z1 = jax.random.normal(k2, (b, z_dim))
        cond = cond_sampler(b) if cond_sampler is not None else {}
        t = jax.random.uniform(k3, (b, 1))
        if space == "w":
            w0 = map_ws(z0, **cond)
            w1 = map_ws(z1, **cond)
            wt0 = w0 + (w1 - w0) * t[..., None]
            wt1 = w0 + (w1 - w0) * (t[..., None] + epsilon)
            img0 = g_synthesize(wt0)
            img1 = g_synthesize(wt1)
        else:
            zt0 = slerp(z0, z1, t)
            zt1 = slerp(z0, z1, t + epsilon)
            img0 = g_synthesize(map_ws(zt0, **cond))
            img1 = g_synthesize(map_ws(zt1, **cond))
        if feature_fn is not None:
            f0, f1 = feature_fn(img0), feature_fn(img1)
        else:
            f0 = img0.reshape(b, -1)
            f1 = img1.reshape(b, -1)
        d = jnp.sum(jnp.square(f0 - f1), axis=-1) / (epsilon ** 2)
        dists.append(np.asarray(d))
        done += b
    dist = np.concatenate(dists)
    # Reject outliers beyond the 1st/99th percentile (ref :104-108).
    lo, hi = np.percentile(dist, [1, 99])
    keep = dist[(dist >= lo) & (dist <= hi)]
    return float(keep.mean())


# --- registry entries (ref metric_main.py:85-…) -----------------------------


@register_metric
def fid50k_full(sample_fn=None, evaluator=None, ref_mu=None, ref_sigma=None,
                num_images: int = 50000, **kw):
    from ic_gan_tpu.eval.pipeline import evaluate_generator

    out = evaluate_generator(sample_fn, evaluator, ref_mu, ref_sigma,
                             num_images=num_images, **kw)
    return {"fid50k_full": out["FID"]}


@register_metric
def kid50k_full(sample_fn=None, evaluator=None, real_features=None,
                num_images: int = 50000, batch: int = 64, **kw):
    pools = []
    remaining = num_images
    while remaining > 0:
        b = min(batch, remaining)
        imgs, _ = sample_fn(b)
        p, _ = evaluator(jnp.asarray(imgs))
        pools.append(p)
        remaining -= b
    fake = np.concatenate(pools)
    return {"kid50k_full": kid_from_features(real_features, fake, **kw)}


@register_metric
def is50k(sample_fn=None, evaluator=None, num_images: int = 50000,
          batch: int = 64, **kw):
    from ic_gan_tpu.eval.fid import inception_score

    logits = []
    remaining = num_images
    while remaining > 0:
        b = min(batch, remaining)
        imgs, _ = sample_fn(b)
        _, l = evaluator(jnp.asarray(imgs))
        logits.append(l)
        remaining -= b
    m, s = inception_score(np.concatenate(logits))
    return {"is50k_mean": m, "is50k_std": s}


@register_metric
def pr50k3(sample_fn=None, evaluator=None, real_features=None,
           num_images: int = 50000, batch: int = 64, nearest_k: int = 3, **kw):
    from ic_gan_tpu.eval.prdc import compute_prdc

    pools = []
    remaining = num_images
    while remaining > 0:
        b = min(batch, remaining)
        imgs, _ = sample_fn(b)
        p, _ = evaluator(jnp.asarray(imgs))
        pools.append(p)
        remaining -= b
    fake = np.concatenate(pools)
    n = min(len(real_features), len(fake))
    out = compute_prdc(real_features[:n], fake[:n], nearest_k)
    return {"pr50k3_precision": out["precision"], "pr50k3_recall": out["recall"]}


@register_metric
def ppl2_wend(g_synthesize=None, map_ws=None, z_dim=None, **kw):
    return {"ppl2_wend": ppl_w(g_synthesize, map_ws, z_dim, **kw)}
