"""End-to-end eval pipeline: Inception activations → IS / FID / stratified-FID
/ PRDC.

Reference: ``data_utils/inception_utils.py:289-455`` (activation accumulation
+ ``prepare_inception_metrics`` closure) and
``data_utils/calculate_inception_moments.py`` (reference-moment precompute,
incl. ImageNet-LT many/low/few strata).

On-device design: activations stream through a jitted InceptionV3 in batches;
moments accumulate as (sum, outer) pairs (``eval.fid.FeatureMoments``); FID's
matrix sqrt runs as Newton-Schulz matmuls on the MXU.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.eval.fid import (
    FeatureMoments,
    frechet_distance,
    inception_score,
)
from ic_gan_tpu.eval.prdc import compute_prdc
from ic_gan_tpu.models.inception import InceptionV3, load_torch_inception


def moments_filename(resolution, which_dataset="imagenet", longtail=False,
                     split="train", test_part=False, strat=""):
    """``I64_inception_moments.npz`` convention
    (``calculate_inception_moments.py:170-192``)."""
    prefix = {"imagenet": "I", "imagenet_lt": "I", "coco": "COCO"}.get(
        which_dataset, which_dataset
    )
    if strat:
        return f"{prefix}{resolution}__val_{strat}_inception_moments.npz"
    return "%s%i%s%s%s_inception_moments.npz" % (
        prefix,
        resolution,
        "longtail" if longtail else "",
        "_val" if split == "val" else "",
        "_test" if test_part else "",
    )


class InceptionEvaluator:
    """Jitted InceptionV3 feature extractor.

    ``weights_path`` may point to a torchvision ``inception_v3`` checkpoint
    (``.pth``); without it the net runs with random weights — the pipeline
    stays runnable but FID values are only self-consistent, not comparable
    (this environment cannot download the torchvision weights).
    """

    def __init__(self, weights_path: Optional[str] = None, batch: int = 64,
                 mesh=None, deploy_bf16: bool = False):
        # deploy_bf16: compute the conv trunk in bfloat16 on the MXU (params
        # stay f32; BN folding and the pool/logits head stay f32 — see
        # models/inception.py).  ~1.8× the Inception pass on the v5e
        # (≈22 → 12 ms per 128 images at 256², i.e. +5% on the fused
        # generator→Inception loop where the generator dominates) for ~2%
        # relative pool-feature drift; drift measured in FID units by
        # benchmarks/bench_eval_fid.py (fid_between_modes).
        self.net = InceptionV3(
            dtype=jnp.bfloat16 if deploy_bf16 else jnp.float32)
        self.batch = batch
        if weights_path and os.path.exists(weights_path):
            import torch

            sd = torch.load(weights_path, map_location="cpu")
            sd = {k: v.numpy() for k, v in sd.items()}
            self.variables = load_torch_inception(sd)
            self.pretrained = True
        else:
            # Jitted init: un-jitted per-op dispatch of the full InceptionV3
            # initializer takes minutes on the relay TPU backend (CLAUDE.md).
            self.variables = jax.jit(
                lambda: self.net.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
                )
            )()
            self.pretrained = False
        # Pod-scale eval: replicate the net, shard image batches over the
        # mesh's "data" axis — the 50k FID pass then scales across chips.
        self._batch_sharding = None
        self._data_axis = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.variables = jax.device_put(
                self.variables, NamedSharding(mesh, P()))
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._data_axis = int(mesh.shape["data"])
        self._apply = jax.jit(self.net.apply)

    # evaluate_generator feature-detects this to keep features on device.
    supports_device_output = True

    def __call__(self, images: jax.Array, device_output: bool = False):
        """images: NHWC in [-1, 1] → (pool (N,2048), logits (N,1000)).

        ``device_output=True`` skips the host fetch — on the relay TPU each
        per-batch sync costs ~180 ms of round-trip latency and serializes
        the pipeline (measured 605 vs 5394 img/s through Inception)."""
        n = images.shape[0]
        if self._batch_sharding is not None:
            # Tail batches (e.g. 50000 % batch) need not divide the mesh's
            # data axis: pad with zero rows, shard, and drop the pad below.
            pad = (-n) % self._data_axis
            if pad:
                images = jnp.concatenate(
                    [jnp.asarray(images),
                     jnp.zeros((pad,) + tuple(images.shape[1:]),
                               jnp.asarray(images).dtype)])
            images = jax.device_put(jnp.asarray(images), self._batch_sharding)
        pool, logits = self._apply(self.variables, images)
        pool, logits = pool[:n], logits[:n]
        if device_output:
            return pool, logits
        return np.asarray(pool), np.asarray(logits)

    def accumulate(self, image_iter: Iterable) -> Tuple[np.ndarray, np.ndarray]:
        pools, logits = [], []
        for imgs in image_iter:
            p, l = self(jnp.asarray(imgs))
            pools.append(p)
            logits.append(l)
        return np.concatenate(pools), np.concatenate(logits)


def compute_dataset_moments(
    dataset,
    evaluator: InceptionEvaluator,
    batch: int = 64,
    max_items: Optional[int] = None,
    samples_per_class: Optional[np.ndarray] = None,
):
    """Reference moments over a dataset (``calculate_inception_moments.py``).

    Returns ``{"": (mu, sigma, IS)}`` plus ``"many"/"low"/"few"`` strata when
    ``samples_per_class`` is given (ImageNet-LT).
    """
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    pools, logits, labels = [], [], []
    for lo in range(0, n, batch):
        idxs = dataset.possible_sampling_idxs[lo : min(lo + batch, n)]
        imgs = dataset._norm(dataset._get_images(idxs))
        p, l = evaluator(jnp.asarray(imgs))
        pools.append(p)
        logits.append(l)
        labels.append(dataset.get_label(idxs))
    pool = np.concatenate(pools)
    logit = np.concatenate(logits)
    label = np.concatenate(labels)

    def stats(p, lg):
        mu, sigma = np.mean(p, axis=0), np.cov(p, rowvar=False)
        is_mean, is_std = inception_score(lg)
        return mu, sigma, (is_mean, is_std)

    out = {"": stats(pool, logit)}
    if samples_per_class is not None:
        spc = samples_per_class[label]
        out["many"] = stats(pool[spc >= 100], logit[spc >= 100])
        mid = (spc < 100) & (spc > 20)
        out["low"] = stats(pool[mid], logit[mid])
        out["few"] = stats(pool[spc <= 20], logit[spc <= 20])
    return out


def save_moments(out_path: str, name: str, mu, sigma):
    np.savez(os.path.join(out_path, name), mu=mu, sigma=sigma)


def cached_real_features(
    dataset,
    evaluator: InceptionEvaluator,
    cache_dir: str,
    n_items: int,
    batch: int = 64,
) -> np.ndarray:
    """Real-side Inception pool features, cached to disk keyed by the
    dataset identity (ref ``metric_utils.py:245-268``: md5-keyed cache with
    an atomic ``os.replace`` write).  A 10-50k-image real pass costs minutes
    on the relay TPU backend — recomputing it per eval is waste.
    """
    import hashlib

    idxs_all = np.asarray(dataset.possible_sampling_idxs)
    n = min(n_items, len(idxs_all))
    key_src = repr((
        getattr(dataset, "root", ""),
        getattr(dataset, "root_feats", ""),
        n,
        int(idxs_all[:n].sum()),
        hashlib.md5(idxs_all[:n].tobytes()).hexdigest(),
        evaluator.pretrained,
        # Compute dtype is part of the feature identity: eval_bf16 shifts
        # pool features ~2% relative — silently mixing a bf16 real-side
        # cache with f32 fake features (or vice versa) would leak that
        # drift into FID/KID/PR with no warning.
        str(jnp.dtype(evaluator.net.dtype).name)
        if hasattr(evaluator, "net") else "f32",
    )).encode()
    tag = hashlib.md5(key_src).hexdigest()[:16]
    path = os.path.join(cache_dir, f"real-pool-{tag}.npz")
    if os.path.exists(path):
        return np.load(path)["pool"]
    pools = []
    for lo in range(0, n, batch):
        idxs = idxs_all[lo : min(lo + batch, n)]
        imgs = dataset._norm(dataset._get_images(idxs))
        p, _ = evaluator(jnp.asarray(imgs))
        pools.append(p)
    pool = np.concatenate(pools)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, pool=pool)
    os.replace(tmp, path)
    return pool


def make_fused_feature_fn(sampler, evaluator: InceptionEvaluator,
                          batch: Optional[int] = None) -> Callable:
    """Fuse the deployment sampler's generator forward with the Inception
    forward into ONE jitted executable.

    ``sampler`` must come from ``io.deploy.make_sampler`` (it exposes
    ``module`` / ``prepared_variables`` / ``apply_kwargs``).  Returns
    ``feature_fn(z, label=None, feats=None) -> (pool, logits)`` with
    device-resident outputs.

    Why: the eval loop's two-dispatch form (sample → Inception) pays an
    extra executable launch per batch on the relay backend; fused, the
    10k-image feature loop runs at the compiled op-sum ceiling —
    measured ~995 img/s vs ~722 split (benchmarks/results/eval_fid.json),
    i.e. the generator's own 1137 img/s roofline share plus Inception's
    bf16 ~12 ms/128, with zero loop overhead left.
    """
    g = sampler.module
    gv = sampler.prepared_variables
    apply_kwargs = sampler.apply_kwargs
    inet, iv = evaluator.net, evaluator.variables
    bs = batch or sampler.batch_size

    @jax.jit
    def fwd(gv, iv, z, label, feats):
        imgs = g.apply(gv, z, label, feats, train=False, **apply_kwargs)
        return inet.apply(iv, imgs)

    def _pad(a, pad):
        if a is None or pad == 0:
            return a
        return jnp.concatenate([jnp.asarray(a), jnp.asarray(a)[:1].repeat(
            pad, axis=0)])

    def feature_fn(z, label=None, feats=None):
        z = jnp.asarray(z)
        n = z.shape[0]
        chunk = bs or n
        outs = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            pad = chunk - (hi - lo)
            pool, logits = fwd(
                gv, iv, _pad(z[lo:hi], pad),
                None if label is None else _pad(label[lo:hi], pad),
                None if feats is None else _pad(feats[lo:hi], pad),
            )
            outs.append((pool[: hi - lo], logits[: hi - lo]))
        if len(outs) == 1:
            return outs[0]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    return feature_fn


def evaluate_generator(
    sample_fn: Callable[[int], Tuple[np.ndarray, Optional[np.ndarray]]],
    evaluator: InceptionEvaluator,
    ref_mu: np.ndarray,
    ref_sigma: np.ndarray,
    num_images: int = 50000,
    batch: int = 64,
    num_splits: int = 10,
    prdc_ref_features: Optional[np.ndarray] = None,
    prdc_nearest_k: int = 5,
    stratified: Optional[Dict] = None,
    samples_per_class: Optional[np.ndarray] = None,
    feature_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Full quantitative eval (ref ``inception_utils.py:342-455`` +
    ``compute_pdrc.py``): IS over 10 splits, FID vs reference moments,
    optional PRDC and stratified FID.

    ``sample_fn(batch) -> (images NHWC [-1,1], labels or None)``.
    ``feature_fn(batch) -> (pool, logits, labels)`` (see
    ``make_fused_feature_fn`` / ``cli.inference.make_conditioned_feature_fn``)
    replaces the sample→Inception pair with one fused executable; when given,
    ``sample_fn`` is unused and ``evaluator`` only provides the device-output
    capability flag.
    """
    keep_pools = prdc_ref_features is not None or stratified is not None
    device = bool(getattr(evaluator, "supports_device_output", False))
    logits_all, labels_all, pools_all = [], [], []

    def next_batch(b):
        if feature_fn is not None:
            return feature_fn(b)
        imgs, labels = sample_fn(b)
        pool, logits = evaluator(jnp.asarray(imgs), device_output=device)
        return pool, logits, labels

    if device:
        # Fully asynchronous loop: pools/logits stay device-resident and
        # nothing syncs to host until the end (each per-batch host fetch
        # costs ~180 ms round-trip on the relay backend and serializes the
        # pipeline — measured 103 → ~900 img/s).  The entire metric tail
        # (moments → Newton-Schulz FID → 10-split IS) then runs as ONE
        # jitted executable over the concatenated device buffers
        # (eval.fid.fid_is_device): interleaving per-batch accumulator
        # launches with the feature executable stalls the relay dispatch
        # pipeline, and an eager tail pays per-op round trips plus a 16 MB
        # covariance fetch.  Only three scalars cross the link; the
        # device-resident pool buffer is 82 MB per 10k images.
        device_pools = []
        remaining = num_images
        while remaining > 0:
            b = min(batch, remaining)
            pool, logits, labels = next_batch(b)
            logits_all.append(logits)
            device_pools.append(pool)
            if labels is not None:
                labels_all.append(np.asarray(labels))
            remaining -= b

        from ic_gan_tpu.eval.fid import fid_is_device

        pool_cat = jnp.concatenate(device_pools)
        logits_cat = jnp.concatenate(logits_all)
        fid_d, is_m, is_s = fid_is_device(
            pool_cat, logits_cat,
            jnp.asarray(ref_mu, jnp.float32),
            jnp.asarray(ref_sigma, jnp.float32),
            num_splits=num_splits,
        )
        if keep_pools:
            pools_all = [np.asarray(pool_cat)]
        fid, is_mean, is_std = float(fid_d), float(is_m), float(is_s)
        del device_pools, pool_cat, logits_cat
    else:
        moments = FeatureMoments(2048)
        remaining = num_images
        while remaining > 0:
            b = min(batch, remaining)
            pool, logits, labels = next_batch(b)
            pool, logits = np.asarray(pool), np.asarray(logits)
            moments.update(pool)
            logits_all.append(logits)
            if keep_pools:
                pools_all.append(pool)
            if labels is not None:
                labels_all.append(np.asarray(labels))
            remaining -= b
        logits_cat = np.concatenate(logits_all)
        mu, sigma = moments.mean, moments.cov
        is_mean, is_std = inception_score(logits_cat, num_splits=num_splits)
        fid = frechet_distance(mu, sigma, ref_mu, ref_sigma)

    out = {"IS_mean": is_mean, "IS_std": is_std, "FID": fid}

    if stratified is not None and labels_all and samples_per_class is not None:
        pool_cat = np.concatenate(pools_all)
        label_cat = np.concatenate(labels_all)
        spc = samples_per_class[label_cat]
        masks = {
            "many": spc >= 100,
            "low": (spc < 100) & (spc > 20),
            "few": spc <= 20,
        }
        for name, mask in masks.items():
            if name in stratified and mask.sum() > 1:
                mu_s = np.mean(pool_cat[mask], axis=0)
                sig_s = np.cov(pool_cat[mask], rowvar=False)
                ref_mu_s, ref_sig_s = stratified[name]
                out[f"FID_{name}"] = frechet_distance(
                    mu_s, sig_s, ref_mu_s, ref_sig_s
                )

    if prdc_ref_features is not None:
        pool_cat = np.concatenate(pools_all)
        k = min(len(prdc_ref_features), len(pool_cat))
        out.update(
            compute_prdc(prdc_ref_features[:k], pool_cat[:k], prdc_nearest_k)
        )
    return out


def make_train_eval_fn(cfg: Dict):
    """Build the trainer's ``eval_fn`` from a flat config (used by
    ``cli.train``): needs precomputed reference moments npz under
    ``data_root``."""
    data_root = cfg.get("data_root", cfg.get("data_path", "data"))
    name = moments_filename(
        cfg.get("resolution", 64),
        cfg.get("which_dataset", "imagenet"),
        cfg.get("longtail", False),
    )
    path = os.path.join(data_root, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"reference moments not found: {path}")
    ref = np.load(path)
    evaluator = InceptionEvaluator(cfg.get("inception_weights"),
                                   deploy_bf16=cfg.get("eval_bf16", False))
    num_images = cfg.get("num_inception_images", 50000)
    eval_batch = cfg.get("eval_batch_size", 64)

    def eval_fn(trainer):
        import jax.random as jr

        counter = [0]

        def sample(b):
            counter[0] += 1
            imgs, labels, _ = trainer.sample_fn(
                b, jr.PRNGKey(1000 + counter[0]), use_ema=True
            )
            # Keep images on device: they feed the on-device Inception pass
            # (a host round-trip per batch dominates on the relay backend).
            return imgs, labels

        return evaluate_generator(
            sample, evaluator, ref["mu"], ref["sigma"],
            num_images=num_images, batch=eval_batch,
        )

    return eval_fn
