import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.eval.metrics import (
    _METRICS,
    _ppl_prepare_images,
    calc_metric,
    compute_ppl,
    is_valid_metric,
    kid_from_features,
    list_metrics,
    ppl_w,
    slerp,
)
from ic_gan_tpu.parallel.stats import Collector, report


def test_metric_registry():
    """All 12 reference registrations (``metric_main.py:98-241``) with their
    real-side sample caps."""
    caps = {
        "fid50k_full": None, "kid50k_full": 1000000, "pr50k3_full": 200000,
        "ppl2_wend": 0, "is50k": 0,
        "fid50k": 50000, "kid50k": 50000, "pr50k3": 50000,
        "ppl_zfull": 0, "ppl_wfull": 0, "ppl_zend": 0, "ppl_wend": 0,
    }
    assert set(list_metrics()) == set(caps)
    for name, cap in caps.items():
        assert is_valid_metric(name)
        assert _METRICS[name].max_real == cap
    assert not is_valid_metric("nope")


def test_kid_identical_near_zero_and_shifted_positive():
    rng = np.random.RandomState(0)
    real = rng.randn(512, 64)
    same = kid_from_features(real, real + rng.randn(512, 64) * 0.01,
                             num_subsets=10, max_subset_size=128)
    far = kid_from_features(real, real + 3.0, num_subsets=10,
                            max_subset_size=128)
    assert abs(same) < 0.05
    assert far > same + 0.5


def test_slerp_endpoints():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-6)


def test_ppl_linear_generator_constant():
    # For a linear "generator" the path length is constant = |A (w1-w0)|²
    # scaled; mainly check the plumbing produces a finite positive scalar.
    A = jnp.asarray(np.random.RandomState(0).randn(8, 32).astype(np.float32))

    def map_ws(z):
        return z[:, None, :]  # (b, num_ws=1, w_dim) like a mapping network

    def synth(w):
        return (w[:, 0] @ A).reshape(w.shape[0], 4, 4, 2)

    val = ppl_w(synth, map_ws, z_dim=8, num_samples=64, batch=16, space="w")
    assert np.isfinite(val) and val > 0


def test_ppl_prepare_images_matches_reference_math():
    """Crop/downsample/grayscale conditioning vs an independent NCHW mirror
    of the reference lines (``perceptual_path_length.py:85-107``)."""
    rng = np.random.RandomState(0)
    for H, C, crop in [(512, 3, True), (512, 1, False), (16, 3, True),
                       (256, 3, False), (1024, 3, True)]:
        nchw = rng.randn(2, C, H, H).astype(np.float32)
        # Reference math, NCHW:
        exp = nchw
        if crop:
            c = H // 8
            exp = exp[:, :, c * 3 : c * 7, c * 2 : c * 6]
        # The reference pools by G.img_resolution // 256 — the FULL (pre-crop)
        # resolution (perceptual_path_length.py:92-104): 512² cropped → 256²
        # still pools by 2 to 128².
        factor = H // 256
        if factor > 1:
            b, ch, h, w = exp.shape
            exp = exp.reshape(b, ch, h // factor, factor, w // factor,
                              factor).mean(axis=(3, 5))
        if C == 1:
            exp = np.repeat(exp, 3, axis=1)
        got = np.asarray(_ppl_prepare_images(
            jnp.asarray(nchw.transpose(0, 2, 3, 1)), crop))
        assert got.shape == exp.transpose(0, 2, 3, 1).shape, (H, crop)
        np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), atol=1e-5)
    # The high-res crop cases pin the exact geometry the reference produces.
    assert _ppl_prepare_images(jnp.zeros((1, 512, 512, 3)), True).shape == \
        (1, 128, 128, 3)
    assert _ppl_prepare_images(jnp.zeros((1, 1024, 1024, 3)), True).shape == \
        (1, 128, 128, 3)


def test_compute_ppl_end_sampling_and_shared_noise_rng():
    """sampling="end" pins t=0 (wt0 == w0, ref ``:56-58``) and a synth taking
    ``rng=`` gets the SAME key for both endpoints of a pair (the reference
    re-randomizes noise_const once per batched forward, ``:75-78``)."""
    mapped, synth_in, keys = [], [], []

    def map_ws(z):
        mapped.append(np.asarray(z))
        return z[:, None, :]

    def synth(ws, rng=None):
        synth_in.append(np.asarray(ws))
        keys.append(np.asarray(jax.random.key_data(rng)))
        return jnp.broadcast_to(ws[:, 0, :1, None, None], (ws.shape[0], 8, 8, 1))

    compute_ppl(synth, map_ws, z_dim=6, num_samples=8, batch=4,
                space="w", sampling="end")
    assert len(mapped) == 4 and len(synth_in) == 4  # 2 batches x 2 calls
    # Pair 0: wt0 == w0 exactly at t=0.
    np.testing.assert_array_equal(synth_in[0][:, 0], mapped[0])
    # Same noise key within a pair, fresh across batches.
    np.testing.assert_array_equal(keys[0], keys[1])
    np.testing.assert_array_equal(keys[2], keys[3])
    assert not np.array_equal(keys[0], keys[2])


def test_compute_ppl_crop_isolates_center():
    """crop=True must score only the 3c:7c / 2c:6c window: a generator whose
    variation lives outside that window has ~0 cropped PPL."""
    def map_ws(z):
        return z[:, None, :]

    def synth(ws):
        # Border pixels carry the latent; the crop window (rows 6:14,
        # cols 4:12 at 16^2) is constant.
        val = ws[:, 0, :1]
        img = jnp.zeros((ws.shape[0], 16, 16, 3))
        img = img.at[:, :4, :, :].set(val[:, :, None, None])
        return img

    cropped = compute_ppl(synth, map_ws, z_dim=6, num_samples=16, batch=8,
                          space="w", sampling="end", crop=True)["ppl"]
    uncropped = compute_ppl(synth, map_ws, z_dim=6, num_samples=16, batch=8,
                            space="w", sampling="end", crop=False)["ppl"]
    assert cropped == 0.0
    assert uncropped > 1.0


def test_ppl_pixel_fallback_labeled_and_warned():
    import warnings

    import ic_gan_tpu.eval.metrics as M

    M._warned_pixel_ppl = False
    def map_ws(z):
        return z[:, None, :]

    def synth(ws):
        return jnp.broadcast_to(ws[:, 0, :1, None, None],
                                (ws.shape[0], 8, 8, 1))

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = compute_ppl(synth, map_ws, z_dim=6, num_samples=8, batch=8)
    assert out["ppl_distance"] == "pixel"
    assert any("pixel-space" in str(w.message) for w in rec)
    # With a feature_fn it is labeled lpips and silent.
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = compute_ppl(synth, map_ws, z_dim=6, num_samples=8, batch=8,
                          feature_fn=lambda img: img.reshape(img.shape[0], -1))
    assert out["ppl_distance"] == "lpips"
    assert not rec


def test_ppl_registry_entries_pin_reference_args(monkeypatch):
    """Each PPL registration must pass the exact (sampling, space, crop)
    combination from ``metric_main.py:129-241``."""
    import ic_gan_tpu.eval.metrics as M

    seen = {}

    def fake(g_synthesize, map_ws, z_dim, sampling, space, crop, **kw):
        seen.update(sampling=sampling, space=space, crop=crop)
        return {"ppl": 1.0, "ppl_distance": "pixel"}

    monkeypatch.setattr(M, "compute_ppl", fake)
    expect = {
        "ppl2_wend": ("end", "w", False),
        "ppl_zfull": ("full", "z", True),
        "ppl_wfull": ("full", "w", True),
        "ppl_zend": ("end", "z", True),
        "ppl_wend": ("end", "w", True),
    }
    for name, (sampling, space, crop) in expect.items():
        out = calc_metric(name, g_synthesize=None, map_ws=None, z_dim=4)
        assert out[name] == 1.0 and out["ppl_distance"] == "pixel"
        assert (seen["sampling"], seen["space"], seen["crop"]) == \
            (sampling, space, crop), name


def _fake_eval_stack(seed=0, dim=8):
    """sample_fn/evaluator pair whose pool features are iid N(0,1)."""
    rng = np.random.RandomState(seed)

    def sample_fn(b):
        return rng.randn(b, 4, 4, 3).astype(np.float32), None

    def evaluator(imgs):
        b = imgs.shape[0]
        return rng.randn(b, dim).astype(np.float32), \
            rng.randn(b, 10).astype(np.float32)

    return sample_fn, evaluator


def test_legacy_fid50k_same_distribution_near_zero():
    """fid50k computes real moments from capped features (ref
    ``metric_main.py:158-162``) — identical distributions give FID ~ 0."""
    sample_fn, evaluator = _fake_eval_stack()
    real = np.random.RandomState(1).randn(512, 8)
    out = calc_metric("fid50k", sample_fn=sample_fn, evaluator=evaluator,
                      real_features=real, num_images=512, batch=128)
    assert out["fid50k"] < 0.5


def test_legacy_kid_and_pr_full_entries_run():
    sample_fn, evaluator = _fake_eval_stack()
    real = np.random.RandomState(1).randn(256, 8)
    out = calc_metric("kid50k", sample_fn=sample_fn, evaluator=evaluator,
                      real_features=real, num_images=256, batch=128,
                      num_subsets=5, max_subset_size=64)
    assert abs(out["kid50k"]) < 0.5
    out = calc_metric("pr50k3_full", sample_fn=sample_fn, evaluator=evaluator,
                      real_features=real, num_images=256, batch=128)
    assert 0.0 <= out["pr50k3_full_precision"] <= 1.0
    assert 0.0 <= out["pr50k3_full_recall"] <= 1.0


def test_training_stats_collector():
    stats = {}
    stats = report(stats, "Loss/G", jnp.asarray([1.0, 3.0]))
    stats = report(stats, "Loss/D", jnp.asarray(2.0))
    stats = report(stats, "Loss/G", jnp.asarray([5.0]))
    c = Collector(r"Loss/.*")
    c.update(stats)
    assert c.num("Loss/G") == 3
    assert abs(c.mean("Loss/G") - 3.0) < 1e-6
    assert abs(c.std("Loss/G") - np.std([1, 3, 5])) < 1e-6
    only_g = Collector(r"Loss/G")
    only_g.update(stats)
    assert "Loss/D" not in only_g.moments


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from ic_gan_tpu.data.image_datasets import ImageFolderDataset

    rng = np.random.RandomState(0)
    for c in ("a", "b"):
        (tmp_path / c).mkdir()
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)
            ).save(tmp_path / c / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), resolution=16)
    assert len(ds) == 6
    imgs, labels, idxs = ds.batch([0, 4])
    assert imgs.shape == (2, 16, 16, 3)
    assert imgs.min() >= -1 and imgs.max() <= 1
    assert labels.tolist() == [0, 1]


def test_imagenet_lt_split_file(tmp_path):
    from PIL import Image

    from ic_gan_tpu.data.image_datasets import ImageFolderDataset

    (tmp_path / "train" / "n01").mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "train" / "n01" / "x.jpg"
    )
    split = tmp_path / "lt.txt"
    split.write_text("train/n01/x.jpg 7\n")
    ds = ImageFolderDataset(str(tmp_path), resolution=8, longtail=True,
                            split_file=str(split))
    assert len(ds) == 1
    assert ds.labels[0] == 7


def test_cocostuff_filters(tmp_path):
    import json

    from PIL import Image

    from ic_gan_tpu.data.image_datasets import CocoStuffDataset

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    images, annotations = [], []
    for i in range(4):
        fname = f"im{i}.jpg"
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(imgdir / fname)
        images.append({"id": i, "file_name": fname, "width": 32, "height": 32})
    # image 0: 2 objects (too few), image 1: 3 objects (ok),
    # image 2: 3 objects but tiny boxes (filtered -> too few),
    # image 3: 9 objects (too many).
    def ann(img_id, n, size=16):
        for k in range(n):
            annotations.append({
                "image_id": img_id, "bbox": [0, 0, size, size],
                "category_id": 1, "iscrowd": 0,
            })
    ann(0, 2)
    ann(1, 3)
    ann(2, 3, size=1)
    ann(3, 9)
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }
    inst = tmp_path / "instances.json"
    inst.write_text(json.dumps(data))
    ds = CocoStuffDataset(str(imgdir), str(inst), stuff_json=None,
                          stuff_only=False, resolution=16)
    assert len(ds) == 1  # only image 1 passes all filters
    imgs, labels, _ = ds.batch([0])
    assert imgs.shape == (1, 16, 16, 3)
    assert labels[0] == 0  # void label


def test_sample_and_interp_sheets():
    from ic_gan_tpu.cli.visualize import interp_sheet, sample_sheet

    def fake_apply(z, label, feats):
        base = jnp.mean(z, axis=1)[:, None, None, None]
        return jnp.broadcast_to(base, (z.shape[0], 8, 8, 3))

    conds = [(None, np.ones(4, np.float32)), (None, np.zeros(4, np.float32))]
    sheet = sample_sheet(fake_apply, dim_z=6, conditionings=conds,
                         samples_per_cond=3)
    assert sheet.shape == (6, 8, 8, 3)

    imgs = interp_sheet(fake_apply, dim_z=6, num_midpoints=2, num_rows=2,
                        feats_bank=np.eye(4, dtype=np.float32))
    assert imgs.shape == (2 * 4, 8, 8, 3)
    # fix_z: every image in a row identical (z constant, apply ignores feats).
    imgs_fz = interp_sheet(fake_apply, dim_z=6, num_midpoints=2, num_rows=1,
                           fix_z=True, feats_bank=np.eye(4, dtype=np.float32))
    row = imgs_fz.reshape(4, -1)
    assert np.allclose(row, row[0])

    # Class-conditional: one label per row, constant across the row.
    seen = []

    def labeled_apply(z, label, feats):
        assert label is not None and label.shape == (z.shape[0],)
        seen.append(np.asarray(label))
        return fake_apply(z, label, feats)

    imgs_lab = interp_sheet(labeled_apply, dim_z=6, num_midpoints=2,
                            num_rows=2, labels_bank=np.arange(5))
    assert imgs_lab.shape == (2 * 4, 8, 8, 3)
    per_row = seen[0].reshape(2, 4)
    assert (per_row == per_row[:, :1]).all()


# --- fused eval loop + bf16 Inception deployment (r4) -----------------------


def _tiny_gen_and_evaluator():
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator
    from ic_gan_tpu.io.deploy import make_sampler
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator

    cfg = BigGANConfig(resolution=32, n_classes=10, G_ch=8, dim_z=20,
                       G_attn="0", shared_dim=16, shared_dim_feat=24,
                       instance_sz=32)
    g = Generator(cfg)
    z = jnp.zeros((4, cfg.effective_dim_z))
    feats = jnp.zeros((4, cfg.instance_sz))
    variables = jax.jit(
        lambda: g.init(jax.random.PRNGKey(0), z, None, feats))()
    sampler = make_sampler(g, variables, batch_size=4)
    return cfg, sampler, InceptionEvaluator(batch=4)


def test_fused_feature_fn_matches_split_path():
    """The one-executable generator→Inception loop must produce the same
    features as sample → evaluator (eval/pipeline.make_fused_feature_fn)."""
    from ic_gan_tpu.eval.pipeline import make_fused_feature_fn

    cfg, sampler, ev = _tiny_gen_and_evaluator()
    fused = make_fused_feature_fn(sampler, ev)

    rng = np.random.RandomState(0)
    z = rng.randn(6, cfg.effective_dim_z).astype(np.float32)  # forces a
    feats = rng.randn(6, cfg.instance_sz).astype(np.float32)  # padded tail
    pool_f, logits_f = fused(z, None, feats)
    imgs = sampler(z, None, feats)
    pool_s, logits_s = ev(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(pool_f), pool_s, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_f), logits_s, atol=1e-4)


def test_evaluate_generator_feature_fn_path():
    """evaluate_generator(feature_fn=...) must agree with the classic
    sample_fn path on identical draws."""
    from ic_gan_tpu.eval.pipeline import evaluate_generator, make_fused_feature_fn

    cfg, sampler, ev = _tiny_gen_and_evaluator()
    fused = make_fused_feature_fn(sampler, ev)

    rng = np.random.RandomState(1)
    ref_mu = rng.randn(2048) * 0.01
    a = rng.randn(2048, 64)
    ref_sigma = a @ a.T * 1e-3 + np.eye(2048)

    def draws(seed):
        r = np.random.RandomState(seed)
        return (r.randn(4, cfg.effective_dim_z).astype(np.float32),
                r.randn(4, cfg.instance_sz).astype(np.float32))

    counter = [0]

    def sample_fn(b):
        z, feats = draws(counter[0]); counter[0] += 1
        return sampler(z, None, feats), None

    counter2 = [0]

    def feature_fn(b):
        z, feats = draws(counter2[0]); counter2[0] += 1
        pool, logits = fused(z, None, feats)
        return pool, logits, None

    m_split = evaluate_generator(sample_fn, ev, ref_mu, ref_sigma,
                                 num_images=8, batch=4)
    m_fused = evaluate_generator(None, ev, ref_mu, ref_sigma,
                                 num_images=8, batch=4,
                                 feature_fn=feature_fn)
    assert abs(m_split["FID"] - m_fused["FID"]) < 1e-3 * (1 + abs(m_split["FID"]))
    assert abs(m_split["IS_mean"] - m_fused["IS_mean"]) < 1e-4


def test_inception_bf16_deploy_drift():
    """bf16 deployment mode (models/inception.py dtype): same weights, pool
    features within bf16-quantization distance of the f32 trunk; the head
    stays f32 so drift cannot compound into the FID moments at full
    precision."""
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator

    ev32 = InceptionEvaluator()
    ev16 = InceptionEvaluator(deploy_bf16=True)
    ev16.variables = ev32.variables  # share weights

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(np.tanh(rng.randn(2, 75, 75, 3)).astype(np.float32))
    p32, l32 = ev32(imgs)
    p16, l16 = ev16(imgs)
    assert p16.dtype == np.float32  # f32 head regardless of trunk dtype
    scale = np.abs(p32).mean()
    assert np.abs(p16 - p32).max() < 0.15 * scale
    assert np.abs(p16 - p32).mean() < 0.02 * scale
