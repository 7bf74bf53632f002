"""Full-chain FID oracle: reference torch pipeline vs this framework, <1%.

The north-star gate (BASELINE.md) — "FID within 1% of the reference on a
released checkpoint" — cannot be run verbatim in this environment (zero
egress: no SwAV/torchvision/Inception weights).  This test is the strongest
offline proxy: it composes every link of both chains on the SAME
random-weight generator and asserts the end-to-end FIDs agree to <1%.

  reference chain (all reference code, /root/reference):
      BigGAN.Generator (torch, eval mode, random weights)
        → inception_utils.accumulate_inception_activations (torch loop,
          softmax-probs IS convention)
        → inception_utils.compute_fid (np.mean/np.cov +
          numpy_calculate_frechet_distance, scipy sqrtm)
        → inception_utils.calculate_inception_score
  our chain (the production path, nothing mocked):
      io.torch_import.load_generator_variables (state-dict converter)
        → io.deploy.make_sampler (σ-fold + fixed-batch jit)
        → eval.pipeline.evaluate_generator (device loop,
          eval.fid.fid_is_device: one-executable moments → Newton-Schulz
          FID → 10-split IS)

Shared infrastructure: the Inception feature function itself.  The real
torchvision net cannot load here, so BOTH sides call the same
random-weight flax InceptionV3 — built from a manifest-shaped torch state
dict through ``load_torch_inception``, so the weight converter is in the
chain; the graph itself is golden-pinned separately
(tests/test_inception_graph.py).  The torch side wraps it in an nn.Module
shim so the reference's own accumulation loop runs unmodified.

Reference moments are a synthetic well-conditioned (mu, sigma) pair passed
identically to both sides — in both frameworks the data moments are a
precomputed file input (``calculate_inception_moments.py`` /
``eval/pipeline.compute_dataset_moments``), and real 50k-image moment sets
are well-conditioned.  Generator-side covariance stays honestly singular
(320 samples, 2048 dims): the regime where sqrtm implementations could
diverge, measured to agree to 0.03% (scipy exact vs our Newton-Schulz/eigh).

Ref: inference/test.py:35-267 (the eval app this proxies),
inference/utils.py:268-412.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# The reference's data_utils imports torchvision at module scope for
# load_inception_net; stub it — this test never calls that loader.
for _name in ("torchvision", "torchvision.models",
              "torchvision.models.inception", "torchvision.transforms",
              "torchvision.datasets"):
    sys.modules.setdefault(_name, types.ModuleType(_name))
sys.modules["torchvision.models.inception"].inception_v3 = (
    lambda *a, **k: None)

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/BigGAN_PyTorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.eval.pipeline import (
    InceptionEvaluator,
    evaluate_generator,
    make_fused_feature_fn,
)
from ic_gan_tpu.io.deploy import make_sampler
from ic_gan_tpu.io.torch_import import load_generator_variables
from ic_gan_tpu.models.biggan import BigGANConfig, Generator
from ic_gan_tpu.models.inception import load_torch_inception

from test_inception_graph import torchvision_inception_v3_manifest
from test_torch_parity import _init_ref_weights, make_cfg, ref_kwargs

N_IMAGES = 320
BATCH = 32


def _random_inception_evaluator(seed=7):
    """Random torchvision-shaped state dict → converter → flax evaluator."""
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in torchvision_inception_v3_manifest().items():
        if name.endswith("num_batches_tracked"):
            sd[name] = torch.tensor(0)
        elif name.endswith("running_var"):
            sd[name] = torch.from_numpy(
                rng.rand(*shape).astype(np.float32) * 0.5 + 0.5)
        else:
            sd[name] = torch.from_numpy(
                rng.randn(*shape).astype(np.float32) * 0.05)
    ev = InceptionEvaluator(batch=BATCH)
    ev.variables = load_torch_inception(
        {k: v.numpy() for k, v in sd.items()})
    ev.pretrained = True
    return ev


class _NetShim(torch.nn.Module):
    """Torch wrapper over the shared flax Inception so the reference's
    accumulation loop (``inception_utils.py:289-310``) runs unmodified."""

    def __init__(self, evaluator):
        super().__init__()
        self._ev = evaluator

    def forward(self, x):  # NCHW float in [-1, 1]
        xn = np.transpose(x.detach().cpu().numpy(), (0, 2, 3, 1))
        pool, logits = self._ev(jnp.asarray(xn))
        return torch.from_numpy(np.asarray(pool)), torch.from_numpy(
            np.asarray(logits))


@pytest.mark.slow
def test_full_chain_fid_within_one_percent():
    from data_utils import inception_utils as iu

    import BigGAN as ref_biggan

    cfg = make_cfg(resolution=64, attn="32")
    tg = ref_biggan.Generator(**ref_kwargs(cfg))
    _init_ref_weights(tg)
    tg.eval()

    evaluator = _random_inception_evaluator()
    net = _NetShim(evaluator)

    # Identical inputs on both sides: the test pins the chains, not the
    # sampling distribution.
    rng = np.random.RandomState(0)
    z_all = rng.randn(N_IMAGES, cfg.effective_dim_z).astype(np.float32)
    f_all = rng.randn(N_IMAGES, cfg.instance_sz).astype(np.float32)

    # Well-conditioned precomputed "data" moments, shared verbatim.
    a = rng.randn(2048, 2048).astype(np.float64) * 0.02
    mu_data = rng.randn(2048) * 0.1
    sigma_data = a @ a.T + 0.05 * np.eye(2048)

    # --- reference chain -----------------------------------------------
    cursor = [0]

    def ref_sample():
        lo = cursor[0] % N_IMAGES
        cursor[0] += BATCH
        z = torch.from_numpy(z_all[lo : lo + BATCH])
        f = torch.from_numpy(f_all[lo : lo + BATCH])
        with torch.no_grad():
            imgs = tg(z, None, f)
        return imgs, None, None

    pool_t, probs_t, _ = iu.accumulate_inception_activations(
        ref_sample, net, num_inception_images=N_IMAGES)
    fid_ref = iu.compute_fid(pool_t, mu_data, sigma_data, prints=False,
                             use_torch=False)
    is_ref, _ = iu.calculate_inception_score(probs_t.numpy())

    # --- our chain -------------------------------------------------------
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = load_generator_variables(sd, cfg)
    g = Generator(cfg)
    sampler = make_sampler(g, variables, batch_size=BATCH)
    fused = make_fused_feature_fn(sampler, evaluator, batch=BATCH)

    cursor2 = [0]

    def feature_fn(b):
        lo = cursor2[0] % N_IMAGES
        cursor2[0] += b
        pool, logits = fused(z_all[lo : lo + b], None, f_all[lo : lo + b])
        return pool, logits, None

    out = evaluate_generator(
        None, evaluator, mu_data, sigma_data,
        num_images=N_IMAGES, batch=BATCH, feature_fn=feature_fn,
    )

    rel_fid = abs(out["FID"] - fid_ref) / fid_ref
    rel_is = abs(out["IS_mean"] - is_ref) / is_ref
    print(f"FID ref {fid_ref:.4f} vs ours {out['FID']:.4f} "
          f"(rel {rel_fid:.2e}); IS ref {is_ref:.4f} vs ours "
          f"{out['IS_mean']:.4f} (rel {rel_is:.2e})")
    assert rel_fid < 0.01, (fid_ref, out["FID"])
    assert rel_is < 0.01, (is_ref, out["IS_mean"])
