"""Full-chain FID oracle for the StyleGAN2 backbone: reference torch metric
pipeline vs this framework, <1%.

Companion to ``tests/test_full_chain_fid.py`` (BigGAN chain): the reference's
eval surface is backbone-agnostic (``inference/test.py:35-267`` dispatches
both; the SG2 load path is ``inference/utils.py:404-411``), so the
north-star proxy needs BOTH backbones composed end-to-end.

  reference chain (all reference code, /root/reference/stylegan2_ada_pytorch):
      training.networks.Generator (torch, eval mode, random weights)
        → metrics.metric_utils.compute_feature_stats_for_generator
          (the VERBATIM generator-stats loop: z/c/h draws, uint8 image
          quantization, FeatureStats mean/cov accumulation)
        → the FID formula lines of metrics/frechet_inception_distance.py:54-59
          (scipy sqrtm) against shared precomputed "data" moments
  our chain (the production path, nothing mocked):
      io.stylegan_import.convert_state_dict (pkl-layout converter)
        → io.deploy.make_sampler (fixed-batch jit, noise_mode="const")
        → the same uint8 dynamic-range hop the reference loop applies
        → eval.pipeline.evaluate_generator (device loop, Newton-Schulz FID)

Shared infrastructure: the Inception feature function (the real TorchScript
inception-2015-12-05.pt cannot download here — zero egress), served to the
reference loop through its own ``get_feature_detector`` seam as a torch
module wrapping the same random-weight flax InceptionV3 both sides use.
The detector consumes the reference loop's uint8 NCHW images and maps them
to the [-1,1] NHWC contract our evaluator pins elsewhere.

Input pinning: the reference loop draws z via ``torch.randn`` and h via
``dataset.get_instance_features(np.random.randint(...))``
(``metric_utils.py:368-388``).  Both RNGs are seeded and the exact draw
sequence replayed on our side, so the two chains see identical (z, h)
streams — the test pins the chains, not the sampling distribution.

Ref: inference/utils.py:404-411 (SG2 eval load path),
metrics/frechet_inception_distance.py:26-59, metrics/metric_utils.py:320-390.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")

import jax.numpy as jnp

from ic_gan_tpu.eval.pipeline import evaluate_generator
from ic_gan_tpu.io.deploy import make_sampler
from ic_gan_tpu.io.stylegan_import import convert_state_dict
from ic_gan_tpu.models import stylegan2 as sg2

from test_full_chain_fid import _random_inception_evaluator
from test_stylegan2_parity import CFG, _randomize, make_ref_G, our_cfg

N_IMAGES = 320
BATCH = 32
RNG_SEED = 11


class SG2FakeDataset:
    """Stand-in for the reflection-constructed dataset the reference's
    generator-stats loop draws conditioning from (``metric_utils.py:373-382``
    calls ``get_label`` / ``get_instance_features`` per sample).  Instance
    features are a fixed random bank so index draws fully determine h."""

    def __init__(self, n=N_IMAGES, h_dim=CFG["h_dim"], seed=5, **_kw):
        self._bank = np.random.RandomState(seed).randn(n, h_dim).astype(
            np.float32)

    def __len__(self):
        return self._bank.shape[0]

    def get_label(self, idx):
        return np.zeros([0], np.float32)  # c_dim == 0

    def get_instance_features(self, idx):
        return self._bank[idx]


class _DetectorShim(torch.nn.Module):
    """Torch wrapper over the shared flax Inception, standing in for the
    TorchScript inception-2015-12-05.pt at the reference's own
    ``get_feature_detector`` seam.  Receives the loop's uint8 NCHW images
    (``metric_utils.py:341-343`` quantizes) and maps them to the [-1,1]
    float contract of our evaluator — the exact inverse of the loop's
    ``img * 127.5 + 128`` hop."""

    def __init__(self, evaluator):
        super().__init__()
        self._ev = evaluator
        self.calls = 0

    def forward(self, x, return_features=True):
        assert x.dtype == torch.uint8
        self.calls += 1
        xf = (x.numpy().astype(np.float32) - 128.0) / 127.5
        xn = np.transpose(xf, (0, 2, 3, 1))
        pool, _logits = self._ev(jnp.asarray(xn))
        return torch.from_numpy(np.asarray(pool))


def _uint8_roundtrip(img_nhwc: np.ndarray) -> np.ndarray:
    """The reference loop's dynamic-range hop (``metric_utils.py:341-343``:
    ``(img * 127.5 + 128).clamp(0, 255).to(torch.uint8)``; the uint8 cast
    truncates) followed by the shim's inverse map."""
    u = np.clip(img_nhwc * 127.5 + 128.0, 0, 255).astype(np.uint8)
    return (u.astype(np.float32) - 128.0) / 127.5


@pytest.mark.slow
def test_sg2_full_chain_fid_within_one_percent(monkeypatch):
    from metrics import metric_utils

    tg = make_ref_G()
    _randomize(tg, seed=3)
    tg.eval()

    evaluator = _random_inception_evaluator()
    shim = _DetectorShim(evaluator)
    monkeypatch.setattr(metric_utils, "get_feature_detector",
                        lambda url, **kw: shim)
    # The reference loop pins conditioning tensors for the H2D copy
    # (``metric_utils.py:376,381``) — a CUDA-only no-op-on-values step this
    # CPU-only box cannot execute; identity-patch it (values unaffected).
    monkeypatch.setattr(torch.Tensor, "pin_memory", lambda self: self)

    # Well-conditioned precomputed "data" moments, shared verbatim (in both
    # frameworks the real-side moments are a precomputed file input).
    mrng = np.random.RandomState(0)
    a = mrng.randn(2048, 2048).astype(np.float64) * 0.02
    mu_data = mrng.randn(2048) * 0.1
    sigma_data = a @ a.T + 0.05 * np.eye(2048)

    # --- reference chain: the VERBATIM generator-stats loop ---------------
    opts = metric_utils.MetricOptions(
        G=tg,
        G_kwargs=dict(noise_mode="const"),
        dataset_kwargs=dict(
            class_name="test_full_chain_fid_sg2.SG2FakeDataset"),
        num_gpus=1, rank=0, device=torch.device("cpu"), cache=False,
    )
    torch.manual_seed(RNG_SEED)
    np.random.seed(RNG_SEED)
    stats = metric_utils.compute_feature_stats_for_generator(
        opts=opts, detector_url="inception-2015-12-05.pt",
        detector_kwargs=dict(return_features=True),
        batch_size=BATCH, batch_gen=BATCH,
        capture_mean_cov=True, max_items=N_IMAGES,
    )
    assert shim.calls == N_IMAGES // BATCH
    mu_gen, sigma_gen = stats.get_mean_cov()
    # The FID formula of frechet_inception_distance.py:54-59 (scipy sqrtm).
    import scipy.linalg

    m = np.square(mu_gen - mu_data).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_data), disp=False)
    fid_ref = float(np.real(m + np.trace(sigma_gen + sigma_data - s * 2)))

    # --- our chain ---------------------------------------------------------
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    variables = convert_state_dict(sd)
    g = sg2.Generator(our_cfg())
    sampler = make_sampler(g, variables, batch_size=BATCH,
                           noise_mode="const")

    # Replay the reference loop's exact RNG sequence (same seeds, same call
    # order: per batch, one torch.randn for z, then per-sample np.random
    # index draws for c and h — ``metric_utils.py:368-382``).
    torch.manual_seed(RNG_SEED)
    np.random.seed(RNG_SEED)
    ds = SG2FakeDataset()
    z_batches, h_batches = [], []
    for _ in range(N_IMAGES // BATCH):
        z_batches.append(torch.randn([BATCH, CFG["z_dim"]]).numpy())
        _c = [ds.get_label(np.random.randint(len(ds))) for _ in range(BATCH)]
        h_batches.append(np.stack([
            ds.get_instance_features(np.random.randint(len(ds)))
            for _ in range(BATCH)
        ]))

    cursor = [0]

    def feature_fn(b):
        assert b == BATCH
        i = cursor[0]
        cursor[0] += 1
        imgs = sampler(z_batches[i], None, h_batches[i])
        pool, logits = evaluator(jnp.asarray(_uint8_roundtrip(imgs)))
        return pool, logits, None

    out = evaluate_generator(
        None, evaluator, mu_data, sigma_data,
        num_images=N_IMAGES, batch=BATCH, feature_fn=feature_fn,
    )

    rel_fid = abs(out["FID"] - fid_ref) / fid_ref
    print(f"SG2 FID ref {fid_ref:.4f} vs ours {out['FID']:.4f} "
          f"(rel {rel_fid:.2e})")
    assert rel_fid < 0.01, (fid_ref, out["FID"])
