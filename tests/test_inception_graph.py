"""Inception-graph hardening for the FID north star.

torchvision is not installed in this environment, so ``models/inception.py``
can never be oracle-tested against the real ``inception_v3`` offline — yet
FID-within-1% of the reference hinges on this graph (ref
``data_utils/inception_utils.py:42-102`` wraps torchvision inception_v3).
Two defenses:

1. ``test_full_geometry_state_dict_conversion`` — a synthetic state dict
   with the EXACT torchvision ``inception_v3`` tensor names and shapes
   (manifest derived independently below, from torchvision's published
   architecture spec, NOT from our model — so graph drift fails the test),
   converted by ``load_torch_inception`` and checked 1:1 against the
   Flax module's init tree.

2. ``test_golden_outputs`` — pool/logits on fixed synthetic weights+inputs
   against a committed golden npz: any numerics change (BN eps, avg-pool
   divisor, branch concat order, resize grid) silently shifts FID, so it
   must fail here instead.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.models.inception import InceptionV3, load_torch_inception

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "inception_golden.npz")


def _basic_conv(prefix, cin, cout, k):
    """BasicConv2d state-dict entries (torchvision inception.py:405-416):
    conv.weight OIHW + bn.{weight,bias,running_mean,running_var,
    num_batches_tracked}."""
    kh, kw = (k, k) if isinstance(k, int) else k
    return {
        f"{prefix}.conv.weight": (cout, cin, kh, kw),
        f"{prefix}.bn.weight": (cout,),
        f"{prefix}.bn.bias": (cout,),
        f"{prefix}.bn.running_mean": (cout,),
        f"{prefix}.bn.running_var": (cout,),
        f"{prefix}.bn.num_batches_tracked": (),
    }


def torchvision_inception_v3_manifest():
    """Every tensor in torchvision ``inception_v3(aux_logits=True)``'s state
    dict, name → shape.  Derived from the published torchvision architecture
    (torchvision/models/inception.py), independent of our Flax module."""
    m = {}
    m.update(_basic_conv("Conv2d_1a_3x3", 3, 32, 3))
    m.update(_basic_conv("Conv2d_2a_3x3", 32, 32, 3))
    m.update(_basic_conv("Conv2d_2b_3x3", 32, 64, 3))
    m.update(_basic_conv("Conv2d_3b_1x1", 64, 80, 1))
    m.update(_basic_conv("Conv2d_4a_3x3", 80, 192, 3))

    def inception_a(prefix, cin, pool_features):
        m.update(_basic_conv(f"{prefix}.branch1x1", cin, 64, 1))
        m.update(_basic_conv(f"{prefix}.branch5x5_1", cin, 48, 1))
        m.update(_basic_conv(f"{prefix}.branch5x5_2", 48, 64, 5))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3))
        m.update(_basic_conv(f"{prefix}.branch_pool", cin, pool_features, 1))
        return 64 + 64 + 96 + pool_features

    def inception_b(prefix, cin):
        m.update(_basic_conv(f"{prefix}.branch3x3", cin, 384, 3))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3))
        return 384 + 96 + cin

    def inception_c(prefix, cin, c7):
        m.update(_basic_conv(f"{prefix}.branch1x1", cin, 192, 1))
        m.update(_basic_conv(f"{prefix}.branch7x7_1", cin, c7, 1))
        m.update(_basic_conv(f"{prefix}.branch7x7_2", c7, c7, (1, 7)))
        m.update(_basic_conv(f"{prefix}.branch7x7_3", c7, 192, (7, 1)))
        m.update(_basic_conv(f"{prefix}.branch7x7dbl_1", cin, c7, 1))
        m.update(_basic_conv(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1)))
        m.update(_basic_conv(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7)))
        m.update(_basic_conv(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1)))
        m.update(_basic_conv(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7)))
        m.update(_basic_conv(f"{prefix}.branch_pool", cin, 192, 1))
        return 4 * 192

    def inception_d(prefix, cin):
        m.update(_basic_conv(f"{prefix}.branch3x3_1", cin, 192, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3_2", 192, 320, 3))
        m.update(_basic_conv(f"{prefix}.branch7x7x3_1", cin, 192, 1))
        m.update(_basic_conv(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7)))
        m.update(_basic_conv(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1)))
        m.update(_basic_conv(f"{prefix}.branch7x7x3_4", 192, 192, 3))
        return 320 + 192 + cin

    def inception_e(prefix, cin):
        m.update(_basic_conv(f"{prefix}.branch1x1", cin, 320, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3_1", cin, 384, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3_2a", 384, 384, (1, 3)))
        m.update(_basic_conv(f"{prefix}.branch3x3_2b", 384, 384, (3, 1)))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 448, 1))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 448, 384, 3))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3)))
        m.update(_basic_conv(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1)))
        m.update(_basic_conv(f"{prefix}.branch_pool", cin, 192, 1))
        return 320 + 2 * 384 + 2 * 384 + 192

    c = inception_a("Mixed_5b", 192, 32)        # 256
    c = inception_a("Mixed_5c", c, 64)          # 288
    c = inception_a("Mixed_5d", c, 64)          # 288
    c = inception_b("Mixed_6a", c)              # 768
    c = inception_c("Mixed_6b", c, 128)
    c = inception_c("Mixed_6c", c, 160)
    c = inception_c("Mixed_6d", c, 160)
    c = inception_c("Mixed_6e", c, 192)         # 768
    # AuxLogits (dropped by the converter, but present in the .pth).
    m.update(_basic_conv("AuxLogits.conv0", c, 128, 1))
    m.update(_basic_conv("AuxLogits.conv1", 128, 768, 5))
    m["AuxLogits.fc.weight"] = (1000, 768)
    m["AuxLogits.fc.bias"] = (1000,)
    c = inception_d("Mixed_7a", c)              # 1280
    c = inception_e("Mixed_7b", c)              # 2048
    c = inception_e("Mixed_7c", c)              # 2048
    m["fc.weight"] = (1000, c)
    m["fc.bias"] = (1000,)
    return m


def synthetic_state_dict():
    """Deterministic values per tensor (seeded by name) — BN vars positive,
    conv weights small so 94 stacked layers stay numerically tame."""
    import zlib

    sd = {}
    for name, shape in torchvision_inception_v3_manifest().items():
        # crc32, not hash(): str hash is salted per process and would make
        # the golden file non-reproducible.
        rng = np.random.RandomState(zlib.crc32(name.encode()) % (2 ** 31))
        v = np.asarray(rng.randn(*shape), np.float32)
        if name.endswith("running_var"):
            v = np.abs(v) + 0.5
        elif name.endswith("num_batches_tracked"):
            v = np.zeros(shape, np.int64)
        elif name.endswith("conv.weight") or name == "fc.weight":
            v = v * 0.05
        sd[name] = v
    return sd


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_full_geometry_state_dict_conversion():
    """Every torchvision tensor converts onto exactly the Flax init tree:
    same key set, same shapes, values carried through (incl. OIHW→HWIO)."""
    sd = synthetic_state_dict()
    variables = load_torch_inception(sd)

    net = InceptionV3()
    init_shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    )
    want = _flatten(init_shapes["params"])
    got = _flatten(variables["params"])
    assert set(got) == set(want), sorted(set(got) ^ set(want))[:10]
    for key in want:
        assert got[key].shape == want[key].shape, key

    # Converted count: manifest minus aux minus num_batches_tracked.
    manifest = torchvision_inception_v3_manifest()
    expect_n = sum(
        1 for k in manifest
        if not k.startswith("AuxLogits") and not k.endswith("num_batches_tracked")
    )
    assert len(got) == expect_n

    # Spot-check value plumbing including the OIHW→HWIO transpose.
    w = sd["Mixed_6b.branch7x7_2.conv.weight"]  # (c7, c7, 1, 7)
    conv = np.asarray(
        variables["params"]["Mixed_6b"]["branch7x7_2"]["conv"]["kernel"]
    )
    np.testing.assert_array_equal(conv, np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["Mixed_5d"]["branch_pool"]["bn_var"]),
        sd["Mixed_5d.branch_pool.bn.running_var"],
    )


def _golden_forward():
    sd = synthetic_state_dict()
    variables = load_torch_inception(sd)
    net = InceptionV3()
    x = np.random.RandomState(1234).uniform(
        -1.0, 1.0, (2, 75, 75, 3)
    ).astype(np.float32)
    pool, logits = jax.jit(net.apply)(variables, jnp.asarray(x))
    return np.asarray(pool), np.asarray(logits)


def test_golden_outputs():
    """Committed golden pool/logits: a refactor that shifts the Inception
    numerics (and therefore FID) must fail here.  Regenerate (only after
    deliberate, understood numerics changes) with:
    ``python tests/test_inception_graph.py --regen``."""
    assert os.path.exists(GOLDEN_PATH), (
        f"golden file missing: {GOLDEN_PATH} — run "
        "`python tests/test_inception_graph.py --regen`"
    )
    golden = np.load(GOLDEN_PATH)
    pool, logits = _golden_forward()
    # f32 conv reassociation across compilers: tight but not bitwise.
    np.testing.assert_allclose(pool, golden["pool"], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(logits, golden["logits"], atol=2e-3, rtol=2e-3)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        pool, logits = _golden_forward()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, pool=pool, logits=logits)
        print(f"wrote {GOLDEN_PATH}: pool {pool.shape}, logits {logits.shape}")
        print("pool[0,:4] =", pool[0, :4], "logits[0,:4] =", logits[0, :4])
