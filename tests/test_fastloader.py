"""Native fastloader vs numpy-fallback parity: the C++ path converts every
training batch (data/datasets.py _prepare_images), so a silent stride or
hflip bug would corrupt all training data. Oracle = the pure-numpy fallback
in native/build.py."""

import numpy as np
import pytest

from ic_gan_tpu.native import build


@pytest.fixture(scope="module")
def native_mod():
    mod = build.build_and_import()
    if mod is None:
        pytest.skip("native fastloader unavailable")
    return mod


def _numpy_normalize(imgs, hflip_mask, apply_norm):
    x = np.transpose(imgs, (0, 2, 3, 1)).astype(np.float32)
    if hflip_mask is not None:
        m = np.asarray(hflip_mask, bool)
        x[m] = x[m, :, ::-1]
    if apply_norm:
        x = (x / 255.0 - 0.5) * 2.0
    return x


@pytest.mark.parametrize("apply_norm", [True, False])
@pytest.mark.parametrize("with_flip", [True, False])
def test_normalize_batch_matches_numpy(native_mod, apply_norm, with_flip):
    rng = np.random.RandomState(0)
    for shape in [(7, 3, 16, 16), (1, 3, 9, 13), (5, 1, 8, 8)]:
        imgs = rng.randint(0, 256, shape, dtype=np.uint8)
        flip = rng.randint(0, 2, shape[0]).astype(np.uint8) if with_flip else None
        got = build.normalize_batch(imgs, hflip_mask=flip,
                                    apply_norm=apply_norm)
        want = _numpy_normalize(imgs, flip, apply_norm)
        if apply_norm:
            # The C++ path fuses the affine as x*(2/255)-1: 1-ulp rounding
            # differences vs numpy's (x/255-0.5)*2 are expected.
            np.testing.assert_allclose(got, want, atol=2.5e-7)
        else:
            np.testing.assert_array_equal(got, want)


def test_normalize_batch_noncontiguous_input(native_mod):
    rng = np.random.RandomState(1)
    base = rng.randint(0, 256, (8, 3, 16, 16), dtype=np.uint8)
    view = base[::2]  # stride trap: wrapper must contiguify
    got = build.normalize_batch(view, hflip_mask=np.ones(4, np.uint8))
    want = _numpy_normalize(np.ascontiguousarray(view), np.ones(4, bool), True)
    np.testing.assert_allclose(got, want, atol=2.5e-7)


def test_gather_rows_matches_numpy(native_mod):
    rng = np.random.RandomState(2)
    src = rng.randn(100, 32).astype(np.float32)
    idx = rng.randint(0, 100, 57)
    np.testing.assert_array_equal(build.gather_rows(src, idx), src[idx])


def test_gather_rows_out_of_range_raises(native_mod):
    src = np.zeros((4, 8), np.float32)
    with pytest.raises(Exception):
        build.gather_rows(src, np.array([0, 99]))
