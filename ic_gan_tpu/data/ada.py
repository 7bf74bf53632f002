"""ADA — adaptive discriminator augmentation pipeline (JAX, NHWC).

Faithful port of ``stylegan2_ada_pytorch/training/augment.py:279-829``:
pixel blitting (x-flip, 90° rotations, integer translation), general
geometric transforms (iso/aniso scaling, rotation, fractional translation)
executed as one composed inverse affine with wavelet-filtered orthogonal
resampling, color transforms as homogeneous 4×4 matrices (brightness,
contrast, luma flip, hue rotation, saturation), per-band image-space
filtering (sym2 wavelet bank), additive noise, and cutout — all gated per
sample by ``p`` multipliers.

TPU deviation (static shapes): the reference pads the image by a
*data-dependent* margin before the geometric warp (``augment.py:546-566``,
clamped to image size); under jit we use a static margin
(``geom_margin_frac`` of the image size, default ¼ — the clamp's typical
regime) so shapes stay compile-time constant.  Samples warped beyond the
margin read zeros, exactly like the reference beyond its clamp.

Everything is differentiable w.r.t. the images (the D gradient flows through
the augmentation, which is the point of ADA).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.resample import setup_filter, upsample2d, downsample2d

# Symlet wavelets used by the reference (augment.py:24-50).
WAVELETS = {
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}


# --- homogeneous matrix helpers (augment.py:198-277) -------------------------


def _mat3(batch, rows):
    m = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    return jnp.broadcast_to(m, (batch, 3, 3)) if m.ndim == 2 else m


def translate2d_inv(tx, ty):
    one = jnp.ones_like(tx)
    zero = jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([one, zero, -tx], -1),
        jnp.stack([zero, one, -ty], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def translate2d(tx, ty):
    return translate2d_inv(-tx, -ty)


def scale2d_inv(sx, sy):
    one = jnp.ones_like(sx)
    zero = jnp.zeros_like(sx)
    return jnp.stack([
        jnp.stack([1.0 / sx, zero, zero], -1),
        jnp.stack([zero, 1.0 / sy, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def scale2d(sx, sy):
    return scale2d_inv(1.0 / sx, 1.0 / sy)


def rotate2d_inv(theta):
    return rotate2d(-theta)


def rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)


def translate3d(tx, ty, tz):
    n = tx.shape[0] if hasattr(tx, "shape") and tx.ndim else 1
    eye = jnp.broadcast_to(jnp.eye(4), (tx.shape[0], 4, 4))
    m = eye.at[:, 0, 3].set(tx)
    m = m.at[:, 1, 3].set(ty)
    m = m.at[:, 2, 3].set(tz)
    return m


def scale3d(sx, sy, sz):
    eye = jnp.broadcast_to(jnp.eye(4), (sx.shape[0], 4, 4))
    m = eye.at[:, 0, 0].set(sx)
    m = m.at[:, 1, 1].set(sy)
    m = m.at[:, 2, 2].set(sz)
    return m


def rotate3d(v, theta):
    """Rotation around axis ``v`` (augment.py:45-59), batched over theta."""
    vx, vy, vz = v[0], v[1], v[2]
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    cc = 1.0 - c
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, zero],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, zero],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, zero],
        [zero, zero, zero, one],
    ]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def _build_fbank():
    """4-band sym2 filter bank (augment.py:380-399)."""
    Hz_lo = np.asarray(WAVELETS["sym2"])
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    Hz_fbank = np.eye(4, 1)
    for i in range(1, Hz_fbank.shape[0]):
        Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]).reshape(
            Hz_fbank.shape[0], -1
        )[:, :-1]
        Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
        Hz_fbank[
            i,
            (Hz_fbank.shape[1] - Hz_hi2.size) // 2 :
            (Hz_fbank.shape[1] + Hz_hi2.size) // 2,
        ] += Hz_hi2
    return Hz_fbank.astype(np.float32)


def grid_sample_bilinear(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sampling with zero padding, align_corners=False.

    img: (N, H, W, C); grid: (N, Ho, Wo, 2) normalized [-1, 1] (x, y).
    Differentiable to any order (pure gather arithmetic — replaces the
    reference's grid_sample_gradfix).

    Implementation: one 2×2-patch gather per output point (vmapped
    dynamic_slice → a single lax.gather with slice_sizes=(2,2,C)) instead of
    four scalar point-gathers — ~1.4× faster on TPU.  This generic gather path
    is kept as the oracle and the fallback for arbitrary grids; the training
    hot path routes affine warps through the Catmull–Rom/shear decomposition
    in ``data/fast_warp.py`` + the Pallas barrel-shift kernel
    (``ops/pallas/row_shift.py``), which makes ADA's geometric stage
    essentially free (0.99× a no-augment step at 128²,
    ``benchmarks/results/ada_warp.json``).
    """
    N, H, W, C = img.shape
    gx = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    # Pad so every clipped 2x2 patch start is in bounds; zero padding doubles
    # as the out-of-image value, with validity masks for clipped corners.
    imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
    ys = jnp.clip(y0.astype(jnp.int32) + 1, 0, H + 1)
    xs = jnp.clip(x0.astype(jnp.int32) + 1, 0, W + 1)
    valid_x0 = (x0 >= 0) & (x0 < W)
    valid_x1 = (x0 + 1 >= 0) & (x0 + 1 < W)
    valid_y0 = (y0 >= 0) & (y0 < H)
    valid_y1 = (y0 + 1 >= 0) & (y0 + 1 < H)

    def per_image(im, yy, xx):
        flat_y = yy.reshape(-1)
        flat_x = xx.reshape(-1)

        def one(yy_, xx_):
            return jax.lax.dynamic_slice(im, (yy_, xx_, 0), (2, 2, C))

        patches = jax.vmap(one)(flat_y, flat_x)
        return patches.reshape(yy.shape + (2, 2, C))

    patches = jax.vmap(per_image)(imgp, ys, xs)  # (N, Ho, Wo, 2, 2, C)
    v00 = patches[..., 0, 0, :] * (valid_y0 & valid_x0)[..., None]
    v01 = patches[..., 0, 1, :] * (valid_y0 & valid_x1)[..., None]
    v10 = patches[..., 1, 0, :] * (valid_y1 & valid_x0)[..., None]
    v11 = patches[..., 1, 1, :] * (valid_y1 & valid_x1)[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class AugmentPipe:
    """Callable ADA pipe: ``pipe(rng, images, p) -> images``.

    Constructor args mirror the reference's probability multipliers
    (``augment.py:281-310``); the published specs (blit/geom/color/filter/
    noise/cutout → 'bgc', 'bgcfnc', …; ``train.py:452-522``) are exposed via
    ``AugmentPipe.from_spec``.
    """

    SPECS = {
        "blit": dict(xflip=1, rotate90=1, xint=1),
        "geom": dict(scale=1, rotate=1, aniso=1, xfrac=1),
        "color": dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
        "filter": dict(imgfilter=1),
        "noise": dict(noise=1),
        "cutout": dict(cutout=1),
        "bg": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                   xfrac=1),
        "bgc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                    xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                    saturation=1),
        "bgcf": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                     xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                     saturation=1, imgfilter=1),
        "bgcfn": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                      xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                      saturation=1, imgfilter=1, noise=1),
        "bgcfnc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                       xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                       saturation=1, imgfilter=1, noise=1, cutout=1),
    }

    def __init__(
        self,
        xflip=0, rotate90=0, xint=0, xint_max=0.125,
        scale=0, rotate=0, aniso=0, xfrac=0,
        scale_std=0.2, rotate_max=1.0, aniso_std=0.2, xfrac_std=0.125,
        brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
        brightness_std=0.2, contrast_std=0.5, hue_max=1.0, saturation_std=1.0,
        imgfilter=0, imgfilter_bands=(1, 1, 1, 1), imgfilter_std=1.0,
        noise=0, cutout=0, noise_std=0.1, cutout_size=0.5,
        geom_margin_frac=0.25, geom_impl="auto",
    ):
        # geom_impl: "exact" = per-pixel bilinear gather (bit-parity with the
        # reference grid_sample); "fast" = Catmull-Smith two-pass warp with
        # the Pallas row-shift kernel (gather-free, 35–54× over the XLA
        # shift engines at the 432² canvas — benchmarks/results/ada_warp.json
        # — triple-lerp numerics within second-order interpolation error);
        # "auto" = fast on TPU, exact elsewhere.
        self.__dict__.update(
            {k: v for k, v in locals().items() if k not in ("self",)}
        )
        self.Hz_geom = np.asarray(setup_filter(jnp.asarray(WAVELETS["sym6"])))
        self.Hz_fbank = _build_fbank()

    @classmethod
    def from_spec(cls, spec: str = "bgc", **kw):
        return cls(**cls.SPECS[spec], **kw)

    def __call__(self, rng: jax.Array, images: jax.Array, p,
                 debug_percentile=None) -> jax.Array:
        """``debug_percentile`` replaces every random draw with its percentile
        value — the reference's deterministic testing hook
        (``augment.py:402-405`` and per-op ``if debug_percentile`` blocks)."""
        from jax.scipy.special import erfinv

        N, H, W, C = images.shape
        p = jnp.asarray(p, jnp.float32)
        keys = iter(jax.random.split(rng, 40))
        nk = lambda: next(keys)
        dp = debug_percentile

        # ---- pixel blitting + geometry: compose inverse affine ----
        G_inv = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
        used_geom = False
        if self.xflip > 0:
            i = jnp.floor(jax.random.uniform(nk(), (N,)) * 2)
            i = jnp.where(jax.random.uniform(nk(), (N,)) < self.xflip * p, i, 0.0)
            if dp is not None:
                i = jnp.full((N,), float(np.floor(dp * 2)))
            G_inv = G_inv @ scale2d_inv(1 - 2 * i, jnp.ones_like(i))
            used_geom = True
        if self.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(nk(), (N,)) * 4)
            i = jnp.where(jax.random.uniform(nk(), (N,)) < self.rotate90 * p, i, 0.0)
            if dp is not None:
                i = jnp.full((N,), float(np.floor(dp * 4)))
            G_inv = G_inv @ rotate2d_inv(-np.pi / 2 * i)
            used_geom = True
        if self.xint > 0:
            t = (jax.random.uniform(nk(), (N, 2)) * 2 - 1) * self.xint_max
            t = jnp.where(jax.random.uniform(nk(), (N, 1)) < self.xint * p, t, 0.0)
            if dp is not None:
                t = jnp.full((N, 2), (dp * 2 - 1) * self.xint_max)
            G_inv = G_inv @ translate2d_inv(
                jnp.round(t[:, 0] * W), jnp.round(t[:, 1] * H)
            )
            used_geom = True
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(nk(), (N,)) * self.scale_std)
            s = jnp.where(jax.random.uniform(nk(), (N,)) < self.scale * p, s, 1.0)
            if dp is not None:
                s = jnp.full(
                    (N,), float(2 ** (float(erfinv(dp * 2 - 1)) * self.scale_std))
                )
            G_inv = G_inv @ scale2d_inv(s, s)
            used_geom = True
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
        if self.rotate > 0:
            theta = (jax.random.uniform(nk(), (N,)) * 2 - 1) * np.pi * self.rotate_max
            theta = jnp.where(jax.random.uniform(nk(), (N,)) < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.full((N,), (dp * 2 - 1) * np.pi * self.rotate_max)
            G_inv = G_inv @ rotate2d_inv(-theta)
            used_geom = True
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(nk(), (N,)) * self.aniso_std)
            s = jnp.where(jax.random.uniform(nk(), (N,)) < self.aniso * p, s, 1.0)
            if dp is not None:
                s = jnp.full(
                    (N,), float(2 ** (float(erfinv(dp * 2 - 1)) * self.aniso_std))
                )
            G_inv = G_inv @ scale2d_inv(s, 1.0 / s)
            used_geom = True
        if self.rotate > 0:
            theta = (jax.random.uniform(nk(), (N,)) * 2 - 1) * np.pi * self.rotate_max
            theta = jnp.where(jax.random.uniform(nk(), (N,)) < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.zeros((N,))
            G_inv = G_inv @ rotate2d_inv(-theta)
        if self.xfrac > 0:
            t = jax.random.normal(nk(), (N, 2)) * self.xfrac_std
            t = jnp.where(jax.random.uniform(nk(), (N, 1)) < self.xfrac * p, t, 0.0)
            if dp is not None:
                t = jnp.full((N, 2), float(erfinv(dp * 2 - 1)) * self.xfrac_std)
            G_inv = G_inv @ translate2d_inv(t[:, 0] * W, t[:, 1] * H)
            used_geom = True

        if used_geom:
            images, G_inv = self._execute_geom(images, G_inv)

        # ---- color matrix ----
        Cm = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))
        used_color = False
        v_luma = jnp.asarray([1, 1, 1, 0], jnp.float32) / np.sqrt(3)
        if self.brightness > 0:
            b = jax.random.normal(nk(), (N,)) * self.brightness_std
            b = jnp.where(jax.random.uniform(nk(), (N,)) < self.brightness * p, b, 0.0)
            if dp is not None:
                b = jnp.full((N,), float(erfinv(dp * 2 - 1)) * self.brightness_std)
            Cm = translate3d(b, b, b) @ Cm
            used_color = True
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(nk(), (N,)) * self.contrast_std)
            c = jnp.where(jax.random.uniform(nk(), (N,)) < self.contrast * p, c, 1.0)
            if dp is not None:
                c = jnp.full(
                    (N,), float(2 ** (float(erfinv(dp * 2 - 1)) * self.contrast_std))
                )
            Cm = scale3d(c, c, c) @ Cm
            used_color = True
        if self.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(nk(), (N, 1, 1)) * 2)
            i = jnp.where(
                jax.random.uniform(nk(), (N, 1, 1)) < self.lumaflip * p, i, 0.0
            )
            if dp is not None:
                i = jnp.full((N, 1, 1), float(np.floor(dp * 2)))
            vv = jnp.outer(v_luma, v_luma)
            Cm = (jnp.eye(4) - 2 * vv * i) @ Cm
            used_color = True
        if self.hue > 0 and C > 1:
            theta = (jax.random.uniform(nk(), (N,)) * 2 - 1) * np.pi * self.hue_max
            theta = jnp.where(jax.random.uniform(nk(), (N,)) < self.hue * p,
                              theta, 0.0)
            if dp is not None:
                theta = jnp.full((N,), (dp * 2 - 1) * np.pi * self.hue_max)
            Cm = rotate3d(v_luma[:3], theta) @ Cm
            used_color = True
        if self.saturation > 0 and C > 1:
            s = jnp.exp2(jax.random.normal(nk(), (N, 1, 1)) * self.saturation_std)
            s = jnp.where(
                jax.random.uniform(nk(), (N, 1, 1)) < self.saturation * p, s, 1.0
            )
            if dp is not None:
                s = jnp.full(
                    (N, 1, 1),
                    float(2 ** (float(erfinv(dp * 2 - 1)) * self.saturation_std)),
                )
            vv = jnp.outer(v_luma, v_luma)
            Cm = (vv + (jnp.eye(4) - vv) * s) @ Cm
            used_color = True

        if used_color:
            if C == 3:
                # Elementwise formulation: per-sample 3x3+bias as broadcast
                # multiply-adds — a batched (HW,3)x(3,3) matmul lowers terribly
                # on the MXU (3-wide contractions), ~5x whole-step cost.
                M = Cm[:, :3, :3][:, None, None, :, :]   # (N,1,1,3,3)
                bias = Cm[:, :3, 3][:, None, None, :]    # (N,1,1,3)
                images = (
                    jnp.sum(M * images[..., None, :], axis=-1) + bias
                )
            elif C == 1:
                cm = jnp.mean(Cm[:, :3, :], axis=1)      # (N, 4)
                scale = jnp.sum(cm[:, :3], axis=1)[:, None, None, None]
                images = images * scale + cm[:, 3][:, None, None, None]

        # ---- image-space filtering (per-band amplification) ----
        if self.imgfilter > 0:
            num_bands = self.Hz_fbank.shape[0]
            expected_power = jnp.asarray([10, 1, 1, 1], jnp.float32) / 13.0
            g = jnp.ones((N, num_bands))
            for i, band_strength in enumerate(self.imgfilter_bands):
                t_i = jnp.exp2(jax.random.normal(nk(), (N,)) * self.imgfilter_std)
                t_i = jnp.where(
                    jax.random.uniform(nk(), (N,)) < self.imgfilter * p * band_strength,
                    t_i, 1.0,
                )
                if dp is not None:
                    t_i = (
                        jnp.full(
                            (N,),
                            float(2 ** (float(erfinv(dp * 2 - 1))
                                        * self.imgfilter_std)),
                        )
                        if band_strength > 0
                        else jnp.ones((N,))
                    )
                t = jnp.ones((N, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(
                    jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True)
                )
                g = g * t
            Hz_prime = g @ jnp.asarray(self.Hz_fbank)  # (N, taps)
            taps = Hz_prime.shape[1]
            pad = self.Hz_fbank.shape[1] // 2
            # Fold batch into channels for per-sample depthwise filtering.
            x = jnp.transpose(images, (1, 2, 0, 3)).reshape(1, H, W, N * C)
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode="reflect")
            ker = jnp.repeat(Hz_prime[:, None, :], C, axis=1).reshape(N * C, taps)
            ker_v = ker.T[:, None, None, :]  # (taps, 1, 1, N*C)
            x = jax.lax.conv_general_dilated(
                x, ker_v, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=N * C,
            )
            ker_h = ker.T[None, :, None, :]
            x = jax.lax.conv_general_dilated(
                x, ker_h, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=N * C,
            )
            images = jnp.transpose(x.reshape(H, W, N, C), (2, 0, 1, 3))

        # ---- corruptions ----
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(nk(), (N, 1, 1, 1))) * self.noise_std
            sigma = jnp.where(
                jax.random.uniform(nk(), (N, 1, 1, 1)) < self.noise * p, sigma, 0.0
            )
            if dp is not None:
                sigma = jnp.full((N, 1, 1, 1),
                                 float(erfinv(dp)) * self.noise_std)
            images = images + jax.random.normal(nk(), images.shape) * sigma
        if self.cutout > 0:
            size = jnp.full((N, 2, 1, 1), self.cutout_size)
            size = jnp.where(
                jax.random.uniform(nk(), (N, 1, 1, 1)) < self.cutout * p, size, 0.0
            )
            center = jax.random.uniform(nk(), (N, 2, 1, 1))
            if dp is not None:
                size = jnp.full((N, 2, 1, 1), self.cutout_size)
                center = jnp.full((N, 2, 1, 1), dp)
            coord_x = jnp.arange(W).reshape(1, 1, -1)
            coord_y = jnp.arange(H).reshape(1, -1, 1)
            mask_x = (
                jnp.abs((coord_x + 0.5) / W - center[:, 0]) >= size[:, 0] / 2
            )
            mask_y = (
                jnp.abs((coord_y + 0.5) / H - center[:, 1]) >= size[:, 1] / 2
            )
            mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
            images = images * mask[..., None]
        return images

    # -- geometric execution (augment.py:540-607) ---------------------------

    def _execute_geom(self, images, G_inv):
        N, H, W, C = images.shape
        f = jnp.asarray(self.Hz_geom)
        Hz_pad = self.Hz_geom.shape[0] // 4
        # Static margin (see module docstring).
        mx = int(np.ceil(W * self.geom_margin_frac)) + Hz_pad * 2
        my = int(np.ceil(H * self.geom_margin_frac)) + Hz_pad * 2
        mx = min(mx, W - 1)
        my = min(my, H - 1)
        images = jnp.pad(
            images, ((0, 0), (my, my), (mx, mx), (0, 0)), mode="reflect"
        )
        # Symmetric margins: the (mx0-mx1)/2 origin shift is zero.

        # Upsample 2x with the orthogonal wavelet filter.
        images = upsample2d(images, f, up=2)
        two = jnp.asarray(2.0)
        G_inv = (
            jnp.broadcast_to(scale2d(two, two), (N, 3, 3))
            @ G_inv
            @ jnp.broadcast_to(scale2d_inv(two, two), (N, 3, 3))
        )
        t_half = jnp.asarray(-0.5)
        G_inv = (
            jnp.broadcast_to(translate2d(t_half, t_half), (N, 3, 3))
            @ G_inv
            @ jnp.broadcast_to(translate2d_inv(t_half, t_half), (N, 3, 3))
        )

        # Output grid: same padded size as the warp input.
        Hp = H + 2 * my
        Wp = W + 2 * mx
        in_h, in_w = images.shape[1], images.shape[2]
        G_inv = (
            jnp.broadcast_to(
                scale2d(jnp.asarray(2.0 / in_w), jnp.asarray(2.0 / in_h)),
                (N, 3, 3),
            )
            @ G_inv
            @ jnp.broadcast_to(
                scale2d_inv(jnp.asarray(2.0 / (Wp * 2)), jnp.asarray(2.0 / (Hp * 2))),
                (N, 3, 3),
            )
        )
        use_fast = self.geom_impl == "fast" or (
            self.geom_impl == "auto" and jax.default_backend() == "tpu"
        )
        if use_fast and images.shape[1] == images.shape[2]:
            # Gather-free two-pass warp (fast_warp + Pallas row shifts).
            # Convert the normalized-coords affine to pixel space:
            #   px = (G·[x_n, y_n, 1] + 1)·in/2 − 0.5,  x_n = (2·xo+1)/Wo − 1.
            in_h, in_w = images.shape[1], images.shape[2]
            Ho, Wo = Hp * 2, Wp * 2
            G2 = G_inv[:, :2, :]
            a = G2[:, 0, 0] * (in_w / Wo)
            b = G2[:, 0, 1] * (in_w / Ho)
            tx = (in_w / 2.0) * (
                G2[:, 0, 0] * (1.0 / Wo - 1.0)
                + G2[:, 0, 1] * (1.0 / Ho - 1.0)
                + G2[:, 0, 2] + 1.0
            ) - 0.5
            c = G2[:, 1, 0] * (in_h / Wo)
            d = G2[:, 1, 1] * (in_h / Ho)
            ty = (in_h / 2.0) * (
                G2[:, 1, 0] * (1.0 / Wo - 1.0)
                + G2[:, 1, 1] * (1.0 / Ho - 1.0)
                + G2[:, 1, 2] + 1.0
            ) - 0.5
            A_px = jnp.stack(
                [jnp.stack([a, b], -1), jnp.stack([c, d], -1)], axis=1
            )
            t_px = jnp.stack([tx, ty], -1)
            from ic_gan_tpu.data.fast_warp import affine_warp

            images = affine_warp(images, A_px, t_px)
        else:
            # affine_grid(align_corners=False): output pixel centres in
            # [-1, 1].
            ys = (2.0 * jnp.arange(Hp * 2) + 1.0) / (Hp * 2) - 1.0
            xs = (2.0 * jnp.arange(Wp * 2) + 1.0) / (Wp * 2) - 1.0
            gx, gy = jnp.meshgrid(xs, ys)
            ones = jnp.ones_like(gx)
            base = jnp.stack([gx, gy, ones], axis=-1)  # (Ho, Wo, 3)
            grid = jnp.einsum("nij,hwj->nhwi", G_inv[:, :2, :], base)
            images = grid_sample_bilinear(images, grid)

        # Downsample and crop back to (H, W).
        images = downsample2d(
            images, f, down=2, padding=-Hz_pad * 2, flip_filter=True
        )
        # Crop the margins.
        h2, w2 = images.shape[1], images.shape[2]
        y0 = (h2 - H) // 2
        x0 = (w2 - W) // 2
        images = images[:, y0 : y0 + H, x0 : x0 + W, :]
        return images, G_inv
