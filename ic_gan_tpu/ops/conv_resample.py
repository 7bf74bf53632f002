"""2-D convolution with fused up/down-sampling (NHWC).

Reference: ``stylegan2_ada_pytorch/torch_utils/ops/conv2d_resample.py:79-216``.
The reference picks among five CUDA fast paths; on TPU the same arithmetic is
expressed directly in ``lax.conv_general_dilated``:

- upsampling  → ``lhs_dilation`` on the dense conv (zero-stuffing fused into
  the MXU conv, no transpose-conv gymnastics), then the low-pass FIR at full
  resolution (LTI ops commute, so filtering after the conv equals the
  reference's pre-filtering).
- downsampling → FIR first (depthwise), then a strided dense conv.

All padding is applied once up front, in upsampled coordinates, with the same
filter-halo adjustments as the reference (``conv2d_resample.py:118-127``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.resample import upfirdn2d, _quad, _filter_size


def _is_symmetric_const(f) -> bool:
    """True iff ``f`` is a trace-time constant and spatially symmetric.

    The fused fast paths below build K = w ⊛ f (a convolution), while
    upfirdn2d *correlates* with f — identical only when f == flip(f).  Every
    SG2 resample filter (binomial setup_filter output) is symmetric, but the
    filter is user-configurable, so gate on the actual values; traced
    (non-constant) filters fall back to the generic exact path."""
    try:
        import numpy as np

        arr = np.asarray(f)
    except Exception:
        return False
    flipped = arr[::-1] if arr.ndim == 1 else arr[::-1, ::-1]
    return bool(np.allclose(arr, flipped))


def _compose_kernel(w, f2d):
    """Full 2-D convolution of a conv kernel with a (symmetric) FIR filter:
    correlations compose as corr(corr(x, F), W) = corr(x, F ⊛ W), so the
    composite K replaces the separate FIR pass exactly.  w (kh,kw,I,O),
    f2d (fh,fw) → K (kh+fh−1, kw+fw−1, I, O), f32."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fh, fw = int(f2d.shape[0]), int(f2d.shape[1])
    io = int(w.shape[2]) * int(w.shape[3])
    w_flat = jnp.transpose(
        w.reshape(kh, kw, io), (2, 0, 1)
    )[:, :, :, None]  # (IO, kh, kw, 1) as NHWC batch
    fk = f2d[::-1, ::-1][:, :, None, None]
    K = jax.lax.conv_general_dilated(
        w_flat.astype(jnp.float32), fk.astype(jnp.float32),
        window_strides=(1, 1),
        padding=((fh - 1, fh - 1), (fw - 1, fw - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (IO, kh+fh-1, kw+fw-1, 1)
    return jnp.transpose(K[..., 0], (1, 2, 0)).reshape(
        kh + fh - 1, kw + fw - 1, int(w.shape[2]), int(w.shape[3])
    )


def _conv_up2_polyphase(x, w, f2d, py0, px0, groups):
    """Exact polyphase rewrite of ``conv(lhs_dil=2) → full-res FIR`` for the
    SG2 hot geometry (3×3 kernel, up=2, 4-tap filter, padding=1 ⇒ py0=3).

    True convolutions compose: the chain equals one VALID conv of the
    zero-stuffed input with the 6×6 composite kernel K = w ⊛ f.  Splitting K
    by output parity gives four 3×3 phase kernels applied to x directly at
    *input* resolution with SAME padding — 9 MACs per output pixel, the same
    arithmetic as the plain conv, and the (N, 2H, 2W, C) FIR temp (an
    HBM-bound depthwise pass over the full-resolution tensor) never exists.
    Derivation: phase a ∈ {0,1} (output row n = 2q+a) keeps taps
    t ≡ (py0−a) mod 2 of K, reading x[q−1 .. q+1] when py0 = 3.
    Exact up to float associativity (oracle-tested in
    ``tests/test_fused_resample.py``).
    """
    K = _compose_kernel(w, f2d)
    # Phase split: taps t ≡ (py0 − a) mod 2 per dim; 4·(Kh//2 rounded) taps.
    phases = []
    for a in (0, 1):
        t0h = (py0 - a) % 2
        for b in (0, 1):
            t0w = (px0 - b) % 2
            phases.append(K[t0h::2, t0w::2])  # (3, 3, I, O) for the SG2 case
    Kp = jnp.concatenate(phases, axis=-1).astype(x.dtype)  # (3,3,I,4O)
    y = jax.lax.conv_general_dilated(
        x, Kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    n, h, wd = x.shape[0], x.shape[1], x.shape[2]
    co = int(w.shape[3])
    y = y.reshape(n, h, wd, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # N, H, a, W, b, C
    return y.reshape(n, 2 * h, 2 * wd, co)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jax.Array:
    """Args mirror the reference; ``x`` is NHWC, ``w`` is HWIO.

    ``flip_weight=True`` means correlation (torch ``F.conv2d`` semantics,
    which is also XLA's native conv); ``False`` flips the kernel spatially.
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = _quad(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    w = w.astype(x.dtype)

    def conv(inp, strides=(1, 1), pad="VALID", lhs_dil=(1, 1)):
        return jax.lax.conv_general_dilated(
            inp,
            w,
            window_strides=strides,
            padding=pad,
            lhs_dilation=lhs_dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    if up > 1:
        # Fast path: the SG2 hot geometry (3×3 kernel, 2× up, 4-tap
        # symmetric filter, SAME padding) — the dilated conv and the
        # full-resolution FIR compose into four 3×3 phase convs at INPUT
        # resolution (see _conv_up2_polyphase): same MACs/output as a plain
        # 3×3 conv, and the HBM-bound depthwise FIR pass is gone (measured
        # 14-57 GB/s effective on XLA's 4×4 depthwise at SG2 shapes).
        if (
            up == 2 and down == 1 and groups == 1 and f is not None
            and kh == 3 and kw == 3
            and tuple(f.shape) in ((4,), (4, 4))
            and (py0, py1, px0, px1) == (3, 2, 3, 2)
            and _is_symmetric_const(f)
        ):
            f2d = jnp.outer(f, f) if f.ndim == 1 else f
            return _conv_up2_polyphase(
                x, w, f2d * float(up * up), py0, px0, groups
            )
        # Dense conv with lhs_dilation (zero-stuffing fused); trailing +up-1
        # matches the reference's trailing-zero upsampling convention.
        y = conv(
            x,
            pad=((py0, py1 + up - 1), (px0, px1 + up - 1)),
            lhs_dil=(up, up),
        )
        if f is not None:
            y = upfirdn2d(y, f, gain=up * up)
        else:
            y = y * float(up * up)
        if down > 1:
            y = upfirdn2d(y, f, down=down)
        return y

    if down > 1:
        # Fast path (SG2 D): compose the FIR into the strided conv —
        # corr(corr(x, F), W) stride 2 = one (k+3)² stride-2 dense conv of x.
        # 4× the conv MACs (negligible at D's channel widths) for zero
        # full-resolution depthwise FIR passes (measured 38-89 GB/s eff on
        # XLA's depthwise at these shapes).  Exact up to float associativity
        # (oracle-tested in tests/test_fused_resample.py).
        if (
            down == 2 and groups == 1 and f is not None
            and tuple(f.shape) in ((4,), (4, 4))
            and min(px0, px1, py0, py1) >= 0
            and _is_symmetric_const(f)
        ):
            f2d = jnp.outer(f, f) if f.ndim == 1 else f
            K = _compose_kernel(w, f2d).astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, K, (down, down), ((py0, py1), (px0, px1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
        # FIR (depthwise) with the full padding, then strided dense conv.
        y = upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        return conv(y, strides=(down, down))

    # Plain conv.
    y = upfirdn2d(x, None, padding=(px0, px1, py0, py1))
    return conv(y)
