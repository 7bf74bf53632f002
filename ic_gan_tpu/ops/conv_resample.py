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
        # FIR (depthwise) with the full padding, then strided dense conv.
        y = upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        return conv(y, strides=(down, down))

    # Plain conv.
    y = upfirdn2d(x, None, padding=(px0, px1, py0, py1))
    return conv(y)
