"""The "official" TF1 Inception IS/FID — executed natively, no TensorFlow.

The reference's canonical numbers come from the frozen 2015 Inception
classifier run under TF1 (``data_utils/inception_tf13.py``): images in
[0,255] are fed to ``ExpandDims:0``, ``pool_3:0`` (2048-d) feeds FID moments,
and IS uses ``softmax(matmul(squeeze(pool_3), W))`` with ``W`` pulled from
the graph's ``softmax/logits/MatMul`` node (``inception_tf13.py:162-186``).

TF1 cannot exist in this environment, so this module executes the *same
graph* with JAX: ``io/graphdef.py`` decodes ``classify_image_graph_def.pb``
(env-gated — ``$ICGAN_TF_INCEPTION_PB``; zero egress means no download), and
``TFGraphExecutor`` interprets the op set frozen classifier graphs use
(Conv2D / BatchNormWithGlobalNormalization / pooling / concat / the legacy
ResizeBilinear grid), jitted end-to-end. IS/FID then follow the reference's
exact split-KL and moment formulas (``inception_tf13.py:120-160,269-272``).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.io.graphdef import NodeDef, parse_graphdef


def _resize_bilinear_tf_legacy(x, out_h, out_w, align_corners=False):
    """TF1 ``ResizeBilinear`` (half_pixel_centers=False): src = dst * in/out
    — the legacy grid, NOT half-pixel. ``align_corners`` uses (in-1)/(out-1).
    Implemented as two dense interpolation matmuls (MXU-friendly)."""
    in_h, in_w = x.shape[1], x.shape[2]

    def axis_matrix(n_in, n_out):
        if align_corners and n_out > 1:
            scale = (n_in - 1) / (n_out - 1)
        else:
            scale = n_in / n_out
        src = np.arange(n_out, dtype=np.float64) * scale
        i0 = np.floor(src).astype(np.int64)
        i0 = np.clip(i0, 0, n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        frac = (src - i0).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), i0] += 1 - frac
        m[np.arange(n_out), i1] += frac
        return jnp.asarray(m)

    mh = axis_matrix(in_h, out_h)
    mw = axis_matrix(in_w, out_w)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("ow,nhwc->nhoc", mw, x)
    return x


def _pool(x, ksize, strides, padding, kind):
    window = tuple(ksize)
    strides = tuple(strides)
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides, padding)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    if padding == "VALID":
        return summed / np.prod(ksize)
    # TF AvgPool with SAME padding averages over in-bounds elements only.
    counts = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add,
                                   window, strides, padding)
    return summed / counts


class TFGraphExecutor:
    """Interpret a frozen TF GraphDef with JAX ops (NHWC native).

    ``feed`` names a node whose *output* is supplied by the caller (the
    reference feeds ``ExpandDims:0``); everything upstream of it is cut.
    ``fetches`` are node names to return. The traced function is jittable —
    wrap calls in ``jax.jit`` (done by ``OfficialTF1Evaluator``).
    """

    SUPPORTED = {
        "Const", "Identity", "Placeholder", "ExpandDims", "Cast",
        "ResizeBilinear", "Sub", "Mul", "Add", "Conv2D",
        "BatchNormWithGlobalNormalization", "Relu", "MaxPool", "AvgPool",
        "Concat", "ConcatV2", "Reshape", "MatMul", "BiasAdd", "Softmax",
        "Squeeze",
    }

    def __init__(self, nodes: Sequence[NodeDef], feed: str,
                 fetches: Sequence[str]):
        self.nodes: Dict[str, NodeDef] = {n.name: n for n in nodes}
        self.feed = feed
        self.fetches = list(fetches)
        self._consts: Dict[str, np.ndarray] = {}
        for n in nodes:
            if n.op == "Const":
                self._consts[n.name] = np.asarray(n.attrs["value"].tensor)

    def const(self, name: str) -> np.ndarray:
        """A Const node's tensor (e.g. the softmax MatMul weights)."""
        return self._consts[name.split(":")[0]]

    def __call__(self, fed_value: jax.Array) -> List[jax.Array]:
        cache: Dict[str, jax.Array] = {self.feed: fed_value}

        def ref(inp: str) -> jax.Array:
            # "name", "name:0", "^name" (control deps ignored upstream)
            name = inp.lstrip("^").split(":")[0]
            return evaluate(name)

        def evaluate(name: str) -> jax.Array:
            if name in cache:
                return cache[name]
            node = self.nodes[name]
            out = self._run_node(node, ref)
            cache[name] = out
            return out

        return [evaluate(f.split(":")[0]) for f in self.fetches]

    def _run_node(self, node: NodeDef, ref):
        op, a = node.op, node.attrs
        ins = [i for i in node.inputs if not i.startswith("^")]
        if op == "Const":
            return jnp.asarray(self._consts[node.name])
        if op in ("Identity", "ExpandDims", "Cast", "CheckNumerics"):
            # ExpandDims only appears as the feed in this flow; when executed
            # (synthetic graphs) it behaves as written:
            if op == "ExpandDims":
                x = ref(ins[0])
                axis = int(np.asarray(self._consts[ins[1].split(":")[0]]))
                return jnp.expand_dims(x, axis)
            if op == "Cast":
                return ref(ins[0]).astype(_np_dtype(a.get("DstT")))
            return ref(ins[0])
        if op == "ResizeBilinear":
            x = ref(ins[0])
            size = np.asarray(self._consts[ins[1].split(":")[0]]).astype(np.int64)
            ac = bool(a["align_corners"].b) if "align_corners" in a else False
            return _resize_bilinear_tf_legacy(x, int(size[0]), int(size[1]), ac)
        if op in ("Sub", "Mul", "Add"):
            x, y = ref(ins[0]), ref(ins[1])
            return {"Sub": jnp.subtract, "Mul": jnp.multiply,
                    "Add": jnp.add}[op](x, y)
        if op == "Conv2D":
            x, w = ref(ins[0]), ref(ins[1])
            strides = list(a["strides"].list_i) or [1, 1, 1, 1]
            padding = a["padding"].s.decode()
            return jax.lax.conv_general_dilated(
                x, w, window_strides=strides[1:3], padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if op == "BatchNormWithGlobalNormalization":
            x, m, v, beta, gamma = (ref(i) for i in ins[:5])
            eps = float(a["variance_epsilon"].f)
            scale_after = (bool(a["scale_after_normalization"].b)
                           if "scale_after_normalization" in a else True)
            inv = jax.lax.rsqrt(v + eps)
            if scale_after:
                inv = inv * gamma
            return x * inv + (beta - m * inv)
        if op == "Relu":
            return jax.nn.relu(ref(ins[0]))
        if op in ("MaxPool", "AvgPool"):
            return _pool(ref(ins[0]), a["ksize"].list_i, a["strides"].list_i,
                         a["padding"].s.decode(),
                         "max" if op == "MaxPool" else "avg")
        if op == "Concat":  # axis first (TF1)
            axis = int(np.asarray(self._consts[ins[0].split(":")[0]]))
            return jnp.concatenate([ref(i) for i in ins[1:]], axis=axis)
        if op == "ConcatV2":  # axis last
            axis = int(np.asarray(self._consts[ins[-1].split(":")[0]]))
            return jnp.concatenate([ref(i) for i in ins[:-1]], axis=axis)
        if op == "Reshape":
            shape = np.asarray(self._consts[ins[1].split(":")[0]]).astype(np.int64)
            x = ref(ins[0])
            # Batch-size generalization (inception_tf13.py:188-199 patches
            # shapes so batch>1 works): leading 1 → -1.
            shape = list(shape)
            if shape and shape[0] == 1:
                shape[0] = -1
            return jnp.reshape(x, shape)
        if op == "MatMul":
            x, y = ref(ins[0]), ref(ins[1])
            if a.get("transpose_a") and a["transpose_a"].b:
                x = x.T
            if a.get("transpose_b") and a["transpose_b"].b:
                y = y.T
            return x @ y
        if op == "BiasAdd":
            return ref(ins[0]) + ref(ins[1])
        if op == "Softmax":
            return jax.nn.softmax(ref(ins[0]), axis=-1)
        if op == "Squeeze":
            dims = tuple(a["squeeze_dims"].list_i) if "squeeze_dims" in a else None
            return jnp.squeeze(ref(ins[0]), axis=dims)
        raise NotImplementedError(f"op {op} (node {node.name})")


def _np_dtype(attr) -> np.dtype:
    from ic_gan_tpu.io.graphdef import DTYPES

    if attr is None or attr.type is None:
        return np.float32
    return np.dtype(DTYPES.get(attr.type, np.float32))


class OfficialTF1Evaluator:
    """pool_3 features + 1008-way softmax from the frozen 2015 graph.

    ``pb_path`` (or ``$ICGAN_TF_INCEPTION_PB``) must point to a local
    ``classify_image_graph_def.pb`` — the reference downloads it
    (``inception_tf13.py:40-42``); zero egress here, so it is env-gated the
    same way as every other pretrained artifact in this repo.

    Images: NHWC float in **[0, 255]** (the reference's
    ``np.uint8(255*(x+1)/2)`` hop happens in ``evaluate_npz_samples``).
    """

    def __init__(self, pb_path: Optional[str] = None):
        pb_path = pb_path or os.environ.get("ICGAN_TF_INCEPTION_PB")
        if not pb_path or not os.path.exists(pb_path):
            raise FileNotFoundError(
                "classify_image_graph_def.pb not found — set "
                "$ICGAN_TF_INCEPTION_PB to a local copy (the reference "
                "downloads inception-2015-12-05.tgz; this environment "
                "cannot).")
        with open(pb_path, "rb") as f:
            nodes = parse_graphdef(f.read())
        self.exe = TFGraphExecutor(nodes, feed="ExpandDims",
                                   fetches=["pool_3"])
        # softmax weights: the reference rebuilds logits = pool3 @ W with W
        # from the graph (inception_tf13.py:183-186) — no bias.
        self.w = jnp.asarray(self.exe.const(
            self.exe.nodes["softmax/logits/MatMul"].inputs[1]))

        def run(images):
            pool = self.exe(images)[0]  # (N,1,1,2048)
            pool = pool.reshape(pool.shape[0], -1)
            preds = jax.nn.softmax(pool @ self.w, axis=-1)
            return pool, preds

        self._run = jax.jit(run)

    def __call__(self, images_255: jax.Array) -> Tuple[np.ndarray, np.ndarray]:
        pool, preds = self._run(jnp.asarray(images_255, jnp.float32))
        return np.asarray(pool), np.asarray(preds)


def official_inception_score(preds: np.ndarray, splits: int = 10
                             ) -> Tuple[float, float]:
    """The reference's split-KL IS (``inception_tf13.py:148-159``)."""
    scores = []
    n = preds.shape[0]
    for i in range(splits):
        part = preds[i * n // splits:(i + 1) * n // splits]
        kl = part * (np.log(part) - np.log(np.mean(part, 0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    return float(np.mean(scores)), float(np.std(scores))


def evaluate_images(evaluator: OfficialTF1Evaluator, images: np.ndarray,
                    batch: int = 100, normalize: bool = True,
                    splits: int = 10) -> Dict[str, np.ndarray]:
    """images NHWC; ``normalize`` maps [-1,1]→uint8 [0,255] like
    ``inception_tf13.py:132-135``. Returns IS, pool activations, moments."""
    if normalize:
        images = np.uint8(255 * (np.asarray(images) + 1) / 2.0)
    images = np.asarray(images, np.float32)
    pools, preds = [], []
    for i in range(int(math.ceil(len(images) / batch))):
        p, s = evaluator(images[i * batch:(i + 1) * batch])
        pools.append(p)
        preds.append(s)
    pools = np.concatenate(pools)
    preds = np.concatenate(preds)
    is_mean, is_std = official_inception_score(preds, splits)
    return {
        "IS_mean": is_mean, "IS_std": is_std, "pool": pools,
        "mu": np.mean(pools, axis=0), "sigma": np.cov(pools, rowvar=False),
    }
