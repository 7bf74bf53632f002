"""Spectral normalization as a pure function with explicit power-iteration state.

Semantics follow the BigGAN spectral norm (reference:
``BigGAN_PyTorch/layers.py:39-112``): per weight matrix ``W`` of shape
``(out, in_flat)`` we keep ``num_svs`` left singular-vector estimates ``u`` of
shape ``(num_svs, out)``.  One power-iteration step (per call, per vector):

    v_i = normalize(gram_schmidt(u_i @ W,  {v_j : j<i}))
    u_i = normalize(gram_schmidt(v_i @ Wᵀ, {u_j : j<i}))
    σ_i = v_i @ Wᵀ @ u_iᵀ

and the normalized weight is ``W / σ_0``.  Gradients flow through ``W`` in both
the numerator and σ (u, v are treated as constants via ``stop_gradient``),
matching the reference where the power iteration runs under ``torch.no_grad()``
but the final σ matmul stays on the autograd tape.

TPU notes: these are tiny (1, out)·(out, in) matmuls; XLA fuses them into the
surrounding graph.  State is threaded functionally — the caller carries the
updated ``u`` (a Flax variable collection in the model layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, eps: float) -> jax.Array:
    # torch F.normalize semantics: x / max(||x||, eps)
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def power_iteration(
    w_mat: jax.Array,
    u: jax.Array,
    num_itrs: int = 1,
    eps: float = 1e-6,
):
    """Run ``num_itrs`` power-iteration steps estimating the top singular values.

    Args:
      w_mat: weight matrix ``(out, in_flat)``.
      u: current left singular-vector estimates ``(num_svs, out)``.
      num_itrs: number of power-iteration steps.
      eps: normalization epsilon.

    Returns:
      ``(svs, new_u, vs)`` where ``svs`` is ``(num_svs,)`` singular values
      (differentiable w.r.t. ``w_mat``), ``new_u`` is the updated state
      (gradient-stopped) and ``vs`` is ``(num_svs, in_flat)``.
    """
    num_svs = u.shape[0]
    w_ng = jax.lax.stop_gradient(w_mat)

    for _ in range(num_itrs):
        us, vs = [], []
        for i in range(num_svs):
            v = u[i] @ w_ng
            # Gram-Schmidt against previously-extracted right vectors.
            for v_prev in vs:
                v = v - (v @ v_prev) / (v_prev @ v_prev) * v_prev
            v = _l2_normalize(v, eps)
            vs.append(v)
            u_new = v @ w_ng.T
            for u_prev in us:
                u_new = u_new - (u_new @ u_prev) / (u_prev @ u_prev) * u_prev
            u_new = _l2_normalize(u_new, eps)
            us.append(u_new)
        u = jnp.stack(us)

    vs_arr = jnp.stack(vs)
    # σ_i = v_i @ Wᵀ @ u_iᵀ — differentiable through W only.
    svs = jnp.einsum("si,oi,so->s", vs_arr, w_mat, u)
    return svs, jax.lax.stop_gradient(u), vs_arr


def spectral_normalize(
    w: jax.Array,
    u: jax.Array,
    update: bool = True,
    num_itrs: int = 1,
    eps: float = 1e-6,
    transpose: bool = False,
):
    """Spectrally normalize an arbitrary-rank weight.

    The weight is viewed as ``(out, -1)`` with ``out`` = trailing dim for
    HWIO conv kernels / ``(in, out)`` linear kernels (JAX layout), i.e. we
    flatten all leading axes; this matches the reference's
    ``weight.view(out, -1)`` on OIHW/(out,in) up to the transpose that the
    converter applies.

    Args:
      w: weight array; trailing axis is the output dimension.
      u: ``(num_svs, out)`` power-iteration state.
      update: if False (eval mode), the state is not advanced — the returned
        ``u`` equals the input — but σ is still recomputed from the stored u
        (matching ``update=self.training`` in the reference).
      transpose: operate on Wᵀ (used by SNEmbedding where num_embeddings is
        the "output" dim).

    Returns:
      ``(w_bar, new_u, svs)``.
    """
    out_dim = w.shape[-1]
    w_mat = w.reshape(-1, out_dim).T  # (out, in_flat)
    if transpose:
        w_mat = w_mat.T
    svs, new_u, _ = power_iteration(w_mat, u, num_itrs=num_itrs, eps=eps)
    if not update:
        new_u = u
    return w / svs[0], new_u, jax.lax.stop_gradient(svs)
