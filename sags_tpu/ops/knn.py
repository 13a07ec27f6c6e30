"""k-NN queries and mean k-NN distance — TPU-native equivalent of simple-knn.

The reference's `distCUDA2(points) -> mean squared distance to the 3 nearest
neighbors` (`submodules/simple-knn/simple_knn.cu:185-221`) drives Gaussian scale
initialization in the classic 3DGS path (`scene/gaussian_model.py:20,~130`).

The CUDA version is an *approximate* kNN (Morton-sorted 1024-point boxes with
box-distance culling, `simple_knn.cu:78-183`). On TPU we compute the exact
answer with blocked distance matrices: queries are processed in chunks so the
[chunk, N] distance block stays resident in VMEM-sized working sets, and the
top-k reduction is `lax.top_k` on the negated distances. Exact ≥ approximate
for this use (scale init), and the MXU does the heavy lifting via the
‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b expansion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunked_neg_sqdist_topk(queries, points, k, chunk):
    """Return (neg_sqdist_topk, idx_topk) for each query, blocked over queries."""
    n = queries.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)
    pt_sq = jnp.sum(points * points, axis=-1)  # [N]

    def body(carry, qc):
        # d2[i,j] = |qc_i|^2 + |p_j|^2 - 2 qc_i . p_j  (MXU matmul)
        dots = qc @ points.T
        d2 = jnp.sum(qc * qc, axis=-1)[:, None] + pt_sq[None, :] - 2.0 * dots
        neg, idx = jax.lax.top_k(-d2, k)
        return carry, (neg, idx)

    _, (neg, idx) = jax.lax.scan(body, None, q)
    neg = neg.reshape(-1, k)[:n]
    idx = idx.reshape(-1, k)[:n]
    return neg, idx


@functools.partial(jax.jit, static_argnames=("k", "chunk", "exclude_self"))
def knn(
    queries: jax.Array,
    points: jax.Array,
    k: int,
    chunk: int = 1024,
    exclude_self: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest neighbors of `queries` [M,3] within `points` [N,3].

    Returns (sq_dists [M,k], indices [M,k]) sorted ascending by distance.
    With `exclude_self=True`, searches k+1 and drops the first hit (assumed to
    be the query itself — the simple-knn self-query setting).
    """
    kk = k + 1 if exclude_self else k
    neg, idx = _chunked_neg_sqdist_topk(queries, points, kk, chunk)
    d2 = jnp.maximum(-neg, 0.0)
    if exclude_self:
        d2, idx = d2[:, 1:], idx[:, 1:]
    return d2, idx


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_knn3_sqdist(points: jax.Array, chunk: int = 1024) -> jax.Array:
    """`distCUDA2` equivalent: mean squared distance to the 3 nearest neighbors.

    Reference semantics: `simple_knn.cu:147-183` (best-3 scan, self excluded),
    consumed at `scene/gaussian_model.py` for scale init
    (`dist2 = clamp_min(distCUDA2(pts), 1e-7)`).
    """
    d2, _ = knn(points, points, k=3, chunk=chunk, exclude_self=True)
    return jnp.mean(d2, axis=-1)


def scale_init_from_points(points: jax.Array) -> jax.Array:
    """Classic 3DGS scale init: log(sqrt(clamp(mean-3NN-dist², 1e-7))) per axis."""
    dist2 = jnp.clip(mean_knn3_sqdist(points), 1e-7, None)
    return jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
