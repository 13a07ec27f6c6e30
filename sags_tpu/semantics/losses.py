"""Semantic losses: per-pixel CE and the 3D neighborhood-consistency regularizer.

References:
  * CE: `cls_criterion = CrossEntropyLoss(reduction='none')`, normalized by
    log(num_classes) (`scripts/gaussian_splatting.py:216,802-803`).
  * `loss_cls_3d`: sample points, kNN in xyz, KL(sample ‖ neighbors), λ=2,
    /num_classes (`utils/loss_utils.py:71-112`; SLAM call with
    (xyz.detach(), softmax(classifier(obj_dc)), 5, 2, 300000, 1000) at
    `scripts/gaussian_splatting.py:812-814`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sags_tpu.ops.knn import knn


def object_ce_loss(logits: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """logits [K,H,W], labels [H,W] int → scalar CE / log(K).

    Gatherless: `take_along_axis` over the class dim costs ~100x the math on
    TPU (per-element gather + scatter backward); a one-hot select is a fused
    compare+sum.
    """
    K = logits.shape[0]
    logp = jax.nn.log_softmax(logits, axis=0)
    onehot = labels[None] == jnp.arange(K, dtype=labels.dtype)[:, None, None]
    picked = jnp.sum(jnp.where(onehot, logp, 0.0), axis=0)
    return -jnp.mean(picked) / jnp.log(jnp.float32(num_classes))


def loss_cls_3d(
    features: jax.Array,  # [N,3] xyz (stop-gradient'd by caller)
    predictions: jax.Array,  # [N,K] softmax probabilities
    rng: jax.Array,
    active: jax.Array,  # [N] bool — fixed-capacity map mask
    k: int = 5,
    lambda_val: float = 2.0,
    sample_size: int = 1000,
) -> jax.Array:
    """KL(sample ‖ its k xyz-neighbors), masked for the fixed-capacity map.

    The reference downsamples to max_points then samples `sample_size`
    (`loss_utils.py:86-99`); here inactive slots are pushed to +inf distance so
    they are never neighbors, and the sample is drawn from active slots via
    Gumbel-top-k on the mask.
    """
    N = features.shape[0]
    # Sample `sample_size` active indices (without replacement).
    scores = jnp.where(active, jax.random.uniform(rng, (N,)), -jnp.inf)
    _, sample_idx = jax.lax.top_k(scores, sample_size)
    sample_feat = features[sample_idx]
    sample_pred = predictions[sample_idx]

    # Neighbor search over active points only: inactive → far away.
    far = jnp.where(active[:, None], features, 1e10)
    _, nbr_idx = knn(sample_feat, far, k=k, chunk=min(1024, sample_size))
    nbr_pred = predictions[nbr_idx]  # [S,k,K]

    kl = sample_pred[:, None, :] * (
        jnp.log(sample_pred[:, None, :] + 1e-10) - jnp.log(nbr_pred + 1e-10)
    )
    loss = jnp.mean(jnp.sum(kl, axis=-1))
    num_classes = predictions.shape[-1]
    return lambda_val * loss / num_classes
