"""Chamfer distance for point clouds, MXU-first.

Behavior parity with the reference ChamferLoss
(/root/reference/soft_intro_vae_3d/losses/chamfer_loss.py:5-35): for clouds
x, y of shape (B, N, 3) / (B, M, 3) it returns the per-sample

    sum_j min_i ||x_i - y_j||^2  +  sum_i min_j ||x_i - y_j||^2

as a (B,) vector (no reduction; callers reduce).

Two implementations:

* ``chamfer_distance`` — plain XLA: the (B, N, M) squared-distance matrix is
  built from one batched matmul (MXU) plus rank-1 norm terms, then reduced.
  Fully differentiable; XLA fuses the epilogue. Memory O(B*N*M).

* ``chamfer_distance_tiled`` — lax.scan over tiles of the second cloud, never
  materializing the full (N, M) matrix in HBM for both directions at once.
  Use for very large clouds where O(N*M) per batch element would blow HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_sqdist(x: Array, y: Array) -> Array:
    """Batched squared euclidean distances, (B,N,D),(B,M,D) -> (B,N,M).

    ||x_i - y_j||^2 = ||x_i||^2 + ||y_j||^2 - 2 <x_i, y_j>; the inner-product
    term is one batched matmul that XLA tiles onto the MXU.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xx = jnp.sum(jnp.square(x), axis=-1)  # (B, N)
    yy = jnp.sum(jnp.square(y), axis=-1)  # (B, M)
    # HIGHEST precision: the TPU default (bf16 MXU passes) loses ~1e-2
    # relative accuracy on the cancellation-prone xx+yy-2xy form, which is
    # visible in chamfer minima. The pallas kernel (ops/chamfer_pallas.py)
    # computes exact f32 sum-of-squares and is the fast path on TPU.
    xy = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return xx[:, :, None] + yy[:, None, :] - 2.0 * xy


def chamfer_distance(preds: Array, gts: Array) -> Array:
    """Reference-parity chamfer: (B, N, 3) clouds -> (B,) loss vector.

    Matches ChamferLoss.forward (chamfer_loss.py:11-17): P = dist(gts, preds);
    loss = sum_j min_over_gts P[:, :, j] + sum_i min_over_preds P[:, i, :].
    """
    p = pairwise_sqdist(gts, preds)  # (B, N_gt, N_pred)
    loss_1 = jnp.sum(jnp.min(p, axis=1), axis=1)  # best gt for each pred
    loss_2 = jnp.sum(jnp.min(p, axis=2), axis=1)  # best pred for each gt
    return loss_1 + loss_2


def chamfer_distance_tiled(preds: Array, gts: Array, tile: int = 512) -> Array:
    """Chamfer via lax.scan over tiles of ``preds`` — O(B*N*tile) live memory.

    Same value as ``chamfer_distance``; differentiable (min gradients flow to
    the arg-min elements, as in the dense version).
    """
    b, m, d = preds.shape
    n = gts.shape[1]
    if m % tile != 0:
        # fall back: pad is possible but dense is simpler for ragged sizes
        return chamfer_distance(preds, gts)
    num_tiles = m // tile
    preds_t = preds.reshape(b, num_tiles, tile, d).transpose(1, 0, 2, 3)

    def body(carry, pred_tile):
        min_over_preds, acc_loss1 = carry
        p = pairwise_sqdist(gts, pred_tile)  # (B, N, tile)
        acc_loss1 = acc_loss1 + jnp.sum(jnp.min(p, axis=1), axis=1)
        min_over_preds = jnp.minimum(min_over_preds, jnp.min(p, axis=2))
        return (min_over_preds, acc_loss1), None

    init = (jnp.full((b, n), jnp.inf, jnp.float32), jnp.zeros((b,), jnp.float32))
    (min_over_preds, loss_1), _ = jax.lax.scan(body, init, preds_t)
    loss_2 = jnp.sum(min_over_preds, axis=1)
    return loss_1 + loss_2
