"""Pallas TPU chamfer kernel: fused pairwise-distance + two-sided min.

The XLA path (ops/chamfer.py) materializes the (B, N, M) squared-distance
tensor in HBM (B=32, N=M=2048 -> 512 MB of f32 traffic per call; the 3D train
step makes 6+ chamfer calls per iteration). This kernel tiles the first cloud
and keeps each (TILE, M) distance block in VMEM only, emitting just the
per-point minima and arg-minima (O(B*(N+M)) HBM bytes) — the loss epilogue
and the analytic VJP are cheap XLA.

Layout notes: the second cloud is passed transposed (B, 3, M) so its
coordinate rows broadcast along lanes; the distance block is built on the
VPU as sum_d (x_d - y_d)^2 (K=3 is far too small for the MXU).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _min_kernel(x_ref, yt_ref, min_x_ref, amin_x_ref, min_y_ref, amin_y_ref):
    t = pl.program_id(1)
    tile = x_ref.shape[1]
    x = x_ref[0]          # (TILE, 3)
    d_acc = jnp.zeros((tile, yt_ref.shape[2]), jnp.float32)
    for d in range(3):
        xd = x[:, d : d + 1]            # (TILE, 1)
        yd = yt_ref[0, d : d + 1, :]    # (1, M)
        diff = xd - yd
        d_acc = d_acc + diff * diff

    # per-x minima over the second cloud: write this tile's slice of the
    # full (1, 1, N) resident output row
    off = pl.multiple_of(t * tile, tile)
    min_x_ref[0, 0, pl.ds(off, tile)] = jnp.min(d_acc, axis=1)
    amin_x_ref[0, 0, pl.ds(off, tile)] = jnp.argmin(d_acc, axis=1).astype(jnp.int32)

    # running per-y minima across x tiles (output block revisited: the index
    # map is constant in t, so the block stays resident in VMEM)
    col_min = jnp.min(d_acc, axis=0)
    col_arg = (jnp.argmin(d_acc, axis=0) + t * tile).astype(jnp.int32)

    @pl.when(t == 0)
    def _():
        min_y_ref[0, 0] = col_min
        amin_y_ref[0, 0] = col_arg

    @pl.when(t > 0)
    def _():
        better = col_min < min_y_ref[0, 0]
        min_y_ref[0, 0] = jnp.where(better, col_min, min_y_ref[0, 0])
        amin_y_ref[0, 0] = jnp.where(better, col_arg, amin_y_ref[0, 0])


def _nearest(x: Array, y: Array, tile: int, interpret: bool) -> Tuple[Array, Array, Array, Array]:
    """(min_x, amin_x, min_y, amin_y) for clouds x:(B,N,3), y:(B,M,3)."""
    b, n, _ = x.shape
    m = y.shape[1]
    tile = min(tile, n)
    while n % tile != 0:  # shapes are static; pick a divisor
        tile //= 2
    tile = max(tile, 1)
    yt = jnp.swapaxes(y, 1, 2)  # (B, 3, M)
    grid = (b, n // tile)
    out = pl.pallas_call(
        _min_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bb, tt: (bb, tt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), yt.astype(jnp.float32))
    return tuple(o[:, 0, :] for o in out)  # type: ignore[return-value]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_distance_pallas(preds: Array, gts: Array, tile: int = 256) -> Array:
    """Reference-parity chamfer loss (B,) — fused TPU kernel + analytic VJP.

    Same value/gradients as ops.chamfer.chamfer_distance (ChamferLoss
    semantics, chamfer_loss.py:5-35).
    """
    loss, _ = _chamfer_fwd_impl(preds, gts, tile)
    return loss


def _chamfer_fwd_impl(preds, gts, tile):
    interpret = not _on_tpu()
    min_g, amin_g, min_p, amin_p = _nearest(gts, preds, tile, interpret)
    # min_g: per-gt min over preds (loss_2); min_p: per-pred min over gts (loss_1)
    loss = jnp.sum(min_g, axis=1) + jnp.sum(min_p, axis=1)
    return loss, (preds, gts, amin_g, amin_p)


def _chamfer_fwd(preds, gts, tile):
    return _chamfer_fwd_impl(preds, gts, tile)


def _chamfer_bwd(tile, res, g):
    preds, gts, amin_g, amin_p = res
    # amin_g: for each gt point, index of nearest pred; amin_p: per pred, nearest gt
    b = preds.shape[0]
    bidx = jnp.arange(b)[:, None]
    near_pred = jnp.take_along_axis(preds, amin_g[..., None], axis=1)  # (B, Ngt, 3)
    d_gts_direct = 2.0 * (gts - near_pred)
    near_gt = jnp.take_along_axis(gts, amin_p[..., None], axis=1)      # (B, Npred, 3)
    d_preds_direct = 2.0 * (preds - near_gt)
    d_preds_scatter = jnp.zeros_like(preds).at[bidx, amin_g].add(-d_gts_direct)
    d_gts_scatter = jnp.zeros_like(gts).at[bidx, amin_p].add(-d_preds_direct)
    gb = g[:, None, None]
    return gb * (d_preds_direct + d_preds_scatter), gb * (d_gts_direct + d_gts_scatter)


chamfer_distance_pallas.defvjp(_chamfer_fwd, _chamfer_bwd)
