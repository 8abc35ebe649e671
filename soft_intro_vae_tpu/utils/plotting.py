"""Figure utilities: image grids, 2D scatter/density plots, 3D point clouds.

Capability parity with the reference's visualization surface:
  * image grids a la torchvision vutils.save_image
    (train_soft_intro_vae.py:539-540,641-646)
  * 2D sample scatter + VAE density plots
    (train_soft_intro_vae_2d.py:232-258,311-342,662-699)
  * 3D point-cloud panels (soft_intro_vae_3d/utils/pcutil.py:110-150 and the
    3x5 epoch figure, train_soft_intro_vae_3d.py:396-426)

matplotlib is imported lazily with the Agg backend; every function is a
no-op returning None when matplotlib is unavailable.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover
        return None


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """Tile (N, H, W, C) into one (H', W', C) image (vutils.make_grid)."""
    n, h, w, c = images.shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.full((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8, value_range=(0.0, 1.0)):
    """Save an (N, H, W, C) batch as a tiled grid image."""
    plt = _plt()
    if plt is None:
        return None
    lo, hi = value_range
    imgs = np.clip((np.asarray(images, np.float32) - lo) / (hi - lo), 0, 1)
    if imgs.shape[-1] == 1:
        imgs = np.repeat(imgs, 3, axis=-1)
    grid = make_grid(imgs, nrow=nrow)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.imsave(path, grid)
    return path


def save_scatter_2d(points: np.ndarray, path: str, lim: float = 4.0, color: str = "g",
                    title: Optional[str] = None):
    """2D sample scatter (reference :662-676)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(1, 1, figsize=(6, 6))
    ax.scatter(points[:, 0], points[:, 1], s=8, c=color)
    ax.set_xlim((-lim, lim))
    ax.set_ylim((-lim, lim))
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def save_density_2d(density: np.ndarray, n_pts: int, path: str):
    """VAE density heatmap (plot_vae_density, reference :232-258)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(1, 1, figsize=(6, 6))
    img = density.reshape(n_pts, n_pts)
    ax.pcolormesh(img, cmap=plt.cm.jet)
    ax.set_facecolor(plt.cm.jet(0.0))
    ax.set_axis_off()
    ax.invert_yaxis()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def save_pointcloud_panel(rows: Sequence[np.ndarray], path: str, n_cols: int = 5,
                          in_u_sphere: bool = True, s: int = 4, color: str = "dodgerblue"):
    """k-row x n_cols panel of 3D point clouds — the 3D trainer's per-epoch
    figure (real / reconstruction / samples rows, 3d:396-426).
    Each row: (n_cols, N, 3)."""
    plt = _plt()
    if plt is None:
        return None
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    n_rows = len(rows)
    fig = plt.figure(dpi=200, figsize=(2 * n_cols, 2 * n_rows))
    for r, row in enumerate(rows):
        for k in range(min(n_cols, row.shape[0])):
            ax = fig.add_subplot(n_rows, n_cols, r * n_cols + k + 1, projection="3d")
            pc = row[k]
            ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=s, c=color)
            if in_u_sphere:
                ax.set_xlim3d(-0.5, 0.5)
                ax.set_ylim3d(-0.5, 0.5)
                ax.set_zlim3d(-0.5, 0.5)
            ax.set_xticklabels([])
            ax.set_yticklabels([])
            ax.set_zticklabels([])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
