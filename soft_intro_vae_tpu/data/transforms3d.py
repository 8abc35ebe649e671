"""3D transforms for point clouds.

Capability parity with the parts of the reference's vendored transforms3d
(/root/reference/soft_intro_vae_3d/datasets/{transforms,transforms3d}.py)
that the framework actually exercises — RotateAxisAngle is the only
transform the trainer uses (train_soft_intro_vae_3d.py:26,256-260) — plus
the standard conversion/compose utilities so users of the reference's
transform API find equivalents: axis-angle / euler / matrix conversions,
Compose, normalization and jitter augments.

Pure numpy (host-side data augmentation, like the reference).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

_AXES = {"X": 0, "Y": 1, "Z": 2}


def axis_angle_matrix(axis: str, angle_deg: np.ndarray) -> np.ndarray:
    """(B,) degrees -> (B, 3, 3) rotation matrices about a named axis."""
    th = np.deg2rad(np.asarray(angle_deg, np.float32))
    c, s = np.cos(th), np.sin(th)
    b = th.shape[0] if th.ndim else 1
    c, s = np.broadcast_to(c, (b,)), np.broadcast_to(s, (b,))
    m = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    i = _AXES[axis.upper()]
    j, k = (i + 1) % 3, (i + 2) % 3
    m[:, j, j] = c
    m[:, j, k] = -s
    m[:, k, j] = s
    m[:, k, k] = c
    return m


def euler_matrix(angles_deg: np.ndarray, convention: str = "XYZ") -> np.ndarray:
    """(B, 3) euler angles (degrees) -> (B, 3, 3), extrinsic composition."""
    angles_deg = np.asarray(angles_deg, np.float32)
    m = None
    for ax, a in zip(convention, angles_deg.T):
        r = axis_angle_matrix(ax, a)
        m = r if m is None else np.einsum("bij,bjk->bik", r, m)
    return m


def rotate_points(points: np.ndarray, matrices: np.ndarray) -> np.ndarray:
    """(B, N, 3) @ (B, 3, 3)^T — transform_points semantics."""
    return np.einsum("bni,bji->bnj", points, matrices)


class RotateAxisAngle:
    """Reference-call-compatible: RotateAxisAngle(angle, axis="Z").transform_points(x)."""

    def __init__(self, angle, axis: str = "X", **_):
        self.m = axis_angle_matrix(axis, np.atleast_1d(np.asarray(angle, np.float32)))

    def transform_points(self, points: np.ndarray) -> np.ndarray:
        m = self.m
        if m.shape[0] == 1 and points.shape[0] > 1:
            m = np.broadcast_to(m, (points.shape[0], 3, 3))
        return rotate_points(points, m)


class Compose:
    def __init__(self, transforms: Sequence[Callable[[np.ndarray], np.ndarray]]):
        self.transforms = list(transforms)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            x = t(x)
        return x


def unit_sphere_normalize(points: np.ndarray) -> np.ndarray:
    """Center and scale each cloud into the unit sphere (radius 0.5)."""
    centered = points - points.mean(axis=-2, keepdims=True)
    r = np.linalg.norm(centered, axis=-1).max(axis=-1, keepdims=True)
    return centered / (2.0 * r[..., None] + 1e-12)


def jitter(points: np.ndarray, rng: np.random.Generator, sigma: float = 0.01,
           clip: float = 0.05) -> np.ndarray:
    noise = np.clip(rng.normal(0, sigma, points.shape), -clip, clip).astype(points.dtype)
    return points + noise


def check_valid_rotation_matrix(m: np.ndarray, tol: float = 1e-5) -> bool:
    """Orthonormal + det 1 (reference _check_valid_rotation_matrix,
    transforms3d.py:1130)."""
    eye = np.eye(3, dtype=m.dtype)
    orth = np.allclose(np.einsum("...ij,...kj->...ik", m, m), eye, atol=tol)
    det1 = np.allclose(np.linalg.det(m), 1.0, atol=tol)
    return bool(orth and det1)
