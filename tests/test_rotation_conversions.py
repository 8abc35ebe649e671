"""Rotation conversions + Transform3d family (reference transforms3d.py
vendored-PyTorch3D surface: conversions :32-506, classes :509-1018)."""

import numpy as np
import pytest

from soft_intro_vae_tpu.data.rotation_conversions import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quaternion_apply,
    quaternion_invert,
    quaternion_multiply,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    random_quaternions,
    random_rotations,
    rotation_6d_to_matrix,
    standardize_quaternion,
)
from soft_intro_vae_tpu.data.transforms3d import (
    Rotate,
    RotateAxisAngle,
    RotateAxisAngleTransform,
    Scale,
    Transform3d,
    Translate,
    check_valid_rotation_matrix,
)

RNG = np.random.default_rng(11)


class TestQuaternions:
    def test_matrix_roundtrip(self):
        q = random_quaternions(32, RNG)
        m = quaternion_to_matrix(q)
        assert check_valid_rotation_matrix(m, tol=1e-4)
        q2 = matrix_to_quaternion(m)
        np.testing.assert_allclose(q2, standardize_quaternion(q), atol=1e-5)

    def test_apply_matches_matrix(self):
        q = random_quaternions(8, RNG)
        p = RNG.normal(size=(8, 16, 3)).astype(np.float32)
        via_q = quaternion_apply(q[:, None, :], p)
        via_m = np.einsum("bij,bnj->bni", quaternion_to_matrix(q), p)
        np.testing.assert_allclose(via_q, via_m, atol=1e-5)

    def test_multiply_invert(self):
        a, b = random_quaternions(8, RNG), random_quaternions(8, RNG)
        # composition order: quat product == matrix product
        np.testing.assert_allclose(
            quaternion_to_matrix(quaternion_multiply(a, b)),
            quaternion_to_matrix(a) @ quaternion_to_matrix(b), atol=1e-5)
        ident = quaternion_multiply(a, quaternion_invert(a))
        np.testing.assert_allclose(np.abs(ident[:, 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-6)

    def test_standardize(self):
        q = np.array([[-0.5, 0.5, 0.5, 0.5]], np.float32)
        s = standardize_quaternion(q)
        np.testing.assert_allclose(s, -q)
        np.testing.assert_allclose(quaternion_to_matrix(s), quaternion_to_matrix(q),
                                   atol=1e-6)


class TestAxisAngle:
    def test_matrix_roundtrip(self):
        aa = RNG.normal(size=(16, 3)).astype(np.float32)
        m = axis_angle_to_matrix(aa)
        assert check_valid_rotation_matrix(m, tol=1e-4)
        np.testing.assert_allclose(matrix_to_axis_angle(m), aa, atol=1e-4)

    def test_small_angle_stable(self):
        aa = np.array([[1e-9, 0, 0], [0, 0, 0]], np.float32)
        q = axis_angle_to_quaternion(aa)
        assert np.all(np.isfinite(q))
        np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-7)

    def test_known_z_90(self):
        m = axis_angle_to_matrix(np.array([[0, 0, np.pi / 2]], np.float32))
        # column-vector convention: R @ e_x = e_y
        np.testing.assert_allclose(m[0] @ [1, 0, 0], [0, 1, 0], atol=1e-6)


class TestEuler:
    @pytest.mark.parametrize("conv", ["XYZ", "ZYX", "YXZ", "XYX", "ZXZ"])
    def test_roundtrip(self, conv):
        angles = (RNG.uniform(-0.9, 0.9, size=(16, 3))).astype(np.float32)
        if conv[0] == conv[2]:  # proper euler: central angle in (0, pi)
            angles[:, 1] = np.abs(angles[:, 1]) + 0.05
        m = euler_angles_to_matrix(angles, conv)
        assert check_valid_rotation_matrix(m, tol=1e-4)
        m2 = euler_angles_to_matrix(matrix_to_euler_angles(m, conv), conv)
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_composition_order(self):
        a = np.array([[0.3, 0.4, 0.5]], np.float32)
        m = euler_angles_to_matrix(a, "XYZ")
        mx = euler_angles_to_matrix(np.array([[0.3, 0, 0]], np.float32), "XYZ")
        my = euler_angles_to_matrix(np.array([[0, 0.4, 0]], np.float32), "XYZ")
        mz = euler_angles_to_matrix(np.array([[0, 0, 0.5]], np.float32), "XYZ")
        np.testing.assert_allclose(m, mx @ my @ mz, atol=1e-6)

    def test_invalid_convention(self):
        with pytest.raises(ValueError):
            euler_angles_to_matrix(np.zeros((1, 3)), "XXY")
        with pytest.raises(ValueError):
            matrix_to_euler_angles(np.eye(3)[None], "ABC")


class TestSixD:
    def test_roundtrip(self):
        m = random_rotations(16, RNG)
        np.testing.assert_allclose(rotation_6d_to_matrix(matrix_to_rotation_6d(m)),
                                   m, atol=1e-5)

    def test_unnormalized_input_projects_to_rotation(self):
        d6 = RNG.normal(size=(8, 6)).astype(np.float32) * 3
        assert check_valid_rotation_matrix(rotation_6d_to_matrix(d6), tol=1e-4)


class TestTransform3d:
    def test_translate_then_scale_order(self):
        t = Transform3d().translate(1.0, 0.0, 0.0).scale(2.0)
        p = np.array([[[1.0, 0.0, 0.0]]], np.float32)
        # compose applies translate FIRST: (1+1)*2 = 4
        np.testing.assert_allclose(t.transform_points(p)[0, 0], [4, 0, 0], atol=1e-6)
        t2 = Transform3d().scale(2.0).translate(1.0, 0.0, 0.0)
        np.testing.assert_allclose(t2.transform_points(p)[0, 0], [3, 0, 0], atol=1e-6)

    def test_inverse(self):
        R = random_rotations(4, RNG)
        t = Rotate(R).compose(Translate(RNG.normal(size=(4, 3)).astype(np.float32)))
        p = RNG.normal(size=(4, 32, 3)).astype(np.float32)
        back = t.inverse().transform_points(t.transform_points(p))
        np.testing.assert_allclose(back, p, atol=1e-4)

    def test_rotate_matches_column_vector_matrix(self):
        R = random_rotations(4, RNG)
        p = RNG.normal(size=(4, 8, 3)).astype(np.float32)
        got = Rotate(R).transform_points(p)
        want = np.einsum("bij,bnj->bni", R, p)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotate_rejects_non_rotation(self):
        with pytest.raises(ValueError, match="rotation"):
            Rotate(np.eye(3) * 2.0)

    def test_transform_normals_under_scale(self):
        # anisotropic scale: normals do NOT transform like points
        t = Scale(2.0, 1.0, 1.0)
        n = np.array([[[1.0, 1.0, 0.0]]], np.float32)
        out = t.transform_normals(n)[0, 0]
        np.testing.assert_allclose(out, [0.5, 1.0, 0.0], atol=1e-6)

    def test_axis_angle_transform_matches_trainer_path(self):
        angle = RNG.uniform(0, 180, size=4).astype(np.float32)
        p = RNG.normal(size=(4, 16, 3)).astype(np.float32)
        lightweight = RotateAxisAngle(angle, axis="Z").transform_points(p)
        composable = RotateAxisAngleTransform(angle, axis="Z").transform_points(p)
        np.testing.assert_allclose(composable, lightweight, atol=1e-5)

    def test_batch_broadcast_single_transform_many_clouds(self):
        t = Translate(np.array([[1.0, 2.0, 3.0]], np.float32))
        p = RNG.normal(size=(5, 8, 3)).astype(np.float32)
        out = t.transform_points(p)
        np.testing.assert_allclose(out, p + np.array([1, 2, 3], np.float32), atol=1e-6)
