"""Unit tests for the core geometry / quaternion / image-op library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from activegs_tpu.core import geometry as geo
from activegs_tpu.core import image_ops, quaternions as quat


def random_rotations(n, seed=0):
    return R.random(n, random_state=seed).as_matrix().astype(np.float32)


class TestQuaternions:
    def test_roundtrip_matrix_quat(self):
        mats = random_rotations(64)
        q = quat.matrix_to_quaternion(jnp.asarray(mats))
        m2 = quat.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m2), mats, atol=1e-5)

    def test_matches_scipy_convention(self):
        mats = random_rotations(16, seed=1)
        q = np.asarray(quat.matrix_to_quaternion(jnp.asarray(mats)))
        q_scipy = R.from_matrix(mats).as_quat()  # xyzw
        q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        sign = np.sign(q_scipy[:, :1])
        sign[sign == 0] = 1
        np.testing.assert_allclose(q, q_scipy * sign, atol=1e-5)

    def test_no_nan_at_pi_rotation(self):
        # 180-degree rotations break the naive trace formula the reference
        # uses (utils/operations.py:526-541); ours must stay finite.
        m = R.from_rotvec([np.pi, 0, 0]).as_matrix().astype(np.float32)
        q = quat.matrix_to_quaternion(jnp.asarray(m[None]))
        assert np.isfinite(np.asarray(q)).all()

    def test_normal_to_quaternion_third_column(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(128, 3)).astype(np.float32)
        z /= np.linalg.norm(z, axis=1, keepdims=True)
        q, rot = quat.normal_to_quaternion(jnp.asarray(z))
        rot = np.asarray(rot)
        np.testing.assert_allclose(rot[:, :, 2], z, atol=1e-5)
        # orthonormality
        eye = np.einsum("nij,nik->njk", rot, rot)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        # quaternion reproduces the matrix
        np.testing.assert_allclose(
            np.asarray(quat.quaternion_to_matrix(q)), rot, atol=1e-4
        )

    def test_rotation_from_z(self):
        rng = np.random.default_rng(1)
        z = rng.normal(size=(32, 3)).astype(np.float32)
        z /= np.linalg.norm(z, axis=1, keepdims=True)
        rot = np.asarray(quat.rotation_from_z(jnp.asarray(z)))
        np.testing.assert_allclose(rot[:, :, 2], z, atol=1e-5)
        det = np.linalg.det(rot)
        np.testing.assert_allclose(det, 1.0, atol=1e-4)

    def test_slerp_endpoints(self):
        v1 = jnp.array([1.0, 0.0, 0.0])
        v2 = jnp.array([0.0, 1.0, 0.0])
        t = jnp.array([0.0, 0.5, 1.0])
        out = np.asarray(quat.slerp_vec(v1, v2, t))
        np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[2], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], np.sqrt([0.5, 0.5, 0.0]), atol=1e-6)


class TestGeometry:
    def test_intrinsics_from_fov_60(self):
        k = np.asarray(geo.intrinsics_from_fov(60.0, 60.0))
        assert k[0, 0] == pytest.approx(0.5 / np.tan(np.pi / 6), abs=1e-6)
        assert k[0, 2] == pytest.approx(0.5)
        fov = np.asarray(geo.fov_from_intrinsics(jnp.asarray(k)))
        np.testing.assert_allclose(fov, [np.pi / 3, np.pi / 3], atol=1e-5)

    def test_invert_rigid(self):
        rng = np.random.default_rng(2)
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = random_rotations(1, seed=3)[0]
        e[:3, 3] = rng.normal(size=3)
        inv = np.asarray(geo.invert_rigid(jnp.asarray(e)))
        np.testing.assert_allclose(inv @ e, np.eye(4), atol=1e-5)

    def test_project_backproject_roundtrip(self):
        k = geo.intrinsics_from_fov(60.0, 60.0)
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = random_rotations(1, seed=4)[0]
        e[:3, 3] = [0.3, -0.2, 0.1]
        e = jnp.asarray(e)

        h = w = 16
        depth = jnp.full((h, w), 2.5)
        pts = geo.backproject_depth(depth, e, k)
        uv, z, valid = geo.project_points(pts.reshape(-1, 3), e, k)
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(np.asarray(z), 2.5, atol=1e-5)
        grid = geo.pixel_grid(h, w).reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(grid), atol=1e-5)

    def test_world_rays_unit_z(self):
        k = geo.intrinsics_from_fov(90.0, 90.0)
        e = jnp.eye(4)
        coords = jnp.array([[0.5, 0.5]])
        o, d = geo.get_world_rays(coords, e, k)
        np.testing.assert_allclose(np.asarray(d), [[0, 0, 1]], atol=1e-6)


class TestImageOps:
    def test_depth_to_normal_flat_plane(self):
        # A fronto-parallel plane must produce normals (0, 0, -1)-ish in the
        # reference convention: cross-product layout gives -z toward camera.
        k = geo.intrinsics_from_fov(60.0, 60.0)
        depth = jnp.full((32, 32), 2.0)
        mask = jnp.ones((32, 32), bool)
        n = np.asarray(image_ops.depth_to_normal(depth, mask, k))
        inner = n[8:-8, 8:-8]
        nz = inner[..., 2]
        assert np.all(np.abs(nz) > 0.999)
        assert np.allclose(np.abs(inner[..., 0]), 0, atol=1e-3)

    def test_depth_to_normal_tilted_plane(self):
        # plane z = 2 + 0.5x in camera space => normal proportional to (0.5,0,-1)
        k = geo.intrinsics_from_fov(60.0, 60.0)
        h = w = 64
        fx = k[0, 0] * w
        us = jnp.arange(w) + 0.5 - 0.5 * w
        # solve z = 2 + 0.5 * (u/fx * z) -> z = 2 / (1 - 0.5u/fx)
        z = 2.0 / (1.0 - 0.5 * us / fx)
        depth = jnp.broadcast_to(z[None, :], (h, w))
        mask = jnp.ones((h, w), bool)
        n = np.asarray(image_ops.depth_to_normal(depth, mask, k))
        inner = n[16:-16, 16:-16]
        expected = np.array([0.5, 0.0, -1.0])
        expected /= np.linalg.norm(expected)
        sign = np.sign(inner[..., 2:3])
        np.testing.assert_allclose(
            inner * sign, np.broadcast_to(-expected, inner.shape), atol=5e-3
        )

    def test_bilateral_preserves_edges(self):
        d = np.ones((32, 32), np.float32)
        d[:, 16:] = 3.0
        noisy = d + np.random.default_rng(0).normal(scale=0.01, size=d.shape).astype(
            np.float32
        )
        out = np.asarray(image_ops.bilateral_filter(jnp.asarray(noisy), radius=3))
        # noise reduced
        assert np.abs(out[:, :14] - 1.0).mean() < np.abs(noisy[:, :14] - 1.0).mean()
        # edge not blurred across
        assert np.abs(out[:, 20:] - 3.0).max() < 0.05

    def test_bilateral_keeps_invalid(self):
        d = np.full((8, 8), 2.0, np.float32)
        d[3, 3] = -1.0
        out = np.asarray(image_ops.bilateral_filter(jnp.asarray(d), radius=2))
        assert out[3, 3] == -1.0

    def test_ssim_identity_and_range(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        assert float(image_ops.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        other = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        val = float(image_ops.ssim(img, other))
        assert -1.0 <= val < 0.9

    def test_central_diff_shapes(self):
        x = jnp.ones((2, 3, 8, 8))
        out = image_ops.central_diff_sq(x)
        assert out.shape == (2, 4, 8, 8)
        assert float(jnp.max(jnp.abs(out))) == 0.0
