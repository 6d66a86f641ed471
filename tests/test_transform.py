"""Transform tests (model: transform/rigid_transform_test.cc)."""

import numpy as np
import pytest

from cartographer_tpu.transform import rigid2, rigid3
from cartographer_tpu.transform.interpolation import TransformInterpolationBuffer


def random_rigid2(rng):
    return rigid2.make(rng.uniform(-10, 10, size=2), rng.uniform(-np.pi, np.pi))


def random_rigid3(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return rigid3.make(rng.uniform(-10, 10, size=3), q)


class TestRigid2:
    def test_identity(self):
        p = np.array([[1.0, 2.0]])
        np.testing.assert_allclose(rigid2.apply(rigid2.identity(), p), p)

    def test_compose_inverse(self):
        rng = np.random.default_rng(42)
        for _ in range(20):
            a = random_rigid2(rng)
            ainv = rigid2.inverse(a)
            np.testing.assert_allclose(
                rigid2.compose(a, ainv), rigid2.identity(), atol=1e-12
            )
            np.testing.assert_allclose(
                rigid2.compose(ainv, a), rigid2.identity(), atol=1e-12
            )

    def test_compose_matches_pointwise(self):
        rng = np.random.default_rng(7)
        a, b = random_rigid2(rng), random_rigid2(rng)
        pts = rng.uniform(-5, 5, size=(17, 2))
        via_compose = rigid2.apply(rigid2.compose(a, b), pts)
        via_sequence = rigid2.apply(a, rigid2.apply(b, pts))
        np.testing.assert_allclose(via_compose, via_sequence, atol=1e-12)

    def test_angle_normalization(self):
        a = rigid2.make([0.0, 0.0], 3.0)
        b = rigid2.make([0.0, 0.0], 3.0)
        c = rigid2.compose(a, b)
        assert -np.pi < rigid2.angle(c) <= np.pi

    def test_batched(self):
        rng = np.random.default_rng(3)
        poses = np.stack([random_rigid2(rng) for _ in range(5)])
        inv = rigid2.inverse(poses)
        out = rigid2.compose(poses, inv)
        np.testing.assert_allclose(out, np.tile(rigid2.identity(), (5, 1)), atol=1e-12)


class TestRigid3:
    def test_compose_inverse(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            a = random_rigid3(rng)
            ident = rigid3.compose(a, rigid3.inverse(a))
            np.testing.assert_allclose(ident[:3], np.zeros(3), atol=1e-12)
            # Quaternion may be -identity; compare rotation action.
            np.testing.assert_allclose(abs(ident[3]), 1.0, atol=1e-12)

    def test_compose_matches_pointwise(self):
        rng = np.random.default_rng(1)
        a, b = random_rigid3(rng), random_rigid3(rng)
        pts = rng.uniform(-5, 5, size=(11, 3))
        np.testing.assert_allclose(
            rigid3.apply(rigid3.compose(a, b), pts),
            rigid3.apply(a, rigid3.apply(b, pts)),
            atol=1e-12,
        )

    def test_angle_axis_roundtrip(self):
        rng = np.random.default_rng(5)
        for _ in range(30):
            aa = rng.normal(size=3)
            q = rigid3.quat_from_angle_axis(aa)
            aa2 = rigid3.quat_to_angle_axis(q)
            # Round trip modulo 2*pi wrap; for |aa| < pi it is exact.
            if np.linalg.norm(aa) < np.pi:
                np.testing.assert_allclose(aa2, aa, atol=1e-9)

    def test_yaw(self):
        pose2 = rigid2.make([1.0, 2.0], 0.7)
        pose3 = rigid3.embed_3d(pose2)
        assert rigid3.get_yaw(pose3) == pytest.approx(0.7, abs=1e-12)
        back = rigid3.project_2d(pose3)
        np.testing.assert_allclose(back, pose2, atol=1e-12)

    def test_from_two_vectors(self):
        rng = np.random.default_rng(9)
        for _ in range(10):
            a, b = rng.normal(size=3), rng.normal(size=3)
            q = rigid3.quat_from_two_vectors(a, b)
            rotated = rigid3.quat_rotate(q, a / np.linalg.norm(a))
            np.testing.assert_allclose(rotated, b / np.linalg.norm(b), atol=1e-9)


class TestInterpolationBuffer:
    def test_lookup(self):
        buf = TransformInterpolationBuffer()
        buf.push(0.0, rigid3.translation(np.array([0.0, 0.0, 0.0])))
        buf.push(10.0, rigid3.translation(np.array([10.0, 0.0, 0.0])))
        mid = buf.lookup(5.0)
        np.testing.assert_allclose(mid[:3], [5.0, 0.0, 0.0], atol=1e-12)
        assert buf.has(0.0) and buf.has(10.0) and not buf.has(10.1)

    def test_size_limit(self):
        buf = TransformInterpolationBuffer(buffer_size_limit=2)
        for t in [0.0, 1.0, 2.0, 3.0]:
            buf.push(t, rigid3.identity())
        assert buf.size() == 2
        assert buf.earliest_time() == 2.0
