"""Parity tests for rotation parameterizations vs the upstream reference (torch)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acquisition_focus_tpu.ops.rotations import (
    random_affine, rotation_from_angle_axis, rotation_from_normal, rotation_from_r6)

from conftest import import_reference_module, reference_available


def assert_rotation(mat):
    lin = mat[..., :3, :3]
    eye = np.broadcast_to(np.eye(3), lin.shape)
    np.testing.assert_allclose(lin @ np.swapaxes(lin, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(lin), 1.0, atol=1e-5)


class TestR6:
    def test_is_rotation(self, rng):
        r6 = rng.normal(size=(4, 6)).astype(np.float32)
        assert_rotation(np.asarray(rotation_from_r6(jnp.asarray(r6))))

    def test_identity_init(self):
        # The ATM's R6 init vector must map to the identity rotation
        # (reference learnable_transform.py:93).
        r6 = jnp.asarray([[1e-2, 0, 0, 0, 1e-2, 0]], jnp.float32)
        np.testing.assert_allclose(np.asarray(rotation_from_r6(r6))[0], np.eye(4), atol=1e-6)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_parity(self, rng):
        import torch
        ref = import_reference_module("acquisition_focus.utils.transform_utils")
        r6 = rng.normal(size=(5, 6)).astype(np.float32)
        ours = np.asarray(rotation_from_r6(jnp.asarray(r6)))
        theirs = ref.compute_rotation_matrix_from_ortho6d(torch.as_tensor(r6)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestAngleAxis:
    def test_is_rotation(self, rng):
        aa = rng.normal(size=(4, 3)).astype(np.float32)
        assert_rotation(np.asarray(rotation_from_angle_axis(jnp.asarray(aa))))

    def test_small_angle(self):
        out = np.asarray(rotation_from_angle_axis(jnp.zeros((1, 3))))
        np.testing.assert_allclose(out[0], np.eye(4), atol=1e-6)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_parity(self, rng):
        import torch
        ref = import_reference_module("acquisition_focus.utils.transform_utils")
        aa = np.concatenate([
            rng.normal(size=(4, 3)), np.zeros((1, 3)), 1e-5 * rng.normal(size=(1, 3)),
        ]).astype(np.float32)
        ours = np.asarray(rotation_from_angle_axis(jnp.asarray(aa)))
        theirs = ref.angle_axis_to_rotation_matrix(torch.as_tensor(aa)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestNormal:
    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_parity(self, rng):
        import torch
        ref = import_reference_module("acquisition_focus.utils.transform_utils")
        n = rng.normal(size=(5, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        ours = np.asarray(rotation_from_normal(jnp.asarray(n)))
        theirs = ref.normal_to_rotation_matrix(torch.as_tensor(n)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestRandomAffine:
    def test_structure(self):
        aff = np.asarray(random_affine(jax.random.key(0)))
        assert aff.shape == (4, 4)
        # rotation part scaled by isotropic zoom
        lin = aff[:3, :3]
        s = np.linalg.norm(lin, axis=1)
        np.testing.assert_allclose(s, s[0] * np.ones(3), atol=1e-5)
        np.testing.assert_allclose(aff[3], [0, 0, 0, 1], atol=1e-6)
