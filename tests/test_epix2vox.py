"""(E)Pix2Vox baseline family: interface adapters + module forward shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acquisition_focus_tpu.models.epix2vox import (
    EPix2VoxModel128, epix2vox_interface_input, epix2vox_interface_output)


class TestInterface:
    def test_input_adapter(self, rng):
        B, V, C, S = 2, 3, 2, 32
        b_input = jnp.asarray(rng.random((B, V * C, S, S)), jnp.float32)
        views = epix2vox_interface_input(b_input, V)
        assert views.shape == (B, V, 224, 224, 3)
        # 3 channels identical, scaled by 255
        np.testing.assert_allclose(np.asarray(views[..., 0]),
                                   np.asarray(views[..., 1]))
        assert float(views.max()) <= 255.0 * float(b_input[:, 1::C].max()) + 1e-3

    def test_output_adapter(self, rng):
        vol = jnp.asarray(rng.random((2, 8, 8, 8)), jnp.float32)
        out = epix2vox_interface_output(vol)
        assert out.shape == (2, 2, 8, 8, 8)
        np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 1.0, atol=1e-6)


@pytest.mark.slow
class TestModelForward:
    def test_forward_shapes(self, rng):
        model = EPix2VoxModel128(n_views=2, use_epix2vox=True)
        views = jnp.asarray(rng.random((1, 2, 224, 224, 3)), jnp.float32)
        params = model.init(jax.random.key(0), views)
        out = model.apply(params, views)
        assert out.shape == (1, 128, 128, 128)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
