"""Frozen-segmenter serving tests: sliding-window blending, tile-predictor
caching, and the spacing helper (reference nnunetv2_utils.py:342-499 semantics;
all on CPU with a stub network)."""

import numpy as np

from acquisition_focus_tpu.engine.segmenter import (
    _spacing_from, compute_sliding_steps, gaussian_importance_map,
    sliding_window_logits_2d)


def _identity_apply(params, x):
    """Stub net: logits = input broadcast over 3 classes (class c gets x*(c+1))."""
    import jax.numpy as jnp
    b = jnp.stack([x[..., 0] * (c + 1) for c in range(3)], axis=-1)
    return b


def test_sliding_window_blends_to_input():
    """With a linear stub net, gaussian-weighted overlap-blending must
    reconstruct the per-pixel logits exactly (weights cancel in acc/norm)."""
    rng = np.random.default_rng(0)
    img = rng.normal(size=(40, 40)).astype(np.float32)
    logits = sliding_window_logits_2d(_identity_apply, None, img, 3,
                                      tile_size=(16, 16), mirror_tta=False)
    assert logits.shape == (40, 40, 3)
    np.testing.assert_allclose(logits[..., 0], img, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(logits[..., 2], 3 * img, rtol=1e-4, atol=1e-4)


def test_sliding_window_tile_clamps_to_small_image():
    img = np.ones((8, 8), np.float32)
    logits = sliding_window_logits_2d(_identity_apply, None, img, 3,
                                      tile_size=(128, 128), mirror_tta=False)
    assert logits.shape == (8, 8, 3)


def test_predictor_cache_reused_across_calls():
    cache = {}
    img = np.ones((16, 16), np.float32)
    sliding_window_logits_2d(_identity_apply, None, img, 3, (16, 16),
                             mirror_tta=False, predictor_cache=cache)
    assert len(cache) == 1
    first = next(iter(cache.values()))
    sliding_window_logits_2d(_identity_apply, None, img, 3, (16, 16),
                             mirror_tta=False, predictor_cache=cache)
    assert next(iter(cache.values())) is first  # same jitted fn, no re-jit


def test_mirror_tta_symmetric_input_invariant():
    """TTA averages the 4 flip predictions; for a flip-symmetric input the
    result must equal the plain prediction."""
    img = np.ones((16, 16), np.float32)
    plain = sliding_window_logits_2d(_identity_apply, None, img, 3, (16, 16),
                                     mirror_tta=False)
    tta = sliding_window_logits_2d(_identity_apply, None, img, 3, (16, 16),
                                   mirror_tta=True)
    np.testing.assert_allclose(tta, plain, rtol=1e-5, atol=1e-5)


def test_compute_sliding_steps_cover_and_overlap():
    steps_h, steps_w = compute_sliding_steps((40, 64), (16, 16), 0.5)
    assert steps_h[0] == 0 and steps_h[-1] == 40 - 16
    assert steps_w[0] == 0 and steps_w[-1] == 64 - 16
    # step <= tile/2 guarantees >= 2x coverage interior
    assert all(b - a <= 8 for a, b in zip(steps_h, steps_h[1:]))


def test_gaussian_importance_map_properties():
    g = gaussian_importance_map((16, 16))
    assert g.max() == 1.0 and g.min() > 0
    assert g[8, 8] > g[0, 0]  # center-weighted


def test_spacing_from_affine_and_vector():
    aff = np.diag([1.5, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(_spacing_from(aff), [1.5, 2.0, 3.0])
    np.testing.assert_allclose(_spacing_from(aff[None]), [1.5, 2.0, 3.0])
    np.testing.assert_allclose(_spacing_from([1.0, 1.0, 2.5]), [1.0, 1.0, 2.5])
    assert _spacing_from(None) is None
