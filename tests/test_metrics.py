"""Metric semantics: device (jnp) implementations vs the host scipy oracles.

The device HD/HD95 path (exact separable min-plus EDT) must match the host
scipy exact-EDT implementation bit-for-bit in structure: same surfaces (cross
erosion, border_value=0), same directed distances, same percentile
interpolation, same NaN-on-empty semantics (reference cadence metrics,
run_dl.py:499-532).
"""

import numpy as np
import pytest
from scipy.ndimage import binary_erosion, distance_transform_edt

from acquisition_focus_tpu.engine.metrics import (
    dice_per_class, edt_squared_device, hausdorff_per_class,
    hausdorff_per_class_device, iou_per_class, iou_per_class_labels,
    _erode6_device)


@pytest.fixture
def labels(rng_np=None):
    rng = np.random.default_rng(7)
    # blobby multi-class volumes: threshold smoothed noise into 4 classes;
    # class 3 is absent from the target of batch item 1 (NaN semantics)
    def blobs(seed):
        r = np.random.default_rng(seed)
        x = r.normal(size=(2, 20, 22, 24))
        from scipy.ndimage import gaussian_filter
        x = gaussian_filter(x, sigma=(0, 2.5, 2.5, 2.5))
        q = np.quantile(x, [0.55, 0.75, 0.92])
        lbl = np.digitize(x, q)
        return lbl.astype(np.int32)
    pred = blobs(1)
    target = blobs(2)
    target[1][target[1] == 3] = 0
    return pred, target


def test_erode6_matches_scipy(labels):
    pred, _ = labels
    mask = pred[0] == 1
    ours = np.asarray(_erode6_device(mask))
    ref = binary_erosion(mask, iterations=1, border_value=0)
    np.testing.assert_array_equal(ours, ref)


def test_edt_squared_matches_scipy(labels):
    pred, _ = labels
    mask = pred[0] == 2
    assert mask.any()
    ours = np.asarray(edt_squared_device(mask))
    ref = distance_transform_edt(~mask) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_hausdorff_device_matches_host(labels):
    pred, target = labels
    num_classes = 4
    dev = np.asarray(hausdorff_per_class_device(pred, target, num_classes))
    host_hd = hausdorff_per_class(pred, target, num_classes)
    host_hd95 = hausdorff_per_class(pred, target, num_classes, percentile=95)
    np.testing.assert_allclose(dev[..., 0], host_hd, atol=1e-4)
    np.testing.assert_allclose(dev[..., 1], host_hd95, atol=1e-4)
    # the emptied class produced NaN, background column is 0
    assert np.isnan(dev[1, 3]).all()
    assert (dev[:, 0] == 0).all()


def test_iou_labels_matches_onehot(labels):
    pred, target = labels
    num_classes = 4
    p_oh = (pred[:, None] == np.arange(num_classes)[None, :, None, None, None])
    t_oh = (target[:, None] == np.arange(num_classes)[None, :, None, None, None])
    ref = np.asarray(iou_per_class(p_oh.astype(np.float32),
                                   t_oh.astype(np.float32)))
    ours = np.asarray(iou_per_class_labels(pred, target, num_classes))
    np.testing.assert_allclose(ours, ref, atol=1e-6, equal_nan=True)


def test_dice_nan_on_empty_target():
    pred = np.zeros((1, 2, 4, 4, 4), np.float32)
    target = np.zeros_like(pred)
    pred[0, 1, 0, 0, 0] = 1
    pred[0, 0] = 1 - pred[0, 1]
    target[0, 0] = 1
    d = np.asarray(dice_per_class(pred, target))
    assert np.isnan(d[0, 1])
    assert d[0, 0] > 0.9
