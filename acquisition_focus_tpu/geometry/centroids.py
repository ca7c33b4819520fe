"""Per-class centroid registration to a canonical reference heart.

Aligns a case's label centroids to a fixed reference by optimizing a 6/7-DOF affine
(R6 rotation + translation [+ zoom]) with AdamW — a jit-compiled ``lax.fori_loop``
replacing the reference's 500-iteration Python loop
(/root/reference/acquisition_focus/functional/register_centroids.py:16-70).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from acquisition_focus_tpu.geometry.moments import label_center
from acquisition_focus_tpu.ops.affine import compose
from acquisition_focus_tpu.ops.rotations import rotation_from_r6


def _class_centers_grid_space(label, classes):
    """Foreground centers per class, mapped to grid space: flip to (W, H, D) order and
    re-normalize by the (cubic) shape to [-1, 1]; homogeneous coordinate appended."""
    shp = np.asarray(label.shape, np.float64)
    centers = []
    for c in classes:
        center = np.asarray(label_center(jnp.asarray(label == c)), np.float64)
        centers.append(center[::-1] / shp[::-1] * 2.0 - 1.0)
    centers = np.stack(centers)
    return np.concatenate([centers, np.ones((centers.shape[0], 1))], axis=1)


def register_centroids(fixed_label, moving_label, dof=6, iters=500, lr=0.05, seed=0):
    """Fit an affine mapping moving-label centroids onto fixed-label centroids.

    Returns the *inverse* fitted matrix (4, 4) — the grid-space affine that reorients
    the moving volume into the canonical frame, as consumed by the data pipeline
    (reference base_dataset.py:232-233, run_dl.py:248).
    """
    assert dof in (6, 7)
    fixed_label = np.asarray(fixed_label)
    moving_label = np.asarray(moving_label)
    # Shapes may differ: centers are normalized to [-1, 1] grid space by each
    # volume's own shape. The fitted affine lives in the MOVING volume's
    # normalized grid space — it is only valid to apply it to another grid
    # (e.g. the hires volume, base_dataset.py) when that grid spans the SAME
    # physical FOV; the data layer guarantees this by registering the
    # hires-interpolated segmentation, never the raw prescan.
    assert fixed_label.shape[0] == fixed_label.shape[1] == fixed_label.shape[2]
    assert moving_label.shape[0] == moving_label.shape[1] == moving_label.shape[2]

    common = sorted(set(np.unique(fixed_label)) & set(np.unique(moving_label)))
    common = [c for c in common if c != 0]
    fixed = jnp.asarray(_class_centers_grid_space(fixed_label, common), jnp.float32)
    moving = jnp.asarray(_class_centers_grid_space(moving_label, common), jnp.float32)

    k_zoom, k_rot, k_trans = jax.random.split(jax.random.key(seed), 3)
    params = {
        'rot': jax.random.normal(k_rot, (6,)),
        'trans': jax.random.normal(k_trans, (3,)),
    }
    if dof == 7:
        params['zoom'] = jax.random.normal(k_zoom, (1,))

    def transform_matrix(p):
        zoom = p['zoom'][0] if dof == 7 else 1.0
        # Note: eye(4) * zoom also scales the homogeneous row — reference parity
        # (register_centroids.py:54).
        mat = compose(jnp.eye(4) * zoom, rotation_from_r6(p['rot'][None])[0])
        return mat.at[:3, 3].add(p['trans'])

    def loss_fn(p):
        pred = (transform_matrix(p) @ moving.T).T
        return jnp.mean((pred - fixed) ** 2)

    opt = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.01)  # torch AdamW defaults

    @jax.jit
    def fit(p):
        state = opt.init(p)

        def body(_, carry):
            p, state = carry
            grads = jax.grad(loss_fn)(p)
            updates, state = opt.update(grads, state, p)
            return optax.apply_updates(p, updates), state

        p, _ = jax.lax.fori_loop(0, iters, body, (p, state))
        return transform_matrix(p)

    mat = fit(params)
    return jnp.linalg.inv(mat)


def centroid_reorient_grid_affine(moving_label, reference_label, dof=6):
    """Canonical-orientation affine for a case, given the reference heart label
    volume (already loaded; the data layer owns file I/O).

    Parity: ``get_centroid_reorient_grid_affine`` (register_centroids.py:67-70).
    """
    return register_centroids(reference_label, moving_label, dof=dof)
