"""Dense-mask moment analysis of label volumes.

The reference extracts sparse COO indices and reduces over them
(/root/reference/acquisition_focus/utils/torch_sparse_tensor_utils.py:35-86). Sparse
index sets have data-dependent shapes — hostile to XLA. Here the same quantities are
computed as masked dense reductions with static shapes, so they run equally well on
host numpy inputs and inside jit on device.
"""

import jax.numpy as jnp


def _coord_grids(shape, dtype=jnp.float32):
    return jnp.meshgrid(*[jnp.arange(n, dtype=dtype) for n in shape], indexing='ij')


def label_center(mask):
    """Mass center (voxel coords, (3,)) of a boolean/float foreground mask (D, H, W)."""
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    grids = _coord_grids(mask.shape)
    return jnp.stack([(g * mask).sum() / n for g in grids])


def label_center_and_median(mask):
    """Mass center and per-axis median of foreground voxel coordinates.

    Parity: ``get_center_and_median`` (torch_sparse_tensor_utils.py:60-77); for an
    empty mask both fall back to the volume center.
    """
    m = mask != 0
    count = m.sum()
    center = label_center(m)
    grids = _coord_grids(m.shape)
    medians = []
    for g in grids:
        vals = jnp.sort(jnp.where(m, g, jnp.inf).ravel())
        # median of `count` valid entries: torch.median picks element (count-1)//2
        medians.append(vals[jnp.maximum(count - 1, 0) // 2])
    fallback = jnp.asarray(mask.shape, jnp.float32) / 2.0
    empty = count == 0
    return (jnp.where(empty, fallback, center),
            jnp.where(empty, fallback, jnp.stack(medians)))


def label_inertia_tensor(mask):
    """(center (3,), inertia (3, 3)) of the foreground voxel distribution, with unit
    mass per voxel: I = tr(M2) * eye - M2 where M2 is the centered second moment.

    Parity: ``get_inertia_tensor`` (torch_sparse_tensor_utils.py:35-56).
    """
    mask = (mask != 0).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    grids = _coord_grids(mask.shape)
    center = jnp.stack([(g * mask).sum() / n for g in grids])
    centered = [g - c for g, c in zip(grids, center)]
    m2 = jnp.stack([
        jnp.stack([(a * b * mask).sum() for b in centered]) for a in centered])
    inertia = jnp.trace(m2) * jnp.eye(3) - m2
    return center, inertia


def batched_inertia(masks):
    """Batched (N, D, H, W) masks -> centers (N, 3), inertia tensors (N, 3, 3)."""
    import jax
    return jax.vmap(label_inertia_tensor)(masks.astype(jnp.float32))


def slice_min_principal_align_affines(slice_labels):
    """Grid-space affines rotating each slice so its non-background content's
    min-inertia axis becomes the in-plane principal direction.

    Args:
      slice_labels: (N, Sh, Sw, 1) dense integer labels (one-voxel-thick slices).
    Returns: (N, 4, 4) grid affines.

    jit-compatible re-design of the reference's per-sample loop
    (learnable_transform.py:337-358): masked dense moments + eigh instead of sparse
    indices + eig, vmapped over the batch.
    """
    import jax

    def per_slice(lbl):
        mask = (lbl > 0)
        center, inertia = label_inertia_tensor(mask)
        center = center.at[-1].set(0.5)
        vecs = jnp.linalg.eigh(inertia)[1]
        min_principal = vecs[:, 0]
        second = jnp.cross(min_principal, jnp.asarray([0.0, 0.0, 1.0]))

        # orthonormal slice frame (jnp variant of clinical_views.
        # pix_affine_from_center_and_plane_vects)
        main = min_principal / jnp.linalg.norm(min_principal)
        two = second / jnp.maximum(jnp.linalg.norm(second), 1e-8)
        normal = jnp.cross(main, two)
        normal = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-8)
        two = jnp.cross(normal, main)
        pix = jnp.eye(4)
        pix = pix.at[:3, :3].set(jnp.stack([two, main, normal]))
        pix = pix.at[:3, 3].set(center)

        # pix -> grid affine (clinical_views.grid_affine_from_pix_affine, jnp)
        shape = jnp.asarray(lbl.shape, jnp.float32)
        out = pix
        out = out.at[:3, :3].set(pix[:3, :3][::-1, ::-1].T)
        out = out.at[:3, 3].set((2.0 * pix[:3, 3] / shape - 1.0)[::-1])
        return out

    return jax.vmap(per_slice)(slice_labels)


def principal_axes(inertia):
    """(min, mid, max) principal axes of a symmetric 3x3 inertia tensor, ordered by
    ascending eigenvalue (sign of each axis is arbitrary, as in the reference).

    Parity: ``get_main_principal_axes`` (torch_sparse_tensor_utils.py:81-86).
    """
    _, vecs = jnp.linalg.eigh(inertia)  # ascending eigenvalues, eigenvectors in columns
    return vecs[:, 0], vecs[:, 1], vecs[:, 2]
