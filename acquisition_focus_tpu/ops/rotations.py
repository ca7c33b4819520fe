"""Differentiable rotation parameterizations and random affine generation.

All functions are pure jnp, batched over leading dimensions, and return homogeneous
4x4 matrices so they compose directly with the affine algebra in ``ops.affine``.

Behavioral parity targets (re-derived from the math, not translated):
/root/reference/acquisition_focus/utils/transform_utils.py:6-179.
"""

import jax
import jax.numpy as jnp

from acquisition_focus_tpu.ops.affine import compose


def _embed_3x3(rot):
    """Embed a (..., 3, 3) linear part into a homogeneous (..., 4, 4) matrix."""
    batch = rot.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    return out.at[..., 3, 3].set(1.0)


def rotation_from_r6(r6):
    """Continuous 6D rotation parameterization (Zhou et al., CVPR'19).

    The first/second triples are Gram-Schmidt-orthonormalized into the first two
    *columns* of the rotation; the third column is their cross product.

    Args:  r6: (..., 6)
    Returns: (..., 4, 4) homogeneous rotation.
    Parity: ``compute_rotation_matrix_from_ortho6d`` (transform_utils.py:27-58).
    """
    x_raw, y_raw = r6[..., 0:3], r6[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    rot = jnp.stack([x, y, z], axis=-1)  # columns are x, y, z
    return _embed_3x3(rot)


def rotation_from_normal(normals):
    """Rotation whose third *row* is the given (unnormalized-ok if pre-normalized
    upstream) normal vector; the in-plane frame is the standard construction from the
    normal's azimuth.

    Args: normals: (..., 3) interpreted as (nz, ny, nx).
    Returns: (..., 4, 4).
    Parity: ``normal_to_rotation_matrix`` (transform_utils.py:62-103) including its
    singularity for normals parallel to the z axis.
    """
    nz, ny, nx = normals[..., 0], normals[..., 1], normals[..., 2]
    rho = jnp.sqrt(nx * nx + ny * ny)
    zero = jnp.zeros_like(nx)
    row0 = jnp.stack([ny / rho, -nx / rho, zero], axis=-1)
    row1 = jnp.stack([nx * nz / rho, ny * nz / rho, -rho], axis=-1)
    row2 = jnp.stack([nx, ny, nz], axis=-1)
    rot = jnp.stack([row0, row1, row2], axis=-2)
    return _embed_3x3(rot)


def rotation_from_angle_axis(angle_axis, eps=1e-6):
    """Rodrigues' formula with a first-order Taylor branch near zero rotation.

    Args: angle_axis: (..., 3); the vector direction is the axis, its norm the angle.
    Returns: (..., 4, 4).
    Parity: ``angle_axis_to_rotation_matrix`` (transform_utils.py:107-179).
    """
    theta2 = jnp.sum(angle_axis * angle_axis, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + eps)
    w = angle_axis / (theta + eps)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    c = jnp.cos(theta[..., 0])
    s = jnp.sin(theta[..., 0])
    one_c = 1.0 - c

    rodrigues = jnp.stack([
        jnp.stack([c + wx * wx * one_c, wx * wy * one_c - wz * s, wy * s + wx * wz * one_c], -1),
        jnp.stack([wz * s + wx * wy * one_c, c + wy * wy * one_c, -wx * s + wy * wz * one_c], -1),
        jnp.stack([-wy * s + wx * wz * one_c, wx * s + wy * wz * one_c, c + wz * wz * one_c], -1),
    ], axis=-2)

    rx, ry, rz = angle_axis[..., 0], angle_axis[..., 1], angle_axis[..., 2]
    one = jnp.ones_like(rx)
    taylor = jnp.stack([
        jnp.stack([one, -rz, ry], -1),
        jnp.stack([rz, one, -rx], -1),
        jnp.stack([-ry, rx, one], -1),
    ], axis=-2)

    use_rodrigues = (theta2 > eps)[..., None]
    return _embed_3x3(jnp.where(use_rodrigues, rodrigues, taylor))


def random_affine(key, rotation_strength=0.2, zoom_strength=0.2, offset_strength=0.0,
                  dtype=jnp.float32):
    """Random augmentation affine: perturbed orthonormal frame x uniform isotropic
    zoom x normal offset, composed as zoom @ rotation @ translation.

    Args: key: jax PRNG key. Strengths as in the reference augmentation
    (transform_utils.py:6-23; used by run_dl.py:208-223 with per-phase strengths).
    Returns: (4, 4).
    """
    k_zoom, k_axis, k_one, k_off = jax.random.split(key, 4)

    zoom = jax.random.uniform(k_zoom, (), dtype) * zoom_strength - zoom_strength / 2 + 1.0

    axis = jnp.concatenate([
        rotation_strength * jax.random.normal(k_axis, (2,), dtype), jnp.ones((1,), dtype)])
    axis = axis / jnp.linalg.norm(axis)
    one = jnp.concatenate([
        jnp.ones((1,), dtype), rotation_strength * jax.random.normal(k_one, (2,), dtype)])
    two = jnp.cross(axis, one)
    two = two / jnp.linalg.norm(two)
    one = jnp.cross(two, axis)

    theta_r = jnp.eye(4, dtype=dtype).at[:3, :3].set(jnp.stack([one, two, axis]))
    theta_z = jnp.diag(jnp.array([zoom, zoom, zoom, 1.0], dtype=dtype))
    theta_t = jnp.eye(4, dtype=dtype).at[:3, 3].set(
        offset_strength * jax.random.normal(k_off, (3,), dtype))
    return compose(theta_z, theta_r, theta_t)


def random_affine_batch(key, batch, rotation_strength=0.2, zoom_strength=0.2,
                        offset_strength=0.0, dtype=jnp.float32):
    """Batch of independent random affines, shape (batch, 4, 4)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: random_affine(k, rotation_strength, zoom_strength, offset_strength, dtype)
    )(keys)
