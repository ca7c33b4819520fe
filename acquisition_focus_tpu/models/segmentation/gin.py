"""GIN (Global Intensity Non-linear) augmentation.

Re-design of the reference's torch implementation
(/root/reference/acquisition_focus/models/segmentation/gin.py:36-241): a shallow
random-weight conv net with leaky-ReLU nonlinearities maps the input image through a
random intensity transform; the output is alpha-blended with the input and
Frobenius-renormalized. Used when training the prescan segmenter for
domain-generalization (the reference applies it as an nnU-Net forward-pre-hook,
nnUNetTrainer_GIN.py:31-57).

Pure-JAX: weights are drawn per call from the PRNG key — nothing is learned.
"""

import jax
import jax.numpy as jnp


def _rand_conv(key, x, features, kernel_size, ndims):
    """Random conv with He-style scaling; x is channels-last with ndims spatial."""
    in_ch = x.shape[-1]
    kernel = (kernel_size,) * ndims
    shape = kernel + (in_ch, features)
    fan_in = in_ch * kernel_size ** ndims
    w = jax.random.normal(key, shape) * jnp.sqrt(2.0 / fan_in)
    spec = ('NHWC', 'HWIO', 'NHWC') if ndims == 2 else ('NDHWC', 'DHWIO', 'NDHWC')
    dn = jax.lax.conv_dimension_numbers(x.shape, shape, spec)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,) * ndims, padding='SAME', dimension_numbers=dn)


def gin_aug(key, x, n_layers=4, interm_channels=2, kernel_size=3, dims=2,
            alpha_range=(0.0, 1.0)):
    """Apply a random GIN intensity transform.

    Args:
      key: PRNG key. x: (B, ..., C) channels-last image batch (2D or 3D spatial).
      n_layers: depth of the random conv stack.
    Returns: augmented batch, same shape/dtype.

    Parity: ``gin_aug`` (reference gin.py:36-241) — random grouped convs +
    leaky-relu, alpha blend with the input, Frobenius norm preservation.
    """
    keys = jax.random.split(key, n_layers + 1)
    out_ch = x.shape[-1]

    h = x
    for i in range(n_layers - 1):
        h = _rand_conv(keys[i], h, interm_channels, kernel_size, dims)
        h = jax.nn.leaky_relu(h, negative_slope=0.2)
    h = _rand_conv(keys[n_layers - 1], h, out_ch, kernel_size, dims)

    alpha = jax.random.uniform(keys[-1], (x.shape[0],) + (1,) * (x.ndim - 1),
                               minval=alpha_range[0], maxval=alpha_range[1])
    mixed = alpha * h + (1.0 - alpha) * x

    # preserve per-sample Frobenius norm (reference gin.py renormalization)
    axes = tuple(range(1, x.ndim))
    x_norm = jnp.sqrt((x ** 2).sum(axes, keepdims=True))
    m_norm = jnp.sqrt((mixed ** 2).sum(axes, keepdims=True))
    return (mixed * x_norm / jnp.maximum(m_norm, 1e-8)).astype(x.dtype)
