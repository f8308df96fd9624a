"""Photometric augmentation (on-device).

Equivalents of the reference's preprocess transforms
(snvc/utils/preprocess.py:21-179): ImageNet normalization, PCA lighting
noise, and brightness/contrast/saturation jitter — expressed as pure jnp
functions over NHWC float images in [0, 1], keyed by jax PRNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])

# ImageNet PCA eigen decomposition (preprocess.py's lighting constants)
_EIGVAL = jnp.array([0.2175, 0.0188, 0.0045])
_EIGVEC = jnp.array(
    [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ]
)


def normalize(img, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    return (img - mean) / std


def pca_lighting(rng, img, alphastd: float = 0.1):
    """AlexNet-style PCA lighting noise (reference Lighting transform)."""
    alpha = jax.random.normal(rng, (3,)) * alphastd
    shift = _EIGVEC @ (alpha * _EIGVAL)
    return img + shift


def brightness(rng, img, var: float = 0.4):
    a = 1.0 + jax.random.uniform(rng, (), minval=-var, maxval=var)
    return img * a


def contrast(rng, img, var: float = 0.4):
    a = 1.0 + jax.random.uniform(rng, (), minval=-var, maxval=var)
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return img * a + gray.mean(axis=(-3, -2), keepdims=True) * (1 - a)


def saturation(rng, img, var: float = 0.4):
    a = 1.0 + jax.random.uniform(rng, (), minval=-var, maxval=var)
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return img * a + gray * (1 - a)


def color_jitter(rng, img, brightness_var=0.4, contrast_var=0.4,
                 saturation_var=0.4, lighting_std=0.1):
    """Random-order jitter + lighting (reference ColorJitter + Lighting).

    The reference shuffles the op order per sample; a fixed random order
    per call (keyed) keeps the jit static while matching the distribution
    closely."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    perm = jax.random.permutation(k5, 3)

    def apply(i, im):
        return jax.lax.switch(
            i,
            [
                lambda m: brightness(k1, m, brightness_var),
                lambda m: contrast(k2, m, contrast_var),
                lambda m: saturation(k3, m, saturation_var),
            ],
            im,
        )

    img = apply(perm[0], img)
    img = apply(perm[1], img)
    img = apply(perm[2], img)
    img = pca_lighting(k4, img, lighting_std)
    return jnp.clip(img, 0.0, 1.0)
