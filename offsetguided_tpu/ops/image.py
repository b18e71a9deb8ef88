"""On-device image normalization.

The host pipeline ships images as uint8 (4x less host->device wire traffic
and 4x less inter-process transport than float32 -- measured 1.6x e2e even
on the development tunnel, BENCHMARKS.md) and normalization runs inside the
jitted program. Same math as the reference's torchvision Normalize step
(transforms/__init__.py:25-35) / data/transforms.py::normalize_image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DATA_MEAN, DATA_STD


def normalize_images(images: jax.Array) -> jax.Array:
    """(N, H, W, 3) uint8 RGB -> ImageNet-normalized float32.

    float32 input is passed through unchanged (already normalized on host),
    so every consumer accepts both layouts.
    """
    if images.dtype != jnp.uint8:
        return images
    mean = jnp.asarray(DATA_MEAN, jnp.float32)
    std = jnp.asarray(DATA_STD, jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean) / std
