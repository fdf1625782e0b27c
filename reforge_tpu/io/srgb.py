"""sRGB transfer functions and host<->device image layout conversion.

The reference performs gamma-correct loading by blitting the decoded bytes
through an sRGB Vulkan image into a linear image — the GPU's fixed-function
sRGB EOTF (reference: src/render.rs:286-312) — and symmetrically converts
back on readback (render.rs:406-433).  Here the exact IEC 61966-2-1
piecewise curves run on device as part of the fused program's prologue and
epilogue, so they fuse into the first/last kernels for free.

Alpha is linear in both directions (sRGB applies to color channels only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """IEC 61966-2-1 EOTF, elementwise on color values in [0, 1]."""
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        jnp.power((c + 0.055) / 1.055, 2.4),
    )


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """IEC 61966-2-1 OETF (inverse EOTF), elementwise."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * jnp.power(c, 1.0 / 2.4) - 0.055,
    )


def decode_image_to_planar(rgba_u8: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 4) uint8 sRGB -> (4, H, W) f32 linear-light.

    The device-side half of the reference's staging-buffer -> sRGB-image ->
    linear-image load (render.rs:264-312).
    """
    x = rgba_u8.astype(jnp.float32) / 255.0
    x = jnp.transpose(x, (2, 0, 1))
    rgb = srgb_to_linear(x[:3])
    return jnp.concatenate([rgb, x[3:4]], axis=0)


def encode_planar_to_image(planar_f32: jnp.ndarray) -> jnp.ndarray:
    """(4, H, W) f32 linear-light -> (H, W, 4) uint8 sRGB."""
    rgb = linear_to_srgb(planar_f32[:3])
    a = jnp.clip(planar_f32[3:4], 0.0, 1.0)
    x = jnp.concatenate([rgb, a], axis=0)
    x = jnp.transpose(x, (1, 2, 0))
    return jnp.round(x * 255.0).astype(jnp.uint8)


# NumPy twins, used by tests and host-side tools.


def np_srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = c.astype(np.float64)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(
        np.float32
    )


def np_linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.clip(c.astype(np.float64), 0.0, 1.0)
    return np.where(
        c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055
    ).astype(np.float32)
