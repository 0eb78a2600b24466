"""Front-to-back alpha compositing as parallel cumulative ops (TPU-native blend).

The reference's `blend_cu` (fastgs/rasterization/include/kernels_forward.cuh:356-459) walks
gaussians front-to-back per pixel with three skip rules and an early-out:

  sigma = 0.5*(A dx^2 + C dy^2) + B dx dy          ; skip if sigma < 0
  alpha = min(opacity * exp(-sigma), 0.999)        ; skip if alpha < 1/255
  T_next = T * (1 - alpha)                         ; STOP (excluding this one) if T_next < 1e-4
  color += T * alpha * max(color_g, 0) ; T = T_next

That sequential loop is *exactly* equivalent to a closed form over the depth-ordered list:
with a_i = alpha_i * [valid_i], P_i = prod_{j<=i}(1-a_j) (inclusive cumprod), the stop fires
first at i* = min{ i : valid_i and P_i < 1e-4 }, contributions are w_i = a_i * P_{i-1} for
valid i < i*, and the final transmittance is P_{i*-1}. Cumprod + cumulative-or are parallel
scans, so the whole blend is dense vector math + one matmul per chunk — no warps, no atomics.
The stop mask is non-differentiable (boolean), matching the reference backward.
"""

from __future__ import annotations

import jax.numpy as jnp

from .projection import MAX_FRAGMENT_ALPHA, MIN_ALPHA, TRANSMITTANCE_THRESHOLD


def pixel_sigma(mean2d, conic, pix):
    """Gaussian exponent at pixel centers.

    mean2d [..., 2], conic [..., 3], pix [..., 2] (already +0.5 centered).
    Returns sigma [...]. delta = mean2d - pixel (kernels_forward.cuh:426).
    """
    dx = mean2d[..., 0] - pix[..., 0]
    dy = mean2d[..., 1] - pix[..., 1]
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    return 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy


def alpha_and_valid(sigma, opacity, valid_in):
    """Skip rules: sigma >= 0 and alpha >= 1/255; alpha clamped to 0.999."""
    gaussian = jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(opacity * gaussian, MAX_FRAGMENT_ALPHA)
    valid = valid_in & (sigma >= 0.0) & (alpha >= MIN_ALPHA)
    return jnp.where(valid, alpha, 0.0), valid


def composite_chunk(a, valid, carry_T, carry_dead, axis):
    """One depth-ordered chunk of the blend recurrence, vectorized.

    a      [...]: alpha with invalid entries already zeroed (depth axis = `axis`)
    valid  [...]: bool skip mask
    carry_T   : transmittance entering the chunk (shape of a without `axis`)
    carry_dead: stop flag entering the chunk

    Returns (w, new_T, new_dead): w are the per-entry contribution weights T_before * alpha.
    """
    one_m = 1.0 - a
    cp_incl = jnp.cumprod(one_m, axis=axis)
    cp_excl = cp_incl / one_m  # safe: one_m >= 1 - 0.999 = 1e-3
    t_excl = jnp.expand_dims(carry_T, axis) * cp_excl
    t_incl = jnp.expand_dims(carry_T, axis) * cp_incl

    trigger = valid & (t_incl < TRANSMITTANCE_THRESHOLD)
    dead_incl = jnp.expand_dims(carry_dead, axis) | (jnp.cumsum(trigger, axis=axis) > 0)
    use = valid & ~dead_incl

    w = jnp.where(use, a * t_excl, 0.0)
    used_one_m = jnp.where(use, one_m, 1.0)
    new_T = carry_T * jnp.prod(used_one_m, axis=axis)
    new_dead = jnp.max(dead_incl, axis=axis)
    return w, new_T, new_dead
