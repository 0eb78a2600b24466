"""Naive O(N*P) differentiable renderer — the test oracle.

Plays the role of the reference's hand-written libtorch oracle (`tests/torch_impl.{hpp,cpp}`,
SURVEY.md §4): a direct, unoptimized implementation of the exact fast-path semantics that the
tiled/Pallas rasterizer is validated against with allclose. Every gaussian is evaluated at
every pixel (globally depth-sorted), so there is no tiling/culling approximation beyond the
alpha >= 1/255 rule itself.

Only for small scenes/tests — memory is O(N * H * W).
"""

from __future__ import annotations

import jax.numpy as jnp

from .blend import alpha_and_valid, composite_chunk, pixel_sigma
from .projection import Projected, project


def render_naive_projected(
    proj: Projected, width: int, height: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite all projected gaussians at every pixel. Returns (image [3,H,W], alpha [H,W])."""
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)

    mean2d = proj.mean2d[order]  # [N,2]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    color = jnp.maximum(proj.color[order], 0.0)  # clamp >= 0 at blend (kernels_forward.cuh:410)
    visible = proj.visible[order]

    ys = jnp.arange(height, dtype=mean2d.dtype) + 0.5
    xs = jnp.arange(width, dtype=mean2d.dtype) + 0.5
    pix = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)  # [P,2]

    sigma = pixel_sigma(mean2d[:, None, :], conic[:, None, :], pix[None, :, :])  # [N,P]
    a, valid = alpha_and_valid(sigma, opacity[:, None], visible[:, None])

    p = pix.shape[0]
    carry_T = jnp.ones((p,), mean2d.dtype)
    carry_dead = jnp.zeros((p,), bool)
    w, t_final, _ = composite_chunk(a, valid, carry_T, carry_dead, axis=0)  # w [N,P]

    img = w.T @ color  # [P,3]
    image = img.T.reshape(3, height, width)
    alpha_map = (1.0 - t_final).reshape(height, width)
    return image, alpha_map


def render_naive(
    means, scaling_raw, rotation_raw, opacity_raw, sh0, shN, alive,
    w2c, cam_position, fx, fy, cx, cy, width: int, height: int,
    active_sh_degree=3, bg_color=None,
):
    """Full fast-path oracle: project + naive blend (+ background composited outside the
    kernel as image + (1-alpha)*bg, fast_rasterizer.cpp:63)."""
    proj = project(
        means, scaling_raw, rotation_raw, opacity_raw, sh0, shN, alive,
        w2c, cam_position, fx, fy, cx, cy, width, height, active_sh_degree,
    )
    image, alpha_map = render_naive_projected(proj, width, height)
    if bg_color is not None:
        image = image + (1.0 - alpha_map)[None] * jnp.asarray(bg_color).reshape(3, 1, 1)
    return image, alpha_map
