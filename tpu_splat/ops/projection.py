"""EWA projection + per-Gaussian preprocess for the fast (pinhole) path.

Vectorized-over-N XLA translation of the *semantics* of `preprocess_cu`
(fastgs/rasterization/include/kernels_forward.cuh:18-205): sigmoid opacity, quat->rotmat->3D
covariance, camera-space depth cull, EWA projection with clamped Jacobian and 0.3 dilation,
conic + opacity-aware screen extent, tile-rect bounds. Instead of warp ballots and atomics,
everything is a masked dense array of capacity N.

Constants from fastgs/rasterization/include/rasterization_config.h:11-30.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quat import quat_to_rotmat_cols
from .sh import sh_to_color

DILATION = 0.3
MIN_ALPHA_RCP = 255.0
MIN_ALPHA = 1.0 / MIN_ALPHA_RCP
MAX_FRAGMENT_ALPHA = 0.999
TRANSMITTANCE_THRESHOLD = 1e-4
NEAR_PLANE = 0.01  # fast_rasterizer.cpp:32
FAR_PLANE = 1e10


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities (dead/culled entries masked by `visible`)."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] upper-tri inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray  # [N] sigmoid opacity
    color: jnp.ndarray  # [N, 3] SH color (unclamped)
    depth: jnp.ndarray  # [N] camera-space z
    tile_min: jnp.ndarray  # [N, 2] int32 (x, y) inclusive tile bounds
    tile_max: jnp.ndarray  # [N, 2] int32 (x, y) exclusive tile bounds
    n_tiles: jnp.ndarray  # [N] int32 conservative rect tile count (0 if culled)
    power_threshold: jnp.ndarray  # [N] log(opacity * 255)
    visible: jnp.ndarray  # [N] bool


def project(
    means: jnp.ndarray,  # [N, 3]
    scaling_raw: jnp.ndarray,  # [N, 3] log sigma
    rotation_raw: jnp.ndarray,  # [N, 4] wxyz unnormalized
    opacity_raw: jnp.ndarray,  # [N, 1] logit
    sh0: jnp.ndarray,  # [N, 1, 3]
    shN: jnp.ndarray,  # [N, K-1, 3]
    alive: jnp.ndarray,  # [N] bool
    w2c: jnp.ndarray,  # [4, 4]
    cam_position: jnp.ndarray,  # [3]
    fx, fy, cx, cy,
    width: int,
    height: int,
    active_sh_degree,
    tile_size: int = 16,
) -> Projected:
    f32 = means.dtype
    r1, r2, r3 = w2c[0], w2c[1], w2c[2]

    depth = means @ r3[:3] + r3[3]
    visible = alive & (depth >= NEAR_PLANE) & (depth <= FAR_PLANE)
    safe_depth = jnp.where(visible, depth, 1.0)

    opacity = jax.nn.sigmoid(opacity_raw[:, 0])  # numerically stable vs 1/(1+exp(-x))
    visible &= opacity >= MIN_ALPHA

    # 3D covariance chain (kernels_forward.cuh:78-106) in FLAT COLUMN form:
    # cov2d = JW (R S^2 R^T) JW^T is evaluated as u = R^T jw1, v = R^T jw2,
    # cov_ij = sum_k var_k u_k v_k — no [N, 3, 3] intermediate ever exists, so the
    # autodiff backward to scaling/rotation stays fully fused flat [N] arithmetic
    # (the einsum form's VJP cost ~37 ms of relayout-heavy code at 1M gaussians,
    # tools/profiling/profile_parambwd.py).
    q = rotation_raw
    q_norm_sq = jnp.sum(q * q, axis=-1)
    visible &= q_norm_sq >= 1e-8
    rc = quat_to_rotmat_cols(q)  # nine flat [N] columns, row-major
    var = jnp.exp(2.0 * scaling_raw)  # [N,3]

    # normalized camera-plane coords
    x = (means @ r1[:3] + r1[3]) / safe_depth
    y = (means @ r2[:3] + r2[3]) / safe_depth

    # clamped Jacobian (kernels_forward.cuh:113-122)
    tx = jnp.clip(x, (-0.15 * width - cx) / fx, (1.15 * width - cx) / fx)
    ty = jnp.clip(y, (-0.15 * height - cy) / fy, (1.15 * height - cy) / fy)
    j11 = fx / safe_depth
    j13 = -j11 * tx
    j22 = fy / safe_depth
    j23 = -j22 * ty

    # JW rows (J @ W[:3,:3]) as flat columns; w2c row entries are per-camera scalars
    jw1 = tuple(j11 * r1[i] + j13 * r3[i] for i in range(3))  # 3 x [N]
    jw2 = tuple(j22 * r2[i] + j23 * r3[i] for i in range(3))

    u = tuple(jw1[0] * rc[0][k] + jw1[1] * rc[1][k] + jw1[2] * rc[2][k] for k in range(3))
    v = tuple(jw2[0] * rc[0][k] + jw2[1] * rc[1][k] + jw2[2] * rc[2][k] for k in range(3))
    v0, v1, v2 = var[:, 0], var[:, 1], var[:, 2]
    cov_a = v0 * u[0] * u[0] + v1 * u[1] * u[1] + v2 * u[2] * u[2] + DILATION
    cov_b = v0 * u[0] * v[0] + v1 * u[1] * v[1] + v2 * u[2] * v[2]
    cov_c = v0 * v[0] * v[0] + v1 * v[1] * v[1] + v2 * v[2] * v[2] + DILATION

    det = cov_a * cov_c - cov_b * cov_b
    visible &= det >= 1e-8
    safe_det = jnp.where(det > 1e-12, det, 1.0)
    conic = jnp.stack([cov_c / safe_det, -cov_b / safe_det, cov_a / safe_det], axis=-1)

    mean2d = jnp.stack([x * fx + cx, y * fy + cy], axis=-1)

    # opacity-aware screen extent (kernels_forward.cuh:158-170)
    power_threshold = jnp.log(jnp.maximum(opacity, MIN_ALPHA) * MIN_ALPHA_RCP)
    ptf = jnp.sqrt(jnp.maximum(2.0 * power_threshold, 0.0))
    ext_x = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(cov_a, 0.0)) - 0.5, 0.0)
    ext_y = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(cov_c, 0.0)) - 0.5, 0.0)

    gw = (width + tile_size - 1) // tile_size
    gh = (height + tile_size - 1) // tile_size
    ts = jnp.asarray(float(tile_size), f32)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - ext_x) / ts).astype(jnp.int32), 0, gw)
    x_max = jnp.clip(jnp.ceil((mean2d[:, 0] + ext_x) / ts).astype(jnp.int32), 0, gw)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - ext_y) / ts).astype(jnp.int32), 0, gh)
    y_max = jnp.clip(jnp.ceil((mean2d[:, 1] + ext_y) / ts).astype(jnp.int32), 0, gh)

    n_tiles = (x_max - x_min) * (y_max - y_min)
    visible &= n_tiles > 0
    n_tiles = jnp.where(visible, n_tiles, 0)

    dirs = means - cam_position[None, :]
    color = sh_to_color(sh0, shN, dirs, active_sh_degree)

    return Projected(
        mean2d=mean2d,
        conic=conic,
        opacity=opacity,
        color=color,
        depth=depth,
        tile_min=jnp.stack([x_min, y_min], axis=-1),
        tile_max=jnp.stack([x_max, y_max], axis=-1),
        n_tiles=n_tiles,
        power_threshold=power_threshold,
        visible=visible,
    )


def will_contribute(
    mean2d: jnp.ndarray,  # [..., 2] (UNSHIFTED screen coords)
    conic: jnp.ndarray,  # [..., 3]
    tile_x: jnp.ndarray,  # [...] int
    tile_y: jnp.ndarray,
    power_threshold: jnp.ndarray,  # [...]
    tile_size: int = 16,
) -> jnp.ndarray:
    """Exact per-tile contribution test (kernel_utils.cuh:108-143, StopThePop).

    The mean is shifted by -0.5 before testing (pixel-center convention,
    kernel_utils.cuh:153). Returns bool [...].
    """
    mx = mean2d[..., 0] - 0.5
    my = mean2d[..., 1] - 0.5
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    tsf = float(tile_size)

    rect_min_x = tile_x.astype(mx.dtype) * tsf
    rect_min_y = tile_y.astype(my.dtype) * tsf
    rect_max_x = rect_min_x + (tsf - 1.0)
    rect_max_y = rect_min_y + (tsf - 1.0)

    x_left = (rect_min_x - mx > 0).astype(mx.dtype)
    not_in_x = x_left + (mx > rect_max_x).astype(mx.dtype)
    y_above = (rect_min_y - my > 0).astype(my.dtype)
    not_in_y = y_above + (my > rect_max_y).astype(my.dtype)

    inside = (not_in_x + not_in_y) == 0.0

    ccx = rect_max_x + x_left * (rect_min_x - rect_max_x)  # lerp(max, min, x_left)
    ccy = rect_max_y + y_above * (rect_min_y - rect_max_y)
    dx = mx - ccx
    dy = my - ccy

    # copysign(tile_size-1, rect_min - mean): points from the closest corner into the tile
    d_x = jnp.where(rect_min_x - mx > 0, tsf - 1.0, -(tsf - 1.0))
    d_y = jnp.where(rect_min_y - my > 0, tsf - 1.0, -(tsf - 1.0))

    eps = 1e-12
    t_x = not_in_y * jnp.clip((d_x * a * dx + d_x * b * dy) / (d_x * a * d_x + eps), 0.0, 1.0)
    t_y = not_in_x * jnp.clip((d_y * b * dx + d_y * c * dy) / (d_y * c * d_y + eps), 0.0, 1.0)

    px = ccx + t_x * d_x
    py = ccy + t_y * d_y
    ddx = mx - px
    ddy = my - py
    max_power = 0.5 * (a * ddx * ddx + c * ddy * ddy) + b * ddx * ddy
    return inside | (max_power <= power_threshold)
