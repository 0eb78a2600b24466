"""Per-image learned bilateral color grids (appearance compensation).

Reference: src/training/components/bilateral_grid.cpp + kernels
src/training/kernels/bilateral_grid_{forward,backward,tv}.cu. Each training image owns a
[12, L, H, W] grid (default L=8, H=16, W=16) of 3x4 affine color matrices initialized to
identity; `slice` trilinearly fetches a matrix per pixel at (x/(w-1)*(W-1), y/(h-1)*(H-1),
gray*(L-1)) with gray = 0.299 R + 0.587 G + 0.114 B of the *clamped* rendered color
(bilateral_grid_forward.cu:10-90), and applies rgb' = A @ [rgb, 1]. A total-variation loss
regularizes the grids (bilateral_grid_tv.cu:12-80). Both are plain differentiable jnp ops —
XLA fuses the gather+blend chain; no hand-written backward needed (the reference writes
CUDA backward kernels because torch can't autodiff through its custom kernel).

Applied AFTER rasterization, BEFORE the photometric loss (trainer.cpp:662-665), so its
gradient flows into the rasterizer backward. Optimized by a separate Adam (lr 2e-3,
eps 1e-15) with WarmupExponentialLR (1000 warmup steps from 1%, gamma 0.01^(1/iterations))
(trainer.cpp:66-101).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GRAY = (0.299, 0.587, 0.114)  # kC2G (bilateral_grid_forward.cu:11)


def init_grids(num_images: int, grid_w: int = 16, grid_h: int = 16, grid_l: int = 8) -> jnp.ndarray:
    """[N, 12, L, H, W] grids, identity affine (bilateral_grid.cpp:82-93)."""
    eye = np.eye(4, dtype=np.float32)[:3].reshape(12)  # row-major 3x4
    grid = np.tile(eye, (grid_l, grid_h, grid_w, 1))  # [L,H,W,12]
    grid = np.transpose(grid, (3, 0, 1, 2))  # [12,L,H,W]
    return jnp.asarray(np.tile(grid[None], (num_images, 1, 1, 1, 1)))


def slice_grid(grid: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Apply one image's grid to a rendered image.

    grid [12, L, H, W]; rgb [3, h, w] in [0,1] (clamped here like bilateral_grid.cpp:113).
    Returns [3, h, w].
    """
    twelve, L, H, W = grid.shape
    _, h, w = rgb.shape
    rgb = jnp.clip(rgb, 0.0, 1.0)
    r, g, b = rgb[0], rgb[1], rgb[2]

    # uniform pixel coords (bilateral_grid_forward.cu:33-40)
    gx = jnp.arange(w, dtype=rgb.dtype) / max(w - 1, 1)
    gy = jnp.arange(h, dtype=rgb.dtype) / max(h - 1, 1)
    x = gx[None, :] * (W - 1) * jnp.ones((h, 1), rgb.dtype)
    y = gy[:, None] * (H - 1) * jnp.ones((1, w), rgb.dtype)
    gray = GRAY[0] * r + GRAY[1] * g + GRAY[2] * b
    z = gray * (L - 1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.maximum(jnp.floor(z).astype(jnp.int32), 0)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.clip(z0 + 1, 0, L - 1)
    fx = x - x0
    fy = y - y0
    fz = z - z0.astype(rgb.dtype)

    flat = grid.reshape(twelve, L * H * W)  # [12, LHW]

    def fetch(zi, yi, xi):
        idx = (zi * H + yi) * W + xi  # [h,w]
        return flat[:, idx]  # [12,h,w]

    val = (
        fetch(z0, y0, x0) * ((1 - fx) * (1 - fy) * (1 - fz))[None]
        + fetch(z0, y0, x1) * (fx * (1 - fy) * (1 - fz))[None]
        + fetch(z0, y1, x0) * ((1 - fx) * fy * (1 - fz))[None]
        + fetch(z0, y1, x1) * (fx * fy * (1 - fz))[None]
        + fetch(z1, y0, x0) * ((1 - fx) * (1 - fy) * fz)[None]
        + fetch(z1, y0, x1) * (fx * (1 - fy) * fz)[None]
        + fetch(z1, y1, x0) * ((1 - fx) * fy * fz)[None]
        + fetch(z1, y1, x1) * (fx * fy * fz)[None]
    )  # [12, h, w]

    a = val.reshape(3, 4, h, w)  # A[d, s]: d = ci//4 output, s = ci%4 source
    out = (
        a[:, 0] * r[None] + a[:, 1] * g[None] + a[:, 2] * b[None] + a[:, 3]
    )  # [3,h,w]
    return out


def tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Total variation over [N, 12, L, H, W] grids (bilateral_grid_tv.cu:12-80).

    Each direction's squared diffs are normalized by the count of *cells along the other
    axes times (axis-1)*, then the sum is divided by 12*N.
    """
    n, c, L, H, W = grids.shape
    dx = grids[..., :, :, 1:] - grids[..., :, :, :-1]
    dy = grids[..., :, 1:, :] - grids[..., :, :-1, :]
    dz = grids[..., 1:, :, :] - grids[..., :-1, :, :]
    loss = (
        jnp.sum(dx * dx) / (L * H * (W - 1))
        + jnp.sum(dy * dy) / (L * (H - 1) * W)
        + jnp.sum(dz * dz) / ((L - 1) * H * W)
    )
    return loss / (12.0 * n)


def warmup_exponential_lr(
    base_lr: float, step, gamma: float, warmup_steps: int = 1000, start_factor: float = 0.01
):
    """WarmupExponentialLR closed form (scheduler.cpp:27-53). `step` is 1-based."""
    stepf = jnp.asarray(step, jnp.float32)
    warm = base_lr * (start_factor + (1.0 - start_factor) * stepf / max(warmup_steps, 1))
    decay = base_lr * jnp.power(jnp.float32(gamma), stepf - warmup_steps)
    return jnp.where(stepf <= warmup_steps, warm, decay)
