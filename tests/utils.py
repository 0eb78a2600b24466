"""Shared test fixtures: random synthetic scenes + camera packs."""

from __future__ import annotations

import numpy as np


def make_scene(n: int, seed: int = 0, sh_rest: int = 15, spread: float = 1.0):
    """Random gaussian cloud in front of a simple pinhole camera."""
    rng = np.random.default_rng(seed)
    means = rng.normal(0, spread, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0  # in front of camera at origin looking +z
    scaling_raw = np.log(rng.uniform(0.02, 0.15, (n, 3))).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q[:, 0] += 2.0  # bias toward identity, avoid near-zero norm
    opacity_raw = rng.normal(0.5, 1.0, (n, 1)).astype(np.float32)
    sh0 = rng.normal(0, 0.7, (n, 1, 3)).astype(np.float32)
    shN = (rng.normal(0, 0.1, (n, sh_rest, 3)) if sh_rest else np.zeros((n, 0, 3))).astype(
        np.float32
    )
    alive = np.ones((n,), bool)
    return dict(
        means=means,
        scaling_raw=scaling_raw,
        rotation_raw=q,
        opacity_raw=opacity_raw,
        sh0=sh0,
        shN=shN,
        alive=alive,
    )


def make_camera(width: int = 64, height: int = 64, fov_deg: float = 60.0):
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    w2c = np.eye(4, dtype=np.float32)
    cam_pos = np.zeros(3, np.float32)
    return dict(
        w2c=w2c,
        cam_position=cam_pos,
        fx=float(f),
        fy=float(f),
        cx=width / 2.0,
        cy=height / 2.0,
        width=width,
        height=height,
    )
