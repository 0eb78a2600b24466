"""Offline render CLI — the TPU stand-in for the reference's interactive viewer.

The reference's OpenGL/ImGui viewer (src/rendering + src/visualizer, ~23k LoC) is
desktop-GPU-specific; its *capabilities* (load PLY/SOG, orbit camera, render modes,
point-cloud mode, background color) are provided here as batch rendering: orbit turntables,
novel-view paths, and single frames written as PNGs/JPEGs from the TPU rasterizer.
SURVEY.md §7.8 records this design decision.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .core.splat import SplatState, init_from_pointcloud
from .io.image import save_image
from .ops.rasterize import rasterize
from .utils.log import get_logger

log = get_logger(__name__)


def load_model(path: str | Path) -> SplatState:
    """Load a PLY or SOG model into a SplatState (capacity = n, all alive)."""
    from .io.loader import load

    res = load(path)
    if res.splat_params is None:
        raise ValueError(f"{path} is not a renderable model (PLY/SOG)")
    raw = res.splat_params
    n = raw["means"].shape[0]
    import dataclasses

    import jax.numpy as jnp

    state = init_from_pointcloud(
        raw["means"], np.zeros((n, 3), np.float32), raw["means"].mean(axis=0), capacity=n,
        sh_degree=int(round(math.sqrt(raw["shN"].shape[1] + 1))) - 1 if raw["shN"].shape[1] else 0,
    )
    return dataclasses.replace(
        state,
        **{k: jnp.asarray(v) for k, v in raw.items()},
    )


def look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0, -1.0, 0])) -> np.ndarray:
    """World-to-camera matrix looking from eye at target (y-down splat convention)."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, :3], w2c[1, :3], w2c[2, :3] = r, u, f
    w2c[:3, 3] = -w2c[:3, :3] @ eye
    return w2c


def render_view(
    state: SplatState,
    w2c: np.ndarray,
    width: int,
    height: int,
    fov_deg: float = 60.0,
    bg: np.ndarray | None = None,
    render_mode: str = "RGB",
    sh_degree: Optional[int] = None,
    point_cloud: bool = False,
):
    f = 0.5 * width / math.tan(math.radians(fov_deg) / 2)
    cam_pos = (-w2c[:3, :3].T @ w2c[:3, 3]).astype(np.float32)
    n = state.capacity
    scaling_raw, opacity_raw = state.scaling_raw, state.opacity_raw
    if point_cloud:
        # point-cloud debug mode (reference viewer: point rendering toggle,
        # include/rendering/rendering.hpp:42-57): every splat drawn as a small
        # opaque dot — scales shrunk to ~0.4% of the scene extent, opacity saturated
        alive_f = state.alive[:, None].astype(jnp.float32)
        center = jnp.sum(state.means * alive_f, 0) / jnp.maximum(jnp.sum(alive_f), 1)
        extent = jnp.sqrt(
            jnp.sum(jnp.sum((state.means - center) ** 2, -1) * alive_f[:, 0])
            / jnp.maximum(jnp.sum(alive_f), 1)
        )
        scaling_raw = jnp.full_like(state.scaling_raw, jnp.log(0.004 * extent + 1e-9))
        opacity_raw = jnp.full_like(state.opacity_raw, 8.0)
    out = rasterize(
        state.means, scaling_raw, state.rotation_raw, opacity_raw,
        state.sh0, state.shN, state.alive,
        jnp.asarray(w2c), jnp.asarray(cam_pos),
        f, f, width / 2.0, height / 2.0,
        state.max_sh_degree if sh_degree is None else sh_degree,
        jnp.zeros(3, jnp.float32) if bg is None else jnp.asarray(bg),
        width=width, height=height,
        max_instances=max(1 << 16, 1 << int(np.ceil(np.log2(max(n * 16, 2))))),
        k_max=4096,
        render_mode=render_mode,
    )
    return out


def render_orbit(
    model_path: str | Path,
    output_dir: str | Path,
    n_frames: int = 60,
    width: int = 1280,
    height: int = 720,
    fov_deg: float = 60.0,
    elevation_deg: float = -15.0,
    radius_scale: float = 1.0,
    render_mode: str = "RGB",
    crop_box=None,  # core.geometry.BoundingBox (viewer crop, rasterizer.cpp:84-136)
) -> list[Path]:
    """Turntable render around the model's centroid."""
    state = load_model(model_path)
    if crop_box is not None:
        from .core.geometry import crop_splat_by_box

        state = crop_splat_by_box(state, crop_box)
    means = np.asarray(state.means)[np.asarray(state.alive)]
    center = means.mean(axis=0)
    radius = float(np.percentile(np.linalg.norm(means - center, axis=1), 90)) * 2.0 * radius_scale

    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    elev = math.radians(elevation_deg)
    for i in range(n_frames):
        theta = 2 * math.pi * i / n_frames
        eye = center + radius * np.array(
            [math.cos(theta) * math.cos(elev), math.sin(elev), math.sin(theta) * math.cos(elev)]
        )
        w2c = look_at(eye.astype(np.float32), center.astype(np.float32))
        out = render_view(state, w2c, width, height, fov_deg, render_mode=render_mode)
        img = np.clip(np.asarray(out.image), 0, 1)
        p = out_dir / f"frame_{i:04d}.png"
        save_image(str(p), img)
        if out.depth is not None:
            d = np.asarray(out.depth)
            dn = (d - d.min()) / max(d.max() - d.min(), 1e-9)
            save_image(str(out_dir / f"depth_{i:04d}.png"), np.repeat(dn[None], 3, 0))
        paths.append(p)
    log.info("rendered %d frames to %s", n_frames, out_dir)
    return paths
