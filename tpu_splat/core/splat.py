"""SplatState — the Gaussian-cloud parameter pytree (TPU-native SplatData).

Mirrors the reference's `SplatData` (`include/core/splat_data.hpp:23-122`) but as a
fixed-capacity, pure-functional pytree: densification never reallocates — `n_alive` counts the
live prefix/slots and dead slots are masked out of every op. This keeps every train step the
same static shape (no recompilation) — the single biggest idiomatic divergence from the
reference's concat/index_select optimizer surgery (SURVEY.md §7).

Parameterization (identical to reference):
  means            [C, 3]    world positions
  sh0              [C, 1, 3] DC SH coefficient
  shN              [C, K-1, 3] rest SH coefficients (K = (sh_degree+1)^2)
  scaling_raw      [C, 3]    log(σ)
  rotation_raw     [C, 4]    unnormalized quaternion, wxyz
  opacity_raw      [C, 1]    logit(opacity)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814  # SH DC basis constant (kernel_utils.cuh:24)

PARAM_FIELDS = ("means", "sh0", "shN", "scaling_raw", "rotation_raw", "opacity_raw")


@jax.tree_util.register_dataclass
@dataclass
class SplatState:
    means: jax.Array
    sh0: jax.Array
    shN: jax.Array
    scaling_raw: jax.Array
    rotation_raw: jax.Array
    opacity_raw: jax.Array
    alive: jax.Array  # [C] bool — live slots
    # static metadata (aux_data, not traced)
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True), default=3)
    scene_scale: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_bases_rest(self) -> int:
        return self.shN.shape[1]

    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def params(self) -> dict[str, jax.Array]:
        return {k: getattr(self, k) for k in PARAM_FIELDS}

    def replace_params(self, params: dict[str, jax.Array]) -> "SplatState":
        return dataclasses.replace(self, **params)

    # Activated getters (splat_data.hpp getters)
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling_raw)

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity_raw[:, 0])

    def get_rotation(self) -> jax.Array:
        q = self.rotation_raw
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mean_neighbor_distances(points: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Mean distance to the 3 nearest neighbors (excluding self / coincident points).

    Reference uses a nanoflann KD-tree (`splat_data.cpp:63-112`); here a chunked brute-force
    top-k (O(N^2) flops but vectorized — fine up to a few hundred k SfM points, and it runs
    once at init).
    """
    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    if n <= 1:
        return np.full((n,), 0.01, np.float32)
    out = np.empty((n,), np.float32)
    sq = np.sum(pts * pts, axis=1)
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        d2 = sq[i0:i1, None] - 2.0 * (pts[i0:i1] @ pts.T) + sq[None, :]
        np.maximum(d2, 0.0, out=d2)
        k = min(4, n)
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        nd2 = np.take_along_axis(d2, idx, axis=1)
        nd2.sort(axis=1)
        valid = nd2 > 1e-8  # drops self-distance and coincident points (splat_data.cpp:102)
        dist = np.sqrt(nd2) * valid
        cnt = np.minimum(valid.sum(axis=1), 3)
        top3 = np.where(np.cumsum(valid, axis=1) <= 3, dist, 0.0).sum(axis=1)
        out[i0:i1] = np.where(cnt > 0, top3 / np.maximum(cnt, 1), 0.01)
    return out


def init_from_pointcloud(
    positions: np.ndarray,
    colors: np.ndarray,
    scene_center: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.5,
    init_scaling: float = 0.1,
) -> SplatState:
    """Initialize a SplatState from SfM points (splat_data.cpp:508-614 semantics).

    colors are in [0,1]. Capacity must be >= len(positions); extra slots are dead.
    """
    positions = np.asarray(positions, np.float32)
    colors = np.asarray(colors, np.float32)
    n = positions.shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial points {n}")

    dists = np.linalg.norm(positions - np.asarray(scene_center, np.float32)[None], axis=1)
    scene_scale = float(np.median(dists))

    nn_dist = np.clip(mean_neighbor_distances(positions), 1e-7, None)
    scaling = np.log(np.sqrt(nn_dist) * init_scaling)[:, None].repeat(3, axis=1)

    k = (sh_degree + 1) ** 2
    sh0 = ((colors - 0.5) / C0)[:, None, :]  # [n,1,3]
    shN = np.zeros((n, k - 1, 3), np.float32)

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)

    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((n, 1), float(np.log(init_opacity / (1.0 - init_opacity))), np.float32)

    alive = np.zeros((capacity,), bool)
    alive[:n] = True

    # dead slots get identity quats (avoid q_norm_sq < 1e-8 NaNs in masked math)
    rot_pad = pad(rotation)
    rot_pad[n:, 0] = 1.0

    return SplatState(
        means=jnp.asarray(pad(positions)),
        sh0=jnp.asarray(pad(sh0.astype(np.float32))),
        shN=jnp.asarray(pad(shN)),
        scaling_raw=jnp.asarray(pad(scaling.astype(np.float32))),
        rotation_raw=jnp.asarray(rot_pad),
        opacity_raw=jnp.asarray(pad(opacity, fill=-15.0)),
        alive=jnp.asarray(alive),
        max_sh_degree=sh_degree,
        scene_scale=scene_scale,
    )


def init_random(
    rng: np.random.Generator,
    num_points: int,
    extent: float,
    capacity: int,
    scene_center: np.ndarray | None = None,
    sh_degree: int = 3,
    init_opacity: float = 0.5,
    init_scaling: float = 0.1,
) -> SplatState:
    """Random init (`--random`): uniform cube of `extent`, random colors, then positions
    scaled by scene_scale (splat_data.cpp:516-547)."""
    positions = (rng.random((num_points, 3), np.float32) * 2.0 - 1.0) * extent
    colors = rng.random((num_points, 3), np.float32)
    center = np.zeros(3, np.float32) if scene_center is None else scene_center
    dists = np.linalg.norm(positions - center[None], axis=1)
    scene_scale = float(np.median(dists))
    positions = positions * scene_scale
    return init_from_pointcloud(
        positions, colors, center, capacity, sh_degree, init_opacity, init_scaling
    )
