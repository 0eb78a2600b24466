"""Camera pose optimization modules (reference: src/training/components/poseopt.{hpp,cpp}).

Two learned corrections to the world-to-camera transform, optimized jointly with the scene
by a separate Adam (lr 1e-5, trainer.cpp:384-386):

  * direct: per-camera 9D embedding (3 translation + 6D rotation), zero-init
    (poseopt.cpp:22-44).
  * mlp: per-camera width-64 embedding -> depth-2 ReLU MLP -> 9D, last layer zero-init
    (3R-GS; poseopt.cpp:45-75).

forward(w2c, cam_idx) returns w2c @ delta where delta = [[R(rot6d+id6), t], [0, 1]]
(poseopt.cpp:31-44). Incompatible with --gut and with --eval in the reference
(trainer.cpp:366-389). Parameters are plain pytrees; functional apply keeps everything
jit/shard-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ROT6D_IDENTITY = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], np.float32)


def rotation_6d_to_matrix(rot6d: jnp.ndarray) -> jnp.ndarray:
    """6D rotation -> 3x3 via Gram-Schmidt (poseopt.cpp:12-20). rot6d [..., 6]."""
    a1 = rot6d[..., :3]
    a2 = rot6d[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def init_direct(num_cameras: int) -> dict:
    """Zero-init per-camera 9D embeddings (poseopt.cpp:28)."""
    return {"embeddings": jnp.zeros((num_cameras, 9), jnp.float32)}


def init_mlp(key: jax.Array, num_cameras: int, width: int = 64, depth: int = 2) -> dict:
    """Zero-init embeddings + MLP; last layer zero-init (poseopt.cpp:47-62)."""
    params = {"embeddings": jnp.zeros((num_cameras, width), jnp.float32), "layers": []}
    keys = jax.random.split(key, depth)
    fan = width
    for i in range(depth):
        # default torch Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound = 1.0 / np.sqrt(fan)
        wkey, bkey = jax.random.split(keys[i])
        params["layers"].append(
            {
                "w": jax.random.uniform(wkey, (width, width), jnp.float32, -bound, bound),
                "b": jax.random.uniform(bkey, (width,), jnp.float32, -bound, bound),
            }
        )
    params["layers"].append(
        {"w": jnp.zeros((width, 9), jnp.float32), "b": jnp.zeros((9,), jnp.float32)}
    )
    return params


def _delta_to_transform(delta9: jnp.ndarray, dtype) -> jnp.ndarray:
    """9D (3 trans + 6D rot) -> 4x4 correction matrix (poseopt.cpp:33-44)."""
    t = delta9[:3]
    rot6d = delta9[3:] + jnp.asarray(ROT6D_IDENTITY, dtype)
    r = rotation_6d_to_matrix(rot6d)
    m = jnp.eye(4, dtype=dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def apply_direct(params: dict, w2c: jnp.ndarray, cam_idx) -> jnp.ndarray:
    """w2c [4,4] x learned per-camera correction (poseopt.cpp:31-44)."""
    delta9 = params["embeddings"][cam_idx]
    return w2c @ _delta_to_transform(delta9, w2c.dtype)


def apply_mlp(params: dict, w2c: jnp.ndarray, cam_idx) -> jnp.ndarray:
    """Embedding -> MLP -> 9D correction (poseopt.cpp:64-75)."""
    h = params["embeddings"][cam_idx]
    for layer in params["layers"][:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    last = params["layers"][-1]
    delta9 = h @ last["w"] + last["b"]
    return w2c @ _delta_to_transform(delta9, w2c.dtype)


def apply(mode: str, params: dict | None, w2c: jnp.ndarray, cam_idx) -> jnp.ndarray:
    if mode == "none" or params is None:
        return w2c
    if mode == "direct":
        return apply_direct(params, w2c, cam_idx)
    if mode == "mlp":
        return apply_mlp(params, w2c, cam_idx)
    raise ValueError(f"unknown pose optimization mode {mode!r}")


def init(mode: str, key: jax.Array, num_cameras: int) -> dict | None:
    if mode == "none":
        return None
    if mode == "direct":
        return init_direct(num_cameras)
    if mode == "mlp":
        return init_mlp(key, num_cameras)
    raise ValueError(f"unknown pose optimization mode {mode!r}")
