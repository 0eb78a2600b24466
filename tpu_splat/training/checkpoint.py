"""Full training-state checkpoint/resume — an upgrade over the reference.

The reference only snapshots model PLYs; optimizer state and the iteration counter are
never saved, so training cannot resume (SURVEY.md §5.4: `--init-ply` merely warm-starts a
fresh run). Here the complete TrainState pytree (splat params, Adam moments, RNG key,
iteration, densification info, component states) round-trips through a single .npz, plus a
JSON sidecar with the static metadata needed to rebuild the pytree structure.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..core.splat import SplatState
from .train_step import TrainState, init_train_state


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(jax.tree_util.keystr((p,))).strip(".[]'\"") for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str | Path, ts: TrainState, extra: Optional[dict] = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    import dataclasses

    # jax PRNG keys need explicit impl-aware serialization
    rng_data = np.asarray(jax.random.key_data(ts.rng))
    ts_no_rng = dataclasses.replace(ts, rng=None)
    arrays = _flatten_with_paths(ts_no_rng)
    arrays["__rng_key_data__"] = rng_data

    meta = {
        "max_sh_degree": ts.splat.max_sh_degree,
        "scene_scale": ts.splat.scene_scale,
        "capacity": int(ts.splat.capacity),
        "has_bilateral": ts.bilateral_grids is not None,
        "has_pose": ts.pose_params is not None,
        "pose_n_layers": len(ts.pose_params["layers"])
        if (ts.pose_params is not None and "layers" in ts.pose_params)
        else 0,
        "has_admm": ts.admm is not None,
        "extra": extra or {},
    }
    np.savez_compressed(path, **arrays)
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: str | Path) -> tuple[TrainState, dict]:
    """Rebuild the TrainState; returns (state, extra)."""
    import dataclasses

    path = Path(path)
    meta = json.loads(Path(str(path) + ".json").read_text())
    data = dict(np.load(path, allow_pickle=False))

    def a(key):
        return jax.numpy.asarray(data[key])

    splat = SplatState(
        means=a("splat/means"),
        sh0=a("splat/sh0"),
        shN=a("splat/shN"),
        scaling_raw=a("splat/scaling_raw"),
        rotation_raw=a("splat/rotation_raw"),
        opacity_raw=a("splat/opacity_raw"),
        alive=a("splat/alive"),
        max_sh_degree=meta["max_sh_degree"],
        scene_scale=meta["scene_scale"],
    )
    # reconstruct via a template state with matching structure, then fill leaves
    opt_stub = None
    if meta["has_bilateral"] or meta["has_pose"]:
        class _Opt:  # minimal attribute bag for init_train_state
            use_bilateral_grid = meta["has_bilateral"]
            pose_optimization = "none"
            bilateral_grid_X = bilateral_grid_Y = 16
            bilateral_grid_W = 8

        opt_stub = _Opt()
        if meta["has_pose"]:
            opt_stub.pose_optimization = "mlp" if meta["pose_n_layers"] else "direct"
    n_imgs = 0
    if meta["has_bilateral"]:
        n_imgs = data["bilateral_grids"].shape[0]
    elif meta["has_pose"]:
        n_imgs = data["pose_params/embeddings"].shape[0]
    template = init_train_state(splat, n_train_images=n_imgs, opt=opt_stub)
    if meta["has_admm"]:
        from . import sparsity as sp

        template = dataclasses.replace(
            template,
            admm=sp.ADMMState(
                u=jax.numpy.zeros((splat.capacity,)), z=jax.numpy.zeros((splat.capacity,))
            ),
        )

    flat, treedef = jax.tree_util.tree_flatten_with_path(dataclasses.replace(template, rng=None))
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(jax.tree_util.keystr((q,))).strip(".[]'\"") for q in p)
        leaves.append(jax.numpy.asarray(data[key]))
    ts = jax.tree_util.tree_unflatten(treedef, leaves)
    rng = jax.random.wrap_key_data(jax.numpy.asarray(data["__rng_key_data__"]))
    ts = dataclasses.replace(ts, rng=rng)
    return ts, meta.get("extra", {})
