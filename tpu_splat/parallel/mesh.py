"""Device mesh + sharding layout for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.3/§5.8) — this layer is NEW functionality.
Layout (per BASELINE.md north star):

  mesh axes ("data", "gauss"):
    * "gauss": the Gaussian capacity axis is sharded over chips — projection, SH, Adam,
      relocation, and noise are embarrassingly parallel over N.
    * "data": cameras (batch) are sharded over chips — each data-group renders different
      views; parameter gradients are all-reduced over the mesh (psum inserted by GSPMD).

Camera/image tensors are replicated within a data group; XLA inserts the all-gathers needed
where the tile pipeline consumes the gaussian axis and reduce-scatters for the backward —
collectives ride ICI. Explicit shard_map scheduling of the blend is a later optimization.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.train_step import TrainState


def make_mesh(devices=None, data: int | None = None) -> Mesh:
    """Build a ("data", "gauss") mesh. `data` defaults to 1 (pure gaussian sharding)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    d = data or 1
    if n % d:
        raise ValueError(f"{n} devices not divisible by data={d}")
    arr = np.asarray(devices).reshape(d, n // d)
    return Mesh(arr, axis_names=("data", "gauss"))


def state_shardings(mesh: Mesh, ts: TrainState) -> TrainState:
    """Sharding pytree matching TrainState: capacity axis over 'gauss', rest replicated."""
    import dataclasses

    from ..training.optim import AdamState

    gauss = NamedSharding(mesh, P("gauss"))
    repl = NamedSharding(mesh, P())

    splat_sh = dataclasses.replace(
        ts.splat,
        **{k: gauss for k in ts.splat.params()},
        alive=gauss,
    )
    adam_sh = AdamState(
        exp_avg={k: gauss for k in ts.adam.exp_avg},
        exp_avg_sq={k: gauss for k in ts.adam.exp_avg_sq},
        step_count={k: repl for k in ts.adam.step_count},
    )
    # optional component states (bilateral grids / pose / ADMM): replicate leaves
    aux_fields = {}
    for f in ("bilateral_grids", "bilateral_opt", "pose_params", "pose_opt", "admm"):
        v = getattr(ts, f)
        aux_fields[f] = None if v is None else jax.tree.map(lambda _: repl, v)
    return TrainState(
        splat=splat_sh, adam=adam_sh, rng=repl, iteration=repl,
        dens_count=gauss, dens_grad2d=gauss, **aux_fields,
    )


def shard_train_state(mesh: Mesh, ts: TrainState) -> TrainState:
    """Place a TrainState onto the mesh with the canonical layout."""
    sh = state_shardings(mesh, ts)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        ts,
        sh,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
