"""ADMM opacity sparsification (reference: src/training/components/sparsity_optimizer.{hpp,cpp}).

Post-training phase appended after the base run: for `sparsify_steps` iterations starting at
`start_iteration` (= base `iterations`), an ADMM penalty drives the lowest opacities toward
zero, then exactly `prune_ratio` of the gaussians are removed:

  loss   = 0.5 * rho * || sigmoid(op) - z + u ||^2        (compute_loss, :46-68)
  update every 50 iters:  z = prune_z(sigmoid(op) + u) ; u += sigmoid(op) - z   (:71-105)
  prune_z(v): keep entries strictly above the `prune_ratio` quantile, zero the rest (:151-168)
  final prune at start+sparsify_steps: bottom prune_ratio by opacity (:107-143)

Fixed-capacity adaptation: u/z are [C] with dead slots ignored; quantile thresholds count
only alive slots (the reference arrays are exactly the alive set).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class ADMMState:
    u: jax.Array  # [C] dual variable
    z: jax.Array  # [C] auxiliary sparse variable


def _prune_z(v: jnp.ndarray, alive: jnp.ndarray, prune_ratio: float) -> jnp.ndarray:
    """Zero all entries <= the prune_ratio quantile among alive slots (:151-168)."""
    n_alive = jnp.sum(alive.astype(jnp.int32))
    index = (prune_ratio * n_alive.astype(jnp.float32)).astype(jnp.int32)
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    masked = jnp.where(alive, v, big)  # dead slots sort to the top, never the threshold
    v_sorted = jnp.sort(masked)
    threshold = v_sorted[jnp.maximum(index - 1, 0)]
    keep = (v > threshold) & (index > 0)
    return jnp.where(keep & alive, v, 0.0)


def init_admm(opacity_raw: jnp.ndarray, alive: jnp.ndarray, prune_ratio: float) -> ADMMState:
    """u = 0, z = prune_z(sigmoid(op) + u) (initialize, :18-44)."""
    opa = jax.nn.sigmoid(opacity_raw[:, 0])
    u = jnp.zeros_like(opa)
    z = _prune_z(opa + u, alive, prune_ratio)
    return ADMMState(u=u, z=z)


def sparsity_loss(
    opacity_raw: jnp.ndarray, alive: jnp.ndarray, state: ADMMState, rho: float
) -> jnp.ndarray:
    """0.5 * rho * ||sigmoid(op) - z + u||^2 over alive slots (compute_loss, :46-68)."""
    opa = jax.nn.sigmoid(opacity_raw[:, 0])
    diff = (opa - jax.lax.stop_gradient(state.z) + jax.lax.stop_gradient(state.u)) * alive.astype(
        opa.dtype
    )
    return 0.5 * rho * jnp.sum(diff * diff)


def update_admm(
    opacity_raw: jnp.ndarray, alive: jnp.ndarray, state: ADMMState, prune_ratio: float
) -> ADMMState:
    """z = prune_z(opa + u); u += opa - z (update_state, :71-105)."""
    opa = jax.nn.sigmoid(opacity_raw[:, 0])
    z = _prune_z(opa + state.u, alive, prune_ratio)
    u = state.u + opa - z
    return ADMMState(u=u, z=z)


def prune_mask(opacity_raw: jnp.ndarray, alive: jnp.ndarray, prune_ratio: float) -> jax.Array:
    """Bottom prune_ratio of alive slots by opacity (get_prune_mask, :107-143)."""
    opa = jax.nn.sigmoid(opacity_raw[:, 0])
    n_alive = jnp.sum(alive.astype(jnp.int32))
    n_prune = (prune_ratio * n_alive.astype(jnp.float32)).astype(jnp.int32)
    big = jnp.asarray(jnp.finfo(opa.dtype).max, opa.dtype)
    masked = jnp.where(alive, opa, big)
    order = jnp.argsort(masked)  # ascending: lowest alive opacities first
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0], dtype=order.dtype))
    return alive & (ranks < n_prune)


# Schedule predicates (sparsity_optimizer.hpp:101-118)
def should_update(iteration: int, start: int, sparsify_steps: int, update_every: int = 50) -> bool:
    rel = iteration - start
    return iteration >= start and 0 < rel < sparsify_steps and rel % update_every == 0


def should_apply_loss(iteration: int, start: int, sparsify_steps: int) -> bool:
    return start <= iteration < start + sparsify_steps


def should_prune(iteration: int, start: int, sparsify_steps: int) -> bool:
    return iteration == start + sparsify_steps
