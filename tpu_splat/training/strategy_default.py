"""Default (ADC) densification strategy — original-3DGS adaptive density control.

Reference: src/training/strategies/default_strategy.cpp. Behavior preserved:

  * densification info (default_strategy.cpp:164-166, kernels_backward.cuh:232-236):
    per-primitive count of visible steps and accumulated NDC-scaled screen-grad magnitude
    ||dL/dmean2d * (0.5 W, 0.5 H)||; averaged at refine time; reset after each refine.
  * grow_gs (:164-192): candidates with avg grad > grad_threshold; duplicate if
    max(scale) <= grow_scale3d * scene_scale, else split into 2 children at
    mean + R @ (scale * eps), scale/1.6 (:87-162). Duplicates copy params and get
    zero optimizer moments; BOTH split children get zero moments and the original is
    removed. Optional revised_opacity: 1 - sqrt(1 - opacity) (:124-127).
  * prune_gs (:229-249): opacity < prune_opacity, degenerate quat (|q|^2 < 1e-8), and —
    only after the first opacity reset (iter > reset_every) — max(scale) >
    prune_scale3d * scene_scale.
  * reset_opacity (:251-290): every reset_every iters clamp opacity_raw to
    logit(2 * prune_opacity) and zero the opacity group's optimizer moments.
  * is_refining (:31-35): iter > start_refine, iter % refine_every == 0,
    iter % reset_every >= pause_refine_after_reset; post_backward is a no-op at
    iter >= stop_refine (:292-305).

TPU-native difference: the reference reallocates all tensors (index_select/cat surgery) on
every topology change; here capacity is static — duplicates/split children claim dead-pool
slots by rank, pruning just clears `alive`, and everything is a masked scatter. When the
free pool can't hold every candidate, the highest-gradient candidates win (the reference is
uncapped; a capped variant must choose, and max-gradient matches the growth intent).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.splat import PARAM_FIELDS, SplatState
from ..ops.quat import quat_to_rotmat
from .optim import AdamState, zero_moments_at


def is_refining(
    iteration: int, start: int, stop: int, every: int, reset_every: int, pause_after_reset: int
) -> bool:
    """default_strategy.cpp:31-35 plus the stop_refine gate in post_backward (:292-299)."""
    return (
        iteration < stop
        and iteration > start
        and iteration % every == 0
        and iteration % reset_every >= pause_after_reset
    )


def accumulate_densification(
    count: jax.Array,  # [C] f32
    grad2d: jax.Array,  # [C] f32
    mean2d_grads: jax.Array,  # [C, 2]
    visible: jax.Array,  # [C] bool
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """One step of _densification_info accumulation (kernels_backward.cuh:232-236)."""
    vis = visible.astype(count.dtype)
    scaled = mean2d_grads * jnp.asarray([0.5 * width, 0.5 * height], mean2d_grads.dtype)
    mag = jnp.linalg.norm(scaled, axis=-1)
    return count + vis, grad2d + vis * mag


def _claim_free_slots(alive: jax.Array, want: jax.Array, priority: jax.Array):
    """Assign free slots to `want` candidates, highest `priority` first.

    Returns (src_for_slot [C] int32, claimed [C] bool): for each claimed free slot, the
    candidate index it serves. Unclaimed slots map to themselves.
    """
    capacity = alive.shape[0]
    n_free = jnp.sum(~alive)

    # order candidates by priority (descending); non-candidates sink
    key = jnp.where(want, priority, -jnp.inf)
    cand_order = jnp.argsort(-key)  # [C] candidate indices, best first
    n_want = jnp.sum(want.astype(jnp.int32))
    n_grant = jnp.minimum(n_want, n_free.astype(jnp.int32))

    free_idx = jnp.nonzero(~alive, size=capacity, fill_value=capacity - 1)[0]  # sorted
    ranks = jnp.arange(capacity, dtype=jnp.int32)
    granted = ranks < n_grant  # first n_grant candidates in cand_order get slots

    slot = free_idx[ranks]  # slot for the rank-th granted candidate
    src_for_slot = jnp.arange(capacity, dtype=jnp.int32)
    src_for_slot = src_for_slot.at[slot].set(
        jnp.where(granted, cand_order, slot), mode="drop"
    )
    claimed = jnp.zeros((capacity,), bool).at[slot].set(granted, mode="drop")
    # a slot claimed => it was free; guard against fill_value collisions
    claimed = claimed & ~alive
    return src_for_slot, claimed


def _scatter_from(params: dict, src_for_slot: jax.Array, claimed: jax.Array) -> dict:
    out = {}
    for k in PARAM_FIELDS:
        v = params[k]
        mask = claimed.reshape((-1,) + (1,) * (v.ndim - 1))
        out[k] = jnp.where(mask, v[src_for_slot], v)
    return out


def grow_gs(
    state: SplatState,
    adam: AdamState,
    key: jax.Array,
    avg_grad: jax.Array,  # [C]
    grad_threshold: float,
    grow_scale3d: float,
    revised_opacity: bool,
) -> tuple[SplatState, AdamState, jax.Array, jax.Array]:
    """duplicate + split (default_strategy.cpp:49-191). Returns (state, adam, n_dup, n_split)."""
    capacity = state.capacity
    scaling = jnp.exp(state.scaling_raw)
    max_scale = jnp.max(scaling, axis=-1)

    is_grad_high = state.alive & (avg_grad > grad_threshold)
    is_small = max_scale <= grow_scale3d * state.scene_scale
    is_dup = is_grad_high & is_small
    is_split = is_grad_high & ~is_small

    # ---- duplicates: each claims one free slot, exact param copy, zero moments at the copy
    src_dup, claimed_dup = _claim_free_slots(state.alive, is_dup, avg_grad)
    params = _scatter_from(state.params(), src_dup, claimed_dup)
    alive = state.alive | claimed_dup
    adam = zero_moments_at(adam, claimed_dup)
    n_dup = jnp.sum(claimed_dup.astype(jnp.int32))

    # ---- splits: child B claims a free slot; child A overwrites the original slot.
    # Only splits whose second child got a slot happen at all (capacity-capped).
    src_split, claimed_split = _claim_free_slots(alive, is_split, avg_grad)
    did_split = jnp.zeros((capacity,), bool).at[src_split].set(claimed_split, mode="drop")
    did_split = did_split & is_split

    rot = quat_to_rotmat(params["rotation_raw"])  # [C,3,3]
    eps = jax.random.normal(key, (2, capacity, 3), params["means"].dtype)
    offsets = jnp.einsum("nij,bnj->bni", rot, scaling[None] * eps)  # [2,C,3]

    new_scaling_raw = jnp.log(jnp.maximum(scaling / 1.6, 1e-30))
    if revised_opacity:
        op = jax.nn.sigmoid(params["opacity_raw"])
        new_op = jnp.clip(1.0 - jnp.sqrt(jnp.maximum(1.0 - op, 0.0)), 1e-7, 1.0 - 1e-7)
        new_opacity_raw = jnp.log(new_op / (1.0 - new_op))
    else:
        new_opacity_raw = params["opacity_raw"]

    # child A in place at the original slot
    maskA = did_split
    params_A = dict(params)
    params_A["means"] = jnp.where(maskA[:, None], params["means"] + offsets[0], params["means"])
    params_A["scaling_raw"] = jnp.where(maskA[:, None], new_scaling_raw, params["scaling_raw"])
    params_A["opacity_raw"] = jnp.where(maskA[:, None], new_opacity_raw, params["opacity_raw"])

    # child B at the claimed slot: copy (already-updated-A? no — from ORIGINAL params)
    child_means = params["means"] + offsets[1]
    donor = dict(
        params,
        means=child_means,
        scaling_raw=new_scaling_raw,
        opacity_raw=new_opacity_raw,
    )
    params_B = _scatter_from(donor, src_split, claimed_split)
    final_params = {
        k: jnp.where(
            claimed_split.reshape((-1,) + (1,) * (params_A[k].ndim - 1)),
            params_B[k],
            params_A[k],
        )
        for k in PARAM_FIELDS
    }

    alive = alive | claimed_split
    # both children get zero moments (split output moments are zeros, :137-145)
    adam = zero_moments_at(adam, did_split | claimed_split)
    n_split = jnp.sum(did_split.astype(jnp.int32))

    new_state = dataclasses.replace(state.replace_params(final_params), alive=alive)
    return new_state, adam, n_dup, n_split


def prune_gs(
    state: SplatState,
    iteration,
    prune_opacity: float,
    prune_scale3d: float,
    reset_every: int,
) -> tuple[SplatState, jax.Array]:
    """Clear `alive` on pruned slots (default_strategy.cpp:229-249)."""
    opacity = jax.nn.sigmoid(state.opacity_raw[:, 0])
    qnorm2 = jnp.sum(state.rotation_raw**2, axis=-1)
    is_prune = (opacity < prune_opacity) | (qnorm2 < 1e-8)
    max_scale = jnp.max(jnp.exp(state.scaling_raw), axis=-1)
    too_big = max_scale > prune_scale3d * state.scene_scale
    is_prune = is_prune | (too_big & (iteration > reset_every))
    is_prune = is_prune & state.alive
    n = jnp.sum(is_prune.astype(jnp.int32))
    return dataclasses.replace(state, alive=state.alive & ~is_prune), n


def reset_opacity(
    state: SplatState, adam: AdamState, prune_opacity: float
) -> tuple[SplatState, AdamState]:
    """Clamp opacities to 2*prune_opacity, zero opacity moments (:251-290)."""
    threshold = 2.0 * prune_opacity
    logit_thr = jnp.log(threshold / (1.0 - threshold))
    new_raw = jnp.minimum(state.opacity_raw, logit_thr)
    state = dataclasses.replace(state, opacity_raw=new_raw)
    adam = dataclasses.replace(
        adam,
        exp_avg=dict(adam.exp_avg, opacity_raw=jnp.zeros_like(adam.exp_avg["opacity_raw"])),
        exp_avg_sq=dict(
            adam.exp_avg_sq, opacity_raw=jnp.zeros_like(adam.exp_avg_sq["opacity_raw"])
        ),
    )
    return state, adam


def remove_gaussians(state: SplatState, mask: jax.Array) -> SplatState:
    """IStrategy::remove_gaussians (istrategy.hpp:29): clear alive where mask."""
    return dataclasses.replace(state, alive=state.alive & ~mask)


def refine(
    state: SplatState,
    adam: AdamState,
    key: jax.Array,
    dens_count: jax.Array,  # [C]
    dens_grad2d: jax.Array,  # [C]
    iteration,
    *,
    grad_threshold: float,
    grow_scale3d: float,
    prune_opacity: float,
    prune_scale3d: float,
    reset_every: int,
    revised_opacity: bool,
) -> tuple[SplatState, AdamState, dict]:
    """One grow+prune round (post_backward when is_refining, :301-309)."""
    avg_grad = dens_grad2d / jnp.maximum(dens_count, 1.0)
    state, adam, n_dup, n_split = grow_gs(
        state, adam, key, avg_grad, grad_threshold, grow_scale3d, revised_opacity
    )
    state, n_pruned = prune_gs(state, iteration, prune_opacity, prune_scale3d, reset_every)
    info = {
        "n_dup": n_dup,
        "n_split": n_split,
        "n_pruned": n_pruned,
        "n_alive": state.n_alive(),
    }
    return state, adam, info
