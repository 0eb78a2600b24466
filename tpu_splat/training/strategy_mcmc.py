"""MCMC densification strategy ("3D Gaussian Splatting as MCMC"), fixed-capacity TPU version.

Reference: src/training/strategies/mcmc.cpp + gsplat/RelocationCUDA.cu. Behavior preserved:

  * relocate_gs (mcmc.cpp:112-190): dead = opacity <= min_opacity or |q|^2 < 1e-8; each dead
    slot is re-seeded from an alive gaussian sampled with replacement with prob ~ opacity;
    the source and its copies all get the MCMC eq.(9) relocation (new opacity
    1-(1-o)^(1/n), scale series correction); optimizer moments are zeroed at the *sampled*
    indices only (the reference's exact quirk — dead slots keep their stale moments).
  * add_new_gs (mcmc.cpp:192-347): grow 5% (capped at max_cap) by claiming dead-pool slots;
    sampled sources relocated with ratio = count+1; claimed slots start with zero moments.
  * inject_noise (mcmc.cpp:349-367, RelocationCUDA.cu:113-146): every step,
    means += lr_means * 5e5 * sigmoid_gate(opacity) * (R S^2 R^T @ eps).
  * is_refining (mcmc.cpp:501-505): strict (start, stop) window, every refine_every.

TPU-native difference: the reference reallocates tensors and performs optimizer-state surgery
on every topology change; here capacity is static and relocation/growth are pure masked
scatters — no recompilation, shardable with the rest of the step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.splat import PARAM_FIELDS, SplatState
from ..ops.quat import quat_to_rotmat
from .optim import AdamState, zero_moments_at

N_MAX = 51  # binomial table size (mcmc.cpp:459-472)
NOISE_LR = 5e5  # mcmc.hpp noise lr multiplier (SURVEY.md §7)


@functools.lru_cache(maxsize=None)
def _relocation_table() -> np.ndarray:
    """A[n, k] = sum_{i=k+1..n} C(i-1, k): collapses the reference kernel's double loop
    (RelocationCUDA.cu:32-39) into one dot product over k per gaussian."""
    binom = np.zeros((N_MAX, N_MAX), np.float32)
    for i in range(N_MAX):
        b = 1.0
        for k in range(i + 1):
            binom[i, k] = b
            b = b * (i - k) / (k + 1)
    a = np.zeros((N_MAX + 1, N_MAX), np.float32)
    for n in range(1, N_MAX + 1):
        a[n] = a[n - 1]
        a[n, : n] += binom[n - 1, : n]
    return a


def relocation_new_params(opacity, scale, ratio):
    """MCMC eq.(9): (new_opacity, new_scale) for sources sampled `ratio` times.

    opacity [C] sigmoid, scale [C,3] sigma, ratio [C] int32 in [1, N_MAX].
    """
    table = jnp.asarray(_relocation_table())  # [N_MAX+1, N_MAX]
    ratio = jnp.clip(ratio, 1, N_MAX)
    new_op = 1.0 - jnp.power(1.0 - opacity, 1.0 / ratio.astype(opacity.dtype))

    k = jnp.arange(N_MAX, dtype=opacity.dtype)  # [K]
    sign = jnp.where(k % 2 == 0, 1.0, -1.0) / jnp.sqrt(k + 1.0)
    log_op = jnp.log(jnp.maximum(new_op, 1e-12))[:, None]  # [C,1]
    powers = jnp.exp(log_op * (k + 1.0)[None, :])  # o^(k+1), [C,K]
    denom = jnp.sum(table[ratio] * sign[None, :] * powers, axis=-1)  # [C]
    coeff = opacity / jnp.where(denom != 0, denom, 1.0)
    return new_op, coeff[:, None] * scale


def _sample_sources(key, probs, capacity):
    """One categorical sample per slot, prob ~ probs (multinomial with replacement,
    mcmc.cpp:136-138)."""
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    src = jax.random.categorical(key, logits, shape=(capacity,))
    return jnp.clip(src, 0, probs.shape[0] - 1)  # guard all-(-inf) degenerate case


def _apply_relocation(state: SplatState, src, target_mask, count_weight,
                      min_opacity: float):
    """Shared core of relocate/add: sources sampled `src[i]` for each target slot i in
    `target_mask`; ratio per source = count_weight + #times sampled; relocation applied at
    sources; all params copied source -> target. New opacities are clamped to
    [min_opacity, 1-1e-7] (mcmc.cpp:164,244)."""
    capacity = state.capacity
    counts = jnp.zeros((capacity,), jnp.int32).at[src].add(target_mask.astype(jnp.int32))
    touched = counts > 0
    ratio = counts + count_weight

    opacity = jax.nn.sigmoid(state.opacity_raw[:, 0])
    scale = jnp.exp(state.scaling_raw)
    new_op, new_scale = relocation_new_params(opacity, scale, ratio)
    new_op = jnp.clip(new_op, min_opacity, 1.0 - 1e-7)

    params = state.params()
    new_opacity_raw = jnp.where(
        touched[:, None], jnp.log(new_op / (1.0 - new_op))[:, None], params["opacity_raw"]
    )
    new_scaling_raw = jnp.where(touched[:, None], jnp.log(new_scale), params["scaling_raw"])
    params = dict(params, opacity_raw=new_opacity_raw, scaling_raw=new_scaling_raw)

    # copy updated source params into target slots
    for k in PARAM_FIELDS:
        v = params[k]
        mask = target_mask.reshape((-1,) + (1,) * (v.ndim - 1))
        params[k] = jnp.where(mask, v[src], v)

    return state.replace_params(params), touched


def relocate_gs(
    state: SplatState, adam: AdamState, key, min_opacity: float
) -> tuple[SplatState, AdamState, jax.Array]:
    """Re-seed dead gaussians from alive ones (mcmc.cpp:112-190)."""
    opacity = jax.nn.sigmoid(state.opacity_raw[:, 0])
    qnorm2 = jnp.sum(state.rotation_raw**2, axis=-1)
    dead = state.alive & ((opacity <= min_opacity) | (qnorm2 < 1e-8))
    alive_src = state.alive & ~dead

    probs = jnp.where(alive_src, opacity, 0.0)
    has_sources = jnp.any(probs > 0)
    n_dead = jnp.sum(dead.astype(jnp.int32))
    do = (n_dead > 0) & has_sources
    dead = dead & do

    src = _sample_sources(key, probs, state.capacity)
    new_state, touched = _apply_relocation(state, src, dead, 1, min_opacity)
    adam = zero_moments_at(adam, touched)
    return new_state, adam, n_dead


def add_new_gs(
    state: SplatState, adam: AdamState, key, max_cap: int, min_opacity: float
) -> tuple[SplatState, AdamState, jax.Array]:
    """Grow by 5% up to max_cap by claiming dead-pool slots (mcmc.cpp:192-347)."""
    cap = min(max_cap, state.capacity)
    n = state.n_alive()
    n_target = jnp.minimum(cap, (1.05 * n.astype(jnp.float32)).astype(jnp.int32))
    n_new = jnp.maximum(n_target - n, 0)

    free_rank = jnp.cumsum((~state.alive).astype(jnp.int32))
    claim = (~state.alive) & (free_rank <= n_new)

    opacity = jax.nn.sigmoid(state.opacity_raw[:, 0])
    probs = jnp.where(state.alive, opacity, 0.0)
    src = _sample_sources(key, probs, state.capacity)

    new_state, touched = _apply_relocation(state, src, claim, 1, min_opacity)
    new_state = dataclasses.replace(new_state, alive=state.alive | claim)
    # new slots start with zero optimizer state (mcmc.cpp:305-312); sources keep theirs
    adam = zero_moments_at(adam, claim)
    return new_state, adam, n_new


def inject_noise(state: SplatState, key, current_means_lr) -> SplatState:
    """Covariance-shaped position noise, opacity-gated, every step
    (RelocationCUDA.cu:113-146)."""
    eps = jax.random.normal(key, state.means.shape, state.means.dtype)
    rot = quat_to_rotmat(state.rotation_raw)
    var = jnp.exp(2.0 * state.scaling_raw)
    # cov @ eps as two matvecs R (S^2 (R^T eps)) — avoids materializing the [N,3,3]
    # covariance (measured 10.8 -> 3.2 ms at 1M, tools/profiling/profile_noise_ssim.py)
    transformed = jnp.einsum("nij,nj->ni", rot, var * jnp.einsum("nji,nj->ni", rot, eps))

    opacity = jax.nn.sigmoid(state.opacity_raw[:, 0])
    gate = 1.0 / (1.0 + jnp.exp(100.0 * opacity - 0.5))  # RelocationCUDA.cu:139
    factor = current_means_lr * NOISE_LR * gate * state.alive.astype(opacity.dtype)
    means = state.means + factor[:, None] * transformed
    return dataclasses.replace(state, means=means)


def is_refining(iteration: int, start: int, stop: int, every: int) -> bool:
    """Strict window (mcmc.cpp:501-505)."""
    return iteration < stop and iteration > start and iteration % every == 0


def refine(
    state: SplatState, adam: AdamState, key, min_opacity: float, max_cap: int
) -> tuple[SplatState, AdamState, jax.Array, jax.Array]:
    """relocate + grow, one refinement round (mcmc.cpp post_backward when is_refining)."""
    k1, k2 = jax.random.split(key)
    state, adam, n_relocated = relocate_gs(state, adam, k1, min_opacity)
    state, adam, n_new = add_new_gs(state, adam, k2, max_cap, min_opacity)
    return state, adam, n_relocated, n_new
