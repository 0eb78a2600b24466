"""SplatAdam — the six-group fused Adam + exponential means-LR schedule.

Reference: `FusedAdam` (src/training/optimizers/fused_adam.{hpp,cpp} + fastgs adam_step_cu):
six param groups {means, sh0, shN, scaling, rotation, opacity} with lrs
{means_lr*scene_scale, shs_lr, shs_lr/20, scaling_lr, rotation_lr, opacity_lr}, betas
(0.9, 0.999), eps 1e-15; shN is not updated for the first 1000 iterations
(fused_adam.cpp:69); an ExponentialLR with gamma = 0.01^(1/iterations) decays ONLY the means
group each step (mcmc.cpp:494-498, scheduler param_group_index 0).

Under jit the moment update + bias-corrected step is one fused elementwise pass — the "fused"
part of the reference kernel is free on XLA. The LR schedule is stateless (closed form
gamma^iter), so checkpoint/resume needs only `step_count`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15
SHN_WARMUP_ITERS = 1000  # fused_adam.cpp:69

PARAM_ORDER = ("means", "sh0", "shN", "scaling_raw", "rotation_raw", "opacity_raw")


@jax.tree_util.register_dataclass
@dataclass
class AdamState:
    exp_avg: dict[str, jax.Array]
    exp_avg_sq: dict[str, jax.Array]
    step_count: dict[str, jax.Array]  # per-group (relocation zeroes moments, not counts)


def init_adam_state(params: dict[str, jax.Array]) -> AdamState:
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(
        exp_avg=zeros,
        exp_avg_sq={k: jnp.zeros_like(v) for k, v in params.items()},
        step_count={k: jnp.zeros((), jnp.int32) for k in params},
    )


def group_lrs(opt_params: Any, scene_scale: float) -> dict[str, float]:
    """Base learning rates per group (mcmc.cpp:487-493)."""
    return {
        "means": opt_params.means_lr * scene_scale,
        "sh0": opt_params.shs_lr,
        "shN": opt_params.shs_lr / 20.0,
        "scaling_raw": opt_params.scaling_lr,
        "rotation_raw": opt_params.rotation_lr,
        "opacity_raw": opt_params.opacity_lr,
    }


def means_lr_at(base_means_lr: float, iteration, total_iterations: int):
    """ExponentialLR, gamma = 0.01^(1/iterations), means group only (mcmc.cpp:494-498).

    The scheduler steps after each optimizer step, so step i uses gamma^i (0-based).
    """
    gamma = 0.01 ** (1.0 / total_iterations)
    return base_means_lr * jnp.power(jnp.float32(gamma), iteration)


def adam_step(
    params: dict[str, jax.Array],
    grads: dict[str, jax.Array],
    state: AdamState,
    lrs: dict[str, jnp.ndarray],
    iteration,
) -> tuple[dict[str, jax.Array], AdamState]:
    """One fused Adam step over all six groups. `iteration` is the 1-based train iter."""
    new_params, new_m, new_v, new_c = {}, {}, {}, {}
    for k in params:
        m = state.exp_avg[k]
        v = state.exp_avg_sq[k]
        c = state.step_count[k] + 1
        g = grads[k]

        m2 = BETA1 * m + (1.0 - BETA1) * g
        v2 = BETA2 * v + (1.0 - BETA2) * g * g
        cf = c.astype(params[k].dtype)
        bc1 = 1.0 - jnp.power(jnp.asarray(BETA1, params[k].dtype), cf)
        bc2 = 1.0 - jnp.power(jnp.asarray(BETA2, params[k].dtype), cf)
        update = lrs[k] * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + EPS)
        p2 = params[k] - update

        if k == "shN":
            # shN frozen for the first 1000 iters; step_count still advances
            # (fused_adam.cpp:66-70: increment precedes the skip).
            skip = iteration <= SHN_WARMUP_ITERS
            p2 = jnp.where(skip, params[k], p2)
            m2 = jnp.where(skip, m, m2)
            v2 = jnp.where(skip, v, v2)

        new_params[k] = p2
        new_m[k] = m2
        new_v[k] = v2
        new_c[k] = c

    return new_params, AdamState(exp_avg=new_m, exp_avg_sq=new_v, step_count=new_c)


def zero_moments_at(state: AdamState, idx_mask: jax.Array) -> AdamState:
    """Zero first/second moments at masked slots (relocation semantics,
    mcmc.cpp:update_optimizer_for_relocate). idx_mask: [C] bool."""

    def z(d):
        out = {}
        for k, v in d.items():
            mask = idx_mask.reshape((-1,) + (1,) * (v.ndim - 1))
            out[k] = jnp.where(mask, 0.0, v)
        return out

    return dataclasses.replace(state, exp_avg=z(state.exp_avg), exp_avg_sq=z(state.exp_avg_sq))
