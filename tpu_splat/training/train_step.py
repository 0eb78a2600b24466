"""The jitted train step: render -> loss -> backward -> fused Adam -> MCMC noise.

Mirrors Trainer::train_step fast path (src/training/trainer.cpp:579-858) as ONE pure function
under jit; refinement (relocate/grow) is a separate jitted function the host dispatches on the
refine schedule (every refine_every iters), keeping the hot step free of cond branches.

The whole step is static-shape: capacity-C parameter arrays, instance budget / per-tile
capacity from a host-managed `RasterPlan` (pow2 buckets; the step reports actual counts so
the host can grow the plan and redo an overflowing step — the reference pays two D2H syncs
per step for the same information, SURVEY.md §8.13).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.splat import SplatState
from ..ops.rasterize import rasterize
from . import strategy_mcmc
from .losses import photometric_loss, regularization_losses
from .optim import AdamState, adam_step, group_lrs, means_lr_at


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    splat: SplatState
    adam: AdamState
    rng: jax.Array
    iteration: jax.Array  # [] int32, 1-based


class StepStats(NamedTuple):
    loss: jnp.ndarray
    total_instances: jnp.ndarray
    max_tile_count: jnp.ndarray
    n_visible: jnp.ndarray
    screen_grad_norm: jnp.ndarray  # [C] densification info (|dL/dmean2d|)


@dataclass(frozen=True)
class RasterPlan:
    """Host-side static-shape plan for the rasterizer."""

    max_instances: int
    k_max: int
    chunk: int = 64
    tile_size: int = 16


@dataclass(frozen=True)
class StepConfig:
    """Hashable static slice of OptimizationParameters consumed by the jitted step."""

    lambda_dssim: float = 0.2
    scale_reg: float = 0.01
    opacity_reg: float = 0.01
    sh_degree_interval: int = 1000
    strategy: str = "mcmc"
    means_lr: float = 0.00016
    shs_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001

    @classmethod
    def from_params(cls, p) -> "StepConfig":
        return cls(
            lambda_dssim=p.lambda_dssim,
            scale_reg=p.scale_reg,
            opacity_reg=p.opacity_reg,
            sh_degree_interval=p.sh_degree_interval,
            strategy=p.strategy,
            means_lr=p.means_lr,
            shs_lr=p.shs_lr,
            opacity_lr=p.opacity_lr,
            scaling_lr=p.scaling_lr,
            rotation_lr=p.rotation_lr,
        )


def active_sh_degree(iteration, interval: int, max_degree: int):
    """SH degree schedule: +1 every `sh_degree_interval` iters (mcmc.cpp:370-373)."""
    return jnp.minimum(iteration // interval, max_degree)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "plan", "opt", "total_iterations"),
)
def train_step(
    ts: TrainState,
    gt_image: jnp.ndarray,  # [3, H, W]
    w2c: jnp.ndarray,
    cam_position: jnp.ndarray,
    fx, fy, cx, cy,
    bg_color: jnp.ndarray,  # [3]
    *,
    width: int,
    height: int,
    plan: RasterPlan,
    opt: Any,  # OptimizationParameters (hashable static)
    total_iterations: int,
) -> tuple[TrainState, StepStats]:
    splat = ts.splat
    it = ts.iteration
    sh_deg = active_sh_degree(it, opt.sh_degree_interval, splat.max_sh_degree)

    def loss_fn(params, mean2d_offset):
        out = rasterize(
            params["means"], params["scaling_raw"], params["rotation_raw"],
            params["opacity_raw"], params["sh0"], params["shN"], splat.alive,
            w2c, cam_position, fx, fy, cx, cy,
            sh_deg, bg_color,
            width=width, height=height,
            max_instances=plan.max_instances, k_max=plan.k_max, chunk=plan.chunk,
            tile_size=plan.tile_size,
            mean2d_offset=mean2d_offset,
        )
        loss = photometric_loss(out.image, gt_image, opt.lambda_dssim)
        loss = loss + regularization_losses(params, splat.alive, opt.scale_reg, opt.opacity_reg)
        return loss, out.aux

    params = splat.params()
    zeros2d = jnp.zeros((splat.capacity, 2), splat.means.dtype)
    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        params, zeros2d
    )
    param_grads, mean2d_grads = grads
    screen_grad_norm = jnp.linalg.norm(mean2d_grads, axis=-1)

    lrs = dict(group_lrs(opt, splat.scene_scale))
    # ExponentialLR stepped once per iteration; iteration is 1-based so step i uses gamma^(i-1)
    lrs["means"] = means_lr_at(lrs["means"], (it - 1).astype(jnp.float32), total_iterations)

    new_params, new_adam = adam_step(params, param_grads, ts.adam, lrs, it)
    new_splat = splat.replace_params(new_params)

    # MCMC noise injection every step, scaled by current means lr (mcmc.cpp:349-367)
    rng, noise_key = jax.random.split(ts.rng)
    if opt.strategy == "mcmc":
        new_splat = strategy_mcmc.inject_noise(new_splat, noise_key, lrs["means"])

    new_ts = TrainState(splat=new_splat, adam=new_adam, rng=rng, iteration=it + 1)
    stats = StepStats(
        loss=loss,
        total_instances=aux.total_instances,
        max_tile_count=aux.max_tile_count,
        n_visible=aux.n_visible,
        screen_grad_norm=screen_grad_norm,
    )
    return new_ts, stats


@functools.partial(jax.jit, static_argnames=("min_opacity", "max_cap"))
def refine_step(ts: TrainState, *, min_opacity: float, max_cap: int) -> tuple[TrainState, dict]:
    """MCMC relocate + grow (host-dispatched on the refine schedule)."""
    rng, key = jax.random.split(ts.rng)
    splat, adam, n_relocated, n_new = strategy_mcmc.refine(
        ts.splat, ts.adam, key, min_opacity, max_cap
    )
    new_ts = dataclasses.replace(ts, splat=splat, adam=adam, rng=rng)
    return new_ts, {"n_relocated": n_relocated, "n_new": n_new, "n_alive": splat.n_alive()}
