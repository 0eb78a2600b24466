"""Multi-chip batched train step: cameras data-parallel x gaussians model-parallel.

NEW functionality vs the single-GPU reference (SURVEY.md §2.3): a batch of B cameras renders
in parallel (sharded over the mesh "data" axis); parameter gradients are averaged over the
batch — GSPMD inserts the psum over ICI — and one fused Adam update applies to the
gaussian-sharded parameters. MCMC noise/refinement run sharded over "gauss"; ADC
densification info accumulates summed over the camera batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.rasterize import rasterize
from ..training import strategy_default, strategy_mcmc
from ..training.losses import photometric_loss, regularization_losses
from ..training.optim import adam_step, group_lrs, means_lr_at
from ..training.train_step import RasterPlan, StepStats, TrainState, active_sh_degree


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "plan", "opt", "total_iterations"),
)
def batched_train_step(
    ts: TrainState,
    gt_images: jnp.ndarray,  # [B, 3, H, W]
    w2cs: jnp.ndarray,  # [B, 4, 4]
    cam_positions: jnp.ndarray,  # [B, 3]
    fxs: jnp.ndarray, fys: jnp.ndarray, cxs: jnp.ndarray, cys: jnp.ndarray,  # [B]
    bg_color: jnp.ndarray,  # [3]
    *,
    width: int,
    height: int,
    plan: RasterPlan,
    opt: Any,  # StepConfig
    total_iterations: int,
) -> tuple[TrainState, StepStats]:
    splat = ts.splat
    it = ts.iteration
    sh_deg = active_sh_degree(it, opt.sh_degree_interval, splat.max_sh_degree)

    def one_camera(params, mean2d_offset, gt, w2c, cpos, fx, fy, cx, cy):
        out = rasterize(
            params["means"], params["scaling_raw"], params["rotation_raw"],
            params["opacity_raw"], params["sh0"], params["shN"], splat.alive,
            w2c, cpos, fx, fy, cx, cy, sh_deg, bg_color,
            width=width, height=height,
            max_instances=plan.max_instances, k_max=plan.k_max, chunk=plan.chunk,
            tile_size=plan.tile_size, mean2d_offset=mean2d_offset,
        )
        return photometric_loss(out.image, gt, opt.lambda_dssim), out.aux

    def loss_fn(params, mean2d_offset):
        losses, aux = jax.vmap(
            lambda g, w, c, fx, fy, cx, cy: one_camera(
                params, mean2d_offset, g, w, c, fx, fy, cx, cy
            )
        )(gt_images, w2cs, cam_positions, fxs, fys, cxs, cys)
        loss = jnp.mean(losses)
        loss = loss + regularization_losses(params, splat.alive, opt.scale_reg, opt.opacity_reg)
        return loss, aux

    params = splat.params()
    zeros2d = jnp.zeros((splat.capacity, 2), splat.means.dtype)
    (loss, aux), (param_grads, mean2d_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, zeros2d)

    lrs = dict(group_lrs(opt, splat.scene_scale))
    lrs["means"] = means_lr_at(lrs["means"], (it - 1).astype(jnp.float32), total_iterations)

    new_params, new_adam = adam_step(params, param_grads, ts.adam, lrs, it)
    new_splat = splat.replace_params(new_params)

    rng, noise_key = jax.random.split(ts.rng)
    if opt.strategy == "mcmc":
        new_splat = strategy_mcmc.inject_noise(new_splat, noise_key, lrs["means"])

    dens_count, dens_grad2d = ts.dens_count, ts.dens_grad2d
    if opt.strategy == "default":
        any_visible = jnp.any(aux.visible, axis=0)  # [C] union over the camera batch
        dens_count, dens_grad2d = strategy_default.accumulate_densification(
            dens_count, dens_grad2d, mean2d_grads, any_visible, width, height
        )

    new_ts = dataclasses.replace(
        ts, splat=new_splat, adam=new_adam, rng=rng, iteration=it + 1,
        dens_count=dens_count, dens_grad2d=dens_grad2d,
    )
    stats = StepStats(
        loss=loss,
        total_instances=jnp.max(aux.total_instances),
        max_tile_count=jnp.max(aux.max_tile_count),
        n_visible=jnp.max(aux.n_visible),
    )
    return new_ts, stats
