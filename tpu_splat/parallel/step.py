"""Multi-chip batched train step: cameras data-parallel x gaussians model-parallel.

NEW functionality vs the single-GPU reference (SURVEY.md §2.3): a batch of B cameras
renders in parallel through the shard_map'd Pallas rasterizer (raster_mc.py) — cameras
sharded over the mesh "data" axis, gaussians and each image's tile rows over "gauss".
Parameter gradients flow back through the shard_map transpose (psum_scatter over "gauss",
batch-mean over "data") and one fused Adam update applies to the gaussian-sharded
parameters. MCMC noise runs sharded over "gauss"; ADC densification info accumulates
summed over the camera batch.

Build the step with `make_batched_train_step(mesh)` — the mesh is closed over so the
jitted step stays hashable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..training import strategy_default, strategy_mcmc
from ..training.losses import photometric_loss, regularization_losses
from ..training.optim import adam_step, group_lrs, means_lr_at
from ..training.train_step import RasterPlan, StepStats, TrainState, active_sh_degree
from .raster_mc import render_batch_mc


def make_batched_train_step(mesh):
    """Returns a jitted step(ts, gt_images, w2cs, cam_positions, intr, bg_color, *,
    width, height, plan, opt, total_iterations) -> (ts, StepStats) over `mesh`."""

    @functools.partial(
        jax.jit, static_argnames=("width", "height", "plan", "opt", "total_iterations")
    )
    def batched_train_step(
        ts: TrainState,
        gt_images: jnp.ndarray,  # [B, 3, H, W]
        w2cs: jnp.ndarray,  # [B, 4, 4]
        cam_positions: jnp.ndarray,  # [B, 3]
        intr: jnp.ndarray,  # [B, 4] fx fy cx cy
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
        batch = gt_images.shape[0]

        def loss_fn(params, mean2d_offset):
            images, alphas, tots, mxts, nvis = render_batch_mc(
                mesh, params, splat.alive, mean2d_offset,
                w2cs, cam_positions, intr, sh_deg, bg_color,
                width=width, height=height, plan=plan, batch=batch,
            )
            losses = jax.vmap(
                lambda im, gt: photometric_loss(im, gt, opt.lambda_dssim)
            )(images, gt_images)
            loss = jnp.mean(losses)
            loss = loss + regularization_losses(
                params, splat.alive, opt.scale_reg, opt.opacity_reg
            )
            return loss, (tots, mxts, nvis)

        params = splat.params()
        zeros2d = jnp.zeros((splat.capacity, 2), splat.means.dtype)
        (loss, (tots, mxts, nvis)), (param_grads, mean2d_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)

        lrs = dict(group_lrs(opt, splat.scene_scale))
        lrs["means"] = means_lr_at(
            lrs["means"], (it - 1).astype(jnp.float32), total_iterations
        )

        new_params, new_adam = adam_step(params, param_grads, ts.adam, lrs, it)
        new_splat = splat.replace_params(new_params)

        rng, noise_key = jax.random.split(ts.rng)
        if opt.strategy == "mcmc":
            new_splat = strategy_mcmc.inject_noise(new_splat, noise_key, lrs["means"])

        dens_count, dens_grad2d = ts.dens_count, ts.dens_grad2d
        if opt.strategy == "default":
            # per-gaussian visibility proxy: any window contributed a 2d-mean gradient
            visible = jnp.abs(mean2d_grads).sum(axis=-1) > 0
            dens_count, dens_grad2d = strategy_default.accumulate_densification(
                dens_count, dens_grad2d, mean2d_grads, visible, width, height
            )

        new_ts = dataclasses.replace(
            ts, splat=new_splat, adam=new_adam, rng=rng, iteration=it + 1,
            dens_count=dens_count, dens_grad2d=dens_grad2d,
        )
        stats = StepStats(
            loss=loss,
            total_instances=jnp.max(tots),
            max_tile_count=jnp.max(mxts),
            n_visible=jnp.max(nvis),
        )
        return new_ts, stats

    return batched_train_step


# Backwards-compatible alias used by the round-1 dryrun: a default-mesh step builder.
def batched_train_step(*args, **kwargs):  # pragma: no cover - thin shim
    raise TypeError(
        "batched_train_step is now built per-mesh: use make_batched_train_step(mesh)"
    )
