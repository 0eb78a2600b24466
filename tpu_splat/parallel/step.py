"""Multi-chip batched train step: cameras data-parallel x gaussians model-parallel.

NEW functionality vs the single-GPU reference (SURVEY.md §2.3): a batch of B cameras
renders in parallel through the shard_map'd Pallas rasterizer (raster_mc.py) — cameras
sharded over the mesh "data" axis, gaussians and each image's tile rows over "gauss".
Parameter gradients flow back through the shard_map transpose (psum_scatter over "gauss",
batch-mean over "data") and one fused Adam update applies to the gaussian-sharded
parameters. MCMC noise runs sharded over "gauss"; ADC densification info accumulates
per camera (a [B, C, 2] per-camera mean2d tap, so batched visibility/grad-norm
accumulation matches the single-camera semantics of kernels_backward.cuh:232-236
exactly — the batch-mean 1/B is undone before the norm).

Optional components mirror the single-camera step (train_step.py): pose optimization
(vmapped over the camera batch), bilateral grid appearance correction (per-camera grid
slice + TV loss), and the GUT camera-model branch (per-camera distortion coefficients as
a traced [B, 12] array; model/shutter static).

Build the step with `make_batched_train_step(mesh)` — the mesh is closed over so the
jitted step stays hashable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..training import bilateral_grid as bgrid
from ..training import poseopt as po
from ..training import strategy_default, strategy_mcmc
from ..training.losses import photometric_loss, regularization_losses
from ..training.optim import adam_step, group_lrs, means_lr_at
from ..training.train_step import (
    RasterPlan, StepStats, TrainState, active_sh_degree, aux_adam_step)
from .raster_mc import render_batch_mc


def make_batched_train_step(mesh):
    """Returns a jitted step(ts, gt_images, w2cs, cam_positions, intr, bg_color,
    cam_idxs, dist, *, width, height, plan, opt, total_iterations) -> (ts, StepStats)
    over `mesh`."""

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
        cam_idxs: jnp.ndarray | None = None,  # [B] int32 (poseopt / bilateral)
        dist: jnp.ndarray | None = None,  # [B, 12] distortion coeffs (GUT)
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
        if cam_idxs is None:
            cam_idxs = jnp.zeros((batch,), jnp.int32)

        use_pose = opt.pose_optimization != "none" and ts.pose_params is not None
        use_bilateral = opt.use_bilateral_grid and ts.bilateral_grids is not None

        def loss_fn(params, mean2d_offset, pose_params, bilateral_grids):
            if use_pose:
                w2cs_eff = jax.vmap(
                    lambda w, i: po.apply(opt.pose_optimization, pose_params, w, i)
                )(w2cs, cam_idxs)
                cpos_eff = jax.vmap(lambda w: -w[:3, :3].T @ w[:3, 3])(w2cs_eff)
            else:
                w2cs_eff, cpos_eff = w2cs, cam_positions
            images, alphas, tots, mxts, nvis, nshard, visible = render_batch_mc(
                mesh, params, splat.alive, mean2d_offset,
                w2cs_eff, cpos_eff, intr, sh_deg, bg_color,
                width=width, height=height, plan=plan, batch=batch,
                dist=dist, cam_params=opt.cam_params if opt.gut else None,
                max_angle=opt.max_angle,
            )
            if use_bilateral:
                images = jax.vmap(
                    lambda im, ci: bgrid.slice_grid(bilateral_grids[ci], im)
                )(images, cam_idxs)
            losses = jax.vmap(
                lambda im, gt: photometric_loss(im, gt, opt.lambda_dssim)
            )(images, gt_images)
            loss = jnp.mean(losses)
            loss = loss + regularization_losses(
                params, splat.alive, opt.scale_reg, opt.opacity_reg
            )
            if use_bilateral:
                loss = loss + opt.tv_loss_weight * bgrid.tv_loss(bilateral_grids)
            return loss, (tots, mxts, nvis, nshard, visible)

        params = splat.params()
        # per-camera grad tap: [B, C, 2] (cameras x gaussians) so densification sees
        # each camera's own 2d-mean gradient, like B sequential single-camera steps
        zeros2d = jnp.zeros((batch, splat.capacity, 2), splat.means.dtype)
        argnums = (0, 1) + ((2,) if use_pose else ()) + ((3,) if use_bilateral else ())
        (loss, (tots, mxts, nvis, nshard, visible)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )(params, zeros2d, ts.pose_params, ts.bilateral_grids)
        param_grads, mean2d_grads = grads[0], grads[1]
        gi = 2
        pose_grads = grads[gi] if use_pose else None
        gi += 1 if use_pose else 0
        bilateral_grads = grads[gi] if use_bilateral else None

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
            # accumulate per camera with the batch-mean 1/B undone and the
            # rasterizer's own visibility signal: the loop unrolls over B (static)
            # and each term matches one single-camera step exactly
            per_cam = mean2d_grads * jnp.float32(batch)
            for b in range(batch):
                dens_count, dens_grad2d = strategy_default.accumulate_densification(
                    dens_count, dens_grad2d, per_cam[b], visible[b], width, height
                )

        # component optimizers (mirrors train_step.py; lrs/schedules identical)
        new_pose_params, new_pose_opt = ts.pose_params, ts.pose_opt
        if use_pose:
            new_pose_params, new_pose_opt = aux_adam_step(
                ts.pose_params, pose_grads, ts.pose_opt, opt.pose_lr
            )
        new_bgrids, new_bopt = ts.bilateral_grids, ts.bilateral_opt
        if use_bilateral:
            gamma = 0.01 ** (1.0 / total_iterations)
            blr = bgrid.warmup_exponential_lr(opt.bilateral_grid_lr, it, gamma)
            new_bgrids, new_bopt = aux_adam_step(
                ts.bilateral_grids, bilateral_grads, ts.bilateral_opt, blr, eps=1e-15
            )

        new_ts = dataclasses.replace(
            ts, splat=new_splat, adam=new_adam, rng=rng, iteration=it + 1,
            dens_count=dens_count, dens_grad2d=dens_grad2d,
            bilateral_grids=new_bgrids, bilateral_opt=new_bopt,
            pose_params=new_pose_params, pose_opt=new_pose_opt,
        )
        stats = StepStats(
            loss=loss,
            total_instances=jnp.max(tots),
            max_tile_count=jnp.max(mxts),
            n_visible=jnp.max(nvis),
            n_shard_visible=jnp.max(nshard),
        )
        return new_ts, stats

    return batched_train_step


# Backwards-compatible alias used by the round-1 dryrun: a default-mesh step builder.
def batched_train_step(*args, **kwargs):  # pragma: no cover - thin shim
    raise TypeError(
        "batched_train_step is now built per-mesh: use make_batched_train_step(mesh)"
    )
