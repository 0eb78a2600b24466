"""The jitted train step: poseopt -> render -> bilateral -> loss -> backward -> fused Adam.

Mirrors Trainer::train_step fast path (src/training/trainer.cpp:579-858) as ONE pure function
under jit (the reference's five separate .backward() calls sum into one loss — SURVEY.md
§8.13); refinement (MCMC relocate/grow, ADC grow/prune/reset) is dispatched by the host on
the refine schedule as separate jitted functions, keeping the hot step free of branches.

The whole step is static-shape: capacity-C parameter arrays, instance budget / per-tile
capacity from a host-managed `RasterPlan` (pow2 buckets; the step reports actual counts so
the host can grow the plan and redo an overflowing step — the reference pays two D2H syncs
per step for the same information, SURVEY.md §8.13).

Optional components (all None/off by default, matching trainer.cpp wiring):
  * pose optimization (components/poseopt.cpp): w2c = poseopt(w2c, cam_idx), separate Adam
    lr 1e-5 (trainer.cpp:384-386).
  * bilateral grid (components/bilateral_grid.cpp): rendered -> slice(grids[img_idx]) before
    the photometric loss; + tv_loss_weight * tv; separate Adam lr 2e-3 eps 1e-15 with
    WarmupExponentialLR (trainer.cpp:66-101).
  * ADMM sparsity loss during the appended sparsify phase (trainer.cpp:622-646).
  * ADC densification-info accumulation (kernels_backward.cuh:232-236).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.splat import SplatState
from ..ops.cameras import CameraParams
from ..ops.gut import rasterize_gut
from ..ops.rasterize import rasterize
from . import bilateral_grid as bg
from . import poseopt as po
from . import sparsity as sp
from . import strategy_default, strategy_mcmc
from .losses import photometric_loss, regularization_losses
from .optim import AdamState, adam_step, group_lrs, init_adam_state, means_lr_at


@jax.tree_util.register_dataclass
@dataclass
class AuxOptState:
    """Plain Adam state for a component param pytree (bilateral grids / pose params)."""

    m: Any
    v: Any
    count: jax.Array  # [] int32

    @classmethod
    def init(cls, params) -> "AuxOptState":
        return cls(
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32),
        )


def aux_adam_step(params, grads, state: AuxOptState, lr, eps: float = 1e-8,
                  b1: float = 0.9, b2: float = 0.999):
    """torch::optim::Adam semantics for component optimizers."""
    c = state.count + 1
    cf = c.astype(jnp.float32)
    bc1 = 1.0 - b1**cf
    bc2 = 1.0 - b2**cf

    def upd(p, g, m, v):
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        return p - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps), m2, v2

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AuxOptState(m=new_m, v=new_v, count=c)


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    splat: SplatState
    adam: AdamState
    rng: jax.Array
    iteration: jax.Array  # [] int32, 1-based
    # ADC densification info (zeros when strategy != default)
    dens_count: jax.Array  # [C] f32
    dens_grad2d: jax.Array  # [C] f32
    # optional components (None = disabled; None is static pytree structure)
    bilateral_grids: Optional[jax.Array] = None  # [n_images, 12, L, H, W]
    bilateral_opt: Optional[AuxOptState] = None
    pose_params: Optional[Any] = None
    pose_opt: Optional[AuxOptState] = None
    admm: Optional[sp.ADMMState] = None


def init_train_state(
    splat: SplatState,
    *,
    seed: int = 0,
    n_train_images: int = 0,
    opt=None,
) -> TrainState:
    """Build a fresh TrainState with components enabled per `opt` (OptimizationParameters)."""
    capacity = splat.capacity
    bilateral_grids = bilateral_opt = pose_params = pose_opt = None
    key = jax.random.key(seed)
    if opt is not None and getattr(opt, "use_bilateral_grid", False):
        bilateral_grids = bg.init_grids(
            n_train_images, opt.bilateral_grid_X, opt.bilateral_grid_Y, opt.bilateral_grid_W
        )
        bilateral_opt = AuxOptState.init(bilateral_grids)
    if opt is not None and getattr(opt, "pose_optimization", "none") != "none":
        key, pkey = jax.random.split(key)
        pose_params = po.init(opt.pose_optimization, pkey, n_train_images)
        pose_opt = AuxOptState.init(pose_params)
    return TrainState(
        splat=splat,
        adam=init_adam_state(splat.params()),
        rng=key,
        iteration=jnp.int32(1),
        dens_count=jnp.zeros((capacity,), jnp.float32),
        dens_grad2d=jnp.zeros((capacity,), jnp.float32),
        bilateral_grids=bilateral_grids,
        bilateral_opt=bilateral_opt,
        pose_params=pose_params,
        pose_opt=pose_opt,
        admm=None,
    )


class StepStats(NamedTuple):
    loss: jnp.ndarray
    total_instances: jnp.ndarray
    max_tile_count: jnp.ndarray
    n_visible: jnp.ndarray
    # multi-chip: max per-shard visible count (pre-all-gather compaction budget check);
    # == n_visible on the single-chip path
    n_shard_visible: jnp.ndarray = None


@dataclass(frozen=True)
class RasterPlan:
    """Host-side static-shape plan for the rasterizer."""

    max_instances: int
    k_max: int
    chunk: int = 64
    tile_size: int = 16
    # multi-chip: per-shard slot budget for the pre-all-gather visible compaction
    # (parallel/raster_mc.py); None = gather the full capacity shard
    gather_budget: Optional[int] = None
    # bf16 hi/lo feature pack on the Pallas fast path (ops/pallas/blend.py B_* layout):
    # halves the pack-gather + kernel DMA traffic at <=0.4% forward rounding on
    # opacity/color/depth (mean2d/conic reconstruct ~f32)
    pack_bf16: bool = False


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
    # components
    use_bilateral_grid: bool = False
    tv_loss_weight: float = 10.0
    bilateral_grid_lr: float = 2e-3
    pose_optimization: str = "none"
    pose_lr: float = 1e-5
    enable_sparsity: bool = False
    init_rho: float = 5e-4
    sparsify_start: int = 30_000  # = base iterations (sparsity_optimizer.hpp:91)
    sparsify_steps: int = 15_000
    # GUT path (--gut): distorted / fisheye cameras (trainer.cpp:586-597)
    gut: bool = False
    cam_params: CameraParams = CameraParams()
    max_angle: Optional[float] = None

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
            use_bilateral_grid=p.use_bilateral_grid,
            tv_loss_weight=p.tv_loss_weight,
            bilateral_grid_lr=p.bilateral_grid_lr,
            pose_optimization=p.pose_optimization,
            enable_sparsity=p.enable_sparsity,
            init_rho=p.init_rho,
            sparsify_start=p.iterations,
            sparsify_steps=p.sparsify_steps,
            gut=p.gut,
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
    cam_idx,  # [] int32 — index into the train split (poseopt embedding / bilateral grid)
    dist=None,  # [12] per-sample distortion coeffs (GUT path; model stays in opt)
    *,
    width: int,
    height: int,
    plan: RasterPlan,
    opt: Any,  # StepConfig (hashable static)
    total_iterations: int,
) -> tuple[TrainState, StepStats]:
    splat = ts.splat
    it = ts.iteration
    sh_deg = active_sh_degree(it, opt.sh_degree_interval, splat.max_sh_degree)

    use_pose = opt.pose_optimization != "none" and ts.pose_params is not None
    use_bilateral = opt.use_bilateral_grid and ts.bilateral_grids is not None
    use_sparsity = opt.enable_sparsity and ts.admm is not None

    def loss_fn(params, mean2d_offset, pose_params, bilateral_grids):
        w2c_eff = (
            po.apply(opt.pose_optimization, pose_params, w2c, cam_idx) if use_pose else w2c
        )
        cam_pos_eff = (
            -w2c_eff[:3, :3].T @ w2c_eff[:3, 3] if use_pose else cam_position
        )
        if opt.gut:
            # pose opt is incompatible with GUT in the reference too (trainer.cpp:371)
            out = rasterize_gut(
                params["means"], params["scaling_raw"], params["rotation_raw"],
                params["opacity_raw"], params["sh0"], params["shN"], splat.alive,
                w2c_eff, cam_pos_eff, fx, fy, cx, cy,
                sh_deg, bg_color,
                width=width, height=height,
                max_instances=plan.max_instances, k_max=plan.k_max,
                tile_size=plan.tile_size, cam_params=opt.cam_params,
                max_angle=opt.max_angle, dist=dist,
            )
        else:
            out = rasterize(
                params["means"], params["scaling_raw"], params["rotation_raw"],
                params["opacity_raw"], params["sh0"], params["shN"], splat.alive,
                w2c_eff, cam_pos_eff, fx, fy, cx, cy,
                sh_deg, bg_color,
                width=width, height=height,
                max_instances=plan.max_instances, k_max=plan.k_max, chunk=plan.chunk,
                tile_size=plan.tile_size, pack_bf16=plan.pack_bf16,
                mean2d_offset=mean2d_offset,
            )
        image = out.image
        if use_bilateral:
            image = bg.slice_grid(bilateral_grids[cam_idx], image)
        loss = photometric_loss(image, gt_image, opt.lambda_dssim)
        loss = loss + regularization_losses(params, splat.alive, opt.scale_reg, opt.opacity_reg)
        if use_bilateral:
            loss = loss + opt.tv_loss_weight * bg.tv_loss(bilateral_grids)
        if use_sparsity:
            sp_active = (it >= opt.sparsify_start) & (
                it < opt.sparsify_start + opt.sparsify_steps
            )
            sloss = sp.sparsity_loss(params["opacity_raw"], splat.alive, ts.admm, opt.init_rho)
            loss = loss + jnp.where(sp_active, sloss, 0.0)
        return loss, out.aux

    params = splat.params()
    zeros2d = jnp.zeros((splat.capacity, 2), splat.means.dtype)
    argnums = (0, 1) + ((2,) if use_pose else ()) + ((3,) if use_bilateral else ())
    (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)(
        params, zeros2d, ts.pose_params, ts.bilateral_grids
    )
    param_grads, mean2d_grads = grads[0], grads[1]
    gi = 2
    pose_grads = grads[gi] if use_pose else None
    gi += 1 if use_pose else 0
    bilateral_grads = grads[gi] if use_bilateral else None

    lrs = dict(group_lrs(opt, splat.scene_scale))
    # ExponentialLR stepped once per iteration; iteration is 1-based so step i uses gamma^(i-1)
    lrs["means"] = means_lr_at(lrs["means"], (it - 1).astype(jnp.float32), total_iterations)

    new_params, new_adam = adam_step(params, param_grads, ts.adam, lrs, it)
    new_splat = splat.replace_params(new_params)

    # MCMC noise injection every step, scaled by current means lr (mcmc.cpp:349-367)
    rng, noise_key = jax.random.split(ts.rng)
    if opt.strategy == "mcmc":
        new_splat = strategy_mcmc.inject_noise(new_splat, noise_key, lrs["means"])

    # ADC densification info accumulation (kernels_backward.cuh:232-236)
    dens_count, dens_grad2d = ts.dens_count, ts.dens_grad2d
    if opt.strategy == "default":
        dens_count, dens_grad2d = strategy_default.accumulate_densification(
            dens_count, dens_grad2d, mean2d_grads, aux.visible, width, height
        )

    # component optimizers
    new_pose_params, new_pose_opt = ts.pose_params, ts.pose_opt
    if use_pose:
        new_pose_params, new_pose_opt = aux_adam_step(
            ts.pose_params, pose_grads, ts.pose_opt, opt.pose_lr
        )
    new_bgrids, new_bopt = ts.bilateral_grids, ts.bilateral_opt
    if use_bilateral:
        gamma = 0.01 ** (1.0 / total_iterations)
        blr = bg.warmup_exponential_lr(opt.bilateral_grid_lr, it, gamma)
        new_bgrids, new_bopt = aux_adam_step(
            ts.bilateral_grids, bilateral_grads, ts.bilateral_opt, blr, eps=1e-15
        )

    new_ts = dataclasses.replace(
        ts,
        splat=new_splat,
        adam=new_adam,
        rng=rng,
        iteration=it + 1,
        dens_count=dens_count,
        dens_grad2d=dens_grad2d,
        bilateral_grids=new_bgrids,
        bilateral_opt=new_bopt,
        pose_params=new_pose_params,
        pose_opt=new_pose_opt,
    )
    stats = StepStats(
        loss=loss,
        total_instances=aux.total_instances,
        max_tile_count=aux.max_tile_count,
        n_visible=aux.n_visible,
        n_shard_visible=aux.n_visible,
    )
    return new_ts, stats


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "plan", "opt", "total_iterations"),
)
def train_step_many(
    ts: TrainState,
    gt_images: jnp.ndarray,  # [K, 3, H, W]
    w2cs: jnp.ndarray,  # [K, 4, 4]
    cam_positions: jnp.ndarray,  # [K, 3]
    intrinsics: jnp.ndarray,  # [K, 4] (fx, fy, cx, cy)
    bg_colors: jnp.ndarray,  # [K, 3]
    cam_idxs: jnp.ndarray,  # [K] int32
    dists=None,  # [K, 12] per-sample distortion coeffs (GUT path) or None
    *,
    width: int,
    height: int,
    plan: RasterPlan,
    opt: Any,
    total_iterations: int,
) -> tuple[TrainState, StepStats]:
    """K train steps in ONE executable launch (lax.scan over stacked camera inputs).

    The per-launch host cost (argument handling + tunnel RPC on this single-core host)
    is a measurable slice of the ~190 ms step; the trainer folds uninterrupted stretches
    between host hooks into one launch. Semantically identical to K sequential
    `train_step` calls (same body, carried TrainState); returned stats are stacked [K]
    so the overflow/rollback protocol checks `max()` over the chunk and redoes from the
    chunk start. (The reference's host loop launches its kernel sequence per iteration,
    trainer.cpp:579-858 — on TPU one fused program is the idiomatic equivalent.)"""

    def body(carry, xs):
        gt, w2c, cpos, intr, bgc, ci, dist = xs
        new_ts, stats = train_step.__wrapped__(
            carry, gt, w2c, cpos, intr[0], intr[1], intr[2], intr[3], bgc, ci, dist,
            width=width, height=height, plan=plan, opt=opt,
            total_iterations=total_iterations,
        )
        return new_ts, stats

    k = gt_images.shape[0]
    if dists is None:
        dists = jnp.zeros((k, 0), jnp.float32)  # scan needs a leaf; body ignores shape-0
        xs = (gt_images, w2cs, cam_positions, intrinsics, bg_colors, cam_idxs, dists)

        def body_nodist(carry, xs):
            gt, w2c, cpos, intr, bgc, ci, _ = xs
            new_ts, stats = train_step.__wrapped__(
                carry, gt, w2c, cpos, intr[0], intr[1], intr[2], intr[3], bgc, ci, None,
                width=width, height=height, plan=plan, opt=opt,
                total_iterations=total_iterations,
            )
            return new_ts, stats

        return jax.lax.scan(body_nodist, ts, xs)
    xs = (gt_images, w2cs, cam_positions, intrinsics, bg_colors, cam_idxs, dists)
    return jax.lax.scan(body, ts, xs)


@functools.partial(jax.jit, static_argnames=("min_opacity", "max_cap"))
def refine_step(ts: TrainState, *, min_opacity: float, max_cap: int) -> tuple[TrainState, dict]:
    """MCMC relocate + grow (host-dispatched on the refine schedule)."""
    rng, key = jax.random.split(ts.rng)
    splat, adam, n_relocated, n_new = strategy_mcmc.refine(
        ts.splat, ts.adam, key, min_opacity, max_cap
    )
    new_ts = dataclasses.replace(ts, splat=splat, adam=adam, rng=rng)
    return new_ts, {"n_relocated": n_relocated, "n_new": n_new, "n_alive": splat.n_alive()}


@functools.partial(
    jax.jit,
    static_argnames=(
        "grad_threshold", "grow_scale3d", "prune_opacity", "prune_scale3d",
        "reset_every", "revised_opacity",
    ),
)
def adc_refine_step(
    ts: TrainState,
    *,
    grad_threshold: float,
    grow_scale3d: float,
    prune_opacity: float,
    prune_scale3d: float,
    reset_every: int,
    revised_opacity: bool,
) -> tuple[TrainState, dict]:
    """ADC grow+prune round; resets densification info (default_strategy.cpp:301-309)."""
    rng, key = jax.random.split(ts.rng)
    splat, adam, info = strategy_default.refine(
        ts.splat, ts.adam, key, ts.dens_count, ts.dens_grad2d, ts.iteration,
        grad_threshold=grad_threshold, grow_scale3d=grow_scale3d,
        prune_opacity=prune_opacity, prune_scale3d=prune_scale3d,
        reset_every=reset_every, revised_opacity=revised_opacity,
    )
    new_ts = dataclasses.replace(
        ts, splat=splat, adam=adam, rng=rng,
        dens_count=jnp.zeros_like(ts.dens_count),
        dens_grad2d=jnp.zeros_like(ts.dens_grad2d),
    )
    return new_ts, info


@functools.partial(jax.jit, static_argnames=("prune_opacity",))
def adc_reset_opacity_step(ts: TrainState, *, prune_opacity: float) -> TrainState:
    splat, adam = strategy_default.reset_opacity(ts.splat, ts.adam, prune_opacity)
    return dataclasses.replace(ts, splat=splat, adam=adam)


@functools.partial(jax.jit, static_argnames=("prune_ratio",))
def admm_init_step(ts: TrainState, *, prune_ratio: float) -> TrainState:
    admm = sp.init_admm(ts.splat.opacity_raw, ts.splat.alive, prune_ratio)
    return dataclasses.replace(ts, admm=admm)


@functools.partial(jax.jit, static_argnames=("prune_ratio",))
def admm_update_step(ts: TrainState, *, prune_ratio: float) -> TrainState:
    admm = sp.update_admm(ts.splat.opacity_raw, ts.splat.alive, ts.admm, prune_ratio)
    return dataclasses.replace(ts, admm=admm)


@functools.partial(jax.jit, static_argnames=("prune_ratio",))
def sparsity_prune_step(ts: TrainState, *, prune_ratio: float) -> tuple[TrainState, jax.Array]:
    mask = sp.prune_mask(ts.splat.opacity_raw, ts.splat.alive, prune_ratio)
    splat = strategy_default.remove_gaussians(ts.splat, mask)
    return dataclasses.replace(ts, splat=splat), jnp.sum(mask.astype(jnp.int32))
