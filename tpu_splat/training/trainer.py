"""Trainer orchestration: dataset split, train loop, plan adaptation, eval/save hooks.

Mirrors src/training/trainer.cpp + training_setup.cpp:14-129 — but functional: TrainState is
a pytree; the host loop only moves scalars. Instance-budget management replaces the
reference's per-step D2H count syncs (forward.cu:99-101,175): the step reports counters,
the host checks them with a small lag (keeping the dispatch pipeline deep) and ROLLS BACK +
re-runs any step whose conservative budget overflowed (states are immutable, so rollback is
free — an upgrade over the reference, which cannot replay a step).

Schedule hooks (all host-dispatched between steps, against the reference's post_backward):
  * MCMC: refine (relocate+grow) on the strict (start, stop) window (mcmc.cpp:501-505).
  * ADC: grow/prune on is_refining (default_strategy.cpp:31-35) + reset_opacity every
    reset_every iters, both only while iter < stop_refine (:292-309).
  * ADMM sparsity: init at `iterations`, dual update every 50, final prune at
    iterations + sparsify_steps (sparsity_optimizer.hpp:101-118, trainer.cpp:622-646).
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainingParameters
from ..core.splat import SplatState, init_from_pointcloud, init_random
from ..io.loader import LoadResult, load
from ..io.ply import save_splat_ply
from ..ops.rasterize import rasterize
from ..utils import events as ev
from ..utils.log import get_logger
from . import sparsity as sp
from . import strategy_default, strategy_mcmc
from .dataset import CameraDataset, InfiniteDataLoader, split_cameras
from .metrics import MetricsEvaluator
from .train_step import (
    RasterPlan,
    StepConfig,
    StepStats,
    TrainState,
    adc_refine_step,
    adc_reset_opacity_step,
    admm_init_step,
    admm_update_step,
    init_train_state,
    refine_step,
    sparsity_prune_step,
    train_step,
    train_step_many,
)

log = get_logger(__name__)


def dataclasses_replace_gut(step_cfg):
    import dataclasses as dc

    return dc.replace(step_cfg, gut=True)


def _next_pow2(x: int) -> int:
    return 1 << max(int(math.ceil(math.log2(max(x, 1)))), 0)


def _next_bucket(x: int) -> int:
    """Quarter-pow2 buckets (1, 1.25, 1.5, 1.75 x 2^k), 128-aligned: the instance
    pipeline's cost scales with the BUDGET, so pow2 rounding wastes up to 2x."""
    x = max(x, 1)
    p2 = 1 << max(int(math.floor(math.log2(x))), 0)
    for frac in (1.0, 1.25, 1.5, 1.75, 2.0):
        cand = int(p2 * frac)
        if cand >= x:
            return ((cand + 127) // 128) * 128
    return 2 * p2


def _sine_background(step: int, jitter: np.random.Generator) -> np.ndarray:
    """sine_background_for_step (trainer.cpp:497-537): phase-shifted RGB + jitter."""
    two_pi = 2.0 * math.pi
    periods = (37, 41, 43)
    phases = [two_pi * ((step % p) / p) for p in periods]
    rgb = np.array(
        [
            0.5 * (1.0 + math.sin(phases[0])),
            0.5 * (1.0 + math.sin(phases[1] + two_pi / 3.0)),
            0.5 * (1.0 + math.sin(phases[2] + 2.0 * two_pi / 3.0)),
        ],
        np.float32,
    )
    rgb = rgb + (jitter.random(3).astype(np.float32) - 0.5) * 0.06
    return np.clip(rgb, 1e-4, 1.0 - 1e-4)


def _inv_weight_piecewise(step: int, max_steps: int) -> float:
    """Background-mix weight schedule (trainer.cpp:474-496)."""
    phase = max(0.0, min(1.0, step / max(1, max_steps)))
    if phase < 0.25:
        return 1.0
    if phase < 0.5:
        return 1.0 + (0.5 - 1.0) * (phase - 0.25) / 0.25
    return max(0.0, 0.5 + (0.0 - 0.5) * (phase - 0.5) / 0.25)


@dataclass
class PendingStep:
    iteration: int
    prev_state: TrainState
    stats: object  # StepStats (device arrays, fetched lazily)
    plan: RasterPlan


class Trainer:
    def __init__(self, params: TrainingParameters, load_result: Optional[LoadResult] = None):
        self.params = params
        opt = params.optimization.apply_steps_scaler()
        self.opt = opt
        self.step_cfg = StepConfig.from_params(opt)

        if load_result is None:
            ev.emit(ev.DatasetLoadStarted(path=params.dataset.data_path))
            load_result = load(params.dataset.data_path, params.dataset.images, opt.rc)
            if load_result.scene is not None:
                ev.emit(ev.DatasetLoadCompleted(
                    path=params.dataset.data_path,
                    n_cameras=len(load_result.scene.cameras),
                ))
                ev.emit(ev.SceneLoaded(
                    path=params.dataset.data_path,
                    n_cameras=len(load_result.scene.cameras),
                    n_points=int(load_result.scene.points.shape[0]),
                ))
        if load_result.scene is None:
            raise ValueError("Training requires a camera dataset (COLMAP/Blender), got a model file")
        scene = load_result.scene

        split = "train" if opt.enable_eval else "all"
        self.train_cams = split_cameras(scene.cameras, params.dataset.test_every, split)
        self.val_cams = (
            split_cameras(scene.cameras, params.dataset.test_every, "val")
            if opt.enable_eval
            else []
        )
        self.train_dataset = CameraDataset(
            self.train_cams, params.dataset.resize_factor, params.dataset.max_width
        )
        self.val_dataset = CameraDataset(
            self.val_cams, params.dataset.resize_factor, params.dataset.max_width
        )

        # model init (training_setup.cpp:50-117): SfM points, --init-ply, or random
        capacity = _next_pow2(max(opt.max_cap, 1))
        if params.init_ply:
            from ..io.ply import load_splat_ply

            raw = load_splat_ply(params.init_ply)
            n = raw["means"].shape[0]
            capacity = max(capacity, _next_pow2(n))
            splat = self._state_from_raw(raw, scene.scene_center, capacity, opt.sh_degree)
        elif opt.random or scene.points.shape[0] == 0:
            rng = np.random.default_rng(42)
            splat = init_random(
                rng, opt.init_num_pts, opt.init_extent, capacity,
                scene.scene_center, opt.sh_degree, opt.init_opacity, opt.init_scaling,
            )
        else:
            capacity = max(capacity, _next_pow2(scene.points.shape[0]))
            splat = init_from_pointcloud(
                scene.points, scene.colors, scene.scene_center, capacity,
                opt.sh_degree, opt.init_opacity, opt.init_scaling,
            )

        # distorted / fisheye cameras require the GUT path (trainer.cpp:586-597)
        needs_gut = any(c.requires_gut() for c in self.train_cams)
        if needs_gut and not opt.gut:
            raise ValueError(
                "dataset has distorted/fisheye cameras: pass --gut (trainer.cpp:586-597)"
            )
        if opt.gut:
            # distortion coefficients are per-sample traced arrays (dist); only the
            # camera MODEL/shutter select a compile variant — heterogeneous rigs render
            # each view with its own coefficients (include/core/camera.hpp:16-125)
            self.step_cfg = dataclasses_replace_gut(self.step_cfg)
            self._gut_cfg_cache: dict[int, tuple] = {}
            if opt.pose_optimization != "none":
                raise ValueError("pose optimization is incompatible with --gut (trainer.cpp:371)")

        self.state = init_train_state(
            splat, seed=0, n_train_images=len(self.train_cams), opt=opt
        )
        n0 = int(splat.n_alive())
        self.plan = RasterPlan(
            max_instances=max(_next_bucket(n0 * 8), 1 << 16),
            k_max=1 << 12,
            chunk=256 if opt.tile_size >= 32 else 128,
            tile_size=opt.tile_size,
            # bf16 hi/lo feature pack by default: -3.4 ms/step at garden scale, and
            # the 24 dB CPU quality floor + raytraced e2e floor run WITH it (mean2d/
            # conic reconstruct ~f32; opacity/color/depth round <=0.4%)
            pack_bf16=True,
        )

        # multi-chip training (cameras over "data", gaussians + tile rows over "gauss";
        # NEW vs the single-GPU reference, trainer.cpp:253)
        self.mesh = None
        self._batched_step = None
        self.batch_size = max(1, opt.batch_size)
        if self.batch_size > 1 or opt.mesh_gauss > 1 or opt.mesh_data > 1:
            from ..parallel.mesh import make_mesh, shard_train_state
            from ..parallel.step import make_batched_train_step

            n_dev = len(jax.devices())
            data_ax = opt.mesh_data or min(self.batch_size, n_dev)
            while n_dev % data_ax:
                data_ax -= 1
            if opt.mesh_gauss and data_ax * opt.mesh_gauss <= n_dev:
                n_dev = data_ax * opt.mesh_gauss
            if self.batch_size % data_ax:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by mesh data={data_ax}"
                )
            if opt.gut:
                # batched GUT: one static (model, shutter) variant for the whole batch;
                # per-camera coefficients stay traced [B, 12] arrays
                from ..ops.cameras import CameraParams

                variants = {
                    (CameraParams.from_camera(c).model, CameraParams.from_camera(c).shutter)
                    for c in self.train_cams
                }
                if len(variants) != 1:
                    raise ValueError(
                        f"batched GUT requires a uniform camera model; got {variants}"
                    )
                (model, shutter), = variants
                if shutter != "global" or model == "ortho":
                    raise ValueError(
                        "batched GUT supports global-shutter non-ortho models; use "
                        "--batch-size 1 for rolling shutter / ORTHO"
                    )
            self.mesh = make_mesh(jax.devices()[:n_dev], data=data_ax)
            self.state = shard_train_state(self.mesh, self.state)
            self._batched_step = make_batched_train_step(self.mesh)
            g_ax = self.mesh.shape["gauss"]
            shard_cap = max(1, splat.capacity // g_ax)
            self.plan = dataclasses.replace(
                self.plan,
                gather_budget=min(_next_bucket(max(n0 // g_ax, 1) * 2), shard_cap),
            )
            log.info("multi-chip mesh: %s (batch %d, gather_budget %d)",
                     dict(self.mesh.shape), self.batch_size, self.plan.gather_budget)
        self.evaluator = MetricsEvaluator(params.dataset.output_path or ".")
        self._bg_rng = np.random.default_rng(1234)
        self._loss_hist: list[float] = []
        self.checkpoint_every: int = 0  # 0 = off; full-state checkpoints (checkpoint.py)
        self.project = None  # optional core.project.Project for artifact bookkeeping
        # control flags (reference: pause/save/stop atomics, trainer.cpp:427-472),
        # driven by cmd::* events so a front-end thread can steer training
        import threading

        self._stop_flag = threading.Event()
        self._pause_flag = threading.Event()
        self._save_flag = threading.Event()
        ev.when(ev.StopTraining, lambda e: self._stop_flag.set())
        ev.when(ev.PauseTraining, lambda e: self._pause_flag.set())
        ev.when(ev.ResumeTraining, lambda e: self._pause_flag.clear())
        ev.when(ev.SaveCheckpoint, lambda e: self._save_flag.set())
        log.info(
            "Trainer ready: %d train / %d val cameras, %d gaussians, capacity %d, scene_scale %.3f",
            len(self.train_cams), len(self.val_cams), n0, splat.capacity, splat.scene_scale,
        )
        ev.emit(ev.TrainerReady(
            n_train_cameras=len(self.train_cams), n_val_cameras=len(self.val_cams),
            n_gaussians=n0,
        ))

    @staticmethod
    def _state_from_raw(raw: dict, scene_center, capacity: int, sh_degree: int) -> SplatState:
        import dataclasses as dc

        n = raw["means"].shape[0]
        state = init_from_pointcloud(
            raw["means"], np.zeros((n, 3), np.float32), scene_center, capacity, sh_degree
        )
        pads = {}
        for k, v in raw.items():
            cur = np.asarray(getattr(state, k))
            cur[:n] = v
            pads[k] = jnp.asarray(cur)
        return dc.replace(state, **pads)

    # ------------------------------------------------------------------ train

    @property
    def total_iterations(self) -> int:
        """Base run + appended sparsify phase (trainer.cpp:332-361)."""
        extra = self.opt.sparsify_steps if self.opt.enable_sparsity else 0
        return self.opt.iterations + extra

    def background_for_step(self, iteration: int) -> np.ndarray:
        bg = np.zeros(3, np.float32)  # base background is black (trainer.cpp:363)
        if not self.opt.bg_modulation:
            return bg
        w = _inv_weight_piecewise(iteration, self.opt.iterations)
        if w <= 0:
            return bg
        return (1.0 - w) * bg + w * _sine_background(iteration, self._bg_rng)

    def _gut_cfg_for(self, cam):
        """Per-camera (StepConfig variant, traced coeff vector) for the GUT path."""
        # stable identity, not id(): a freed-and-reallocated camera object could reuse
        # an id and silently pick up another camera's distortion coefficients
        key = (cam.uid, cam.image_name)
        hit = self._gut_cfg_cache.get(key)
        if hit is not None:
            return hit
        import dataclasses as dc

        from ..ops.cameras import CameraParams

        full = CameraParams.from_camera(cam)
        static = CameraParams(model=full.model, shutter=full.shutter)
        cfg = dc.replace(self.step_cfg, cam_params=static, max_angle=None)
        out = (cfg, jnp.asarray(full.coeff_vector()))
        self._gut_cfg_cache[key] = out
        return out

    def _dispatch_step(self, sample, iteration: int) -> PendingStep:
        prev = self.state
        cam = sample.camera
        cfg, dist = (
            self._gut_cfg_for(cam) if self.step_cfg.gut else (self.step_cfg, None)
        )
        self.state, stats = train_step(
            self.state,
            jnp.asarray(sample.image),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.cam_position),
            sample.fx, sample.fy, sample.cx, sample.cy,
            jnp.asarray(self.background_for_step(iteration)),
            jnp.int32(sample.index),
            dist,
            width=cam.image_width, height=cam.image_height,
            plan=self.plan, opt=cfg,
            total_iterations=self.opt.iterations,
        )
        return PendingStep(iteration=iteration, prev_state=prev, stats=stats, plan=self.plan)

    def _dispatch_batched(self, samples, iteration: int) -> PendingStep:
        """One optimizer step over `batch_size` cameras on the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        prev = self.state
        cams = [s.camera for s in samples]
        w, h = cams[0].image_width, cams[0].image_height
        if any(c.image_width != w or c.image_height != h for c in cams):
            raise ValueError("batched training requires uniform image sizes")
        dsh4 = NamedSharding(self.mesh, P("data", None, None, None))
        dsh = NamedSharding(self.mesh, P("data"))
        gts = jax.device_put(
            jnp.stack([jnp.asarray(s.image) for s in samples]), dsh4
        )
        w2cs = jax.device_put(
            jnp.stack([jnp.asarray(c.world_view_transform) for c in cams]), dsh
        )
        cpos = jax.device_put(
            jnp.stack([jnp.asarray(c.cam_position) for c in cams]), dsh
        )
        intr = jax.device_put(
            jnp.asarray([[s.fx, s.fy, s.cx, s.cy] for s in samples], jnp.float32), dsh
        )
        cam_idxs = jax.device_put(
            jnp.asarray([s.index for s in samples], jnp.int32), dsh
        )
        cfg, dist = self.step_cfg, None
        if self.step_cfg.gut:
            pairs = [self._gut_cfg_for(c) for c in cams]
            cfg = pairs[0][0]  # uniform (model, shutter) enforced at init
            dist = jax.device_put(jnp.stack([p[1] for p in pairs]), dsh)
        self.state, stats = self._batched_step(
            self.state, gts, w2cs, cpos, intr,
            jnp.asarray(self.background_for_step(iteration)),
            cam_idxs, dist,
            width=w, height=h, plan=self.plan, opt=cfg,
            total_iterations=self.opt.iterations,
        )
        return PendingStep(iteration=iteration, prev_state=prev, stats=stats, plan=self.plan)

    def _scan_chunk(self, it: int, total: int, progress_every: int) -> int:
        """Steps foldable into one launch from `it`: stop at the FIRST iteration that
        any host hook fires on (that iteration becomes the chunk's last step, so the
        existing hook code runs at the right boundary)."""
        k_max = min(int(getattr(self.opt, "scan_steps", 1) or 1), total - it + 1)
        if k_max <= 1:
            return 1
        opt = self.opt
        for j in range(it, it + k_max):
            if (
                self._needs_topology_hook(j)
                or j % progress_every == 0
                or self._timelapse_due(j)
                or (opt.enable_eval and j in opt.eval_steps)
                or j in opt.save_steps
                or (self.checkpoint_every and j % self.checkpoint_every == 0)
                or j == total
            ):
                return j - it + 1
        return k_max

    def _dispatch_scan(self, samples, iteration: int) -> Optional[PendingStep]:
        """K steps in ONE launch (train_step_many). Returns None when the samples are
        heterogeneous (mixed image sizes, or mixed GUT camera configs) — the caller
        falls back to per-step dispatch."""
        cams = [s.camera for s in samples]
        w, h = cams[0].image_width, cams[0].image_height
        if any(c.image_width != w or c.image_height != h for c in cams):
            return None
        if self.step_cfg.gut:
            pairs = [self._gut_cfg_for(c) for c in cams]
            cfg = pairs[0][0]
            if any(p[0] != cfg for p in pairs[1:]):
                return None
            dists = jnp.stack([p[1] for p in pairs])
        else:
            cfg, dists = self.step_cfg, None
        prev = self.state
        k = len(samples)
        gts = jnp.stack([jnp.asarray(s.image) for s in samples])
        w2cs = jnp.stack([jnp.asarray(c.world_view_transform) for c in cams])
        cpos = jnp.stack([jnp.asarray(c.cam_position) for c in cams])
        intr = jnp.asarray(
            [[s.fx, s.fy, s.cx, s.cy] for s in samples], jnp.float32)
        bgs = jnp.stack([
            jnp.asarray(self.background_for_step(iteration + j)) for j in range(k)])
        cidx = jnp.asarray([s.index for s in samples], jnp.int32)
        self.state, stats = train_step_many(
            self.state, gts, w2cs, cpos, intr, bgs, cidx, dists,
            width=w, height=h, plan=self.plan, opt=cfg,
            total_iterations=self.opt.iterations,
        )
        # budget checks cover the whole chunk (max); loss keeps the full [K] vector so
        # the history records every step (chunking is a launch optimization, not a
        # change to the training record)
        reduced = StepStats(
            loss=stats.loss,
            total_instances=stats.total_instances.max(),
            max_tile_count=stats.max_tile_count.max(),
            n_visible=stats.n_visible.max(),
            n_shard_visible=stats.n_shard_visible.max(),
        )
        return PendingStep(iteration=iteration, prev_state=prev, stats=reduced,
                           plan=self.plan)

    def _check_pending(self, pending: PendingStep) -> bool:
        """Validate a completed step's budget counters; grow plan / request redo."""
        total = int(pending.stats.total_instances)
        max_tile = int(pending.stats.max_tile_count)
        plan = pending.plan
        redo = False
        new_plan = plan
        # dataclasses.replace keeps gather_budget/pack_bf16 across replans (a bare
        # RasterPlan(...) here silently reset both on every budget growth)
        if total > plan.max_instances:
            new_plan = dataclasses.replace(
                new_plan, max_instances=_next_bucket(int(total * 1.3)))
            redo = True
        elif total > 0.85 * plan.max_instances:
            new_plan = dataclasses.replace(
                new_plan, max_instances=_next_bucket(int(plan.max_instances * 1.3)))
        # the blend kernel's per-tile checkpoint caps capacity at 512 chunks
        # (ops/pallas/raster.py); clamp growth there instead of tripping the assert
        k_cap = 512 * plan.chunk
        if max_tile > new_plan.k_max:
            k_want = _next_pow2(int(max_tile * 1.3))
            if k_want > k_cap:
                log.warning(
                    "k_max request %d exceeds kernel capacity %d (tile with %d "
                    "instances); clamping — denser tiles will be truncated",
                    k_want, k_cap, max_tile,
                )
            new_plan = dataclasses.replace(new_plan, k_max=min(k_want, k_cap))
            redo = max_tile <= k_cap  # beyond capacity a redo cannot help
        elif max_tile > 0.85 * new_plan.k_max and new_plan.k_max * 2 <= k_cap:
            new_plan = dataclasses.replace(new_plan, k_max=new_plan.k_max * 2)
        # multi-chip: per-shard visible count vs the pre-all-gather compaction budget
        if plan.gather_budget is not None and self.mesh is not None:
            nsv = int(pending.stats.n_shard_visible)
            shard_cap = max(1, self.state.splat.capacity // self.mesh.shape["gauss"])
            if nsv > plan.gather_budget:
                new_plan = dataclasses.replace(
                    new_plan,
                    gather_budget=min(_next_bucket(int(nsv * 1.3)), shard_cap),
                )
                redo = True
            elif (nsv > 0.85 * plan.gather_budget
                  and new_plan.gather_budget < shard_cap):
                new_plan = dataclasses.replace(
                    new_plan,
                    gather_budget=min(
                        _next_bucket(int(plan.gather_budget * 1.3)), shard_cap
                    ),
                )
        if new_plan != plan:
            log.info(
                "raster plan %s -> %s at iter %d (instances %d, max tile %d)%s",
                (plan.max_instances, plan.k_max), (new_plan.max_instances, new_plan.k_max),
                pending.iteration, total, max_tile, " [REDO]" if redo else "",
            )
            self.plan = new_plan
        return redo

    def _flush_pending(self, pending: list[PendingStep]) -> Optional[int]:
        """Drain all pending checks; on overflow roll back and return the redo iteration."""
        while pending:
            chk = pending.pop(0)
            if self._check_pending(chk):
                self.state = chk.prev_state
                pending.clear()
                return chk.iteration
            self._record_losses(chk)
        return None

    def _record_losses(self, chk: "PendingStep") -> None:
        """Append a checked step's loss(es); scan chunks carry a [K] vector."""
        self._loss_hist.extend(float(v) for v in np.ravel(np.asarray(chk.stats.loss)))

    def _topology_hooks(self, it: int) -> None:
        """Strategy + sparsity schedule (runs with no steps in flight)."""
        opt = self.opt
        if opt.strategy == "mcmc":
            if strategy_mcmc.is_refining(it, opt.start_refine, opt.stop_refine, opt.refine_every):
                self.state, info = refine_step(
                    self.state, min_opacity=opt.min_opacity, max_cap=opt.max_cap
                )
                log.debug("mcmc refine @%d: %s", it, {k: int(v) for k, v in info.items()})
                ev.emit(ev.ModelUpdated(iteration=it, n_alive=int(info["n_alive"])))
        elif opt.strategy == "default":
            if strategy_default.is_refining(
                it, opt.start_refine, opt.stop_refine, opt.refine_every,
                opt.reset_every, opt.pause_refine_after_reset,
            ):
                self.state, info = adc_refine_step(
                    self.state,
                    grad_threshold=opt.grad_threshold, grow_scale3d=opt.grow_scale3d,
                    prune_opacity=opt.prune_opacity, prune_scale3d=opt.prune_scale3d,
                    reset_every=opt.reset_every, revised_opacity=opt.revised_opacity,
                )
                log.debug("adc refine @%d: %s", it, {k: int(v) for k, v in info.items()})
            if it < opt.stop_refine and it % opt.reset_every == 0 and it > 0:
                self.state = adc_reset_opacity_step(self.state, prune_opacity=opt.prune_opacity)
                log.info("opacity reset @%d", it)

        if opt.enable_sparsity:
            start, steps = opt.iterations, opt.sparsify_steps
            if it == start:  # lazy init on phase entry (trainer.cpp:629-634)
                self.state = admm_init_step(self.state, prune_ratio=opt.prune_ratio)
                log.info("ADMM sparsity initialized @%d", it)
            elif sp.should_update(it, start, steps):
                self.state = admm_update_step(self.state, prune_ratio=opt.prune_ratio)
            if sp.should_prune(it, start, steps):
                self.state, n = sparsity_prune_step(self.state, prune_ratio=opt.prune_ratio)
                log.info("sparsity prune @%d: removed %d gaussians", it, int(n))

    def _needs_topology_hook(self, it: int) -> bool:
        opt = self.opt
        if opt.strategy == "mcmc" and strategy_mcmc.is_refining(
            it, opt.start_refine, opt.stop_refine, opt.refine_every
        ):
            return True
        if opt.strategy == "default":
            if strategy_default.is_refining(
                it, opt.start_refine, opt.stop_refine, opt.refine_every,
                opt.reset_every, opt.pause_refine_after_reset,
            ):
                return True
            if it < opt.stop_refine and it % opt.reset_every == 0 and it > 0:
                return True
        if opt.enable_sparsity:
            start, steps = opt.iterations, opt.sparsify_steps
            if it == start or sp.should_update(it, start, steps) or sp.should_prune(it, start, steps):
                return True
        return False

    def train(self, progress_every: int = 100) -> None:
        opt = self.opt
        loader = InfiniteDataLoader(
            self.train_dataset, num_workers=min(opt.num_workers, 8), seed=7
        )
        out_dir = Path(self.params.dataset.output_path or "output")
        out_dir.mkdir(parents=True, exist_ok=True)
        ev.emit(ev.TrainingStarted(total_iterations=self.total_iterations))
        pending: list[PendingStep] = []
        t0 = time.time()
        it = int(self.state.iteration)  # > 1 when resumed from a checkpoint
        total = self.total_iterations
        try:
            while it <= total:
                if self.mesh is not None:
                    samples = [next(loader) for _ in range(self.batch_size)]
                    pending.append(self._dispatch_batched(samples, it))
                else:
                    k = self._scan_chunk(it, total, progress_every)
                    if k > 1:
                        samples = [next(loader) for _ in range(k)]
                        ps = self._dispatch_scan(samples, it)
                        if ps is not None:
                            pending.append(ps)
                            it += k - 1  # hooks below run at the chunk's last step
                        else:  # heterogeneous samples: per-step dispatch
                            for j, s in enumerate(samples[:-1]):
                                pending.append(self._dispatch_step(s, it + j))
                            it += k - 1
                            pending.append(self._dispatch_step(samples[-1], it))
                    else:
                        sample = next(loader)
                        pending.append(self._dispatch_step(sample, it))

                # keep 2 steps in flight; drain opportunistically
                if len(pending) >= 2:
                    chk = pending.pop(0)
                    if self._check_pending(chk):
                        self.state = chk.prev_state
                        it = chk.iteration
                        pending.clear()
                        continue
                    self._record_losses(chk)

                if self._needs_topology_hook(it):
                    redo = self._flush_pending(pending)
                    if redo is not None:
                        it = redo
                        continue
                    self._topology_hooks(it)

                if it % progress_every == 0 and self._loss_hist:
                    rate = it / (time.time() - t0)
                    self._live_rate = rate  # live-viewer status endpoint
                    n_alive = int(self.state.splat.n_alive())
                    log.info(
                        "iter %d/%d loss %.4f alive %d %.2f it/s",
                        it, total, self._loss_hist[-1], n_alive, rate,
                    )
                    ev.emit(ev.TrainingProgress(
                        iteration=it, total_iterations=total,
                        loss=self._loss_hist[-1], n_alive=n_alive, iters_per_s=rate,
                    ))
                if self._timelapse_due(it):
                    redo = self._flush_pending(pending)
                    if redo is not None:
                        it = redo
                        continue
                    self._render_timelapse(it, out_dir)
                if self._stop_flag.is_set():
                    log.info("stop requested at iter %d", it)
                    ev.emit(ev.TrainingStopped(iteration=it))
                    break
                if self._pause_flag.is_set():
                    ev.emit(ev.TrainingPaused(iteration=it))
                    while self._pause_flag.is_set() and not self._stop_flag.is_set():
                        time.sleep(0.1)
                    ev.emit(ev.TrainingResumed(iteration=it))
                if self._save_flag.is_set():
                    self._save_flag.clear()
                    redo = self._flush_pending(pending)
                    if redo is not None:
                        it = redo
                        continue
                    from .checkpoint import save_checkpoint

                    ckpt = out_dir / f"checkpoint_{it}.npz"
                    save_checkpoint(ckpt, self.state)
                    ev.emit(ev.CheckpointSaved(path=str(ckpt), iteration=it))
                if opt.enable_eval and it in opt.eval_steps:
                    redo = self._flush_pending(pending)
                    if redo is not None:
                        it = redo
                        continue
                    self.evaluate(it)
                if it in opt.save_steps and not opt.skip_intermediate_saving and it != total:
                    path = out_dir / f"splat_{it}.ply"
                    self.save_ply(path)
                    if self.project is not None:
                        self.project.add_ply(f"iter_{it}", path, iteration=it)
                if self.checkpoint_every and it % self.checkpoint_every == 0:
                    redo = self._flush_pending(pending)
                    if redo is not None:
                        it = redo
                        continue
                    from .checkpoint import save_checkpoint

                    ckpt = out_dir / f"checkpoint_{it}.npz"
                    save_checkpoint(ckpt, self.state, extra={
                        "plan_max_instances": self.plan.max_instances,
                        "plan_k_max": self.plan.k_max,
                    })
                    if self.project is not None:
                        self.project.add_checkpoint(ckpt)
                    log.info("checkpoint saved: %s", ckpt)
                it += 1

            redo = self._flush_pending(pending)
            self.save_ply(out_dir / "splat_final.ply")
            ev.emit(ev.TrainingFinished(iteration=it - 1))
            if opt.save_sog:
                from ..io.sog import save_sog

                save_sog(out_dir / "splat_final.sog", self._alive_arrays(),
                         kmeans_iterations=opt.sog_iterations)
            if opt.enable_eval:
                self.evaluator.save_report()
        finally:
            loader.close()
            from ..utils.async_io import writer

            writer().flush()  # all queued artifact writes are on disk before we return

    # ------------------------------------------------------------- eval/save

    def render_camera(self, sample) -> jnp.ndarray:
        cam = sample.camera
        splat = self.state.splat
        it = int(self.state.iteration)
        sh_deg = min(it // self.opt.sh_degree_interval, splat.max_sh_degree)
        args = (
            splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
            splat.sh0, splat.shN, splat.alive,
            jnp.asarray(cam.world_view_transform), jnp.asarray(cam.cam_position),
            sample.fx, sample.fy, sample.cx, sample.cy,
            sh_deg, jnp.zeros(3, jnp.float32),
        )
        if self.step_cfg.gut:
            from ..ops.gut import rasterize_gut

            cfg, dist = self._gut_cfg_for(cam)
            out = rasterize_gut(
                *args, width=cam.image_width, height=cam.image_height,
                max_instances=self.plan.max_instances, k_max=self.plan.k_max,
                tile_size=self.plan.tile_size, cam_params=cfg.cam_params,
                max_angle=None, dist=dist,
            )
        else:
            out = rasterize(
                *args, width=cam.image_width, height=cam.image_height,
                max_instances=self.plan.max_instances, k_max=self.plan.k_max,
                chunk=self.plan.chunk, tile_size=self.plan.tile_size,
            )
        return out.image

    def evaluate(self, iteration: int):
        ev.emit(ev.EvaluationStarted(iteration=iteration, num_images=len(self.val_dataset)))
        samples = (self.val_dataset.get(i) for i in range(len(self.val_dataset)))
        result = self.evaluator.evaluate(
            iteration, self.render_camera, samples,
            save_images=self.opt.enable_save_eval_images,
        )
        log.info(
            "eval @%d: PSNR %.3f SSIM %.4f LPIPS %s (%d imgs, %.1fs)",
            iteration, result.psnr, result.ssim,
            f"{result.lpips:.4f}" if result.lpips is not None else "n/a",
            result.num_images, result.elapsed_s,
        )
        ev.emit(ev.EvaluationCompleted(
            iteration=iteration, psnr=result.psnr, ssim=result.ssim,
            lpips=result.lpips, num_images=result.num_images,
        ))
        return result

    # -------------------------------------------------------------- timelapse

    def _timelapse_due(self, it: int) -> bool:
        ds = self.params.dataset
        return bool(ds.timelapse_images) and ds.timelapse_every > 0 and \
            it % ds.timelapse_every == 0

    def _render_timelapse(self, it: int, out_dir: Path) -> None:
        """Render the watched training views (trainer.cpp:812-846)."""
        from ..io.image import save_image

        ds = self.params.dataset
        wanted = set(ds.timelapse_images)
        from ..utils.async_io import writer

        for idx, cam in enumerate(self.train_cams):
            if cam.image_name not in wanted and Path(cam.image_name).stem not in wanted:
                continue
            sample = self.train_dataset.get(idx)
            img = np.clip(np.asarray(self.render_camera(sample)), 0, 1)
            d = out_dir / "timelapse" / Path(cam.image_name).stem
            d.mkdir(parents=True, exist_ok=True)
            writer().submit(save_image, str(d / f"{it:06d}.jpg"), img)

    def _alive_arrays(self) -> dict:
        splat = self.state.splat
        alive = np.asarray(splat.alive)
        return {
            "means": np.asarray(splat.means)[alive],
            "sh0": np.asarray(splat.sh0)[alive],
            "shN": np.asarray(splat.shN)[alive],
            "scaling_raw": np.asarray(splat.scaling_raw)[alive],
            "rotation_raw": np.asarray(splat.rotation_raw)[alive],
            "opacity_raw": np.asarray(splat.opacity_raw)[alive],
        }

    def save_ply(self, path: str | Path) -> None:
        """Device->host gather now; the disk write runs on the artifact writer thread
        (reference: detached save thread, splat_data.cpp:455-477). train() flushes the
        writer before returning."""
        from ..utils.async_io import writer

        a = self._alive_arrays()
        n = a["means"].shape[0]

        def _write():
            save_splat_ply(
                path, a["means"], a["sh0"], a["shN"],
                a["scaling_raw"], a["rotation_raw"], a["opacity_raw"],
            )
            log.info("saved %d gaussians to %s", n, path)

        writer().submit(_write)
