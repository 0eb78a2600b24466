"""Tests for ADC strategy, bilateral grid, pose optimization, ADMM sparsity.

Mirrors the reference's strategy/component coverage (tests/test_default_strategy.cpp and
component wiring in trainer.cpp) at the same altitude: small end-to-end loops + unit checks
of the exact formulas.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.training import bilateral_grid as bg
from tpu_splat.training import poseopt as po
from tpu_splat.training import sparsity as sp
from tpu_splat.training import strategy_default as sd
from tpu_splat.training.optim import init_adam_state
from tpu_splat.training.train_step import (
    RasterPlan,
    StepConfig,
    adc_refine_step,
    adc_reset_opacity_step,
    init_train_state,
    train_step,
)

from utils import make_camera


def _splat(n=100, capacity=256, seed=11):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    pts[:, 2] += 5
    return init_from_pointcloud(
        pts, rng.random((n, 3), np.float32), np.array([0, 0, 5.0]), capacity=capacity
    )


# --------------------------------------------------------------------------- ADC strategy


def test_adc_is_refining_schedule():
    # matches default_strategy.cpp:31-35 with the stop gate from post_backward
    assert sd.is_refining(600, 500, 15000, 100, 3000, 0)
    assert not sd.is_refining(500, 500, 15000, 100, 3000, 0)  # strict >
    assert not sd.is_refining(650, 500, 15000, 100, 3000, 0)  # not on refine_every
    assert not sd.is_refining(15000, 500, 15000, 100, 3000, 0)  # stop
    # pause after reset: iter % reset_every < pause blocks refinement
    assert not sd.is_refining(3100, 500, 15000, 100, 3000, 200)
    assert sd.is_refining(3300, 500, 15000, 100, 3000, 200)


def test_adc_duplicate_and_split():
    splat = _splat(n=50, capacity=256)
    adam = init_adam_state(splat.params())
    # force: 10 small high-grad (dup), 5 large high-grad (split)
    avg_grad = jnp.zeros(256).at[:15].set(1.0)
    scaling = np.full((256, 3), np.log(1e-4), np.float32)  # small
    scaling[10:15] = np.log(10.0)  # large -> split
    splat = dataclasses.replace(splat, scaling_raw=jnp.asarray(scaling))

    state2, adam2, n_dup, n_split = sd.grow_gs(
        splat, adam, jax.random.key(0), avg_grad,
        grad_threshold=2e-4, grow_scale3d=0.01, revised_opacity=False,
    )
    assert int(n_dup) == 10
    assert int(n_split) == 5
    assert int(state2.n_alive()) == 50 + 15  # 10 dup copies + 5 second children
    # split children got scale/1.6
    new_scales = np.exp(np.asarray(state2.scaling_raw))
    assert np.allclose(new_scales[10:15], 10.0 / 1.6, rtol=1e-5)


def test_adc_prune_and_reset():
    splat = _splat(n=60, capacity=128)
    op = np.asarray(splat.opacity_raw).copy()
    op[:5] = -10.0  # opacity ~ 0 -> prune
    splat = dataclasses.replace(splat, opacity_raw=jnp.asarray(op))

    state2, n = sd.prune_gs(splat, 100, prune_opacity=0.005, prune_scale3d=0.1,
                            reset_every=3000)
    assert int(n) == 5
    assert int(state2.n_alive()) == 55

    adam = init_adam_state(splat.params())
    state3, adam3 = sd.reset_opacity(splat, adam, prune_opacity=0.005)
    opac = jax.nn.sigmoid(state3.opacity_raw[:, 0])
    assert float(jnp.max(jnp.where(state3.alive, opac, 0))) <= 0.0101


def test_adc_end_to_end_improves():
    from tpu_splat.ops.reference import render_naive

    splat = _splat(n=80, capacity=512, seed=3)
    cam = make_camera(48, 48)
    gt, _ = render_naive(
        splat.means, splat.scaling_raw, splat.rotation_raw,
        jnp.asarray(np.asarray(splat.opacity_raw) + 1.0),
        jnp.asarray(np.asarray(splat.sh0) * 0.5 + 0.3), splat.shN, splat.alive,
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        width=48, height=48, active_sh_degree=3, bg_color=jnp.zeros(3),
    )
    gt = jax.lax.stop_gradient(gt)

    ts = init_train_state(splat, seed=5)
    cfg = StepConfig(strategy="default")
    plan = RasterPlan(max_instances=1 << 13, k_max=256, chunk=32)
    losses = []
    for i in range(1, 41):
        ts, stats = train_step(
            ts, gt, cam["w2c"], cam["cam_position"],
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], jnp.zeros(3), jnp.int32(0),
            width=48, height=48, plan=plan, opt=cfg, total_iterations=100,
        )
        losses.append(float(stats.loss))
        if sd.is_refining(i, 10, 100, 20, 3000, 0):
            ts, info = adc_refine_step(
                ts, grad_threshold=2e-4, grow_scale3d=0.01, prune_opacity=0.005,
                prune_scale3d=0.1, reset_every=3000, revised_opacity=False,
            )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # densification info was accumulated and reset at refine rounds
    assert float(jnp.max(ts.dens_count)) >= 0


# ------------------------------------------------------------------------ bilateral grid


def test_bilateral_identity_init_is_noop():
    grids = bg.init_grids(2)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 24, 32), np.float32))
    out = bg.slice_grid(grids[0], img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_bilateral_tv_loss_zero_for_constant():
    grids = bg.init_grids(1)  # identity everywhere -> zero variation
    assert float(bg.tv_loss(grids)) < 1e-10
    bumped = grids.at[0, 0, 0, 0, 0].add(1.0)
    assert float(bg.tv_loss(bumped)) > 0


def test_bilateral_gradients_flow():
    grids = bg.init_grids(1)
    img = jnp.ones((3, 8, 8)) * 0.5

    def loss(g):
        out = bg.slice_grid(g[0], img)
        return jnp.sum((out - 0.8) ** 2)

    g = jax.grad(loss)(grids)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_warmup_exponential_lr():
    gamma = 0.01 ** (1.0 / 1000)
    # during warmup: linear from 1% to 100%
    lr0 = float(bg.warmup_exponential_lr(1.0, 1, gamma, 1000, 0.01))
    assert abs(lr0 - (0.01 + 0.99 / 1000)) < 1e-6
    lr_mid = float(bg.warmup_exponential_lr(1.0, 500, gamma, 1000, 0.01))
    assert abs(lr_mid - (0.01 + 0.99 * 0.5)) < 1e-6
    # after warmup: exponential decay
    lr_post = float(bg.warmup_exponential_lr(1.0, 1100, gamma, 1000, 0.01))
    assert abs(lr_post - gamma**100) < 1e-5


# ----------------------------------------------------------------------------- pose opt


def test_rotation_6d_identity():
    m = po.rotation_6d_to_matrix(jnp.asarray(po.ROT6D_IDENTITY))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_poseopt_direct_zero_init_is_identity():
    params = po.init_direct(4)
    w2c = jnp.asarray(np.random.default_rng(0).random((4, 4)).astype(np.float32))
    out = po.apply_direct(params, w2c, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(w2c), atol=1e-6)


def test_poseopt_mlp_zero_last_layer_is_identity():
    params = po.init_mlp(jax.random.key(0), 3)
    w2c = jnp.eye(4)
    out = po.apply_mlp(params, w2c, 1)
    np.testing.assert_allclose(np.asarray(out), np.eye(4), atol=1e-6)


def test_poseopt_translation_applies():
    params = po.init_direct(1)
    params = {"embeddings": params["embeddings"].at[0, :3].set(jnp.asarray([1.0, 2.0, 3.0]))}
    w2c = jnp.eye(4)
    out = po.apply_direct(params, w2c, 0)
    np.testing.assert_allclose(np.asarray(out)[:3, 3], [1, 2, 3], atol=1e-6)


# ----------------------------------------------------------------------------- sparsity


def test_admm_lifecycle():
    splat = _splat(n=100, capacity=128)
    # init_from_pointcloud gives constant opacity; randomize for distinct quantiles
    op = np.random.default_rng(1).normal(0, 1, (128, 1)).astype(np.float32)
    splat = dataclasses.replace(splat, opacity_raw=jnp.asarray(op))
    state = sp.init_admm(splat.opacity_raw, splat.alive, prune_ratio=0.6)
    # z zeros exactly ratio of alive slots (the <= threshold ones)
    z_alive = np.asarray(state.z)[np.asarray(splat.alive)]
    assert (z_alive == 0).sum() == 60

    loss = sp.sparsity_loss(splat.opacity_raw, splat.alive, state, rho=5e-4)
    assert float(loss) >= 0

    state2 = sp.update_admm(splat.opacity_raw, splat.alive, state, 0.6)
    assert state2.u.shape == state.u.shape

    mask = sp.prune_mask(splat.opacity_raw, splat.alive, 0.6)
    assert int(jnp.sum(mask)) == 60
    # pruned are the lowest-opacity alive slots
    opac = np.asarray(jax.nn.sigmoid(splat.opacity_raw[:, 0]))
    alive = np.asarray(splat.alive)
    pruned_max = opac[np.asarray(mask)].max()
    kept_min = opac[alive & ~np.asarray(mask)].min()
    assert pruned_max <= kept_min + 1e-7


def test_sparsity_schedule():
    assert sp.should_apply_loss(30_000, 30_000, 15_000)
    assert not sp.should_apply_loss(45_000, 30_000, 15_000)
    assert sp.should_update(30_050, 30_000, 15_000)
    assert not sp.should_update(30_000, 30_000, 15_000)
    assert sp.should_prune(45_000, 30_000, 15_000)


# ------------------------------------------------------------------- integrated step


def test_train_step_with_all_components():
    splat = _splat(n=60, capacity=128, seed=9)
    cam = make_camera(32, 32)
    opt_params = type("P", (), dict(
        use_bilateral_grid=True, bilateral_grid_X=8, bilateral_grid_Y=8, bilateral_grid_W=4,
        pose_optimization="direct",
    ))()
    ts = init_train_state(splat, seed=1, n_train_images=3, opt=opt_params)
    cfg = StepConfig(
        use_bilateral_grid=True, pose_optimization="direct",
        tv_loss_weight=10.0,
    )
    plan = RasterPlan(max_instances=1 << 12, k_max=256, chunk=32)
    gt = jnp.asarray(np.random.default_rng(2).random((3, 32, 32), np.float32))
    for _ in range(3):
        ts, stats = train_step(
            ts, gt, cam["w2c"], cam["cam_position"],
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], jnp.zeros(3), jnp.int32(1),
            width=32, height=32, plan=plan, opt=cfg, total_iterations=100,
        )
    assert np.isfinite(float(stats.loss))
    # pose embeddings and grids were touched by their optimizers
    assert float(jnp.max(jnp.abs(ts.pose_params["embeddings"]))) > 0
    assert float(jnp.max(jnp.abs(ts.bilateral_grids - bg.init_grids(3, 8, 8, 4)))) > 0
