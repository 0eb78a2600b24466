"""MCMC strategy mechanics + end-to-end train_step integration on a synthetic scene
(mirrors tests/test_mcmc.cpp: init, grad flow, noise injection, refinement cycles,
post-op render consistency)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.training import strategy_mcmc
from tpu_splat.training.optim import init_adam_state
from tpu_splat.training.train_step import (
    RasterPlan, StepConfig, init_train_state, refine_step, train_step,
    train_step_many,
)

from utils import make_camera


def _make_state(n=100, capacity=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    pts[:, 2] += 5
    cols = rng.random((n, 3)).astype(np.float32)
    return init_from_pointcloud(pts, cols, np.array([0, 0, 5.0]), capacity=capacity)


def test_relocate_replaces_dead():
    state = _make_state()
    # kill 20 gaussians by forcing opacity below threshold
    op = np.asarray(state.opacity_raw).copy()
    op[10:30] = -10.0  # sigmoid ~ 4.5e-5 <= 0.005
    state = dataclasses.replace(state, opacity_raw=jnp.asarray(op))
    adam = init_adam_state(state.params())
    adam = dataclasses.replace(
        adam, exp_avg={k: jnp.ones_like(v) for k, v in adam.exp_avg.items()}
    )

    new_state, new_adam, n_dead = strategy_mcmc.relocate_gs(
        state, adam, jax.random.key(0), min_opacity=0.005
    )
    assert int(n_dead) == 20
    new_op = jax.nn.sigmoid(new_state.opacity_raw[:100, 0])
    assert float(new_op.min()) >= 0.005 - 1e-6  # dead slots got live opacities
    # alive set unchanged by relocation
    np.testing.assert_array_equal(np.asarray(new_state.alive), np.asarray(state.alive))
    # moments zeroed at sampled sources (some rows), not everywhere
    ea = np.asarray(new_adam.exp_avg["means"])
    assert (ea[:100] == 0).all(axis=1).sum() > 0
    assert (ea[:100] == 1).all(axis=1).sum() > 0


def test_add_new_grows_5pct():
    state = _make_state(n=100, capacity=256)
    adam = init_adam_state(state.params())
    new_state, _, n_new = strategy_mcmc.add_new_gs(
        state, adam, jax.random.key(1), max_cap=1000, min_opacity=0.005
    )
    # static_cast<int>(1.05f * 100) == 104 in the reference (f32 truncation, mcmc.cpp:201)
    assert int(n_new) == 4
    assert int(new_state.n_alive()) == 104
    # claimed slots must hold real (copied) params, not padding
    claimed = np.asarray(new_state.means)[100:105]
    assert np.abs(claimed).sum() > 0


def test_add_new_respects_max_cap():
    state = _make_state(n=100, capacity=128)
    adam = init_adam_state(state.params())
    new_state, _, n_new = strategy_mcmc.add_new_gs(
        state, adam, jax.random.key(1), max_cap=102, min_opacity=0.005
    )
    assert int(n_new) == 2
    assert int(new_state.n_alive()) == 102


def test_inject_noise_moves_low_opacity_only():
    state = _make_state()
    op = np.asarray(state.opacity_raw).copy()
    op[:50] = 4.0  # opacity ~0.98 -> gate ~ 0
    op[50:100] = -8.0  # opacity ~3e-4 -> gate ~ 1
    state = dataclasses.replace(state, opacity_raw=jnp.asarray(op))
    moved = strategy_mcmc.inject_noise(state, jax.random.key(2), current_means_lr=1e-4)
    delta = np.linalg.norm(np.asarray(moved.means - state.means), axis=1)
    assert delta[:50].max() < 1e-8  # opaque: gated off
    assert delta[50:100].mean() > delta[:50].max()  # transparent: jittered
    assert delta[100:].max() == 0  # dead pool untouched


def test_is_refining_window():
    f = strategy_mcmc.is_refining
    assert not f(500, 500, 25000, 100)  # strict start
    assert f(600, 500, 25000, 100)
    assert not f(650, 500, 25000, 100)
    assert not f(25000, 500, 25000, 100)  # strict stop
    assert f(24900, 500, 25000, 100)


def test_train_step_many_matches_sequential():
    """K steps in one lax.scan launch == K sequential train_step calls (the trainer's
    dispatch-amortization lane must be semantically invisible)."""
    state = _make_state(n=120, capacity=256, seed=7)
    cams = [make_camera(48, 48, fov_deg=55.0 + 5.0 * i) for i in range(3)]
    plan = RasterPlan(max_instances=1 << 14, k_max=256, chunk=32)
    cfg = StepConfig(strategy="mcmc")
    gt = jnp.asarray(np.random.default_rng(2).random((3, 48, 48), np.float32))
    kw = dict(width=48, height=48, plan=plan, opt=cfg, total_iterations=100)

    k = 5
    seq = [cams[i % 3] for i in range(k)]
    ts_a = init_train_state(state, seed=9)
    losses_a = []
    for i, cam in enumerate(seq):
        ts_a, st = train_step(
            ts_a, gt, cam["w2c"], cam["cam_position"],
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], jnp.zeros(3), jnp.int32(i % 3),
            **kw,
        )
        losses_a.append(float(st.loss))

    ts_b = init_train_state(state, seed=9)
    gts = jnp.broadcast_to(gt[None], (k,) + gt.shape)
    w2cs = jnp.stack([jnp.asarray(c["w2c"]) for c in seq])
    cpos = jnp.stack([jnp.asarray(c["cam_position"]) for c in seq])
    intr = jnp.asarray([[c["fx"], c["fy"], c["cx"], c["cy"]] for c in seq], jnp.float32)
    bgs = jnp.zeros((k, 3), jnp.float32)
    cidx = jnp.asarray([i % 3 for i in range(k)], jnp.int32)
    ts_b, stats = train_step_many(ts_b, gts, w2cs, cpos, intr, bgs, cidx, **kw)

    np.testing.assert_allclose(np.asarray(stats.loss), np.asarray(losses_a), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ts_b.splat.means), np.asarray(ts_a.splat.means), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ts_b.splat.opacity_raw), np.asarray(ts_a.splat.opacity_raw), atol=1e-6)
    assert int(ts_b.iteration) == int(ts_a.iteration) == 6
    assert int(np.asarray(stats.max_tile_count).max()) <= plan.k_max


def test_train_step_end_to_end_improves():
    """Full pipeline: train_step + periodic refine_step fit a reference rendering."""
    state = _make_state(n=150, capacity=256, seed=3)
    cam = make_camera(48, 48)
    plan = RasterPlan(max_instances=1 << 14, k_max=256, chunk=32)
    cfg = StepConfig(strategy="mcmc")

    # ground truth = render of a perturbed copy (realizable target)
    from tpu_splat.ops.reference import render_naive

    gt_img, _ = render_naive(
        state.means, state.scaling_raw, state.rotation_raw,
        jnp.asarray(np.asarray(state.opacity_raw) + 1.0),
        jnp.asarray(np.asarray(state.sh0) * 0.5 + 0.3), state.shN, state.alive,
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        width=48, height=48, active_sh_degree=3, bg_color=jnp.zeros(3),
    )
    gt_img = jax.lax.stop_gradient(gt_img)

    ts = init_train_state(state, seed=4)
    losses = []
    for i in range(1, 61):
        ts, stats = train_step(
            ts, gt_img, cam["w2c"], cam["cam_position"],
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], jnp.zeros(3), jnp.int32(0),
            width=48, height=48, plan=plan, opt=cfg, total_iterations=100,
        )
        losses.append(float(stats.loss))
        if strategy_mcmc.is_refining(i, start=10, stop=100, every=25):
            ts, info = refine_step(ts, min_opacity=0.005, max_cap=200)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert int(ts.iteration) == 61
    assert int(ts.splat.n_alive()) > 150  # growth happened
    assert int(stats.n_visible) > 0
