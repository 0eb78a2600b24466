"""Rasterizer edge cases: empty scenes, single/huge gaussians, odd sizes, behind-camera.

Robustness analog of the reference's intersection edge-case tests
(tests/test_intersect_debug.cpp)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.ops.rasterize import rasterize

BG = jnp.asarray([0.2, 0.4, 0.6])


def _render(splat, w=50, h=34, **kw):
    f = 0.8 * w
    return rasterize(
        splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        splat.sh0, splat.shN, splat.alive,
        jnp.eye(4), jnp.zeros(3), f, f, w / 2.0, h / 2.0, 3, BG,
        width=w, height=h, max_instances=1 << 12, k_max=256, chunk=32, **kw,
    )


def _splat(pts, capacity=64, **kw):
    pts = np.asarray(pts, np.float32)
    return init_from_pointcloud(
        pts, np.full((len(pts), 3), 0.8, np.float32), np.array([0, 0, 5.0], np.float32),
        capacity=capacity, **kw,
    )


def test_empty_scene_renders_background():
    splat = _splat([[0, 0, 5.0]])
    splat = dataclasses.replace(splat, alive=jnp.zeros_like(splat.alive))
    out = _render(splat)
    np.testing.assert_allclose(
        np.asarray(out.image), np.broadcast_to(np.asarray(BG)[:, None, None], (3, 34, 50)),
        atol=1e-6,
    )
    assert float(out.alpha.max()) == 0.0
    assert int(out.aux.total_instances) == 0


def test_all_behind_camera():
    splat = _splat([[0, 0, -3.0], [1, 1, -5.0]])
    out = _render(splat)
    assert float(out.alpha.max()) == 0.0
    assert int(out.aux.n_visible) == 0


def test_single_gaussian_center():
    splat = _splat([[0, 0, 5.0]])
    out = _render(splat)
    a = np.asarray(out.alpha)
    cy, cx = 17, 25
    assert a[cy, cx] > 0.1
    assert np.isfinite(np.asarray(out.image)).all()


def test_huge_gaussian_spans_all_tiles():
    splat = _splat([[0, 0, 3.0]])
    big = np.asarray(splat.scaling_raw).copy()
    big[0] = np.log(5.0)  # world sigma 5 at z=3: covers the frame
    splat = dataclasses.replace(splat, scaling_raw=jnp.asarray(big))
    out = _render(splat)
    a = np.asarray(out.alpha)
    assert a.min() > 0.1  # covers every pixel
    # instance count equals the full tile grid for the one gaussian
    assert int(out.aux.total_instances) >= (50 // 16 + 1) * (34 // 16 + 1)


def test_odd_image_size_cropping():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (30, 3)).astype(np.float32)
    pts[:, 2] += 5
    splat = _splat(pts, capacity=64)
    out = _render(splat, w=37, h=23)
    assert out.image.shape == (3, 23, 37)
    assert out.alpha.shape == (23, 37)
    assert np.isfinite(np.asarray(out.image)).all()


def test_saturating_opacity_early_stop_matches_oracle():
    """Dense opaque stack: the transmittance stop must still match the oracle."""
    from tpu_splat.ops.reference import render_naive

    rng = np.random.default_rng(3)
    n = 120
    pts = np.stack([
        rng.normal(0, 0.03, n), rng.normal(0, 0.03, n), np.linspace(4, 6, n)
    ], axis=1).astype(np.float32)
    splat = _splat(pts, capacity=128)
    op = np.full((128, 1), 3.0, np.float32)  # sigmoid ~ 0.95: saturates in a few hits
    splat = dataclasses.replace(splat, opacity_raw=jnp.asarray(op))

    out = _render(splat, w=48, h=48)
    f = 0.8 * 48
    oracle_img, oracle_alpha = render_naive(
        splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw,
        splat.sh0, splat.shN, splat.alive,
        jnp.eye(4), jnp.zeros(3), f, f, 24.0, 24.0,
        width=48, height=48, active_sh_degree=3, bg_color=BG,
    )
    assert float(jnp.max(jnp.abs(out.image - oracle_img))) < 2e-2
    assert float(jnp.max(jnp.abs(out.alpha - oracle_alpha))) < 1e-2


def test_capacity_one():
    splat = _splat([[0.2, -0.1, 4.0]], capacity=1)
    out = _render(splat)
    assert np.isfinite(np.asarray(out.image)).all()


def test_gradients_finite_on_edge_scene():
    """Grad through a scene mixing behind-camera, dead, and huge gaussians."""
    pts = np.array([[0, 0, 5.0], [0, 0, -2.0], [0.5, 0.5, 3.0]], np.float32)
    splat = _splat(pts, capacity=8)
    sc = np.asarray(splat.scaling_raw).copy()
    sc[2] = np.log(4.0)
    alive = np.asarray(splat.alive).copy()
    splat = dataclasses.replace(splat, scaling_raw=jnp.asarray(sc))

    def loss(means, scaling, rot, opac):
        out = rasterize(
            means, scaling, rot, opac, splat.sh0, splat.shN, splat.alive,
            jnp.eye(4), jnp.zeros(3), 40.0, 40.0, 25.0, 17.0, 3, BG,
            width=50, height=34, max_instances=1 << 10, k_max=128, chunk=32,
        )
        return jnp.sum(out.image**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        splat.means, splat.scaling_raw, splat.rotation_raw, splat.opacity_raw
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
