"""GUT path: camera models, UT projection, world-ray rasterizer.

Reference coverage analog: tests/test_basic.cpp camera-model tests +
test_gsplat_ops.cpp UT projection/pipeline tests (SURVEY.md §4).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splat.core.splat import init_from_pointcloud
from tpu_splat.ops.cameras import (
    CameraParams, fisheye_project, fisheye_ray, pinhole_project, pinhole_ray,
)
from tpu_splat.ops.gut import rasterize_gut, ut_project
from tpu_splat.ops.rasterize import rasterize

from utils import make_camera, make_scene

W, H = 64, 64
F = 55.0


def _cam_points(n=200, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.uniform(1, 8, n).astype(np.float32)
    x = rng.uniform(-0.4, 0.4, n).astype(np.float32) * z
    y = rng.uniform(-0.4, 0.4, n).astype(np.float32) * z
    return jnp.asarray(np.stack([x, y, z], 1))


def test_pinhole_distortion_roundtrip():
    params = CameraParams(radial=(0.1, -0.05, 0.001, 0, 0, 0), tangential=(0.001, -0.002))
    pts = _cam_points()
    img, valid = pinhole_project(pts, F, F, W / 2, H / 2, params, W, H)
    rays = pinhole_ray(img, F, F, W / 2, H / 2, params)
    # rays must be parallel to the original camera points
    ptsn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    dots = jnp.sum(ptsn * rays, axis=-1)
    ok = np.asarray(dots)[np.asarray(valid)]
    assert ok.min() > 0.99999, ok.min()


def test_fisheye_roundtrip():
    params = CameraParams(model="fisheye", radial=(0.05, -0.01, 0.002, 0.0, 0, 0))
    pts = _cam_points(seed=1)
    img, valid = fisheye_project(pts, F, F, W / 2, H / 2, params, W, H)
    rays = fisheye_ray(img, F, F, W / 2, H / 2, params)
    ptsn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    dots = np.asarray(jnp.sum(ptsn * rays, axis=-1))[np.asarray(valid)]
    assert dots.min() > 0.9999, dots.min()


def test_ut_matches_pinhole_projection_of_mean():
    scene = make_scene(100, seed=2)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    w2c = jnp.eye(4)
    proj, comp = ut_project(
        splat["means"], splat["scaling_raw"], splat["rotation_raw"], splat["opacity_raw"],
        splat["alive"], w2c, F, F, W / 2, H / 2, CameraParams(), W, H, 16, None,
    )
    # UT mean of an undistorted pinhole is close to the projected mean for small gaussians
    z = np.asarray(splat["means"][:, 2])
    expect_x = np.asarray(splat["means"][:, 0]) / z * F + W / 2
    expect_y = np.asarray(splat["means"][:, 1]) / z * F + H / 2
    vis = np.asarray(proj.visible)
    assert vis.sum() > 20
    err = np.abs(np.asarray(proj.mean2d[:, 0]) - expect_x)[vis]
    assert np.median(err) < 1.0, np.median(err)
    # compensation in (0, 1]
    c = np.asarray(comp)[vis]
    assert (c > 0).all() and (c <= 1.0 + 1e-5).all()


def test_gut_render_close_to_fast_path_when_pinhole():
    scene = make_scene(150, seed=3)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = make_camera(W, H)
    args = (splat["means"], splat["scaling_raw"], splat["rotation_raw"],
            splat["opacity_raw"], splat["sh0"], splat["shN"], splat["alive"],
            jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3))
    fast = rasterize(*args, width=W, height=H, max_instances=1 << 13, k_max=512, chunk=32)
    gut = rasterize_gut(*args, width=W, height=H, max_instances=1 << 13, k_max=512,
                        chunk=16)
    # different response models (2D conic vs max-along-ray); images should agree coarsely,
    # like the reference's image-level grading (test_rasterization.cpp:611)
    diff = float(jnp.mean(jnp.abs(fast.image - gut.image)))
    assert diff < 0.035, diff
    assert float(jnp.mean(jnp.abs(fast.alpha - gut.alpha))) < 0.1


def test_gut_gradients_flow_and_fit():
    scene = make_scene(80, seed=4)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = make_camera(48, 48)
    gt = jnp.asarray(np.random.default_rng(0).random((3, 48, 48), np.float32))
    params = CameraParams(radial=(0.05, 0, 0, 0, 0, 0))

    def loss_fn(means, scaling, rot, opac, sh0, shN):
        out = rasterize_gut(
            means, scaling, rot, opac, sh0, shN, splat["alive"],
            jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3),
            width=48, height=48, max_instances=1 << 12, k_max=256, chunk=16,
            cam_params=params,
        )
        return jnp.mean((out.image - gt) ** 2)

    keys = ("means", "scaling_raw", "rotation_raw", "opacity_raw", "sh0", "shN")
    vals = [splat[k] for k in keys]
    l0, grads = jax.value_and_grad(loss_fn, argnums=tuple(range(6)))(*vals)
    assert np.isfinite(float(l0))
    for k, g in zip(keys, grads):
        assert np.isfinite(np.asarray(g)).all(), k
        assert float(jnp.max(jnp.abs(g))) > 0, f"zero grad for {k}"

    # a few SGD steps reduce the loss
    lr = {"means": 1e-3, "scaling_raw": 1e-2, "rotation_raw": 1e-2,
          "opacity_raw": 5e-2, "sh0": 5e-2, "shN": 5e-3}
    for _ in range(10):
        l, grads = jax.value_and_grad(loss_fn, argnums=tuple(range(6)))(*vals)
        vals = [v - lr[k] * g for v, g, k in zip(vals, grads, keys)]
    l_end = float(loss_fn(*vals))
    assert l_end < float(l0), (float(l0), l_end)


def test_gut_train_step_integration():
    from tpu_splat.training.train_step import (RasterPlan, StepConfig, init_train_state,
                                               train_step)

    splat = init_from_pointcloud(
        np.asarray(make_scene(60, seed=5)["means"]),
        np.random.default_rng(0).random((60, 3), np.float32),
        np.array([0, 0, 5.0], np.float32), capacity=128,
    )
    cam = make_camera(32, 32)
    ts = init_train_state(splat, seed=2)
    cfg = StepConfig(gut=True, cam_params=CameraParams(radial=(0.02, 0, 0, 0, 0, 0)))
    plan = RasterPlan(max_instances=1 << 12, k_max=256, chunk=16)
    gt = jnp.asarray(np.random.default_rng(3).random((3, 32, 32), np.float32))
    losses = []
    for _ in range(5):
        ts, st = train_step(ts, gt, jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
                            cam["fx"], cam["fy"], cam["cx"], cam["cy"], jnp.zeros(3),
                            jnp.int32(0), width=32, height=32, plan=plan, opt=cfg,
                            total_iterations=100)
        losses.append(float(st.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gut_cli_end_to_end(tmp_path):
    """--gut training route on an OPENCV-distorted synthetic COLMAP dataset."""
    from synth_data import make_synthetic_colmap_distorted
    from tpu_splat.cli import main

    ds = tmp_path / "ds"
    make_synthetic_colmap_distorted(ds, n_gauss=60, n_cams=4, size=32, seed=7)
    out = tmp_path / "out"
    rc = main(["-d", str(ds), "-o", str(out), "-i", "8", "--headless", "--gut",
               "--max-cap", "150", "--test-every", "0", "--sh-degree", "1"])
    assert rc == 0
    assert (out / "splat_final.ply").exists()


def test_gut_required_for_distorted(tmp_path):
    """Distorted cameras without --gut must be rejected (trainer.cpp:586-597)."""
    import pytest
    from synth_data import make_synthetic_colmap_distorted
    from tpu_splat.cli import params_from_args, build_parser
    from tpu_splat.training.trainer import Trainer

    ds = tmp_path / "ds2"
    make_synthetic_colmap_distorted(ds, n_gauss=40, n_cams=3, size=32, seed=8)
    args = build_parser().parse_args(["-d", str(ds), "-o", str(tmp_path / "o"),
                                      "--max-cap", "100"])
    with pytest.raises(ValueError, match="gut"):
        Trainer(params_from_args(args))


def _pose_from_w2c(w2c):
    from scipy.spatial.transform import Rotation

    x, y, z, w = Rotation.from_matrix(np.asarray(w2c)[:3, :3]).as_quat()
    return (jnp.asarray([w, x, y, z], jnp.float32), jnp.asarray(w2c[:3, 3], jnp.float32))


def test_rolling_shutter_static_pose_equals_global():
    """With q_end == q_start the rolling-shutter render must equal global shutter."""
    scene = make_scene(120, seed=6)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = make_camera(48, 48)
    q, t = _pose_from_w2c(cam["w2c"])
    args = (splat["means"], splat["scaling_raw"], splat["rotation_raw"],
            splat["opacity_raw"], splat["sh0"], splat["shN"], splat["alive"],
            jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3))
    kw = dict(width=48, height=48, max_instances=1 << 12, k_max=256, chunk=16)
    glob = rasterize_gut(*args, **kw)
    roll = rasterize_gut(*args, cam_params=CameraParams(shutter="top_to_bottom"),
                         shutter_pose=(q, t, q, t), **kw)
    np.testing.assert_allclose(np.asarray(roll.image), np.asarray(glob.image), atol=2e-3)


def test_rolling_shutter_interpolates_between_poses():
    """Top rows follow the start pose, bottom rows the end pose."""
    scene = make_scene(200, seed=7)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = make_camera(48, 48)
    w2c_start = np.asarray(cam["w2c"], np.float32)
    w2c_end = w2c_start.copy()
    w2c_end[0, 3] += 0.25  # camera translates during readout
    qs, ts_ = _pose_from_w2c(w2c_start)
    qe, te = _pose_from_w2c(w2c_end)
    base = (splat["means"], splat["scaling_raw"], splat["rotation_raw"],
            splat["opacity_raw"], splat["sh0"], splat["shN"], splat["alive"])
    kw = dict(width=48, height=48, max_instances=1 << 12, k_max=256, chunk=16)

    def render(w2c, cam_params=CameraParams(), pose=None):
        w2c = jnp.asarray(w2c)
        cpos = jnp.asarray((-np.asarray(w2c)[:3, :3].T @ np.asarray(w2c)[:3, 3]))
        return rasterize_gut(*base, w2c, cpos, cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                             3, jnp.zeros(3), cam_params=cam_params, shutter_pose=pose,
                             **kw)

    img_start = np.asarray(render(w2c_start).image)
    img_end = np.asarray(render(w2c_end).image)
    img_roll = np.asarray(render(
        w2c_start, CameraParams(shutter="top_to_bottom"), (qs, ts_, qe, te)
    ).image)

    # rows near the top should match the start-pose render better than the end-pose one
    def rowdiff(a, b, rows):
        return float(np.mean(np.abs(a[:, rows] - b[:, rows])))

    top = slice(0, 8)
    bot = slice(40, 48)
    assert rowdiff(img_roll, img_start, top) < rowdiff(img_roll, img_end, top)
    assert rowdiff(img_roll, img_end, bot) < rowdiff(img_roll, img_start, bot)
    # and the rolling render differs from both globally
    assert float(np.mean(np.abs(img_roll - img_start))) > 1e-4


def test_per_camera_distortion_traced():
    """`dist` makes distortion per-sample: same jitted variant renders two different
    radial profiles, each matching the statically-baked render of that profile
    (VERDICT r1: camera-0 coeffs were baked statically, mis-rendering mixed rigs)."""
    scene = make_scene(80, seed=9)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    W = H = 48
    F = 0.8 * W
    args = (splat["means"], splat["scaling_raw"], splat["rotation_raw"],
            splat["opacity_raw"], splat["sh0"], splat["shN"], splat["alive"],
            jnp.eye(4), jnp.zeros(3), F, F, W / 2, H / 2, 2, jnp.zeros(3))
    kw = dict(width=W, height=H, max_instances=1 << 12, k_max=256, chunk=16)

    cp_a = CameraParams(radial=(0.08, -0.02, 0, 0, 0, 0))
    cp_b = CameraParams(radial=(-0.06, 0.01, 0, 0, 0, 0), tangential=(0.002, -0.001))
    base = CameraParams()  # zero coeffs: the static part of the per-sample variant

    img_a_static = rasterize_gut(*args, cam_params=cp_a, **kw).image
    img_b_static = rasterize_gut(*args, cam_params=cp_b, **kw).image
    da = jnp.asarray(np.concatenate([cp_a.radial, cp_a.tangential, cp_a.thin_prism]))
    db = jnp.asarray(np.concatenate([cp_b.radial, cp_b.tangential, cp_b.thin_prism]))
    img_a = rasterize_gut(*args, cam_params=base, dist=da, **kw).image
    img_b = rasterize_gut(*args, cam_params=base, dist=db, **kw).image

    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_a_static), atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_b_static), atol=1e-5)
    assert float(jnp.max(jnp.abs(img_a - img_b))) > 1e-3  # profiles actually differ


def test_ortho_camera_model():
    """ORTHO model (gsplat/Common.h:46-50): parallel rays, no z division; splats keep
    their world size regardless of depth."""
    scene = make_scene(60, seed=12)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    W = H = 48
    args = (splat["means"], splat["scaling_raw"], splat["rotation_raw"],
            splat["opacity_raw"], splat["sh0"], splat["shN"], splat["alive"],
            jnp.eye(4), jnp.zeros(3), 8.0, 8.0, W / 2, H / 2, 0, jnp.zeros(3))
    kw = dict(width=W, height=H, max_instances=1 << 12, k_max=256, chunk=16)
    out = rasterize_gut(*args, cam_params=CameraParams(model="ortho"), **kw)
    img = np.asarray(out.image)
    assert np.isfinite(img).all() and img.max() > 0.01
    # orthographic invariance: translating the scene along +z leaves the image unchanged
    shifted = dict(splat, means=splat["means"] + jnp.asarray([0.0, 0.0, 2.0]))
    args2 = (shifted["means"],) + args[1:]
    out2 = rasterize_gut(*args2, cam_params=CameraParams(model="ortho"), **kw)
    np.testing.assert_allclose(np.asarray(out2.image), img, atol=1e-4)


@pytest.mark.parametrize("mode", ["rolling", "ortho"])
def test_gut_pallas_per_pixel_origin_matches_xla(mode):
    """Rolling shutter and ORTHO through the Pallas GUT kernels (interpret mode):
    the per-pixel-origin rays block ([T,P,8], gro(p) = gro + M delta_o(p)) must match
    the XLA chunk-scan blend's delta_o path in images AND gradients — closes the
    PARITY.md kernel-fallback gap (ref gsplat/RasterizeToPixelsFromWorld3DGSFwd.cu:207-241)."""
    scene = make_scene(150, seed=9)
    splat = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = make_camera(32, 32)
    kw = dict(width=32, height=32, max_instances=1 << 12, k_max=256, chunk=16)
    if mode == "rolling":
        w2c_end = np.asarray(cam["w2c"], np.float32).copy()
        w2c_end[0, 3] += 0.2
        qs, ts_ = _pose_from_w2c(cam["w2c"])
        qe, te = _pose_from_w2c(w2c_end)
        extra = dict(cam_params=CameraParams(shutter="top_to_bottom"),
                     shutter_pose=(qs, ts_, qe, te))
    else:
        extra = dict(cam_params=CameraParams(model="ortho"))
    args_tail = (splat["scaling_raw"], splat["rotation_raw"], splat["opacity_raw"],
                 splat["sh0"], splat["shN"], splat["alive"],
                 jnp.asarray(cam["w2c"]), jnp.asarray(cam["cam_position"]),
                 cam["fx"], cam["fy"], cam["cx"], cam["cy"], 3, jnp.zeros(3))

    def run(backend):
        def loss_fn(m):
            out = rasterize_gut(m, *args_tail, backend=backend, **extra, **kw)
            return jnp.sum(out.image ** 2) * 1e-2, out
        (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(splat["means"])
        return out, g

    out_x, g_x = run("xla")
    out_p, g_p = run("pallas")
    assert float(jnp.max(jnp.abs(out_x.image - out_p.image))) < 1e-3
    scale = float(jnp.max(jnp.abs(g_x))) + 1e-12
    assert float(jnp.max(jnp.abs(g_x - g_p))) / scale < 5e-3


def test_gut_vmm_variant_parity():
    """kernel_vmm (v = M d on the MXU, hi/lo bf16 [P,3]x[3,3C]) against the default
    VPU evaluation — image and gradient parity in interpret mode."""
    scene = {k: jnp.asarray(v) for k, v in make_scene(300, seed=11).items()}
    W, H = 64, 48
    args = (scene["means"], scene["scaling_raw"], scene["rotation_raw"],
            scene["opacity_raw"], scene["sh0"], scene["shN"], scene["alive"],
            jnp.eye(4), jnp.zeros(3), 0.85 * W, 0.85 * W, W / 2, H / 2, 3,
            jnp.asarray([0.1, 0.2, 0.3]))
    kw = dict(width=W, height=H, max_instances=1 << 13, k_max=512,
              cam_params=CameraParams(radial=(0.05, 0, 0, 0, 0, 0)), backend="pallas")

    def loss(m, vmm):
        out = rasterize_gut(m, *args[1:], kernel_vmm=vmm, **kw)
        return jnp.sum(out.image ** 2), out

    (_, o0), g0 = jax.value_and_grad(loss, has_aux=True)(args[0], False)
    (_, o1), g1 = jax.value_and_grad(loss, has_aux=True)(args[0], True)
    assert float(jnp.max(jnp.abs(o0.image - o1.image))) < 5e-3
    scale = float(jnp.max(jnp.abs(g0))) + 1e-12
    assert float(jnp.max(jnp.abs(g0 - g1))) / scale < 2e-2
