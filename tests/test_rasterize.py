"""Tiled rasterizer vs naive oracle: images and gradients allclose.

Mirrors the reference's validation strategy (tests/test_rasterization.cpp:611 grades rendered
images at 1e-2; SURVEY.md §4) — oracle here is ops/reference.py (pure-jnp O(N*P) blend).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splat.ops.rasterize import rasterize
from tpu_splat.ops.reference import render_naive as _render_naive

from utils import make_camera, make_scene

render_naive = functools.partial(
    jax.jit(_render_naive, static_argnames=("width", "height", "active_sh_degree"))
)


def _render_both(scene, cam, sh_degree=3, bg=None, max_instances=1 << 14, k_max=256):
    args = (
        scene["means"], scene["scaling_raw"], scene["rotation_raw"], scene["opacity_raw"],
        scene["sh0"], scene["shN"], scene["alive"],
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
    )
    out = rasterize(
        *args, sh_degree, bg,
        width=cam["width"], height=cam["height"],
        max_instances=max_instances, k_max=k_max, chunk=32,
    )
    img_ref, alpha_ref = render_naive(
        *args, width=cam["width"], height=cam["height"],
        active_sh_degree=sh_degree, bg_color=bg,
    )
    assert int(out.aux.total_instances) <= max_instances, "instance budget overflow in test"
    assert int(out.aux.max_tile_count) <= k_max, "tile list truncated in test"
    return out, img_ref, alpha_ref


@pytest.mark.parametrize("n,seed,k_max", [(50, 0, 256), (500, 1, 256), (2000, 2, 1024)])
def test_tiled_matches_naive(n, seed, k_max):
    scene = make_scene(n, seed)
    cam = make_camera(64, 48)
    out, img_ref, alpha_ref = _render_both(scene, cam, k_max=k_max)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(alpha_ref), atol=1e-5, rtol=1e-4)


def test_background_compositing():
    scene = make_scene(200, 3)
    cam = make_camera(32, 32)
    bg = jnp.array([0.2, 0.5, 0.9], jnp.float32)
    out, img_ref, _ = _render_both(scene, cam, bg=bg)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref), atol=1e-5, rtol=1e-4)


def test_nonsquare_image_with_partial_tiles():
    scene = make_scene(300, 4)
    cam = make_camera(70, 45)  # not multiples of 16
    out, img_ref, alpha_ref = _render_both(scene, cam)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_ref), atol=1e-5, rtol=1e-4)


def test_gradients_match_naive():
    scene = make_scene(300, 5)
    cam = make_camera(48, 32)
    gt = jnp.asarray(np.random.default_rng(9).random((3, 32, 48), np.float32))

    def loss_tiled(means, scaling, rot, opac, sh0, shN):
        out = rasterize(
            means, scaling, rot, opac, sh0, shN, scene["alive"],
            cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            3, None,
            width=cam["width"], height=cam["height"],
            max_instances=1 << 14, k_max=256, chunk=32,
        )
        return jnp.mean(jnp.abs(out.image - gt))

    def loss_naive(means, scaling, rot, opac, sh0, shN):
        img, _ = render_naive(
            means, scaling, rot, opac, sh0, shN, scene["alive"],
            cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            width=cam["width"], height=cam["height"], active_sh_degree=3,
        )
        return jnp.mean(jnp.abs(img - gt))

    args = (scene["means"], scene["scaling_raw"], scene["rotation_raw"],
            scene["opacity_raw"], scene["sh0"], scene["shN"])
    g_tiled = jax.grad(loss_tiled, argnums=tuple(range(6)))(*args)
    g_naive = jax.grad(loss_naive, argnums=tuple(range(6)))(*args)
    names = ["means", "scaling", "rotation", "opacity", "sh0", "shN"]
    for name, gt_, gn_ in zip(names, g_tiled, g_naive):
        gt_, gn_ = np.asarray(gt_), np.asarray(gn_)
        scale = max(np.abs(gn_).max(), 1e-8)
        np.testing.assert_allclose(gt_, gn_, atol=2e-4 * scale + 1e-9, rtol=1e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_finite_difference_gradcheck():
    """Float64 finite-difference check through the full tiled pipeline — the one gradient
    test fully independent of the autodiff path (cf. tests/test_numerical_gradients.cpp:87-462)."""
    scene = make_scene(40, 6)
    cam = make_camera(32, 32)
    gt = np.random.default_rng(10).random((3, 32, 32))

    with jax.enable_x64():
        def loss(means):
            out = rasterize(
                means, scene["scaling_raw"].astype(np.float64),
                scene["rotation_raw"].astype(np.float64),
                scene["opacity_raw"].astype(np.float64),
                scene["sh0"].astype(np.float64), scene["shN"].astype(np.float64),
                scene["alive"],
                np.float64(cam["w2c"]), np.float64(cam["cam_position"]),
                cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                3, None,
                width=32, height=32, max_instances=1 << 14, k_max=256, chunk=32,
            )
            return jnp.sum((out.image - jnp.asarray(gt)) ** 2)

        means = scene["means"].astype(np.float64)
        g = np.asarray(jax.grad(loss)(means))
        rng = np.random.default_rng(11)
        for _ in range(5):
            i = rng.integers(0, means.shape[0])
            j = rng.integers(0, 3)
            eps = 1e-6
            mp = means.copy(); mp[i, j] += eps
            mm = means.copy(); mm[i, j] -= eps
            fd = (float(loss(mp)) - float(loss(mm))) / (2 * eps)
            assert abs(fd - g[i, j]) <= 1e-4 * max(abs(fd), abs(g[i, j]), 1.0), (
                f"FD mismatch at ({i},{j}): fd={fd} ad={g[i, j]}"
            )


def test_dead_slots_do_not_render():
    scene = make_scene(200, 7)
    scene["alive"][100:] = False
    cam = make_camera(32, 32)
    out, img_ref, _ = _render_both(scene, cam)
    scene2 = {k: (v[:100] if k != "shN" else v[:100]) for k, v in scene.items()}
    out2, _, _ = _render_both(scene2, cam)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(out2.image), atol=1e-6)


@pytest.mark.parametrize("pack_bf16", [False, True])
def test_pallas_interpret_matches_xla(pack_bf16):
    """The Pallas blend path (interpret mode on CPU) against the XLA scan blend,
    images AND gradients, in both feature-pack dtypes. The bf16 hi/lo pack
    (blend.py B_* layout) budgets <=0.4% forward rounding on opacity/color/depth;
    mean2d/conic reconstruct ~f32 from hi+lo pairs."""
    scene = make_scene(400, 7)
    cam = make_camera(48, 48)
    kw = dict(width=48, height=48, max_instances=1 << 13, k_max=256, chunk=128,
              tile_size=16)
    args = (
        scene["means"], scene["scaling_raw"], scene["rotation_raw"],
        scene["opacity_raw"], scene["sh0"], scene["shN"], scene["alive"],
        cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        3, jnp.asarray([0.1, 0.2, 0.3]),
    )

    def run(backend, **extra):
        def loss_fn(m, sc, r, o):
            out = rasterize(m, sc, r, o, *args[4:], backend=backend, **extra, **kw)
            tgt = jnp.linspace(0, 1, 48)[None, None, :]
            return jnp.sum((out.image - tgt) ** 2) * 1e-3, out
        (_, out), g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            *args[:4])
        return out, g

    out_x, g_x = run("xla")
    out_p, g_p = run("pallas", pack_bf16=pack_bf16)
    img_tol = 5e-3 if pack_bf16 else 1e-5
    assert float(jnp.max(jnp.abs(out_x.image - out_p.image))) < img_tol
    for gx, gp in zip(g_x, g_p):
        scale = float(jnp.max(jnp.abs(gx))) + 1e-12
        assert float(jnp.max(jnp.abs(gx - gp))) / scale < 2e-2


def test_segmented_grad_reduce_impl_parity():
    """The three segred impls (padded scan, dense flat scan, block MXU matmul) are the
    same decomposition — results must match to f32 roundoff, including empty segments,
    segments spanning block boundaries, and the aligned-slot sentinel."""
    from tpu_splat.ops.pallas.raster import segmented_grad_reduce

    rng = np.random.default_rng(7)
    n, max_inst, max_al, width = 50, 512, 640, 10
    # random contiguous segments over emission order (some empty)
    counts = rng.integers(0, 40, n)
    counts[rng.random(n) < 0.2] = 0
    counts = (counts * (max_inst - 1) // max(counts.sum(), 1)).astype(np.int32)
    seg_e = np.cumsum(counts).astype(np.int32)
    seg_s = (seg_e - counts).astype(np.int32)
    rank = np.repeat(np.arange(n, dtype=np.int32), counts)
    rank = np.pad(rank, (0, max_inst - rank.size), constant_values=n)
    qem = np.full(max_inst, max_al, np.int32)
    used = int(counts.sum())
    qem[:used] = rng.permutation(max_al)[:used]
    ginst = rng.normal(0, 1, (max_al, width)).astype(np.float32)

    args = (jnp.asarray(ginst), jnp.asarray(qem), jnp.asarray(rank),
            jnp.asarray(seg_s), jnp.asarray(seg_e))
    a = segmented_grad_reduce(*args, gather_dtype=jnp.float32, impl="pad_scan")
    b = segmented_grad_reduce(*args, gather_dtype=jnp.float32, impl="flat_scan")
    c = segmented_grad_reduce(*args, gather_dtype=jnp.float32, impl="block_mm")
    d = segmented_grad_reduce(*args, gather_dtype=jnp.float32, impl="pallas_mm")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=1e-5, atol=1e-4)
    # bf16 lane: block_mm must match pad_scan at the SAME gather quantization
    a16 = segmented_grad_reduce(*args, gather_dtype=jnp.bfloat16, impl="pad_scan")
    c16 = segmented_grad_reduce(*args, gather_dtype=jnp.bfloat16, impl="block_mm")
    d16 = segmented_grad_reduce(*args, gather_dtype=jnp.bfloat16, impl="pallas_mm")
    np.testing.assert_allclose(np.asarray(a16), np.asarray(c16), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(d16), rtol=1e-5, atol=1e-4)
    # oracle: plain per-segment sums of the emission-gathered rows
    gp = np.concatenate([ginst, np.zeros((1, width), np.float32)], 0)
    ge = gp[np.minimum(qem, max_al)]
    oracle = np.stack([ge[s:e].sum(0) for s, e in zip(seg_s, seg_e)])
    np.testing.assert_allclose(np.asarray(a), oracle, rtol=1e-4, atol=1e-4)


def test_blend_kernel_variants_parity():
    """Kernel-level A/B variants (hardware-tuning flags) against the default path, in
    interpret mode: sigma_mm (quadratic-form MXU sigma, budget ~1e-3), approx_recip
    (~0.8% on grads), block_scan on/off (exact decomposition)."""
    from tpu_splat.ops.pallas.blend import NFEAT, blend_backward, blend_forward

    rng = np.random.default_rng(3)
    TS, GW, GH, CH = 16, 3, 2, 256
    n_tiles, P, n_rows, max_chunks = GW * GH, TS * TS, 12, 2
    N = n_rows * CH
    s = rng.uniform(1.0, 4.0, N)
    ca = 1 / (s * s)
    cc = 1 / (s * s * rng.uniform(0.5, 2.0, N))
    feats = np.stack(
        [rng.uniform(0, GW * TS, N), rng.uniform(0, GH * TS, N), ca,
         rng.uniform(-0.3, 0.3, N) * np.sqrt(ca * cc), cc,
         rng.uniform(0.1, 1.0, N)] + [rng.uniform(0, 1, N)] * 3
        + [rng.uniform(1, 10, N)], 1).astype(np.float32)
    # flat feature-major table; CONTIGUOUS UNALIGNED segments (tail chunks overlap the
    # next tile's columns — exercises the lane-masked read/write overlap resolution)
    flat = np.zeros((NFEAT, N + max_chunks * CH + 128), np.float32)
    flat[:10, :N] = feats.T
    flat = jnp.asarray(flat)
    count = jnp.asarray([512, 512, 500, 512, 100, 300], jnp.int32)
    seg_start = jnp.asarray([0, 512, 1024, 1524, 2036, 2136], jnp.int32)
    kw = dict(n_tiles=n_tiles, grid_w=GW, tile_size=TS, max_chunks=max_chunks,
              chunk=CH, interpret=True)

    o0, c0 = blend_forward(flat, seg_start, count, **kw)
    o1, _ = blend_forward(flat, seg_start, count, sigma_mm=True, **kw)
    assert float(jnp.max(jnp.abs(o0 - o1)[:, :, :4])) < 2e-3
    # base-2 transcendental lane: value-identical math (exp2(LOG2E*x) == exp(x)),
    # only rounding differs
    o2, _ = blend_forward(flat, seg_start, count, base2=True, **kw)
    assert float(jnp.max(jnp.abs(o0 - o2)[:, :, :4])) < 1e-5

    gout = jnp.asarray(rng.normal(0, 0.3, (n_tiles, P, 8)).astype(np.float32))
    # reference: the exact stacked-product reduction, exact divides, split matmuls
    exact = dict(basis_red=False, approx_recip=False, lowp=False)
    g0 = blend_backward(flat, seg_start, count, c0, o0, gout, **exact, **kw)
    scale = float(jnp.max(jnp.abs(g0))) + 1e-12
    for extra, tol in (
        # basis_red moment form at split precision (~2^-16 matmul split)
        (dict(approx_recip=False, lowp=False), 1e-3),
        # lowp default: single-bf16 prefix + moment matmuls (~2^-8 pre-sum)
        (dict(approx_recip=False), 1e-2),
        (dict(), 2e-2),  # default path: lowp + approx reciprocals (~2^-12)
        (dict(block_scan=False, **exact), 1e-5),
        (dict(red_sum=True, **exact), 1e-5),
        # quadratic-form sigma on the MXU in the backward (~1e-3 on sigma -> alphas)
        (dict(sigma_mm=True, approx_recip=False, lowp=False), 5e-3),
        # base-2 transcendentals: value-identical, rounding-only differences
        (dict(base2=True, **exact), 1e-4),
    ):
        g1 = blend_backward(flat, seg_start, count, c0, o0, gout, **extra, **kw)
        assert float(jnp.max(jnp.abs(g0 - g1))) / scale < tol, extra
    # overlap/ownership invariant: columns past each tile's count up to the next start
    # (and the padded tail) hold ZERO gradients
    g = np.asarray(g0)
    starts = np.asarray(seg_start)
    cnts = np.asarray(count)
    for t in range(n_tiles):
        lo = int(starts[t] + cnts[t])
        hi = int(starts[t + 1]) if t + 1 < n_tiles else g.shape[1]
        assert np.all(g[:, lo:hi] == 0.0), t
