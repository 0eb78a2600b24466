"""Unit tests: SSIM vs direct numpy, fused Adam vs manual reference, MCMC relocation math
(mirrors the reference's oracle-per-op strategy, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.ops.ssim import ssim
from tpu_splat.training.optim import (
    AdamState, adam_step, init_adam_state, means_lr_at, zero_moments_at,
)
from tpu_splat.training.strategy_mcmc import relocation_new_params, _relocation_table


def _ssim_numpy(a, b):
    """Direct per-pixel SSIM, 11x11 gaussian sigma=1.5, valid padding."""
    from scipy.ndimage import convolve  # noqa — fallback below if scipy absent

    x = np.arange(11) - 5
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()
    win = np.outer(g, g)
    c1, c2 = 0.01**2, 0.03**2

    def blur(img):
        out = np.zeros((img.shape[0], img.shape[1] - 10, img.shape[2] - 10), np.float64)
        for c in range(img.shape[0]):
            for i in range(out.shape[1]):
                for j in range(out.shape[2]):
                    out[c, i, j] = np.sum(img[c, i : i + 11, j : j + 11] * win)
        return out

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1**2
    s2 = blur(b * b) - mu2**2
    s12 = blur(a * b) - mu1 * mu2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 * 1 + s2 + c2))
    return m.mean()


def test_ssim_matches_direct():
    rng = np.random.default_rng(0)
    a = rng.random((3, 24, 20)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    want = _ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    # exact math check in f64 (the E[x^2]-mu^2 form cancels catastrophically in f32)
    with jax.enable_x64():
        got64 = float(ssim(jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64)))
    assert abs(got64 - want) < 1e-8, (got64, want)
    # f32 production path within cancellation noise (reference CUDA kernel is f32 too)
    got32 = float(jax.jit(ssim)(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got32 - want) < 2e-3, (got32, want)


def test_ssim_identical_images():
    a = jnp.asarray(np.random.default_rng(1).random((3, 32, 32)), jnp.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6


def test_adam_matches_manual():
    rng = np.random.default_rng(2)
    params = {k: jnp.asarray(rng.normal(0, 1, (7, 3)).astype(np.float32))
              for k in ("means", "sh0", "shN", "scaling_raw", "rotation_raw", "opacity_raw")}
    grads = {k: jnp.asarray(rng.normal(0, 1, (7, 3)).astype(np.float32)) for k in params}
    state = init_adam_state(params)
    lrs = {k: 0.01 for k in params}

    new_params, state2 = adam_step(params, grads, state, lrs, iteration=jnp.int32(2000))

    for k in params:
        g = np.asarray(grads[k], np.float64)
        m = 0.1 * g
        v = 0.001 * g * g
        mhat = m / (1 - 0.9)
        vhat = v / (1 - 0.999)
        want = np.asarray(params[k], np.float64) - 0.01 * mhat / (np.sqrt(vhat) + 1e-15)
        np.testing.assert_allclose(np.asarray(new_params[k]), want, rtol=2e-5, atol=1e-6)


def test_adam_shn_warmup_freeze():
    params = {k: jnp.ones((4, 2)) for k in ("means", "shN")}
    grads = {k: jnp.ones((4, 2)) for k in params}
    state = init_adam_state(params)
    lrs = {k: 0.1 for k in params}
    new_params, st = adam_step(params, grads, state, lrs, iteration=jnp.int32(500))
    assert np.allclose(np.asarray(new_params["shN"]), 1.0)  # frozen (iter <= 1000)
    assert not np.allclose(np.asarray(new_params["means"]), 1.0)
    assert int(st.step_count["shN"]) == 1  # counter still advances (fused_adam.cpp:66-70)
    new_params2, _ = adam_step(params, grads, state, lrs, iteration=jnp.int32(1001))
    assert not np.allclose(np.asarray(new_params2["shN"]), 1.0)


def test_means_lr_schedule():
    lr0 = 1.6e-4
    total = 30000
    assert abs(float(means_lr_at(lr0, 0, total)) - lr0) < 1e-9  # f32 representation
    assert abs(float(means_lr_at(lr0, total, total)) - lr0 * 0.01) / (lr0 * 0.01) < 1e-4


def test_zero_moments_at():
    params = {"means": jnp.ones((5, 3))}
    st = init_adam_state(params)
    st = AdamState(
        exp_avg={"means": jnp.ones((5, 3))},
        exp_avg_sq={"means": jnp.ones((5, 3))},
        step_count=st.step_count,
    )
    mask = jnp.asarray([True, False, True, False, False])
    st2 = zero_moments_at(st, mask)
    assert np.allclose(np.asarray(st2.exp_avg["means"])[0], 0)
    assert np.allclose(np.asarray(st2.exp_avg["means"])[1], 1)


def test_relocation_matches_reference_double_loop():
    """Vectorized table form vs the kernel's literal double loop (RelocationCUDA.cu:29-42)."""
    binoms = np.zeros((51, 51), np.float32)
    for n in range(51):
        b = 1.0
        for k in range(n + 1):
            binoms[n, k] = b
            b = b * (n - k) / (k + 1)

    rng = np.random.default_rng(3)
    opacity = rng.uniform(0.01, 0.99, 16).astype(np.float32)
    scale = rng.uniform(0.01, 1.0, (16, 3)).astype(np.float32)
    ratio = rng.integers(1, 51, 16).astype(np.int32)

    new_op, new_scale = relocation_new_params(
        jnp.asarray(opacity), jnp.asarray(scale), jnp.asarray(ratio)
    )
    for idx in range(16):
        n_idx = int(ratio[idx])
        want_op = 1.0 - (1.0 - float(opacity[idx])) ** (1.0 / n_idx)
        denom = 0.0
        for i in range(1, n_idx + 1):
            for k in range(i):
                denom += binoms[i - 1, k] * ((-1.0) ** k / np.sqrt(k + 1)) * want_op ** (k + 1)
        coeff = opacity[idx] / denom
        np.testing.assert_allclose(float(new_op[idx]), want_op, rtol=2e-3)  # f32, same as ref kernel
        np.testing.assert_allclose(np.asarray(new_scale[idx]), coeff * scale[idx], rtol=5e-3)


def test_lpips_architecture_forward():
    """LPIPS-VGG forward matches a hand-rolled numpy oracle on tiny synthetic weights
    (so the metric is trustworthy once real weights are fetched —
    tools/fetch_lpips_weights.py; offline builds report None like the reference
    without weights/lpips_vgg.pt)."""
    import numpy as np
    from tpu_splat.training import lpips as L

    rng = np.random.default_rng(0)
    params = {}
    cin = 3
    li = 0
    for ch, n_convs in L.VGG_BLOCKS:
        for _ in range(n_convs):
            params[f"conv{li}_w"] = jnp.asarray(
                rng.normal(0, 0.1, (ch, cin, 3, 3)).astype(np.float32))
            params[f"conv{li}_b"] = jnp.asarray(
                rng.normal(0, 0.01, (ch,)).astype(np.float32))
            cin = ch
            li += 1
    for i, (ch, _) in enumerate(L.VGG_BLOCKS):
        params[f"lin{i}_w"] = jnp.asarray(
            rng.uniform(0, 0.1, (1, ch, 1, 1)).astype(np.float32))

    a = jnp.asarray(rng.random((1, 3, 32, 32), np.float32))
    b = jnp.asarray(rng.random((1, 3, 32, 32), np.float32))
    val = float(L._lpips_fn(params, a, b))
    assert np.isfinite(val) and val > 0
    assert float(L._lpips_fn(params, a, a)) < 1e-8  # identical images -> 0

    # numpy oracle for the first tap: conv(3x3 same) + relu + unit-norm + sq-diff + lin
    import scipy.signal as sp  # noqa: F401  (absent: fall back to manual conv)
    def conv_np(x, w, bias):
        n, c, h, ww = x.shape
        o = w.shape[0]
        xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = np.zeros((n, o, h, ww), np.float32)
        for oc in range(o):
            acc = np.zeros((n, h, ww), np.float32)
            for ic in range(c):
                for dy in range(3):
                    for dx in range(3):
                        acc += w[oc, ic, dy, dx] * xp[:, ic, dy:dy + h, dx:dx + ww]
            out[:, oc] = acc + bias[oc]
        return out

    shift = L.SHIFT.reshape(1, 3, 1, 1)
    scale = L.SCALE.reshape(1, 3, 1, 1)
    xa = (2 * np.asarray(a) - 1 - shift) / scale
    h = np.maximum(conv_np(xa, np.asarray(params["conv0_w"]), np.asarray(params["conv0_b"])), 0)
    fa = np.asarray(L.vgg_features(params, jnp.asarray(xa))[0])
    h2 = np.maximum(conv_np(h, np.asarray(params["conv1_w"]), np.asarray(params["conv1_b"])), 0)
    np.testing.assert_allclose(fa, h2, atol=1e-3)
