"""Decompose mcmc noise + ssim costs; try alternatives."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.quat import quat_to_rotmat
from tpu_splat.ops.ssim import ssim

N = 1_000_000
W, H = 1296, 840
splat, cam = build_workload(N, W, H)


def chain(name, fn, x0, *args, iters=10):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


key = jax.random.key(0)
chain("random.normal [1M,3]", lambda x, k: jnp.sum(
    jax.random.normal(jax.random.fold_in(k, jnp.int32(x)), (N, 3))), jnp.float32(0), key)
chain("quat_to_rotmat", lambda x, q: jnp.sum(quat_to_rotmat(q + x)), jnp.float32(0),
      splat.rotation_raw)

eps0 = jax.device_put(np.random.default_rng(0).standard_normal((N, 3), np.float32))


def cov_route(q, s, eps):
    rot = quat_to_rotmat(q)
    var = jnp.exp(2.0 * s)
    cov = (rot * var[:, None, :]) @ jnp.swapaxes(rot, -1, -2)
    return jnp.sum(jnp.einsum("nij,nj->ni", cov, eps))


def matvec_route(q, s, eps):
    rot = quat_to_rotmat(q)
    var = jnp.exp(2.0 * s)
    t = jnp.einsum("nji,nj->ni", rot, eps)
    return jnp.sum(jnp.einsum("nij,nj->ni", rot, var * t))


chain("noise: cov route", lambda x, q, s, e: cov_route(q + x, s, e), jnp.float32(0),
      splat.rotation_raw, splat.scaling_raw, eps0)
chain("noise: matvec route", lambda x, q, s, e: matvec_route(q + x, s, e), jnp.float32(0),
      splat.rotation_raw, splat.scaling_raw, eps0)

# ssim variants
img = jax.device_put(jnp.linspace(0, 1, 3 * H * W, dtype=jnp.float32).reshape(3, H, W))
gt = jax.device_put(jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32)))
chain("ssim (conv) fwd+bwd", lambda x, im, g: jax.grad(
    lambda i: 1 - ssim(i, g))(im + x).sum(), jnp.float32(0), img, gt)


def _kernel11():
    x = np.arange(11) - 5.0
    g = np.exp(-(x**2) / (2.0 * 1.5**2))
    return (g / g.sum()).astype(np.float32)


K11 = _kernel11()


def blur_shift(img4):  # [B,C,H,W] valid blur via shifted adds
    b, c, h, w = img4.shape
    outw = jnp.zeros((b, c, h, w - 10), img4.dtype)
    for i, wgt in enumerate(K11):
        outw = outw + wgt * img4[:, :, :, i : w - 10 + i]
    out = jnp.zeros((b, c, h - 10, w - 10), img4.dtype)
    for i, wgt in enumerate(K11):
        out = out + wgt * outw[:, :, i : h - 10 + i, :]
    return out


def ssim_shift(a, b):
    a, b = a[None], b[None]
    mu1, mu2 = blur_shift(a), blur_shift(b)
    s1 = blur_shift(a * a) - mu1 * mu1
    s2 = blur_shift(b * b) - mu2 * mu2
    s12 = blur_shift(a * b) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


chain("ssim (shifted adds) fwd+bwd", lambda x, im, g: jax.grad(
    lambda i: 1 - ssim_shift(i, g))(im + x).sum(), jnp.float32(0), img, gt)

v = float(ssim(img, gt)), float(ssim_shift(img, gt))
print("ssim parity:", v, abs(v[0] - v[1]))
