"""Bisect the D->E gap of profile_stepgap.py: fwd+bwd(means) 188ms vs full step 277ms.

Cumulative chains over the same REAL graph; the marginal cost of each added piece is the
row delta. Run on TPU: `python tools/profiling/profile_stepgap2.py`.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.rasterize import rasterize
from tpu_splat.training.train_step import (RasterPlan, StepConfig, init_train_state,
                                           train_step)
from tpu_splat.training.losses import photometric_loss, regularization_losses
from tpu_splat.training.optim import adam_step, group_lrs, init_adam_state, means_lr_at
from tpu_splat.training import strategy_mcmc

N = 1_000_000
W, H = 1296, 840
TS = 32
CH = 256
MAX_INST = 1 << 21
K_MAX = 2048

splat, cam = build_workload(N, W, H)
gt = jax.device_put(jnp.asarray(
    np.random.default_rng(1).random((3, H, W), np.float32)))
raster_kw = dict(width=W, height=H, max_instances=MAX_INST, k_max=K_MAX, chunk=CH,
                 tile_size=TS)
alive = splat.alive
cam_args = (cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])
opt = StepConfig()
lrs0 = dict(group_lrs(opt, 1.0))


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms


def render_loss(params, m2d_off=None):
    out = rasterize(
        params["means"], params["scaling_raw"], params["rotation_raw"],
        params["opacity_raw"], params["sh0"], params["shN"], alive,
        *cam_args, 3, jnp.zeros(3, jnp.float32),
        **raster_kw, **({} if m2d_off is None else dict(mean2d_offset=m2d_off)))
    return photometric_loss(out.image, gt, 0.2)


params0 = splat.params()


# A. grad wrt means only (photometric loss) — reference point vs stepgap row D
def a_fn(x, p):
    pp = dict(p, means=p["means"] + x)
    g = jax.grad(lambda m: render_loss(dict(pp, means=m)))(pp["means"])
    return jnp.sum(g) * 1e-3


chain("A bwd means-only (photo loss)", a_fn, jnp.float32(0), params0)


# B. grad wrt ALL param groups
def b_fn(x, p):
    pp = dict(p, means=p["means"] + x)
    g = jax.grad(lambda q: render_loss(q))(pp)
    return sum(jnp.sum(v) for v in jax.tree.leaves(g)) * 1e-3


chain("B bwd all params (photo loss)", b_fn, jnp.float32(0), params0)


# C. + mean2d_offset cotangent (argnums (0,1) like train_step)
def c_fn(x, p):
    pp = dict(p, means=p["means"] + x)
    z = jnp.zeros((N, 2), jnp.float32)
    g, g2 = jax.grad(lambda q, m2: render_loss(q, m2), argnums=(0, 1))(pp, z)
    return (sum(jnp.sum(v) for v in jax.tree.leaves(g)) + jnp.sum(g2)) * 1e-3


chain("C + mean2d_offset grads", c_fn, jnp.float32(0), params0)


# D. + regularization losses
def d_fn(x, p):
    pp = dict(p, means=p["means"] + x)
    z = jnp.zeros((N, 2), jnp.float32)

    def loss(q, m2):
        return render_loss(q, m2) + regularization_losses(q, alive, 0.01, 0.01)

    g, g2 = jax.grad(loss, argnums=(0, 1))(pp, z)
    return (sum(jnp.sum(v) for v in jax.tree.leaves(g)) + jnp.sum(g2)) * 1e-3


chain("D + reg losses", d_fn, jnp.float32(0), params0)

# E. + adam update
adam0 = init_adam_state(params0)


def e_fn(x, p, ad):
    pp = dict(p, means=p["means"] + x)
    z = jnp.zeros((N, 2), jnp.float32)

    def loss(q, m2):
        return render_loss(q, m2) + regularization_losses(q, alive, 0.01, 0.01)

    g, g2 = jax.grad(loss, argnums=(0, 1))(pp, z)
    lrs = dict(lrs0)
    lrs["means"] = means_lr_at(lrs["means"], jnp.float32(0), 30_000)
    newp, _ = adam_step(pp, g, ad, lrs, jnp.int32(1))
    return (sum(jnp.sum(v) for v in jax.tree.leaves(newp)) + jnp.sum(g2)) * 1e-9


chain("E + adam", e_fn, jnp.float32(0), params0, adam0)


# F. + mcmc noise
def f_fn(x, p, ad, sp):
    pp = dict(p, means=p["means"] + x)
    z = jnp.zeros((N, 2), jnp.float32)

    def loss(q, m2):
        return render_loss(q, m2) + regularization_losses(q, alive, 0.01, 0.01)

    g, g2 = jax.grad(loss, argnums=(0, 1))(pp, z)
    lrs = dict(lrs0)
    lrs["means"] = means_lr_at(lrs["means"], jnp.float32(0), 30_000)
    newp, _ = adam_step(pp, g, ad, lrs, jnp.int32(1))
    ns = sp.replace_params(newp)
    ns = strategy_mcmc.inject_noise(ns, jax.random.key(0), lrs["means"])
    return (sum(jnp.sum(v) for v in jax.tree.leaves(ns.params())) + jnp.sum(g2)) * 1e-9


chain("F + mcmc noise", f_fn, jnp.float32(0), params0, adam0, splat)

# G. FULL train_step (for reference)
ts0 = init_train_state(splat)
plan = RasterPlan(max_instances=MAX_INST, k_max=K_MAX, chunk=CH, tile_size=TS)
args = (gt, *cam_args, jnp.zeros(3, jnp.float32), jnp.int32(0))
kw = dict(width=W, height=H, plan=plan, opt=opt, total_iterations=30_000)
ts1, st = train_step(ts0, *args, **kw)
_ = float(st.loss)
t0 = time.perf_counter()
K = 8
tsx = ts1
for _ in range(K):
    tsx, st = train_step(tsx, *args, **kw)
_ = float(st.loss)
print(f"{'G FULL train_step':52s} {(time.perf_counter() - t0) / K * 1e3:9.2f} ms",
      flush=True)
