"""Localize the +39 ms all-param backward cost (profile_stepgap2 A->B): SH chain vs
covariance chain vs opacity. Same dependent-chain timing."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.rasterize import rasterize
from tpu_splat.training.losses import photometric_loss

N = 1_000_000
W, H = 1296, 840
splat, cam = build_workload(N, W, H)
gt = jax.device_put(jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32)))
raster_kw = dict(width=W, height=H, max_instances=1 << 21, k_max=2048, chunk=256,
                 tile_size=32)
alive = splat.alive
cam_args = (cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])
params0 = splat.params()


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 1e-30 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms


def render_loss(params):
    out = rasterize(
        params["means"], params["scaling_raw"], params["rotation_raw"],
        params["opacity_raw"], params["sh0"], params["shN"], alive,
        *cam_args, 3, jnp.zeros(3, jnp.float32), **raster_kw)
    return photometric_loss(out.image, gt, 0.2)


def make(keys):
    def fn(x, p):
        pp = dict(p, means=p["means"] + x)

        def loss(sub):
            return render_loss(dict(pp, **sub))

        g = jax.grad(loss)({k: pp[k] for k in keys})
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    return fn


chain("A grad means", make(("means",)), jnp.float32(0), params0)
chain("B grad means+sh0+shN", make(("means", "sh0", "shN")), jnp.float32(0), params0)
chain("C grad means+scal+rot", make(("means", "scaling_raw", "rotation_raw")),
      jnp.float32(0), params0)
chain("D grad means+opacity", make(("means", "opacity_raw")), jnp.float32(0), params0)
chain("E grad all", make(tuple(params0.keys())), jnp.float32(0), params0)
