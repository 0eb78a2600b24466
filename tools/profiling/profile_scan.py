"""Host-dispatch amortization probe: python-loop train_step vs lax.scan over K steps.

The host is single-core and every jit launch pays tunnel RPC + argument handling; if the
per-launch overhead is a measurable slice of the ~190 ms step, folding K steps into ONE
launch (lax.scan over stacked camera inputs) is a product-level win (trainer runs long
uninterrupted stretches between host hooks). This script sizes that win at bench scale
before we build the feature.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.training.train_step import (
    RasterPlan, StepConfig, init_train_state, train_step, train_step_many)

N = 1_000_000
W, H = 1296, 840

splat, cam = build_workload(N, W, H)
ts = init_train_state(splat)
gt = jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32))

plan = RasterPlan(max_instances=2_228_224, k_max=2048, chunk=256, tile_size=32)
kwargs = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))

K = 10


def sync(x):
    _ = float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


# -- python loop lane
for _ in range(3):
    ts2, stats = train_step(ts, *args, **kwargs)
    ts = ts2
sync(stats.loss)
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    ts, stats = train_step(ts, *args, **kwargs)
sync(stats.loss)
loop_ms = (time.perf_counter() - t0) / iters * 1e3
print(f"python-loop: {loop_ms:.1f} ms/step", flush=True)

# -- scan lane (same camera K times: dispatch-overhead isolation, device work identical)
gts = jnp.broadcast_to(gt[None], (K,) + gt.shape)
w2cs = jnp.broadcast_to(cam["w2c"][None], (K, 4, 4))
cpos = jnp.broadcast_to(cam["cam_position"][None], (K, 3))
intr = jnp.broadcast_to(
    jnp.asarray([cam["fx"], cam["fy"], cam["cx"], cam["cy"]], jnp.float32)[None], (K, 4))
bgs = jnp.zeros((K, 3), jnp.float32)
cidx = jnp.zeros((K,), jnp.int32)

ts3, stats = train_step_many(ts, gts, w2cs, cpos, intr, bgs, cidx, **kwargs)
sync(stats.loss)
t0 = time.perf_counter()
reps = 2
for _ in range(reps):
    ts3, stats = train_step_many(ts3, gts, w2cs, cpos, intr, bgs, cidx, **kwargs)
sync(stats.loss)
scan_ms = (time.perf_counter() - t0) / (reps * K) * 1e3
print(f"scan[K={K}]: {scan_ms:.1f} ms/step  (delta {loop_ms - scan_ms:+.1f} ms)",
      flush=True)
