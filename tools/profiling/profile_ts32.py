"""Full-step timing at tile_size 16 vs 32 (everything else unchanged)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.training.train_step import (
    RasterPlan, StepConfig, init_train_state, train_step)

N = 1_000_000
W, H = 1296, 840
splat, cam = build_workload(N, W, H)
gt = jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32))
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        jnp.zeros(3, jnp.float32), jnp.int32(0))


def run(name, plan, iters=8):
    ts = init_train_state(splat)
    kw = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
    ts2, st = train_step(ts, *args, **kw)
    tot, mx = int(st.total_instances), int(st.max_tile_count)
    _ = float(st.loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts2, st = train_step(ts2, *args, **kw)
    _ = float(st.loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {ms:9.2f} ms   total_inst={tot} max_tile={mx}", flush=True)


run("ts=16 (4.2M budget, kmax 1024)", RasterPlan(max_instances=1 << 22, k_max=1 << 10,
                                                 tile_size=16))
run("ts=32 (2.0M budget, kmax 4096)", RasterPlan(max_instances=1 << 21, k_max=1 << 12,
                                                 tile_size=32))
run("ts=32 (1.75M budget)", RasterPlan(max_instances=1792 * 1024, k_max=1 << 12,
                                       tile_size=32))

run("ts=32 c=256 (2.0M budget)", RasterPlan(max_instances=1 << 21, k_max=1 << 12,
                                            chunk=256, tile_size=32))
run("ts=16 c=256 (3.5M budget)", RasterPlan(max_instances=3584 * 1024, k_max=1 << 10,
                                            chunk=256, tile_size=16))
run("ts=32 c=128 (2.0M budget)", RasterPlan(max_instances=1 << 21, k_max=1 << 12,
                                            chunk=128, tile_size=32))
