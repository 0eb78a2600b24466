"""project and tiles in separate jits vs fused."""
import time
import jax, jax.numpy as jnp, numpy as np
from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.tiles import build_tile_assignment

N = 1_000_000; W, H = 1296, 840; TS = 16
GW, GH = -(-W // TS), -(-H // TS); MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])

@jax.jit
def jproj(m):
    return project(m, *base, W, H, 3, tile_size=TS)

@jax.jit
def jtiles(p):
    a = build_tile_assignment(p, GW, GH, MAX_INST, TS)
    return a.gaussian_idx.sum() + a.tile_start.sum() + a.total_instances

@jax.jit
def step2(m):
    p = jproj(m)
    s = jtiles(p)
    return m + 0 * s.astype(jnp.float32) * jnp.ones_like(m)

# two separate dispatches chained on host
def run_split(m):
    p = jproj(m)
    s = jtiles(p)
    return m + 0 * np.float32(jax.device_get(s))

m = splat.means
for _ in range(2): m = jax.block_until_ready(run_split(m))
t0 = time.perf_counter()
for _ in range(6): m = jax.block_until_ready(run_split(m))
print(f"split jits: {(time.perf_counter()-t0)/6*1e3:9.2f} ms", flush=True)
