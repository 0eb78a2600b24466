"""Minimal standalone blend_forward / blend_backward debug."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.ops.pallas.blend import blend_forward, blend_backward, CHUNK, NFEAT

T = 4          # tiles (grid 2x2)
GW = 2
TS = 16
P = TS * TS
MAXC = 4
R = 16         # rows

rng = np.random.default_rng(0)
packed = np.zeros((R, NFEAT, CHUNK), np.float32)
# tile t segment: rows [t*2, t*2+2): 200 instances per tile
row_start = np.arange(T, dtype=np.int32) * 2
count = np.full(T, 200, np.int32)
for t in range(T):
    for j in range(2):
        n_in = min(200 - j * CHUNK, CHUNK)
        mx = rng.uniform(t % GW * TS, (t % GW + 1) * TS, CHUNK)
        my = rng.uniform(t // GW * TS, (t // GW + 1) * TS, CHUNK)
        packed[row_start[t] + j, 0, :] = mx
        packed[row_start[t] + j, 1, :] = my
        packed[row_start[t] + j, 2, :] = 0.5   # ca
        packed[row_start[t] + j, 3, :] = 0.0   # cb
        packed[row_start[t] + j, 4, :] = 0.5   # cc
        packed[row_start[t] + j, 5, :] = 0.6   # opacity
        packed[row_start[t] + j, 6, :] = rng.uniform(0, 1, CHUNK)
        packed[row_start[t] + j, 7, :] = rng.uniform(0, 1, CHUNK)
        packed[row_start[t] + j, 8, :] = rng.uniform(0, 1, CHUNK)

packed = jnp.asarray(packed)
row_start = jnp.asarray(row_start)
count = jnp.asarray(count)

out, chk = blend_forward(packed, row_start, count, n_tiles=T, grid_w=GW, tile_size=TS,
                         max_chunks=MAXC)
out = np.asarray(out)
chk = np.asarray(chk)
print("fwd OK. out rgb mean", out[:, :, :3].mean(), "T mean", out[:, :, 3].mean())
print("chk col0 mean", chk[:, :, 0].mean(), "col1 mean", chk[:, :, 1].mean(),
      "col2 (unvisited) mean", chk[:, :, 2].mean())

gout = jnp.asarray(rng.normal(0, 1, (T, P, 8)).astype(np.float32))
gp = blend_backward(packed, row_start, count, jnp.asarray(chk), jnp.asarray(out), gout,
                    n_tiles=T, grid_w=GW, tile_size=TS, max_chunks=MAXC)
gp = np.asarray(gp)
print("bwd OK. gpacked abs mean", np.abs(gp).mean(), "rows 8..16 (unowned):",
      np.abs(gp[8:]).max())
