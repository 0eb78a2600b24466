"""Round-3 kernel A/Bs on hardware: block-decomposed MXU scans (chunk=256), packed
single-key sort, red_sum vs M=1 matmul reduction, bf16 feature pack through the kernels.

Honest timing: dependent chains with a device_get sync (block_until_ready does not
synchronize through the axon tunnel).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import align_segments, build_sorted_instances
from tpu_splat.ops.pallas.blend import NFEAT, blend_backward, blend_forward


def pack_features(p, gid, n_rows=None, chunk=None, feat_bf16=False):
    m2d, con, op, col, dep = p.mean2d, p.conic, p.opacity, p.color, p.depth
    col = jnp.maximum(col, 0.0)
    if feat_bf16:
        def split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mxh, mxl = split(m2d[:, 0])
        myh, myl = split(m2d[:, 1])
        cah, cal = split(con[:, 0])
        cbh, cbl = split(con[:, 1])
        cch, ccl = split(con[:, 2])
        b = jnp.bfloat16
        feats = jnp.stack(
            [mxh, mxl, myh, myl, cah, cal, cbh, cbl, cch, ccl,
             op.astype(b), col[:, 0].astype(b), col[:, 1].astype(b),
             col[:, 2].astype(b), dep.astype(b)], axis=1)
    else:
        feats = jnp.stack([m2d[:, 0], m2d[:, 1], con[:, 0], con[:, 1], con[:, 2],
                           op, col[:, 0], col[:, 1], col[:, 2], dep], axis=1)
    g = jax.lax.optimization_barrier(feats[gid])
    packed = jnp.pad(g, ((0, 0), (0, NFEAT - feats.shape[1])))
    return packed.reshape(n_rows, chunk, NFEAT).transpose(0, 2, 1)

N = 1_000_000
W, H = 1296, 840
TS = 32
GW, GH = -(-W // TS), -(-H // TS)
N_TILES = GW * GH
MAX_INST = 1 << 21
K_MAX = 2048
CH = 256
MAX_CHUNKS = ((K_MAX + CH - 1) // CH * CH) // CH

splat, cam = build_workload(N, W, H)
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])

results = {}


def chain(name, fn, x0, *args, iters=8):
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = ms
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
print(f"total={int(inst.total_instances)} max_tile={int(inst.max_tile_count)}", flush=True)

# ---- sort variant A/B
for pk in (True, False):
    chain(f"build_sorted_instances packed_key={pk}",
          lambda x, p, _pk=pk: jnp.square(build_sorted_instances(
              p._replace(mean2d=p.mean2d + x), GW, GH, MAX_INST, TS, packed_key_sort=_pk
          ).sorted_tile_id.astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), proj)

# numerical check: packed-key vs 2-key ordering end state
@jax.jit
def sortdiff(p):
    a = build_sorted_instances(p, GW, GH, MAX_INST, TS, packed_key_sort=True)
    b = build_sorted_instances(p, GW, GH, MAX_INST, TS, packed_key_sort=False)
    # gid sets per tile must match; compare tile_start/count and sorted gid sums per tile
    return (jnp.abs(a.tile_start - b.tile_start).max(),
            jnp.abs(a.tile_count - b.tile_count).max(),
            jnp.abs(jnp.sort(a.sorted_gid) - jnp.sort(b.sorted_gid)).max())

d = sortdiff(proj)
print("packed-key diffs (tile_start, tile_count, gid-set):", [int(v) for v in d], flush=True)

aligned = jax.tree.map(jax.device_put,
                       jax.jit(lambda i: align_segments(i, N_TILES, MAX_CHUNKS, CH))(inst))
row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows = aligned
max_aligned, n_rows = int(max_aligned), int(n_rows)

statics = dict(n_tiles=N_TILES, grid_w=GW, tile_size=TS, max_chunks=MAX_CHUNKS, chunk=CH)

for bf16 in (False, True):
    packed = jax.device_put(jax.jit(functools.partial(
        pack_features, n_rows=n_rows, chunk=CH, feat_bf16=bf16))(proj, aligned_gid))
    tag = "bf16" if bf16 else "f32 "

    for bs in (True, False):
        chain(f"fwd [{tag}] block_scan={bs}",
              lambda x, pk, rs, cc, _bs=bs: jnp.square(
                  blend_forward(pk + x.astype(pk.dtype), rs, cc, block_scan=_bs,
                                **statics)[0][:, :, :4]).sum() * 1e-9,
              jnp.float32(0), packed, row_start, count_capped)
    chain(f"fwd [{tag}] sigma_mm",
          lambda x, pk, rs, cc: jnp.square(
              blend_forward(pk + x.astype(pk.dtype), rs, cc, sigma_mm=True,
                            **statics)[0][:, :, :4]).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped)

    out, chk = jax.tree.map(jax.device_put, jax.jit(functools.partial(
        blend_forward, **statics))(packed, row_start, count_capped))
    gout = jax.device_put(jnp.ones((N_TILES, TS * TS, 8), jnp.float32) * 0.1)

    for bs in (True, False):
        for rsum in (False, True):
            chain(f"bwd [{tag}] block_scan={bs} red_sum={rsum}",
                  lambda x, pk, rs, cc, ck, o, g, _bs=bs, _rs=rsum: jnp.square(
                      blend_backward(pk + x.astype(pk.dtype), rs, cc, ck, o, g,
                                     block_scan=_bs, red_sum=_rs,
                                     grad_dtype=jnp.bfloat16, **statics)
                      .astype(jnp.float32)).sum() * 1e-9,
                  jnp.float32(0), packed, row_start, count_capped, chk, out, gout)
    chain(f"bwd [{tag}] approx_recip",
          lambda x, pk, rs, cc, ck, o, g: jnp.square(
              blend_backward(pk + x.astype(pk.dtype), rs, cc, ck, o, g,
                             approx_recip=True, grad_dtype=jnp.bfloat16, **statics)
              .astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped, chk, out, gout)

    # block_scan numerics vs full triangle (hardware)
    @functools.partial(jax.jit, static_argnames=())
    def bsdiff(pk, rs, cc, ck, o, g):
        a = blend_backward(pk, rs, cc, ck, o, g, block_scan=True, **statics)
        b = blend_backward(pk, rs, cc, ck, o, g, block_scan=False, **statics)
        denom = jnp.maximum(jnp.abs(b).max(), 1e-6)
        fa = blend_forward(pk, rs, cc, block_scan=True, **statics)[0]
        fb = blend_forward(pk, rs, cc, block_scan=False, **statics)[0]
        return jnp.abs(a - b).max() / denom, jnp.abs(fa - fb).max()

    d1, d2 = bsdiff(packed, row_start, count_capped, chk, out, gout)
    print(f"[{tag}] block_scan rel bwd diff {float(d1):.2e}  fwd abs diff {float(d2):.2e}",
          flush=True)

print({k: round(v, 2) for k, v in results.items()})


# ---- GUT kernel A/B: v = M d on MXU (vmm) vs VPU
def gut_ab():
    from tpu_splat.ops.cameras import CameraParams
    from tpu_splat.ops.gut import rasterize_gut

    sp = splat
    gp = CameraParams(radial=(0.03, 0, 0, 0, 0, 0))

    def step(m, vmm):
        def loss(mm_):
            out = rasterize_gut(
                mm_, sp.scaling_raw, sp.rotation_raw, sp.opacity_raw, sp.sh0, sp.shN,
                sp.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"],
                cam["cx"], cam["cy"], 3, jnp.zeros(3, jnp.float32),
                width=W, height=H, max_instances=MAX_INST, k_max=K_MAX,
                cam_params=gp, kernel_vmm=vmm)
            return jnp.sum(out.image)
        return m + 1e-9 * jax.grad(loss)(m)

    for vmm in (False, True):
        f = jax.jit(lambda m, _v=vmm: step(m, _v))
        m = f(sp.means)
        _ = float(m[0, 0])
        t0 = time.perf_counter()
        for _ in range(6):
            m = f(m)
        _ = float(m[0, 0])
        ms = (time.perf_counter() - t0) / 6 * 1e3
        results[f"gut fwd+bwd vmm={vmm}"] = ms
        print(f"gut fwd+bwd vmm={vmm:d} {ms:9.2f} ms", flush=True)


if len(sys.argv) > 1 and "gut" in sys.argv[1:]:
    gut_ab()
    print({k: round(v, 2) for k, v in results.items()})
