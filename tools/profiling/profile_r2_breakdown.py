"""Round-2 per-stage breakdown of the train step (honest timing: dependent chains,
final device_get sync — see memory: block_until_ready does not sync through the tunnel).

Run: timeout 580 python tools/profiling/profile_r2_breakdown.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload
from tpu_splat.ops.projection import project
from tpu_splat.ops.pallas.raster import (
    align_segments, blend_tiles_pallas, build_sorted_instances, segmented_grad_reduce)
from tpu_splat.ops.pallas.blend import CHUNK, NFEAT, blend_backward, blend_forward
from tpu_splat.ops.rasterize import assemble_image
from tpu_splat.ops.ssim import ssim
from tpu_splat.training.optim import adam_step, group_lrs, init_adam_state
from tpu_splat.training import strategy_mcmc
from tpu_splat.training.train_step import (
    RasterPlan, StepConfig, init_train_state, train_step)

N = 1_000_000
W, H = 1296, 840
TS = 16
GW, GH = -(-W // TS), -(-H // TS)
n_tiles = GW * GH
P = TS * TS
MAX_INST = 1 << 22
splat, cam = build_workload(N, W, H)
gt = jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32))
bg = jnp.zeros(3, jnp.float32)

results = {}


def chain(name, fn, x0, *args, iters=8):
    """fn(x, *args) -> scalar float; dependent chain + device_get sync."""
    step = jax.jit(lambda x, *a: x + 0.0 * fn(x, *a))
    x = step(x0, *args)
    _ = float(x)  # true sync after warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *args)
    _ = float(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = ms
    print(f"{name:40s} {ms:9.2f} ms", flush=True)


# ---- full train step reference points -------------------------------------------------
plan = RasterPlan(max_instances=MAX_INST, k_max=1 << 10, chunk=128)
args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
        bg, jnp.int32(0))


def run_step_chain(name, opt, iters=8):
    ts = init_train_state(splat)
    kw = dict(width=W, height=H, plan=plan, opt=opt, total_iterations=30_000)
    ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, st = train_step(ts, *args, **kw)
    _ = float(st.loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = ms
    print(f"{name:40s} {ms:9.2f} ms", flush=True)


run_step_chain("FULL step (mcmc, ssim)", StepConfig())
run_step_chain("step, no ssim (lambda=0)", StepConfig(lambda_dssim=0.0))
run_step_chain("step, no reg", StepConfig(scale_reg=0.0, opacity_reg=0.0))
run_step_chain("step, default strat (no noise)", StepConfig(strategy="default"))

# ---- loss-side pieces -----------------------------------------------------------------
img = jax.device_put(jnp.linspace(0, 1, 3 * H * W, dtype=jnp.float32).reshape(3, H, W))
chain("ssim fwd+bwd [3,840,1296]",
      lambda x, im, g: jax.grad(lambda i: 1 - ssim(i, g))((im + x)).sum(),
      jnp.float32(0), img, gt)
chain("l1 fwd+bwd",
      lambda x, im, g: jax.grad(lambda i: jnp.mean(jnp.abs(i - g)))((im + x)).sum(),
      jnp.float32(0), img, gt)

tile_colors = jax.device_put(jnp.ones((n_tiles, P, 3), jnp.float32) * 0.3)
tile_alpha = jax.device_put(jnp.ones((n_tiles, P), jnp.float32) * 0.7)


def asm_loss(tc, ta):
    image, alpha = assemble_image(tc, ta, GW, GH, TS, W, H)
    image = image + (1.0 - alpha)[None] * bg.reshape(3, 1, 1)
    return jnp.mean(jnp.abs(image - gt))


chain("assemble_image fwd+bwd (L1 loss)",
      lambda x, tc, ta: jax.grad(asm_loss)(tc + x, ta).sum(),
      jnp.float32(0), tile_colors, tile_alpha)


def full_loss(tc, ta):
    image, alpha = assemble_image(tc, ta, GW, GH, TS, W, H)
    image = image + (1.0 - alpha)[None] * bg.reshape(3, 1, 1)
    return 0.8 * jnp.mean(jnp.abs(image - gt)) + 0.2 * (1 - ssim(image, gt))


chain("assemble+L1+SSIM fwd+bwd",
      lambda x, tc, ta: jax.grad(full_loss)(tc + x, ta).sum(),
      jnp.float32(0), tile_colors, tile_alpha)

# ---- optimizer-side pieces ------------------------------------------------------------
params = splat.params()
adam = init_adam_state(params)
grads = jax.tree.map(jnp.ones_like, params)


class _O:
    means_lr = 1.6e-4; shs_lr = 2.5e-3; opacity_lr = 5e-2; scaling_lr = 5e-3
    rotation_lr = 1e-3


lrs = group_lrs(_O(), 3.0)
chain("fused adam (6 groups, 1M)",
      lambda x, ps, gs, ad: jnp.sum(
          adam_step(jax.tree.map(lambda v: v + x, ps), gs, ad, lrs, 5)[0]["means"]),
      jnp.float32(0), params, grads, adam)
chain("mcmc noise (1M)",
      lambda x, sp: jnp.sum(strategy_mcmc.inject_noise(
          sp.replace_params({k: v + x for k, v in sp.params().items()}),
          jax.random.key(0), 1e-4).means),
      jnp.float32(0), splat)

# ---- raster stages --------------------------------------------------------------------
base = (splat.scaling_raw, splat.rotation_raw, splat.opacity_raw, splat.sh0, splat.shN,
        splat.alive, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"],
        cam["cy"])
chain("projection fwd",
      lambda x, m: jnp.sum(project(m + x, *base, W, H, 3, tile_size=TS).mean2d),
      jnp.float32(0), splat.means)


def proj_bwd(m):
    def f(mm):
        p = project(mm, *base, W, H, 3, tile_size=TS)
        return (jnp.sum(p.mean2d * 1e-6) + jnp.sum(p.conic * 1e-6) + jnp.sum(p.opacity)
                + jnp.sum(p.color * 1e-6) + jnp.sum(p.depth * 1e-6))
    return jax.grad(f)(m).sum()


chain("projection fwd+bwd", lambda x, m: proj_bwd(m + x), jnp.float32(0), splat.means)


@jax.jit
def prep(m):
    p = project(m, *base, W, H, 3, tile_size=TS)
    return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)


proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
chain("build_sorted_instances",
      lambda x, pr: jnp.sum(build_sorted_instances(
          pr._replace(depth=pr.depth + x), GW, GH, MAX_INST, TS).sorted_gid
          .astype(jnp.float32)),
      jnp.float32(0), proj)

k_max_al = 1024
max_chunks = k_max_al // CHUNK
(row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows) = jax.tree.map(
    jax.device_put, align_segments(inst, n_tiles, max_chunks))
feats = jnp.stack([proj.mean2d[:, 0], proj.mean2d[:, 1], proj.conic[:, 0], proj.conic[:, 1],
                   proj.conic[:, 2], proj.opacity, proj.color[:, 0], proj.color[:, 1],
                   proj.color[:, 2], proj.depth], axis=1)
feats = jax.device_put(feats)
chain("align_segments",
      lambda x, i: jnp.sum(align_segments(
          i._replace(tile_count=i.tile_count + jnp.int32(x)), n_tiles, max_chunks)[2]
          .astype(jnp.float32)),
      jnp.float32(0), inst)
chain("feature pack (gather+pad+T)",
      lambda x, f, gid: jnp.sum(
          jnp.pad((f + x)[gid], ((0, 0), (0, NFEAT - 10)))
          .reshape(n_rows, CHUNK, NFEAT).transpose(0, 2, 1)),
      jnp.float32(0), feats, aligned_gid)

packed0 = jax.device_put(jnp.pad(feats[aligned_gid], ((0, 0), (0, NFEAT - 10))).reshape(
    n_rows, CHUNK, NFEAT).transpose(0, 2, 1))
statics = dict(n_tiles=n_tiles, grid_w=GW, tile_size=TS, max_chunks=max_chunks)
out0, chk0 = jax.tree.map(jax.device_put, blend_forward(
    packed0, row_start, count_capped, **statics))
gout0 = jax.device_put(jnp.ones((n_tiles, P, 8), jnp.float32) * 1e-3)
chain("fwd kernel", lambda x, pk, rs, cc: jnp.sum(
    blend_forward(pk + x, rs, cc, **statics)[0]), jnp.float32(0),
    packed0, row_start, count_capped)
chain("bwd kernel", lambda x, pk, rs, cc, ck, o, go: jnp.sum(
    blend_backward(pk + x, rs, cc, ck, o, go, **statics)),
    jnp.float32(0), packed0, row_start, count_capped, chk0, out0, gout0)

gp0 = jax.device_put(blend_backward(packed0, row_start, count_capped, chk0, out0, gout0,
                                    **statics))


def segred(gp):
    ginst = jnp.stack([gp[:, f, :].reshape(-1) for f in range(10)], axis=1)
    return jnp.sum(jnp.square(segmented_grad_reduce(
        ginst, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end, inst.inv_order)))


chain("unpack+segmented_grad_reduce", lambda x, gp: segred(gp + x), jnp.float32(0), gp0)

print("\n--- summary ---")
for k, v in results.items():
    print(f"{k:40s} {v:9.2f} ms")
