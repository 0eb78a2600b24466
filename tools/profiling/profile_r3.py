"""Round-3 measurements: instance-pipeline glue candidates + ts16 operating point.

Honest timing: dependent chains with a device_get sync (block_until_ready does not
synchronize through the axon tunnel; see axon-tpu-measurement-pitfalls memory).

Questions this answers:
  1. Stage costs at ts=16 vs ts=32 with current code (kernels should be ~3x cheaper
     at ts16; glue ~1.6x more expensive).
  2. Raw op costs at both scales: row gather f32/bf16, scatter+cummax, cumsum,
     scatter-add, 2-key sort — to price the gather-free emission variant.
  3. Fused align (drop cap_end pass) vs current.
  4. Transposed-layout segmented reduce ([nb, 10, 128], scan on lanes) vs current.
  5. Contribution-cull ratio (what do we pay if emission stops gathering mx..pth).
  6. Dispatch amortization: 8 dispatches vs one lax.scan over 8 steps.
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
from tpu_splat.ops.pallas.raster import (
    align_segments, build_sorted_instances, segmented_grad_reduce, SortedInstances)
from tpu_splat.ops.pallas.blend import NFEAT, blend_backward, blend_forward

N = 1_000_000
W, H = 1296, 840

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
    print(f"{name:54s} {ms:9.2f} ms", flush=True)
    return ms


def setup(ts):
    TS = ts
    GW, GH = -(-W // TS), -(-H // TS)
    n_tiles = GW * GH
    MAX_INST = (1 << 21) if ts == 32 else (1 << 22)
    K_MAX = 2048 if ts == 32 else 1024
    CH = 256

    @jax.jit
    def prep(m):
        p = project(m, *base, W, H, 3, tile_size=TS)
        return p, build_sorted_instances(p, GW, GH, MAX_INST, TS)

    proj, inst = jax.tree.map(jax.device_put, prep(splat.means))
    print(f"--- ts={ts}: total={int(inst.total_instances)} max_tile="
          f"{int(inst.max_tile_count)} n_tiles={n_tiles} MAX_INST={MAX_INST}", flush=True)
    return dict(TS=TS, GW=GW, GH=GH, n_tiles=n_tiles, MAX_INST=MAX_INST, K_MAX=K_MAX,
                CH=CH, proj=proj, inst=inst)


# ---------------------------------------------------------------- raw op costs
def raw_ops(ctx, tag):
    MAX_INST = ctx["MAX_INST"]
    inst = ctx["inst"]
    proj = ctx["proj"]
    n = N
    key = jax.random.PRNGKey(0)
    gid = jax.device_put(jax.random.randint(key, (MAX_INST,), 0, n))
    tab16 = jax.device_put(jax.random.normal(key, (n, 16), jnp.float32))
    tab16b = jax.device_put(tab16.astype(jnp.bfloat16))

    chain(f"[{tag}] row gather [{MAX_INST>>20}M,16] f32",
          lambda x, t, g: jnp.sum(jnp.square(t[g] + x)) * 1e-9, jnp.float32(0), tab16, gid)
    chain(f"[{tag}] row gather [{MAX_INST>>20}M,16] bf16",
          lambda x, t, g: jnp.sum(jnp.square((t[g].astype(jnp.float32) + x))) * 1e-9,
          jnp.float32(0), tab16b, gid)

    starts = jax.device_put(jnp.sort(jax.random.randint(key, (n,), 0, MAX_INST)))
    vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))

    def scat_cummax(x, s, v):
        y = jnp.zeros((MAX_INST,), jnp.int32).at[s].max(v + x.astype(jnp.int32), mode="drop")
        return jnp.sum(jax.lax.cummax(y) * 0 + jnp.square(jax.lax.cummax(y)).astype(jnp.float32)) * 1e-9

    chain(f"[{tag}] scatter+cummax [{MAX_INST>>20}M]",
          lambda x, s, v: jnp.square(jax.lax.cummax(
              jnp.zeros((MAX_INST,), jnp.int32).at[s].max(v + x.astype(jnp.int32),
                                                          mode="drop"))).astype(jnp.float32).sum() * 1e-9,
          jnp.float32(0), starts, vals)
    chain(f"[{tag}] scatter-add x2 + cumsum(int) [{MAX_INST>>20}M]",
          lambda x, s, v: jnp.square(jnp.cumsum(
              jnp.zeros((MAX_INST,), jnp.int32).at[s].add(v, mode="drop")
              .at[jnp.minimum(s + 7, MAX_INST - 1)].add(-v + x.astype(jnp.int32), mode="drop")
          )).astype(jnp.float32).sum() * 1e-9,
          jnp.float32(0), starts, vals)

    tid = jax.device_put(jax.random.randint(key, (MAX_INST,), 0, ctx["n_tiles"]))
    dk = jax.device_put(jax.random.normal(key, (MAX_INST,), jnp.float32))
    p1 = jax.device_put(jax.random.randint(key, (MAX_INST,), 0, n))
    p2 = jax.device_put(jnp.arange(MAX_INST, dtype=jnp.int32))

    def sort4(x, a, b, c, d):
        s = jax.lax.sort((a, b + x, c, d), num_keys=2, is_stable=True)
        return (jnp.square(s[1]).sum() + jnp.square(s[2].astype(jnp.float32)).sum()) * 1e-9

    chain(f"[{tag}] sort 2key+2payload [{MAX_INST>>20}M]", sort4, jnp.float32(0),
          tid, dk, p1, p2)

    def sort3i(x, a, c, d):
        s = jax.lax.sort((a + x.astype(jnp.int32), c, d), num_keys=1, is_stable=True)
        return (jnp.square(s[1].astype(jnp.float32)).sum()
                + jnp.square(s[2].astype(jnp.float32)).sum()) * 1e-9

    chain(f"[{tag}] sort 1key(int)+2payload [{MAX_INST>>20}M]", sort3i, jnp.float32(0),
          jax.device_put(tid * (1 << 19) + jax.random.randint(key, (MAX_INST,), 0, 1 << 19)),
          p1, p2)


# ---------------------------------------------------------------- stage costs
def stages(ctx, tag):
    TS, GW, GH = ctx["TS"], ctx["GW"], ctx["GH"]
    n_tiles, MAX_INST, K_MAX, CH = ctx["n_tiles"], ctx["MAX_INST"], ctx["K_MAX"], ctx["CH"]
    proj, inst = ctx["proj"], ctx["inst"]
    P = TS * TS
    max_chunks = ((K_MAX + CH - 1) // CH * CH) // CH

    chain(f"[{tag}] build_sorted_instances",
          lambda x, p: jnp.square(build_sorted_instances(
              p._replace(mean2d=p.mean2d + x), GW, GH, MAX_INST, TS
          ).sorted_tile_id.astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), proj)

    chain(f"[{tag}] align_segments",
          lambda x, i: jnp.square(align_segments(
              i._replace(tile_start=i.tile_start + x.astype(jnp.int32)),
              n_tiles, max_chunks, CH)[2].astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), inst)

    row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows = jax.tree.map(
        jax.device_put,
        jax.jit(lambda i: align_segments(i, n_tiles, max_chunks, CH),
                static_argnames=())(inst))

    def pack(x, p, gid):
        feats = jnp.stack([p.mean2d[:, 0] + x, p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                           p.conic[:, 2], p.opacity, p.color[:, 0], p.color[:, 1],
                           p.color[:, 2], p.depth], axis=1)
        g = jax.lax.optimization_barrier(feats[gid])
        packed = jnp.pad(g, ((0, 0), (0, NFEAT - 10)))
        return jnp.square(packed.reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)).sum() * 1e-9

    chain(f"[{tag}] feature pack (gather f32)", pack, jnp.float32(0), proj, aligned_gid)

    def packb(x, p, gid):
        feats = jnp.stack([p.mean2d[:, 0] + x, p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                           p.conic[:, 2], p.opacity, p.color[:, 0], p.color[:, 1],
                           p.color[:, 2], p.depth], axis=1).astype(jnp.bfloat16)
        g = jax.lax.optimization_barrier(feats[gid]).astype(jnp.float32)
        packed = jnp.pad(g, ((0, 0), (0, NFEAT - 10)))
        return jnp.square(packed.reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)).sum() * 1e-9

    chain(f"[{tag}] feature pack (gather bf16)", packb, jnp.float32(0), proj, aligned_gid)

    # kernels
    statics = dict(n_tiles=n_tiles, grid_w=GW, tile_size=TS, max_chunks=max_chunks, chunk=CH)

    @jax.jit
    def mkpacked(p, gid):
        feats = jnp.stack([p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
                           p.conic[:, 2], p.opacity, jnp.maximum(p.color[:, 0], 0),
                           jnp.maximum(p.color[:, 1], 0), jnp.maximum(p.color[:, 2], 0),
                           p.depth], axis=1)
        g = feats[gid]
        return jnp.pad(g, ((0, 0), (0, NFEAT - 10))).reshape(n_rows, CH, NFEAT).transpose(0, 2, 1)

    packed = jax.device_put(mkpacked(proj, aligned_gid))

    chain(f"[{tag}] fwd kernel",
          lambda x, pk, rs, cc: jnp.square(
              blend_forward(pk + x, rs, cc, **statics)[0][:, :, :4]).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped)

    @jax.jit
    def mkfwd(pk, rs, cc):
        return blend_forward(pk, rs, cc, **statics)

    out, chk = jax.tree.map(jax.device_put, mkfwd(packed, row_start, count_capped))
    gout = jax.device_put(jnp.ones((n_tiles, P, 8), jnp.float32) * 0.1)

    chain(f"[{tag}] bwd kernel",
          lambda x, pk, rs, cc, ck, o, g: jnp.square(
              blend_backward(pk + x, rs, cc, ck, o, g, **statics)).sum() * 1e-9,
          jnp.float32(0), packed, row_start, count_capped, chk, out, gout)

    @jax.jit
    def mkg(pk, rs, cc, ck, o, g):
        return blend_backward(pk, rs, cc, ck, o, g, **statics)

    gpacked = jax.device_put(mkg(packed, row_start, count_capped, chk, out, gout))

    def unpack_segred(x, gp, qem, rank, ss, se):
        ginst = jnp.stack([(gp + x)[:, f, :].reshape(-1) for f in range(10)], axis=1)
        acc = segmented_grad_reduce(ginst, qem, rank, ss, se)
        return jnp.square(acc).sum() * 1e-9

    chain(f"[{tag}] unpack + segred (current)", unpack_segred, jnp.float32(0),
          gpacked, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)

    # transposed-layout segred
    def segred_T(ginst, qem, rank, seg_s, seg_e, gather_dtype=jnp.bfloat16):
        max_al, width = ginst.shape
        max_inst = qem.shape[0]
        ginst_pad = jnp.concatenate(
            [ginst.astype(gather_dtype), jnp.zeros((1, width), gather_dtype)], axis=0)
        ge = ginst_pad[jnp.minimum(qem, max_al)].astype(ginst.dtype)
        blk = 128
        nb = max_inst // blk
        xb = ge.reshape(nb, blk, width).transpose(0, 2, 1)  # [nb, width, 128]
        rb = rank.reshape(nb, 1, blk)
        step = 1
        while step < blk:
            shifted = jnp.concatenate(
                [jnp.zeros((nb, width, step), ginst.dtype), xb[:, :, :-step]], axis=2)
            same = jnp.concatenate(
                [jnp.zeros((nb, 1, step), bool), rb[:, :, step:] == rb[:, :, :-step]], axis=2)
            xb = xb + jnp.where(same, shifted, 0.0)
            step *= 2
        last = xb[:, :, -1]  # [nb, width]
        lastrank = rb[:, 0, -1]
        firstrank = rb[:, 0, 0]
        spans = (firstrank == lastrank).astype(ginst.dtype)
        eq = jnp.concatenate([jnp.zeros((1,), bool), lastrank[:-1] == firstrank[1:]])
        a_coef = jnp.where(eq, jnp.concatenate([jnp.zeros((1,), ginst.dtype), spans[:-1]]), 0.0)[:, None]
        b_coef = jnp.where(eq[:, None], jnp.concatenate([jnp.zeros((1, width), ginst.dtype), last[:-1]]), 0.0)

        def affine_op(l, r):
            al, bl = l
            ar, br = r
            return al * ar, br + ar * bl

        _, carry = jax.lax.associative_scan(affine_op, (a_coef, b_coef), axis=0)
        xb = xb + jnp.where(rb == firstrank[:, None, None], carry[:, :, None], 0.0)
        # extract at segment ends without a back-transpose: advanced indexing on 2 dims
        idx = jnp.clip(seg_e - 1, 0, max_inst - 1)
        per_gid = xb[idx // blk, :, idx % blk]
        return per_gid * (seg_e > seg_s)[:, None]

    def unpack_segred_T(x, gp, qem, rank, ss, se):
        ginst = jnp.stack([(gp + x)[:, f, :].reshape(-1) for f in range(10)], axis=1)
        acc = segred_T(ginst, qem, rank, ss, se)
        return jnp.square(acc).sum() * 1e-9

    chain(f"[{tag}] unpack + segred (transposed)", unpack_segred_T, jnp.float32(0),
          gpacked, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)

    # correctness cross-check of segred_T (on-device compare)
    @jax.jit
    def cmp(gp, qem, rank, ss, se):
        ginst = jnp.stack([gp[:, f, :].reshape(-1) for f in range(10)], axis=1)
        a = segmented_grad_reduce(ginst, qem, rank, ss, se)
        b = segred_T(ginst, qem, rank, ss, se)
        return jnp.max(jnp.abs(a - b))

    print(f"[{tag}] segred_T max |diff| =",
          float(cmp(gpacked, qa_emis, inst.emis_rank, inst.emis_start, inst.emis_end)),
          flush=True)

    # fused align: drop the cap_end scatter+cummax (keep = pidx < n_valid)
    def align_fused(i: SortedInstances, max_chunks, chunk):
        max_inst = i.sorted_gid.shape[0]
        count_capped = jnp.minimum(i.tile_count, max_chunks * chunk)
        padded = ((count_capped + chunk - 1) // chunk) * chunk
        aligned_end = jnp.cumsum(padded)
        aligned_start = aligned_end - padded
        row_start = (aligned_start // chunk).astype(jnp.int32)
        max_aligned = max_inst + n_tiles * chunk
        n_rows = max_aligned // chunk
        pidx = jnp.arange(max_inst, dtype=jnp.int32)
        shift_at = (jnp.zeros((max_inst,), jnp.int32).at[i.tile_start]
                    .max(aligned_start - i.tile_start, mode="drop"))
        shift = jax.lax.cummax(shift_at)
        n_valid = i.tile_start[-1] + i.tile_count[-1]
        keep = pidx < n_valid
        qa = jnp.where(keep, pidx + shift, max_aligned)
        aligned_gid = (jnp.zeros((max_aligned,), jnp.int32).at[qa]
                       .set(i.sorted_gid, mode="drop"))
        qa_emis = (jnp.full((max_inst,), max_aligned, jnp.int32).at[i.sorted_emis]
                   .set(jnp.where(keep, qa, max_aligned), mode="drop"))
        return row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows

    chain(f"[{tag}] align_segments (fused keep)",
          lambda x, i: jnp.square(align_fused(
              i._replace(tile_start=i.tile_start + x.astype(jnp.int32)),
              max_chunks, CH)[2].astype(jnp.float32)).sum() * 1e-9,
          jnp.float32(0), inst)

    @jax.jit
    def cmp_align(i):
        a = align_segments(i, n_tiles, max_chunks, CH)
        b = align_fused(i, max_chunks, CH)
        return (jnp.max(jnp.abs(a[2] - b[2])), jnp.max(jnp.abs(a[3] - b[3])))

    d1, d2 = cmp_align(inst)
    print(f"[{tag}] align_fused diffs: gid {int(d1)} qa_emis {int(d2)}", flush=True)


# ---------------------------------------------------------------- cull ratio
def cull_ratio(ctx, tag):
    proj = ctx["proj"]

    @jax.jit
    def ratio(p):
        counts = jnp.where(p.visible, p.n_tiles, 0).astype(jnp.int32)
        return jnp.sum(counts)

    rect_total = int(ratio(proj))
    contrib_total = int(ctx["inst"].total_instances)  # rect total (conservative)
    # count valid after contribution test: sentinel tile ids mark culled
    @jax.jit
    def valid_count(i):
        return i.tile_start[-1] + i.tile_count[-1]

    v = int(valid_count(ctx["inst"]))
    print(f"[{tag}] rect_total={rect_total} post-cull valid={v} "
          f"cull={100 * (1 - v / max(rect_total, 1)):.1f}%", flush=True)


def dispatch_amortization():
    """8 dependent dispatches of a trivial-but-real jitted fn vs one scan over 8."""
    from tpu_splat.training.train_step import RasterPlan, StepConfig, init_train_state, train_step

    ts0 = init_train_state(splat)
    gt = jnp.asarray(np.random.default_rng(1).random((3, H, W), np.float32))
    plan = RasterPlan(max_instances=1 << 21, k_max=1 << 12, chunk=256, tile_size=32)
    kwargs = dict(width=W, height=H, plan=plan, opt=StepConfig(), total_iterations=30_000)
    args = (gt, cam["w2c"], cam["cam_position"], cam["fx"], cam["fy"], cam["cx"], cam["cy"],
            jnp.zeros(3, jnp.float32), jnp.int32(0))

    ts1, stats = train_step(ts0, *args, **kwargs)
    _ = float(stats.loss)
    t0 = time.perf_counter()
    K = 16
    tsx = ts1
    for _ in range(K):
        tsx, stats = train_step(tsx, *args, **kwargs)
    _ = float(stats.loss)
    per_dispatch = (time.perf_counter() - t0) / K * 1e3
    print(f"step via {K} dispatches: {per_dispatch:9.2f} ms/step", flush=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def multi(ts, *a, k):
        def body(t, _):
            t2, st = train_step(t, *a, **kwargs)
            return t2, st.loss

        return jax.lax.scan(body, ts, None, length=k)

    tsy, losses = multi(ts1, *args, k=8)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        tsy, losses = multi(tsy, *args, k=8)
    _ = float(losses[-1])
    per_scan = (time.perf_counter() - t0) / (reps * 8) * 1e3
    print(f"step via lax.scan(8):   {per_scan:9.2f} ms/step", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for ts in (32, 16):
        if which in ("all", "stages", str(ts)):
            ctx = setup(ts)
            cull_ratio(ctx, f"ts{ts}")
            raw_ops(ctx, f"ts{ts}")
            stages(ctx, f"ts{ts}")
    if which in ("all", "dispatch"):
        dispatch_amortization()
    print({k: round(v, 2) for k, v in results.items()})
