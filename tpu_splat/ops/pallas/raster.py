"""XLA-side glue for the Pallas blend: emission, tile sort, packing, custom VJP.

TPU-native replacement for the reference's instance pipeline
(fastgs/rasterization/src/forward.cu:15-199: depth radix sort -> exclusive scan ->
warp-cooperative `create_instances_cu` -> tile radix sort -> range extraction). Designed
around measured TPU op costs: random gathers run at ~9 ms/M elements regardless of width,
so every per-element lookup is a single WIDE row-gather; `jnp.repeat`'s
searchsorted-based expansion and 4M-query searchsorted are replaced by scatter+cummax
scans (3-7x cheaper); the exact StopThePop per-tile contribution test
(kernel_utils.cuh:108-143) is applied per emitted instance.

Gradient flow: `blend_tiles_pallas` is a jax.custom_vjp over (mean2d, conic, opacity,
color, depth); its backward runs the hand-written Pallas kernel (transmittance-checkpoint
replay, blend.py) and reduces per-instance gradients to per-gaussian totals with
`segmented_grad_reduce` — a gather-to-emission-order + two-level segmented-scan scheme
that replaces both the reference's atomicAdd accumulation (kernels_backward.cuh:436-448)
and XLA's ~7x-slower collision scatter-add.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..projection import Projected, will_contribute
from .blend import CHUNK, NFEAT, blend_backward, blend_forward

# G-table columns (per-gaussian, gaussian-id order). Columns 0-9 deliberately MATCH the
# blend kernel's f32 feature layout (blend.py F_*), so the SAME table serves both
# row-gathers of the pipeline: gtab[pos] (emission: tile walk, contribution test, sort
# keys) and gtab[sorted_gid].T (the f32 feature pack — no separate feature table is ever
# built; the kernel ignores the junk in columns 10-15). A scatter-based pack through
# the emission->sorted map was measured and REJECTED: XLA's row scatter runs ~220 ms for
# 2M 16-col rows on this TPU (vs ~19 ms for the equivalent gather) regardless of
# unique/sorted hints (tools/profiling/profile_r4b.py).
(G_MX, G_MY, G_CA, G_CB, G_CC, G_OP, G_R, G_G, G_B, G_DEPTH,
 G_COUNT, G_TMINX, G_TMINY, G_RECTW, G_PTH, G_OFFS) = range(16)
G_COLS = 16  # one f32 lane-tile row


EXPAND_OUT = 512  # emission slots per expand-kernel block (output lanes)
EXPAND_WIN = 512  # gaussian window lanes fetched per while-loop trip
# kernel-table row layout (independent of the G_* gtab column order): rows 0-5 are the
# contribution-test inputs (kept bit-exact via a third split term), 6-10 tolerate the
# two-term split (depth: ~2^-18 — far below the packed sort key's own >=2^-7 depth
# truncation; counts/tmin/rect: small ints, exact in 16 bits), 11-12 are REBASED
# in-kernel so 16 bits suffice exactly, 13 is the ownership indicator that
# reconstructs `pos` from the per-window rebase.
(KR_MX, KR_MY, KR_CA, KR_CB, KR_CC, KR_PTH, KR_DEPTH, KR_COUNT, KR_TMINX, KR_TMINY,
 KR_RECTW, KR_K, KR_POS, KR_ONE) = range(14)
KR_ROWS = 16
_EXPAND_EXACT3 = 8  # rows 0-7 get the third (exactness) split term


def _expand_kernel(win_start_ref, gtabt_ref, out_ref, buf, sem, *, n_pad: int):
    """Instance expansion as windowed one-hot matmuls (replaces scatter+cummax+gather).

    Emission slots are gaussian-major: slot i belongs to gaussian g iff
    offs[g] <= i < offs[g] + count[g], and offs is the cumsum of counts — so the
    gaussians covering an EXPAND_OUT-slot block form a CONTIGUOUS index window. Per
    block: DMA the [16, EXPAND_WIN] feature window (sequential HBM read — no random
    row gather), build the one-hot ownership mask from the window's own offs/count
    rows, and multiply it onto the features (one MXU matmul — the bf16 split terms
    ride as stacked rows, all under the 128-sublane pad). Windows advance in a while
    loop, so arbitrarily sparse visibility stays correct (total DMA is bounded by ~2
    sequential reads of the table). Replaces XLA ops measured at 12.7 ms (pos scatter)
    + 17 ms (emission row gather).

    Exactness: ownership is one-hot, so every matmul output has exactly ONE nonzero
    term — the only rounding is each row's own bf16-split truncation. Rows 0-7 carry a
    third split term (24 mantissa bits: bit-exact f32). The offs row is rebased to the
    block origin and the gid row to the window origin in-kernel, bounding the owned
    values to < 2^13 — exact in the two 8-bit terms; `pos` is reconstructed from the
    per-window rebase via the indicator row, and the offs row is emitted directly as
    k = slot - offs. Slots past `total` are owned by nothing: their columns are zero
    (k row = local slot id), masked downstream by `inst_id < total`."""
    b = pl.program_id(0)
    # Mosaic requires lane-dim HBM slices at 128-aligned offsets: round the window
    # start down (costs < 128 already-covered lanes per window)
    base = pl.multiple_of((win_start_ref[b] // 128) * 128, 128)
    # slot ids as the ROW dim of the ownership mask: both mask operands broadcast
    # without any in-kernel transpose. Rebased by the block origin (exact f32 ints).
    ig_loc = jax.lax.broadcasted_iota(jnp.int32, (EXPAND_OUT, 1), 0).astype(jnp.float32)
    bb = (b * EXPAND_OUT).astype(jnp.float32)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (KR_ROWS, 1), 0)

    def get_dma(slot, w):
        # no clamp: the caller pads the table by >= 2*EXPAND_WIN finite-huge-offs
        # columns, so every processed window AND the one speculative prefetch past
        # `done` stay in bounds (a clamp could re-fetch an already-processed window
        # and double-count)
        return pltpu.make_async_copy(
            gtabt_ref.at[:, pl.ds(base + w * EXPAND_WIN, EXPAND_WIN)], buf.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def cond(c):
        w, acc, posfix, done = c
        return jnp.logical_not(done)

    def body(c):
        w, acc, posfix, _ = c
        slot = jax.lax.rem(w, 2)
        get_dma(slot, w).wait()
        get_dma(1 - slot, w + 1).start()  # speculative (bounds padded)
        off_w = (base + w * EXPAND_WIN).astype(jnp.float32)
        win = buf[slot]  # [16, EXPAND_WIN]
        # one subtract pass rebases the offs row by the block origin and the gid row
        # by the window origin (owned values then fit 16 bits exactly)
        reb = jnp.where(row_id == KR_K, bb, 0.0) + jnp.where(row_id == KR_POS, off_w, 0.0)
        win = win - reb
        offs = win[KR_K : KR_K + 1, :]  # [1, W] block-rebased offs (huge pad tail)
        cnt = win[KR_COUNT : KR_COUNT + 1, :]
        oh = jnp.where(
            (offs <= ig_loc) & (ig_loc < offs + cnt), 1.0, 0.0
        ).astype(jnp.bfloat16)  # [OUT, W] ownership (exact 0/1 in bf16)
        # separate matmuls per split term — an in-kernel sublane CONCAT of the terms
        # into one matmul operand measured +25 ms at garden scale (Mosaic relayout)
        mm = lambda a_: jax.lax.dot_general(
            a_, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        h1 = win.astype(jnp.bfloat16)
        r1 = win - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        m1 = mm(h1)  # carries the exact indicator row (ones: h2 term is zero)
        acc = acc + m1 + mm(h2)
        if _EXPAND_EXACT3:
            h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)[:_EXPAND_EXACT3]
            m3 = jax.lax.dot_general(
                h3, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc = acc + jnp.concatenate(
                [m3, jnp.zeros((KR_ROWS - _EXPAND_EXACT3, EXPAND_OUT), jnp.float32)],
                axis=0,
            )
        # pos reconstruction: this window's ownership indicator times its origin
        posfix = posfix + off_w * m1[KR_ONE : KR_ONE + 1]
        # stop once the NEXT window cannot own any slot of this block: the last
        # fetched gaussian already starts past the block end (offs monotone; the
        # huge-offs padding guarantees termination at the table tail)
        done = offs[0, EXPAND_WIN - 1] > ig_loc[EXPAND_OUT - 1, 0]
        return w + 1, acc, posfix, done

    w, acc, posfix, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((KR_ROWS, EXPAND_OUT), jnp.float32),
                     jnp.zeros((1, EXPAND_OUT), jnp.float32), jnp.bool_(False))
    )
    get_dma(jax.lax.rem(w, 2), w).wait()  # drain the speculative prefetch
    # emit k = slot - offs directly (both block-rebased: local iota minus the rebased
    # offs) and pos = rebased-gid sum + per-window origin fix
    loc_row = jax.lax.broadcasted_iota(jnp.int32, (1, EXPAND_OUT), 1).astype(jnp.float32)
    out_ref[:] = jnp.where(
        row_id == KR_K, loc_row - acc,
        jnp.where(row_id == KR_POS, acc + posfix, acc),
    )


@functools.partial(jax.jit, static_argnames=("max_instances", "interpret"))
def expand_emission(gtabt, win_start, *, max_instances: int, interpret: bool = False):
    """gtabt [KR_ROWS, N_pad] (feature-major KR_* layout), win_start [nb] int32 ->
    r_t [KR_ROWS, MAX_INST] per-emission-slot rows (KR_K = rect-walk k, KR_POS =
    owning gaussian id, KR_ONE = owned indicator)."""
    rows, n_pad = gtabt.shape
    assert rows == KR_ROWS
    assert max_instances % EXPAND_OUT == 0
    nb = max_instances // EXPAND_OUT
    return pl.pallas_call(
        functools.partial(_expand_kernel, n_pad=n_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((rows, EXPAND_OUT), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, rows, EXPAND_WIN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, max_instances), jnp.float32),
        interpret=interpret,
    )(win_start, gtabt)


class SortedInstances(NamedTuple):
    sorted_tile_id: jax.Array  # [MAX_INST] int32 (sentinel n_tiles at the tail)
    sorted_gid: jax.Array  # [MAX_INST] int32
    sorted_emis: jax.Array  # [MAX_INST] int32 — emission index of each sorted instance
    emis_rank: jax.Array  # [MAX_INST] int32 — gaussian id (segment id) per emission slot
    emis_start: jax.Array  # [N] int32 — per-gaussian inclusive start in emission order
    emis_end: jax.Array  # [N] int32 — per-gaussian exclusive end in emission order
    tile_start: jax.Array  # [T] int32
    tile_count: jax.Array  # [T] int32 (uncapped)
    total_instances: jax.Array  # [] int32 (conservative rect total)
    max_tile_count: jax.Array  # [] int32
    n_visible: jax.Array  # [] int32
    gtab: jax.Array = None  # [N, 16] f32 per-gaussian table (G_* layout) — the f32
    # pack gathers this directly at sorted_gid (cols 0-9 are the kernel features)


def build_sorted_instances(
    proj: Projected, grid_w: int, grid_h: int, max_instances: int, tile_size: int,
    tile_y0=0, packed_key_sort: bool = True, expand: str | None = None,
) -> SortedInstances:
    """Instance emission + (tile, depth) two-key sort, gather-minimal.

    Emission stays in GAUSSIAN-ID order (no global depth pre-sort): per-tile front-to-back
    order comes from depth as the second sort key instead of sort stability. This drops the
    1M argsort, the gtab permutation gather, and — because per-gaussian gradient segments
    are then contiguous in plain gaussian-id order — the final rank->gid permutation in
    the backward reduction. (The reference sorts 64-bit tile|depth keys the same way,
    fastgs/rasterization/src/forward.cu:15-199.)"""
    n = proj.depth.shape[0]
    n_tiles = grid_w * grid_h
    f32 = proj.depth.dtype

    proj = jax.lax.optimization_barrier(proj)

    # 1. per-gaussian emission table (gaussian-id order — no permutation gather)
    rect_w = jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1)
    counts = jnp.where(proj.visible, proj.n_tiles, 0).astype(jnp.int32)
    offs_incl = jnp.cumsum(counts)
    offs_excl = offs_incl - counts
    total = offs_incl[-1]
    gtab = jnp.stack(
        [
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.opacity,
            jnp.maximum(proj.color[:, 0], 0.0),
            jnp.maximum(proj.color[:, 1], 0.0),
            jnp.maximum(proj.color[:, 2], 0.0),
            proj.depth,
            counts.astype(f32),
            proj.tile_min[:, 0].astype(f32),
            proj.tile_min[:, 1].astype(f32),
            rect_w.astype(f32),
            proj.power_threshold,
            offs_excl.astype(f32),  # exclusive emission offset: yields startpos for free
        ],
        axis=1,
    )
    gtab = jax.lax.optimization_barrier(gtab)
    arange_n = jnp.arange(n, dtype=jnp.int32)
    inst_id = jnp.arange(max_instances, dtype=jnp.int32)

    # 2. instance expansion — per-emission-slot feature rows.
    if expand is None:
        import os

        expand = os.environ.get(
            "TPU_SPLAT_EXPAND",
            "pallas" if max_instances % EXPAND_OUT == 0 else "xla",
        )
    if expand == "pallas":
        # windowed one-hot expansion kernel (see _expand_kernel): replaces the pos
        # scatter+cummax AND the emission row-gather with sequential-bandwidth DMA +
        # one MXU matmul per window.
        kr_rows = [None] * KR_ROWS
        kr_rows[KR_MX] = gtab[:, G_MX]
        kr_rows[KR_MY] = gtab[:, G_MY]
        kr_rows[KR_CA] = gtab[:, G_CA]
        kr_rows[KR_CB] = gtab[:, G_CB]
        kr_rows[KR_CC] = gtab[:, G_CC]
        kr_rows[KR_PTH] = gtab[:, G_PTH]
        kr_rows[KR_DEPTH] = gtab[:, G_DEPTH]
        kr_rows[KR_COUNT] = gtab[:, G_COUNT]
        kr_rows[KR_TMINX] = gtab[:, G_TMINX]
        kr_rows[KR_TMINY] = gtab[:, G_TMINY]
        kr_rows[KR_RECTW] = gtab[:, G_RECTW]
        kr_rows[KR_K] = gtab[:, G_OFFS]
        kr_rows[KR_POS] = arange_n.astype(f32)
        kr_rows[KR_ONE] = jnp.ones((n,), f32)
        zero_row = jnp.zeros((n,), f32)
        kr_rows = [zero_row if row is None else row for row in kr_rows]
        gtabt = jnp.stack(kr_rows, axis=0)  # [16, N]
        # the ownership mask multiplies every window column — a single inf/NaN (GUT's
        # deliberate power_threshold=inf, culled-row garbage) would poison the whole
        # block via 0*inf=NaN. 1e30 is "infinite" for every downstream comparison
        # (slots < 2^24, max_power finite) and multiplies to an exact 0.
        gtabt = jnp.clip(jnp.nan_to_num(gtabt, posinf=1e30, neginf=-1e30), -1e30, 1e30)
        padc = -(n + 2 * EXPAND_WIN) % 128 + 2 * EXPAND_WIN
        pad_block = jnp.zeros((KR_ROWS, padc), f32).at[KR_K].set(1e30)
        # emission/culling is non-differentiable bookkeeping (same as the reference's
        # instance pipeline); gradients reach the per-gaussian params through the blend
        # custom VJP, never through r_t
        gtabt = jax.lax.stop_gradient(jnp.concatenate([gtabt, pad_block], axis=1))
        blk_starts = jnp.arange(max_instances // EXPAND_OUT, dtype=jnp.int32) * EXPAND_OUT
        win_start = jnp.searchsorted(offs_incl, blk_starts, side="right").astype(
            jnp.int32
        )
        r_t = expand_emission(
            gtabt, win_start, max_instances=max_instances,
            interpret=jax.default_backend() == "cpu",
        )
        r_t = jax.lax.optimization_barrier(r_t)
        kr_of = {G_MX: KR_MX, G_MY: KR_MY, G_CA: KR_CA, G_CB: KR_CB, G_CC: KR_CC,
                 G_PTH: KR_PTH, G_DEPTH: KR_DEPTH, G_COUNT: KR_COUNT,
                 G_TMINX: KR_TMINX, G_TMINY: KR_TMINY, G_RECTW: KR_RECTW}
        col = lambda i: r_t[kr_of[i]]
        pos = r_t[KR_POS].astype(jnp.int32)
        k = r_t[KR_K]
    else:
        # XLA fallback: scatter+cummax fill of the owning gaussian id, then one wide
        # row-gather (measured 12.7 + 17 ms at garden scale)
        starts = jnp.where(counts > 0, offs_excl, max_instances)
        pos = (
            jnp.zeros((max_instances,), jnp.int32)
            .at[starts]
            .max(arange_n, mode="drop")
        )
        pos = jax.lax.cummax(pos)  # [MAX_INST] gaussian id per emission slot
        r = jax.lax.optimization_barrier(gtab[pos])  # [MAX_INST, 16] ONE row-gather
        col = lambda i: r[:, i]
        k = inst_id.astype(f32) - col(G_OFFS)  # offs_excl < 2^22: exact in f32

    in_range = (inst_id < total) & (k < col(G_COUNT))

    # tile coords via float division (k < ~2^20, rect_w < 2^11: exact)
    rw = col(G_RECTW)
    ky = jnp.floor(k / rw)
    kx = k - ky * rw
    tile_x = (col(G_TMINX) + kx).astype(jnp.int32)
    tile_y = (col(G_TMINY) + ky).astype(jnp.int32)

    # 3. exact per-tile contribution test (replaces the reference's exact-count prepass);
    # tile_y is window-local under multi-chip tile-row sharding — shift to global pixels
    contrib = will_contribute(
        jnp.stack([col(G_MX), col(G_MY)], axis=-1),  # [MAX, 2] mean2d
        jnp.stack([col(G_CA), col(G_CB), col(G_CC)], axis=-1),  # [MAX, 3] conic
        tile_x, tile_y + tile_y0, col(G_PTH), tile_size,
    )
    valid = in_range & contrib
    tile_id = jnp.where(valid, tile_y * grid_w + tile_x, n_tiles)

    # 4. (tile id, depth) sort: per-tile front-to-back without a pre-sort; stability
    # breaks depth ties by emission (= gaussian id) order, matching the XLA path's
    # stable argsort tiebreak. When tile + depth bits fit one int32, the two sort keys
    # pack into a single key — tile id in the high bits, the top bits of the POSITIVE
    # f32 depth's bit pattern (monotone for positive floats) below it; with >= 16 depth
    # bits that keeps 8 exponent + >= 7 mantissa bits (<= 2^-7 relative depth
    # truncation, ties broken stably) and drops one full 4-byte key lane from the sort
    # (the reference's radix sort packs tile|depth into one 64-bit key the same way,
    # fastgs/rasterization/src/forward.cu:15-199).
    tb = max(int(n_tiles).bit_length(), 1)  # bits for tile id incl. sentinel n_tiles
    db = 31 - tb
    if packed_key_sort and db >= 16:
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(col(G_DEPTH), 0.0), jnp.int32
        )
        key = jnp.where(
            valid,
            (tile_id << db) | jax.lax.shift_right_logical(depth_bits, 31 - db),
            jnp.int32(n_tiles) << db,
        )
        sorted_key, sorted_gid, sorted_emis = jax.lax.sort(
            (key, pos, inst_id), num_keys=1, is_stable=True
        )
        sorted_tile_id = jax.lax.shift_right_logical(sorted_key, db)
    else:
        depth_key = jnp.where(valid, col(G_DEPTH), jnp.inf)
        sorted_tile_id, _, sorted_gid, sorted_emis = jax.lax.sort(
            (tile_id, depth_key, pos, inst_id), num_keys=2, is_stable=True
        )

    # 5. per-tile ranges (few-query searchsorted is cheap; the 4M-query variant is not)
    tiles = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile_id, tiles, side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - tile_start

    return SortedInstances(
        sorted_tile_id=sorted_tile_id,
        sorted_gid=sorted_gid,
        sorted_emis=sorted_emis,
        emis_rank=pos,
        emis_start=jnp.minimum(offs_excl, max_instances).astype(jnp.int32),
        emis_end=jnp.minimum(offs_incl, max_instances).astype(jnp.int32),
        tile_start=tile_start,
        tile_count=tile_count,
        total_instances=total,
        max_tile_count=jnp.max(tile_count),
        n_visible=jnp.sum(proj.visible.astype(jnp.int32)),
        gtab=gtab,
    )


def align_segments(inst: SortedInstances, n_tiles: int, max_chunks: int,
                   chunk: int = CHUNK, with_gid: bool = True):
    """chunk-align per-tile segments — GUT path only (the fast path reads UNALIGNED
    segments via the round-down + dynamic-roll scheme in blend.py; the GUT kernels
    keep the [R, rows, chunk] block layout).

    Instance-side remap via ONE scatter+cummax scan (a 4M-query searchsorted costs
    ~400 ms). Returns (row_start [T], count_capped [T], aligned_gid [MAX_AL],
    qa_emis [MAX_INST], max_aligned, n_rows). qa_emis maps emission slots to aligned
    slots (sentinel max_aligned = no gradient), letting backwards reduce per-gaussian
    gradients over CONTIGUOUS sorted segments with a log-depth segmented scan (~7x
    cheaper than a 4M-row scatter-add, see tools/profiling/profile_scatter2.py).

    Tiles whose count exceeds the `max_chunks * chunk` cap get their overflow instances
    remapped into the NEXT tile's aligned range (the per-instance cap scan this would
    need costs a second scatter+cummax pass). That collision corrupts only steps the
    trainer discards anyway: any tile over k_max <= max_chunks*chunk triggers the
    rollback-and-redo protocol (trainer.py), and the kernel's own per-tile loop bound
    stays `count_capped`, so no out-of-range row is ever read."""
    max_inst = inst.sorted_gid.shape[0]
    count_capped = jnp.minimum(inst.tile_count, max_chunks * chunk)
    padded = ((count_capped + chunk - 1) // chunk) * chunk
    aligned_end = jnp.cumsum(padded)
    aligned_start = aligned_end - padded
    row_start = (aligned_start // chunk).astype(jnp.int32)
    max_aligned = max_inst + n_tiles * chunk  # static bound: sum(padded) <= this
    n_rows = max_aligned // chunk

    pidx = jnp.arange(max_inst, dtype=jnp.int32)
    # per-instance shift = aligned_start[t] - tile_start[t], broadcast by cummax.
    # Overflowing tiles shift by their capped amount, so qa stays < max_aligned even
    # when instances spill past their own tile's aligned range.
    shift_at = (
        jnp.zeros((max_inst,), jnp.int32)
        .at[inst.tile_start]
        .max(aligned_start - inst.tile_start, mode="drop")
    )
    shift = jax.lax.cummax(shift_at)
    qa = pidx + shift
    # aligned-slot gaussian ids (per-gaussian gathers in aligned order — the pack and
    # the GUT feature tables)
    aligned_gid = None
    if with_gid:
        aligned_gid = (
            jnp.zeros((max_aligned,), jnp.int32).at[qa].set(inst.sorted_gid, mode="drop")
        )
    # emission -> aligned map: invert the (sorted_emis, qa) pairing by SORTING on the
    # emission index instead of scattering qa at sorted_emis — a 1-key/1-payload int32
    # sort costs ~half of XLA's element scatter at this size (12.7 ms/M updates,
    # tools/profiling notes r4). sorted_emis is a permutation of [0, max_inst), so the
    # sort output is dense in emission order.
    _, qa_emis = jax.lax.sort((inst.sorted_emis, qa), num_keys=1, is_stable=False)
    return row_start, count_capped, aligned_gid, qa_emis, max_aligned, n_rows


def _segred_prefix_kernel(ge_ref, rank_ref, out_ref, carry, crank, *, sub: int,
                          exact: bool):
    """Segmented inclusive prefix over contiguous runs — one grid step per BR rows.

    Per 128-row block: A[i, j] = (rank_i == rank_j) & (j <= i), x = A @ ge on the MXU;
    the cross-block run carry rides VMEM scratch across the SEQUENTIAL TPU grid (the
    XLA block_mm form materializes the [nb, 128, 128] mask array through HBM — ~1.1 GB
    at garden scale — which is the entire cost of that stage)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)
        crank[:] = jnp.full_like(crank, -1)

    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = row >= col
    for s in range(sub):
        rb = rank_ref[s : s + 1, :]  # [1, 128] int32
        ge_b = ge_ref[s * 128 : (s + 1) * 128, :]  # [128, W] f32
        rcol = jnp.transpose(rb)  # [128, 1]
        same = (rcol == rb) & tri  # [128, 128]
        if exact:
            a = jnp.where(same, 1.0, 0.0)
            xb = jax.lax.dot_general(
                a, ge_b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        else:
            # fast path: ge rows are bf16-quantized upstream (the emission gather),
            # and A is exact in bf16 — DEFAULT precision loses nothing
            a = jnp.where(same, 1.0, 0.0).astype(jnp.bfloat16)
            xb = jax.lax.dot_general(
                a, ge_b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # incoming carry joins rows of the block's FIRST run iff it continues the
        # carried run ([1,1]-slice compares keep everything vectorized)
        first = rb[:, 0:1]  # [1, 1]
        match = (crank[:] == first).astype(jnp.float32)  # [1, 1]
        in_first = (rcol == first).astype(jnp.float32)  # [128, 1]
        xb = xb + in_first * (match * carry[:])
        carry[:] = xb[127:128, :]
        crank[:] = rb[:, 127:128]
        out_ref[s * 128 : (s + 1) * 128, :] = xb


@functools.partial(jax.jit, static_argnames=("exact", "interpret"))
def segred_prefix_pallas(ge, rank, exact: bool = False, interpret: bool = False):
    """ge [M, W] f32, rank [M] int32 (runs contiguous) -> segmented inclusive prefix."""
    m, w = ge.shape
    assert m % 128 == 0
    br = 1024 if m % 1024 == 0 else 128
    sub = br // 128
    grid = m // br
    out = pl.pallas_call(
        functools.partial(_segred_prefix_kernel, sub=sub, exact=exact),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.VMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ge, rank.reshape(m // 128, 128))
    return out


def segmented_grad_reduce(ginst, qem, rank, seg_s, seg_e, gather_dtype=jnp.bfloat16,
                          impl: str | None = None):
    """Per-gaussian gradient totals from per-aligned-instance rows without a collision
    scatter-add: gather to emission order (segments contiguous, ids sorted), block-local
    segmented reduce + affine associative carry propagation, segment-end gathers.

    ginst [MAX_AL, width]; qem [MAX_INST] emission->aligned map (sentinel MAX_AL);
    rank [MAX_INST] segment ids (gaussian id per emission slot); seg_s/seg_e [N] segment
    bounds. Emission order is gaussian-id order, so the segment-end gather lands directly
    in gid order. Returns [N, width]."""
    max_aligned, width = ginst.shape
    # the emission-order row gather is the most expensive single op of the backward
    # (~30 ms f32 at 2M instances: each [*,10] row physically occupies a 128-lane tile);
    # gathering in bf16 halves the tile traffic (measured ~1.7x faster). Only the
    # PRE-SUM values round (<=0.4% relative, unbiased) — the segment sums and everything
    # downstream stay f32, and the e2e PSNR gate covers the quality impact. The GUT path
    # passes gather_dtype=f32: its quaternion chain amplifies the rounding ~10x
    # (tools/gut_parity_check.py fails at bf16).
    ginst_pad = jnp.concatenate(
        [ginst.astype(gather_dtype), jnp.zeros((1, width), gather_dtype)], axis=0
    )
    # sentinel -> 0; the segment sums and everything downstream run in f32 regardless
    # of the gather dtype (ginst may already arrive bf16 from the kernel)
    ge = ginst_pad[jnp.minimum(qem, max_aligned)].astype(jnp.float32)
    return segred_from_emission(ge, rank, seg_s, seg_e,
                                bf16=gather_dtype == jnp.bfloat16, impl=impl)


def segred_from_emission(ge, rank, seg_s, seg_e, *, bf16: bool = True,
                         impl: str | None = None):
    """Segmented reduce of EMISSION-ORDER gradient rows to per-gaussian totals.

    ge [MAX_INST, width] f32 (rows already bf16-rounded upstream when bf16=True);
    rank [MAX_INST] segment ids (gaussian id per emission slot, runs contiguous);
    seg_s/seg_e [N] segment bounds. Returns [N, width].

    impl (A/B lanes, tools/profiling/profile_segred3.py):
    * "pallas_mm": the block_mm scheme as ONE Pallas kernel with the run carry in VMEM
      scratch across the sequential grid (`segred_prefix_pallas`) — avoids
      materializing the [nb, 128, 128] mask array through HBM.
    * "block_mm" (default): ONE batched MXU matmul per 128-block, `A @ x` with
      A[i,j] = (rank_i == rank_j) & (j <= i) — the segmented inclusive prefix, since
      runs are contiguous. (The triangular term is NOT redundant: emission slots past
      `total` hold the last gaussian's rank via the cummax fill, so the last segment's
      end position would otherwise sum tail rows too.) Replaces 7 masked Hillis-Steele
      passes (each streaming the padded [*,width] array) with 128x128 MXU work that is
      ~free next to the A materialization; measured 39 vs 44 ms at garden scale. In the
      full step graph XLA fuses the mask materialization into the matmul read, beating
      the Pallas kernel (which is 2x faster in isolation but forces a fusion boundary
      on the gathered input) — 189.2 vs 193.9 ms (tools/profiling/profile_r4b.py).
    * "pad_scan": block-local Hillis-Steele on the padded [nb, blk, width] layout.
    * "flat_scan": the same scan on a DENSE flat [nb, blk*width] layout (the padded
      form streams 12.8x the useful bytes per pass; the flat form pays two relayouts
      instead — measured slightly SLOWER on chip, kept as a lane)."""
    max_inst, width = ge.shape
    gather_dtype = jnp.bfloat16 if bf16 else jnp.float32

    if impl is None:
        # default is block_mm EVERYWHERE: in the full step graph XLA fuses the
        # [nb, 128, 128] mask materialization into the matmul read, beating the Pallas
        # kernel (which is 2x faster in isolation but forces a fusion boundary on the
        # gathered input) — 189.2 vs 193.9 ms full step (tools/profiling/profile_r4b.py)
        import os

        impl = os.environ.get("TPU_SPLAT_SEGRED_IMPL", "block_mm")
    if impl == "pallas_mm":
        x = segred_prefix_pallas(
            ge, rank, exact=gather_dtype != jnp.bfloat16,
            interpret=jax.default_backend() == "cpu",
        )
        per_gid = x[jnp.clip(seg_e - 1, 0, max_inst - 1)]
        return per_gid * (seg_e > seg_s)[:, None]

    blk = 128
    nb = max_inst // blk
    rb = rank.reshape(nb, blk)
    if impl == "block_mm":
        # A is exact in bf16 (0/1); the fast path's rows are already bf16-quantized by
        # the gather above, so a DEFAULT-precision bf16 matmul (f32 accumulation) loses
        # nothing. The GUT path gathers f32 — give it a HIGHEST-precision f32 matmul.
        if gather_dtype == jnp.bfloat16:
            a_dt, x_dt, prec = jnp.bfloat16, jnp.bfloat16, None
        else:
            a_dt, x_dt, prec = jnp.float32, jnp.float32, jax.lax.Precision.HIGHEST
        ii = jnp.arange(blk, dtype=jnp.int32)
        tri = ii[:, None] >= ii[None, :]
        same = ((rb[:, :, None] == rb[:, None, :]) & tri[None]).astype(a_dt)
        xb = jax.lax.dot_general(
            same, ge.reshape(nb, blk, width).astype(x_dt),
            (((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32,
        )
        last = xb[:, -1]
    elif impl == "flat_scan":
        bw = blk * width
        fb = ge.reshape(nb, bw)  # dense relayout: 10 full lane-tiles per 128 rows
        # per-element segment id, flat (materialized once; each pass then compares
        # dense rolls of this array instead of broadcasting a per-row mask)
        rf = jnp.broadcast_to(rank.reshape(nb, blk)[:, :, None],
                              (nb, blk, width)).reshape(nb, bw)
        step = 1
        while step < blk:
            s = step * width
            shifted = jnp.concatenate(
                [jnp.zeros((nb, s), jnp.float32), fb[:, :-s]], axis=1
            )
            same = jnp.concatenate(
                [jnp.zeros((nb, s), bool), rf[:, s:] == rf[:, :-s]], axis=1
            )
            fb = fb + jnp.where(same, shifted, 0.0)
            step *= 2
        last = fb[:, -width:]  # [nb, width] trailing-run sum at each block end
        xb = None
    else:
        xb = ge.reshape(nb, blk, width)
        step = 1
        while step < blk:
            shifted = jnp.concatenate(
                [jnp.zeros((nb, step, width), jnp.float32), xb[:, :-step]], axis=1
            )
            same = jnp.concatenate(
                [jnp.zeros((nb, step), bool), rb[:, step:] == rb[:, :-step]], axis=1
            )
            xb = xb + jnp.where(same[:, :, None], shifted, 0.0)
            step *= 2
        last = xb[:, -1]  # [nb, width] trailing-run sum at each block end

    lastrank = rb[:, -1]
    firstrank = rb[:, 0]
    spans = (firstrank == lastrank).astype(jnp.float32)  # block is one segment run
    eq = jnp.concatenate([jnp.zeros((1,), bool), lastrank[:-1] == firstrank[1:]])
    a_coef = jnp.where(
        eq, jnp.concatenate([jnp.zeros((1,), jnp.float32), spans[:-1]]), 0.0
    )[:, None]
    b_coef = jnp.where(
        eq[:, None], jnp.concatenate([jnp.zeros((1, width), jnp.float32), last[:-1]]), 0.0
    )

    def affine_op(l, r):
        al, bl = l
        ar, br = r
        return al * ar, br + ar * bl

    _, carry = jax.lax.associative_scan(affine_op, (a_coef, b_coef), axis=0)
    if impl == "flat_scan":
        in_first = jnp.broadcast_to(
            (rb == firstrank[:, None])[:, :, None], (nb, blk, width)
        ).reshape(nb, blk * width)
        cf = jnp.broadcast_to(carry[:, None, :], (nb, blk, width)).reshape(
            nb, blk * width)
        fb = fb + jnp.where(in_first, cf, 0.0)
        x = fb.reshape(max_inst, width)
    else:
        xb = xb + jnp.where(
            (rb == firstrank[:, None])[:, :, None], carry[:, None, :], 0.0)
        x = xb.reshape(max_inst, width)
    per_gid = x[jnp.clip(seg_e - 1, 0, max_inst - 1)]
    return per_gid * (seg_e > seg_s)[:, None]


SEGSUM_BLK = 512  # gaussians per segsum output block
SEGSUM_WIN = 1024  # emission slots fetched per while-loop window


def _segsum_kernel(win_start_ref, rows_ref, rank_ref, out_ref, buf, rbuf, sems, rsems):
    """Per-gaussian gradient totals as windowed one-hot matmuls over EMISSION order
    (the reverse of `_expand_kernel`: there one-hot ownership EXPANDS per-gaussian rows
    to emission slots; here one-hot-transposed ownership SUMS emission rows per
    gaussian). Emission order is gaussian-id order, so the slots owned by an
    OUT-block of gaussians form a contiguous window — sequential DMA, no random
    gather, no [nb, 128, 128] mask through HBM, and no 1M-row segment-end gather
    (both of which made the prefix-scan scheme ~20 ms at garden scale).

    Exactness: ownership is one-hot, so each output element is a plain f32-accumulated
    sum of its owned rows (the rows themselves are bf16-rounded upstream by the
    emission gather — same budget as the prefix scheme's bf16 path)."""
    b = pl.program_id(0)
    g0 = b * SEGSUM_BLK
    base = pl.multiple_of((win_start_ref[b] // 128) * 128, 128)

    def row_dma(slot, w):
        # feature-major [16, WIN] windows: lane-dim HBM slices demand 128-aligned
        # offsets (a [WIN, 16] row window has a 16-lane minor dim Mosaic rejects)
        return pltpu.make_async_copy(
            rows_ref.at[:, pl.ds(base + w * SEGSUM_WIN, SEGSUM_WIN)], buf.at[slot],
            sems.at[slot])

    def rank_dma(slot, w):
        return pltpu.make_async_copy(
            rank_ref.at[:, pl.ds(base + w * SEGSUM_WIN, SEGSUM_WIN)], rbuf.at[slot],
            rsems.at[slot])

    row_dma(0, 0).start()
    rank_dma(0, 0).start()
    gid_col = g0 + jax.lax.broadcasted_iota(jnp.int32, (SEGSUM_BLK, 1), 0)

    def cond(c):
        w, acc, done = c
        return jnp.logical_not(done)

    def body(c):
        w, acc, _ = c
        slot = jax.lax.rem(w, 2)
        row_dma(slot, w).wait()
        rank_dma(slot, w).wait()
        # speculative prefetch (bounds padded by >= 2*SEGSUM_WIN rows)
        row_dma(1 - slot, w + 1).start()
        rank_dma(1 - slot, w + 1).start()
        rk = rbuf[slot]  # [1, WIN] int32, monotone (huge sentinel in the pad tail)
        oh = (rk == gid_col).astype(jnp.bfloat16)  # [BLK, WIN] exact 0/1
        acc = acc + jax.lax.dot_general(
            buf[slot], oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # contract both lane dims: [16, WIN] x [BLK, WIN] -> [16, BLK]
        done = rk[0, SEGSUM_WIN - 1] > g0 + (SEGSUM_BLK - 1)
        return w + 1, acc, done

    w, acc, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((NFEAT, SEGSUM_BLK), jnp.float32), jnp.bool_(False)),
    )
    # drain the speculative prefetch started by the last body iteration
    row_dma(jax.lax.rem(w, 2), w).wait()
    rank_dma(jax.lax.rem(w, 2), w).wait()
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def segsum_emission(rows, rank, win_start, *, interpret: bool = False):
    """rows [16, M_cols] (bf16; feature-major, EMISSION order, padded >= 2*SEGSUM_WIN
    columns, junk rows zero), rank [1, M_cols] int32 (owning gaussian id per slot,
    monotone, huge in the pad), win_start [nb] int32 (first emission slot of each gid
    block; M-clamped for padded blocks). Returns [16, nb*SEGSUM_BLK] f32 sums
    (feature-major: a lane-16 output array triggered a pathological 16 GB buffer
    liveness blowup in the full train graph's buffer assignment)."""
    nb = win_start.shape[0]
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((NFEAT, SEGSUM_BLK), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, NFEAT, SEGSUM_WIN), rows.dtype),
                pltpu.VMEM((2, 1, SEGSUM_WIN), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NFEAT, nb * SEGSUM_BLK), jnp.float32),
        interpret=interpret,
    )(win_start, rows, rank)


def blend_tiles_pallas(
    inst: SortedInstances,
    mean2d: jnp.ndarray,  # [N, 2]
    conic: jnp.ndarray,  # [N, 3]
    opacity: jnp.ndarray,  # [N]
    color: jnp.ndarray,  # [N, 3] (already clamped >= 0 by the caller)
    depth: jnp.ndarray,  # [N] camera-space z (render modes D/ED)
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int,
    k_max: int,
    chunk: int = CHUNK,
    interpret: bool = False,
    tile_y0=None,  # traced [] int32 global tile-row offset (multi-chip windows)
    feat_bf16: bool = False,  # bf16 hi/lo feature pack (half the gather + kernel DMA)
    grad_bf16: bool = True,  # bf16 per-instance grads (same rounding point as before)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-path tile blend.

    Returns (tile_colors [T, P, 3], tile_alpha [T, P], tile_depth [T, P])."""
    assert tile_size * tile_size % 128 == 0, "pixel count per tile must be lane-aligned"
    assert inst.sorted_gid.shape[0] % chunk == 0, (
        f"max_instances {inst.sorted_gid.shape[0]} must be a multiple of chunk {chunk}"
    )
    n_tiles = grid_w * grid_h
    n = mean2d.shape[0]
    max_inst = inst.sorted_gid.shape[0]
    k_max_al = ((k_max + chunk - 1) // chunk) * chunk
    max_chunks = k_max_al // chunk
    # the per-chunk transmittance checkpoint lives in a [P, max_chunks] VMEM scratch;
    # cap its lane width (512 lanes * 1024 px * 4 B = 2 MiB) rather than silently
    # truncating tiles past the cap (the trainer redoes any step with
    # max_tile_count > k_max, so an assert here is a real capacity bound, not a cliff)
    assert max_chunks <= 512, (
        f"k_max={k_max} needs {max_chunks} chunks > 512; raise chunk or tile size"
    )
    p = tile_size * tile_size

    # UNALIGNED segments: per-tile element offsets feed the kernel DMAs directly — no
    # chunk alignment pass (align_segments now serves only the GUT path). The tail
    # chunk of each tile overreads/overwrites into the next tile's columns; reads are
    # masked by lane_valid, writes are zero-masked + resolved by sequential grid order
    # (see blend.py). Replaces align (+12 ms) and makes the pack gather+transpose fuse
    # into ONE op (tools/profiling/profile_r5.py: 28.3 -> 16 ms at garden scale).
    count_capped = jnp.minimum(inst.tile_count, max_chunks * chunk)
    seg_start = inst.tile_start
    # emission -> sorted-slot map: invert the sorted_emis permutation by sorting
    # (a 1-key/1-payload int32 sort costs ~half of XLA's element scatter at this size)
    _, qe_emis = jax.lax.sort(
        (inst.sorted_emis, jnp.arange(max_inst, dtype=jnp.int32)),
        num_keys=1, is_stable=False,
    )

    statics = dict(n_tiles=n_tiles, grid_w=grid_w, tile_size=tile_size,
                   max_chunks=max_chunks, chunk=chunk, interpret=interpret)
    y0_arr = (jnp.zeros((), jnp.int32) if tile_y0 is None
              else jnp.asarray(tile_y0, jnp.int32))

    # Pack OUTSIDE the custom_vjp: ONE fused row-gather+transpose into the flat
    # feature-major [16, M_pad] table (XLA folds the transpose into the gather's output
    # layout — measured the same cost as the row gather alone). The f32 path gathers
    # inst.gtab directly (G_* cols 0-9 are the kernel's F_* feature layout; the junk in
    # cols 10-15 is never read), so no separate feature table is ever built. Gradients
    # flow exclusively through core's hand-written VJP (the segmented reduce is exactly
    # the transpose of this gather); stop_gradient cuts the autodiff path through the
    # pack itself.
    if feat_bf16:
        # hi/lo bf16 split for mean2d/conic (pair reconstructs ~f32 in-kernel),
        # single bf16 for opacity/color/depth — see blend.py B_* layout
        def split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        mxh, mxl = split(mean2d[:, 0])
        myh, myl = split(mean2d[:, 1])
        cah, cal = split(conic[:, 0])
        cbh, cbl = split(conic[:, 1])
        cch, ccl = split(conic[:, 2])
        b = jnp.bfloat16
        ptab = jnp.stack(
            [mxh, mxl, myh, myl, cah, cal, cbh, cbl, cch, ccl,
             opacity.astype(b), color[:, 0].astype(b), color[:, 1].astype(b),
             color[:, 2].astype(b), depth.astype(b)],
            axis=1,
        )  # [N, 15] bf16
        ptab = jnp.pad(ptab, ((0, 0), (0, NFEAT - ptab.shape[1])))
    else:
        ptab = inst.gtab
    # pad the sorted-gid index (rather than the packed output) so the pad columns ride
    # the same fused gather. Bound: the last tile's backward write window spans up to
    # floor128(start) + max_chunks*chunk + 128 columns (the kernel writes its FULL
    # rolled accumulator window regardless of the tile's chunk count); forward reads
    # stay within start + max_chunks*chunk + 128 too.
    gid_pad = jnp.concatenate(
        [inst.sorted_gid, jnp.zeros((k_max_al + 128,), jnp.int32)]
    )  # [M_pad]
    flat = jax.lax.optimization_barrier(
        jnp.transpose(ptab[gid_pad])
    )  # [16, M_pad] feature-major
    flat = jax.lax.stop_gradient(flat)

    @jax.custom_vjp
    def core(m2d, con, op, col, dep, fl, sstart, count, qem, rank, seg_s, seg_e, y0):
        out, _ = blend_forward(fl, sstart, count, tile_y0=y0, **statics)
        return out[:, :, :5]

    def core_fwd(m2d, con, op, col, dep, fl, sstart, count, qem, rank, seg_s, seg_e, y0):
        out, chk = blend_forward(fl, sstart, count, tile_y0=y0, **statics)
        return out[:, :, :5], (fl, chk, out, sstart, count, qem, rank, seg_s,
                               seg_e, y0)

    def core_bwd(res, g5):
        fl, chk, out, sstart, count, qem, rank, seg_s, seg_e, y0 = res
        gout = jnp.concatenate([g5, jnp.zeros((n_tiles, p, 3), jnp.float32)], axis=-1)
        gdt = jnp.bfloat16 if grad_bf16 else jnp.float32
        gflat = blend_backward(fl, sstart, count, chk, out, gout, tile_y0=y0,
                               grad_dtype=gdt, **statics)  # [16, M_pad]
        # transpose FIRST (one cheap relayout, ~3 ms at garden scale), THEN row-gather
        # to emission order. The barrier is load-bearing: fusing the transpose into the
        # gather makes XLA emit a lane-dimension gather over [16, M_pad] — measured
        # 5.4 SECONDS vs ~21 ms for the split form (tools/profiling/profile_r5e.py)
        gfl_rows = jax.lax.optimization_barrier(jnp.transpose(gflat))  # [M_pad, 16]
        import os

        impl = os.environ.get("TPU_SPLAT_SEGRED_IMPL", "segsum")
        if grad_bf16 and impl == "segsum":
            # windowed one-hot segsum kernel: no prefix scan, no [nb, 128, 128] mask
            # through HBM, no 1M-row segment-end gather (~20 -> ~5 ms at garden scale)
            rows_em = gfl_rows[qem]  # [MAX_INST, 16] bf16 — junk cols 10-15 are zero
            # back to feature-major for the kernel's lane-dim windows (barrier again:
            # a fused transpose+gather emits the pathological lane gather)
            rows_p = jnp.concatenate(
                [jax.lax.optimization_barrier(jnp.transpose(rows_em)),
                 jnp.zeros((NFEAT, 2 * SEGSUM_WIN), rows_em.dtype)], axis=1)
            rank_p = jnp.concatenate(
                [rank, jnp.full((2 * SEGSUM_WIN,), 2**30, jnp.int32)])[None, :]
            nb = -(-n // SEGSUM_BLK)
            bidx = jnp.arange(nb, dtype=jnp.int32) * SEGSUM_BLK
            ws = jnp.where(bidx < n, seg_s[jnp.minimum(bidx, n - 1)],
                           jnp.int32(max_inst))
            import os as _os
            if _os.environ.get("SEGSUM_FAKE", "0") == "1":
                acc = (jnp.broadcast_to(jnp.sum(rows_p, axis=1)[None, :],
                                        (n, 16)).astype(jnp.float32)[:, :10]
                       + 0.0 * jnp.sum(rank_p).astype(jnp.float32)
                       + 0.0 * jnp.sum(ws).astype(jnp.float32))
            else:
                acc_t = segsum_emission(rows_p, rank_p, ws,
                                        interpret=statics["interpret"])
                acc = jax.lax.optimization_barrier(
                    jnp.transpose(acc_t))[:n, :10]
        else:
            ge = gfl_rows[qem][:, :10].astype(jnp.float32)  # [MAX_INST, 10]
            acc = segred_from_emission(ge, rank, seg_s, seg_e, bf16=grad_bf16)
        g_m2d = acc[:, 0:2]
        g_con = acc[:, 2:5]
        g_op = acc[:, 5]
        g_col = acc[:, 6:9]
        g_dep = acc[:, 9]

        def f0(y):
            return np.zeros(y.shape, dtype=jax.dtypes.float0)

        # fl's cotangent is discarded by the stop_gradient at the call site (its true
        # adjoint is the segmented reduce above); zeros here are DCE'd
        return (g_m2d, g_con, g_op, g_col, g_dep, jnp.zeros_like(fl), f0(sstart),
                f0(count), f0(qem), f0(rank), f0(seg_s), f0(seg_e), f0(y0))

    core.defvjp(core_fwd, core_bwd)

    out5 = core(mean2d, conic, opacity, color, depth, flat, seg_start, count_capped,
                qe_emis, inst.emis_rank, inst.emis_start, inst.emis_end, y0_arr)
    tile_colors = out5[:, :, 0:3]
    tile_alpha = 1.0 - out5[:, :, 3]
    tile_depth = out5[:, :, 4]
    return tile_colors, tile_alpha, tile_depth
