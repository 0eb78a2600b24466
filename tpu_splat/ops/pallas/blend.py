"""Pallas TPU kernels for the tile blend — forward + hand-written backward.

TPU-native replacement for the reference's blend kernels
(fastgs/rasterization/include/kernels_forward.cuh:356-459 `blend_cu` and
kernels_backward.cuh:240-449 `blend_backward_cu`). Same math, different parallel shape:

  * CUDA: one thread-block per tile, one thread per pixel, warps sweep primitives with
    shfl pipelines; backward replays from per-32-primitive (color, transmittance) buckets
    with atomicAdd gradient accumulation.
  * here: one grid step per tile; work arrays are laid out [P=256 pixels (sublanes),
    C=128 gaussians (lanes)]; the sequential front-to-back recurrence becomes a closed
    form per chunk (cumprod of (1-alpha) along lanes via a 7-step log-scan of lane rolls);
    the backward replays each chunk from a per-chunk transmittance checkpoint (the bucket
    idea, chunk=128) and accumulates per-instance gradients into disjoint column ranges —
    no atomics.

Instance features arrive feature-major [16, M_pad] in tile-sorted depth order
(see raster.py). Per-tile segments are *unaligned*. Mosaic cannot slice HBM memrefs at
unproven lane offsets (tpu.memref_slice demands divisibility by the 128-lane tiling), so
unaligned access is built from proven-aligned pieces (tools/profiling/
test_unaligned_roll.py validates the scheme on hardware):

  * reads: DMA the 128-rounded-down window [16, chunk+128] and pltpu.roll the buffer by
    the (dynamic) residue — roll amounts must be POSITIVE (width - off); a negative
    dynamic shift mis-lowers on this toolchain. Tail lanes past `count` read the next
    tile's columns and are masked by lane index.
  * backward writes: per-chunk gradients land in a per-tile VMEM accumulator at their
    chunk slot (VMEM->VMEM DMA), which is rolled to the residue offset once per tile and
    written as ONE aligned [16, L+128] window. The window's head 128-lane tile is
    ADD-merged with the previous tiles' already-written values (one HBM read per tile);
    zero-masked tail lanes overwrite nothing that a LATER tile doesn't rewrite, because
    TPU grid steps execute sequentially in tile order and each column's owner writes
    last.

Blend semantics preserved exactly (rasterization_config.h:11-30):
  sigma >= 0; alpha = min(opac * exp(-sigma), 0.999), skip if < 1/255;
  stop (excluding the triggering gaussian) when T*(1-alpha) < 1e-4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feature-row indices in the flat [16, M_pad] instance table (f32 layout)
F_MX, F_MY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_D = range(10)
NFEAT = 16  # padded to a (16, 128) f32 tile

# bf16 feature layout: mean2d and conic ride as hi/lo bf16 pairs (the pair reconstructs
# ~f32: truncation error ~2^-17 relative, i.e. ~0.01 px on a 1296-px image), opacity/
# color/depth as single bf16 (<=0.4% relative — the forward AND backward use the same
# rounded values, so training optimizes through an exactly-differentiated, slightly
# perturbed rasterizer). Halves the pack-gather and kernel DMA traffic vs f32.
(B_MXH, B_MXL, B_MYH, B_MYL, B_CAH, B_CAL, B_CBH, B_CBL, B_CCH, B_CCL,
 B_OP, B_R, B_G, B_B, B_D) = range(15)

MIN_ALPHA = 1.0 / 255.0
MAX_FRAGMENT_ALPHA = 0.999
TRANSMITTANCE_THRESHOLD = 1e-4
LOG2E = 1.4426950408889634  # base-2 transcendental folding (see _chunk_alphas)

CHUNK = 128  # default gaussians per inner step (lane dim); kernels accept 128 or 256


def _lane_scan(x, op, identity):
    """Inclusive scan along the lane axis via log-depth rolls."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    ident = jnp.full_like(x, identity)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = op(x, jnp.where(col >= s, shifted, ident))
        s *= 2
    return x


def _lane_cumprod(x):
    return _lane_scan(x, jnp.multiply, 1.0)


def _lane_cumsum(x):
    return _lane_scan(x, jnp.add, 0.0)


def _lane_cummax(x):
    return _lane_scan(x, jnp.maximum, -jnp.inf)


def _strict_upper(chunk: int):
    """U[i, j] = 1 if i < j — dot(x, U) gives the EXCLUSIVE lane prefix-sum of x.

    MXU matmuls replace the log-depth roll scans: the rolls measured ~4x the cost of a
    plain elementwise pass at [1024, 256] (tools/profiling/profile_bwd_bisect.py) while a
    [P,C]x[C,C] matmul is sub-microsecond on the MXU."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return jnp.where(row < col, 1.0, 0.0)


def _strict_lower(chunk: int):
    """S[i, j] = 1 if i > j — dot(x, S) gives the lane suffix-sum excluding self."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return jnp.where(row > col, 1.0, 0.0)


def _mm(a, b, precision=None):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _lane_exclusive_cumsum_bf16(x, u_strict):
    """Single-matmul exclusive lane prefix: LHS truncated to bf16 (~2^-8 relative on
    the log values -> ~0.4% on the recovered cumprod). Half the MXU passes of the
    hi/lo split; the `lowp` A/B lane."""
    c = x.shape[-1]
    if u_strict.shape[0] == c or c <= 128:
        return _mm(x.astype(jnp.bfloat16).astype(jnp.float32), u_strict)
    assert c % 128 == 0
    parts = []
    run = None
    for i in range(c // 128):
        xi = x[:, i * 128 : (i + 1) * 128]
        ei = _mm(xi.astype(jnp.bfloat16).astype(jnp.float32), u_strict)
        if run is not None:
            ei = ei + run
        run = ei[:, 127:128] + xi[:, 127:128]
        parts.append(ei)
    return jnp.concatenate(parts, axis=-1)


def _lane_exclusive_cumsum_f32(x, u_strict):
    """Exclusive lane prefix-sum via MXU at f32 fidelity: the 0/1 triangular RHS is
    EXACT in bf16, so splitting the LHS into hi + lo bf16 halves and summing two
    DEFAULT-precision matmuls reproduces f32 (the only error source is the LHS
    truncation) at 1/3 the passes of Precision.HIGHEST.

    At chunk > 128 the triangular matmul is block-decomposed: an exclusive prefix
    within each 128-lane half plus the first half's total broadcast into the second —
    half the MXU flops of the full [C, C] triangle (prefix cost scales as C per lane,
    the split makes it 128 per lane)."""
    c = x.shape[-1]
    if u_strict.shape[0] == c or c <= 128:
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        return _mm(hi, u_strict) + _mm(lo, u_strict)
    assert c % 128 == 0
    parts = []
    run = None  # [P, 1] running total of preceding halves
    for i in range(c // 128):
        xi = x[:, i * 128 : (i + 1) * 128]
        hi = xi.astype(jnp.bfloat16).astype(jnp.float32)
        lo = xi - hi
        ei = _mm(hi, u_strict) + _mm(lo, u_strict)
        if run is not None:
            ei = ei + run
        run = ei[:, 127:128] + xi[:, 127:128]  # total through this half
        parts.append(ei)
    return jnp.concatenate(parts, axis=-1)


def _lane_strict_suffix_sum(u, s_lower):
    """Strictly-later-lane suffix sum (DEFAULT precision), block-decomposed at
    chunk > 128 like `_lane_exclusive_cumsum_f32` (later halves' totals broadcast
    into earlier halves)."""
    c = u.shape[-1]
    if s_lower.shape[0] == c or c <= 128:
        return _mm(u, s_lower)
    assert c % 128 == 0
    nblk = c // 128
    parts = [None] * nblk
    run = None  # [P, 1] total of strictly-later halves
    for i in range(nblk - 1, -1, -1):
        ui = u[:, i * 128 : (i + 1) * 128]
        si = _mm(ui, s_lower)
        if run is not None:
            si = si + run
        run = si[:, 0:1] + ui[:, 0:1]
        parts[i] = si
    return jnp.concatenate(parts, axis=-1)


def _pixel_coords(t, grid_w: int, tile_size: int, p: int, tile_y0=0):
    """Pixel-center coordinates of tile t as [P, 1] f32 (row-major pixels in tile).

    `tile_y0` offsets the tile row — under the multi-chip tile-row sharding each chip
    rasterizes a window of global tile rows with local tile ids."""
    tile_x = t % grid_w
    tile_y = t // grid_w + tile_y0
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tile_x * tile_size + idx % tile_size).astype(jnp.float32) + 0.5
    py = (tile_y * tile_size + idx // tile_size).astype(jnp.float32) + 0.5
    return px, py


def _feat_rows(data, feat_bf16: bool):
    """Feature rows of one [16, chunk] block as [1, chunk] f32, either layout.

    bf16 layout reconstructs mean2d/conic from hi+lo pairs ([1, chunk] adds — negligible
    next to the [P, chunk] work) and upcasts the single-bf16 rows."""
    if feat_bf16:
        f = lambda i: data[i : i + 1, :].astype(jnp.float32)
        return (f(B_MXH) + f(B_MXL), f(B_MYH) + f(B_MYL),
                f(B_CAH) + f(B_CAL), f(B_CBH) + f(B_CBL), f(B_CCH) + f(B_CCL),
                f(B_OP), f(B_R), f(B_G), f(B_B), f(B_D))
    f = lambda i: data[i : i + 1, :]
    return (f(F_MX), f(F_MY), f(F_CA), f(F_CB), f(F_CC),
            f(F_OP), f(F_R), f(F_G), f(F_B), f(F_D))


def _chunk_alphas(rows, px, py, lane_valid, sigma=None, base2=False):
    """Per-(pixel, gaussian) alpha + masks for one chunk.

    rows = _feat_rows(...); px/py [P, 1]; lane_valid [1, 128] bool (segment tail).
    Returns (a, valid, one_m, gauss) each [P, 128]; a has invalid entries zeroed.
    `sigma` may be precomputed (see `_sigma_mm`); `gauss` is returned so the backward's
    clamp test reuses the SAME exp instead of re-deriving the sigma chain.

    base2: evaluate gauss as exp2(-LOG2E * sigma) with LOG2E folded into the [1, C]
    conic rows (or already folded into `sigma` by the _sigma_mm caller) — exp lowers to
    exp2 + a [P, C] multiply, so folding the scale into per-GAUSSIAN rows deletes one
    full [P, C] VPU pass per chunk. gauss/alpha VALUES are identical (exp2(LOG2E*x) ==
    exp(x)); only sigma's internal scale changes, and sigma is consumed only by the
    sign test + gauss."""
    mx, my, ca, cb, cc, op = rows[:6]

    # sigma >= 0 guards against degenerate conics (rasterization_config.h:11-30); the
    # matmul-sigma path needs a tolerance: its ~1e-3 rounding must not flip the test at
    # gaussian centers (exact sigma ~ 0+), where contributions are strongest
    sig_floor = 0.0
    if sigma is None:
        if base2:
            ca, cb, cc = ca * LOG2E, cb * LOG2E, cc * LOG2E  # [1, C] — free
        dx = mx - px  # [P, 128]
        dy = my - py
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    else:
        sig_floor = -0.01 * (LOG2E if base2 else 1.0)
    exp_fn = jnp.exp2 if base2 else jnp.exp
    gauss = exp_fn(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(op * gauss, MAX_FRAGMENT_ALPHA)
    valid = (sigma >= sig_floor) & (alpha >= MIN_ALPHA) & lane_valid
    a = jnp.where(valid, alpha, 0.0)
    return a, valid, 1.0 - a, gauss


def _hl(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _pixel_basis(px, py, tile_cx, tile_cy):
    """[P, 6] quadratic pixel basis (1, x, y, x^2, xy, y^2) in TILE-LOCAL coordinates,
    hi/lo bf16 split. Tile-local centering bounds every basis/coefficient product by
    ~O(power_threshold + conic * tile_radius^2), keeping the 3-matmul hi/lo product
    error ~2^-17 relative (see `_sigma_mm`)."""
    x = px - tile_cx  # [P, 1]
    y = py - tile_cy
    b = jnp.concatenate([jnp.ones_like(x), x, y, x * x, x * y, y * y], axis=-1)  # [P, 6]
    return _hl(b)


def _sigma_mm(bh, bl, rows, tile_cx, tile_cy, base2=False):
    """sigma(p, c) as ONE quadratic-form matmul: [P, 6] pixel basis x [6, C] per-gaussian
    coefficients. Moves the ~7 VPU passes of the (dx, dy, sigma) evaluation onto the MXU
    (3 DEFAULT-precision bf16 matmuls: hh + hl + lh; the omitted ll term and the hi/lo
    input truncation bound the error at ~2^-17 relative of the largest expanded term,
    which tile-local centering keeps ~O(100) -> absolute sigma error ~1e-3).

    base2: returns LOG2E * sigma (scale folded into the [1, C] conic rows — free; see
    _chunk_alphas)."""
    mx, my, ca, cb, cc = rows[:5]
    if base2:
        ca, cb, cc = ca * LOG2E, cb * LOG2E, cc * LOG2E  # [1, C] — free
    mxl = mx - tile_cx  # [1, C]
    myl = my - tile_cy
    g = jnp.concatenate(
        [
            0.5 * (ca * mxl * mxl + cc * myl * myl) + cb * mxl * myl,
            -(ca * mxl + cb * myl),
            -(cc * myl + cb * mxl),
            0.5 * ca,
            cb,
            0.5 * cc,
        ],
        axis=0,
    )  # [6, C]
    gh, gl = _hl(g)
    return _mm(bh, gh) + _mm(bh, gl) + _mm(bl, gh)


def _exclusive_from_inclusive_prod(cp_incl):
    """Exclusive cumprod from the inclusive one: roll + first-lane reset (cheaper than a
    full [P, C] divide on the VPU)."""
    col = jax.lax.broadcasted_iota(jnp.int32, cp_incl.shape, cp_incl.ndim - 1)
    return jnp.where(col == 0, 1.0, pltpu.roll(cp_incl, 1, axis=cp_incl.ndim - 1))


def _composite_chunk(a, valid, one_m, t_run, dead):
    """Closed-form front-to-back recurrence for one chunk (matches ops/blend.py).

    a/valid/one_m [P, C]; t_run/dead [P, 1]. Returns (w [P, C], t_new, dead_new).

    ONE lane scan suffices: t_incl is monotone non-increasing along the lane, so the stop
    predicate `t_incl < threshold` is a suffix property — the or-scan over triggers
    collapses to the predicate itself, and the post-chunk transmittance is the minimum
    t_incl over still-above-threshold lanes (t_run when none).
    """
    cp_incl = _lane_cumprod(one_m)
    t_excl = t_run * _exclusive_from_inclusive_prod(cp_incl)
    t_incl = t_run * cp_incl
    below = t_incl < TRANSMITTANCE_THRESHOLD
    alive = dead < 0.5
    use = valid & ~below & alive
    w = jnp.where(use, a * t_excl, 0.0)
    t_candidate = jnp.min(jnp.where(below, t_run, t_incl), axis=-1, keepdims=True)
    t_new = jnp.where(alive, t_candidate, t_run)
    triggered = jnp.max(jnp.where(valid & below, 1.0, 0.0), axis=-1, keepdims=True)
    dead_new = jnp.maximum(dead, triggered)
    return w, t_new, dead_new


def _lane_iota_row(chunk: int):
    return jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)


def _mm_hl(a, b):
    """f32-fidelity matmul via hi/lo bf16 split of BOTH operands (hh + hl + lh at
    DEFAULT precision; the dropped ll term is ~2^-16 relative)."""
    ah, al = _hl(a)
    bh, bl = _hl(b)
    ahf = ah.astype(jnp.float32)
    bhf = bh.astype(jnp.float32)
    return (_mm(ahf, bhf) + _mm(ahf, bl.astype(jnp.float32))
            + _mm(al.astype(jnp.float32), bhf))


def _bwd_basis(px, py, tile_cx, tile_cy, gout_rows):
    """Per-tile constants of the basis-reduction backward (hoisted out of the chunk
    loop): bT [6, P] = (1, x, y, x^2, xy, y^2) in TILE-LOCAL pixel coordinates and
    gT [4, P] = per-pixel color/depth cotangents.

    The ten per-gaussian gradient reductions collapse onto these bases:
      * the five sigma-chain gradients (d/dmean2d, d/dconic) are linear combinations of
        the moments S_k[c] = sum_p dLs[p,c] * basis_k[p] because dx = mx - px expands
        polynomially in px — so ONE [6, P] x [P, C] matmul replaces five [P, C]
        multiply passes plus their reductions;
      * d/dopacity = -S1 / op exactly (dL_da * gauss = -dLs / op wherever dLs != 0);
      * the four color/depth gradients are gT @ w.
    Tile-local centering keeps basis magnitudes <= tile_size^2, so the hi/lo bf16
    matmul split holds ~f32 fidelity without cancellation."""
    x = jnp.transpose(px - tile_cx)  # [1, P]
    y = jnp.transpose(py - tile_cy)
    ones = jnp.ones_like(x)
    bt = jnp.concatenate([ones, x, y, x * x, x * y, y * y], axis=0)  # [6, P]
    gt = jnp.concatenate([jnp.transpose(g) for g in gout_rows], axis=0)  # [4, P]
    return bt, gt


# ------------------------------------------------------------------------------- forward


def _fwd_kernel(
    seg_start_ref, count_ref,  # scalar prefetch [T] int32 (element offset, capped count)
    y0_ref,  # scalar prefetch [1] int32 (tile-row offset for multi-chip windows)
    flat_ref,  # [16, M_pad] ANY (HBM): feature-major instance table, tile-sorted order
    out_ref,  # [1, P, 8] VMEM: cols 0-2 rgb, 3 final transmittance
    chk_ref,  # [1, P, MAXC] VMEM: per-chunk entry transmittance (0 where dead)
    buf, chk_s, sems,  # scratch
    *,
    grid_w: int,
    tile_size: int,
    chunk: int,
    feat_bf16: bool = False,
    block_scan: bool = True,
    sigma_mm: bool = False,
    base2: bool = False,
    lowp: bool = False,
):
    t = pl.program_id(0)
    seg0 = seg_start_ref[t]
    count = count_ref[t]
    nch = (count + chunk - 1) // chunk
    p = tile_size * tile_size
    px, py = _pixel_coords(t, grid_w, tile_size, p, y0_ref[0])
    maxc = chk_ref.shape[2]
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, maxc), 1)
    chk_s[:] = jnp.zeros((p, maxc), jnp.float32)  # unvisited chunks read as dead
    lane = _lane_iota_row(chunk)
    u_strict = _strict_upper(min(chunk, 128) if block_scan else chunk)
    if sigma_mm:
        tile_cx = ((t % grid_w) * tile_size + tile_size // 2).astype(jnp.float32)
        tile_cy = ((t // grid_w + y0_ref[0]) * tile_size + tile_size // 2).astype(
            jnp.float32)
        bh, bl = _pixel_basis(px, py, tile_cx, tile_cy)

    # UNALIGNED segment reads: DMA the 128-rounded-down [16, chunk+128] window (offset
    # provably tiling-aligned), roll by the residue in-register. Tail lanes overread
    # the next tile's columns (masked by lane_valid); the caller pads the table so
    # every window stays in bounds.
    base = pl.multiple_of((seg0 // 128) * 128, 128)
    off = seg0 - base

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            flat_ref.at[:, pl.ds(base + j * chunk, chunk + 128)], buf.at[slot],
            sems.at[slot],
        )

    def aligned_window(slot):
        # positive-equivalent dynamic roll (negative shifts mis-lower); lanes [0, chunk)
        # of the result are the segment's lanes [j*chunk, (j+1)*chunk). The roll runs
        # in f32 — tpu.dynamic_rotate supports only 32-bit data; the upcast is one
        # [16, chunk+128] pass and every consumer upcasts the rows anyway.
        w = buf[slot].astype(jnp.float32)
        return pltpu.roll(w, (chunk + 128) - off, axis=1)[:, :chunk]

    @pl.when(nch > 0)
    def _():
        get_dma(0, 0).start()

    def cond(c):
        j, acc4, t_run, dead = c
        return (j < nch) & (jnp.min(dead) < 0.5)

    def body(c):
        j, acc4, t_run, dead = c
        slot = jax.lax.rem(j, 2)
        get_dma(slot, j).wait()

        @pl.when(j + 1 < nch)
        def _():
            get_dma(1 - slot, j + 1).start()

        data = aligned_window(slot)  # [16, chunk]
        # checkpoint the chunk-entry transmittance (0 encodes "already stopped").
        # Mosaic forbids dynamic lane-index stores; a masked full-width select updates
        # one column of the [P, MAXC] scratch instead.
        chk_s[:] = jnp.where(chk_col == j, jnp.where(dead > 0.5, 0.0, t_run), chk_s[:])

        lane_valid = lane < (count - j * chunk)  # [1, chunk] segment-tail mask
        rows = _feat_rows(data, feat_bf16)
        sig = (_sigma_mm(bh, bl, rows, tile_cx, tile_cy, base2=base2)
               if sigma_mm else None)
        a, valid, one_m, _ = _chunk_alphas(rows, px, py, lane_valid, sigma=sig,
                                           base2=base2)
        # exclusive cumprod via exp(bf16-split MXU prefix of logs): two DEFAULT-precision
        # matmuls reproduce f32 (see _lane_exclusive_cumsum_f32). A HIGHEST-precision
        # variant measured SLOWER than the rolls (87 vs 48 ms); the split form is 3x
        # fewer MXU passes. Rest of _composite_chunk inlined on top of cp_excl.
        # base2: log/exp lower to log2/exp2 + a multiply; in base-2 log space the
        # multiplies vanish (the prefix SUM is base-agnostic).
        log_fn, exp_fn = (jnp.log2, jnp.exp2) if base2 else (jnp.log, jnp.exp)
        pfx = _lane_exclusive_cumsum_bf16 if lowp else _lane_exclusive_cumsum_f32
        cp_excl = exp_fn(pfx(log_fn(one_m), u_strict))
        t_excl = t_run * cp_excl
        t_incl = t_excl * one_m
        below = t_incl < TRANSMITTANCE_THRESHOLD
        alive_px = dead < 0.5
        use = valid & ~below & alive_px
        w = jnp.where(use, a * t_excl, 0.0)
        t_candidate = jnp.min(jnp.where(below, t_run, t_incl), axis=-1, keepdims=True)
        t_new = jnp.where(alive_px, t_candidate, t_run)
        triggered = jnp.max(jnp.where(valid & below, 1.0, 0.0), axis=-1, keepdims=True)
        dead_new = jnp.maximum(dead, triggered)

        # color/depth accumulation as ONE MXU matmul instead of 4 lane reductions
        c0 = B_R if feat_bf16 else F_R
        col4 = jnp.transpose(data[c0 : c0 + 4, :]).astype(jnp.float32)  # [C, 4]
        acc4 = acc4 + _mm(w, col4)
        return j + 1, acc4, t_new, dead_new

    zero = jnp.zeros((p, 1), jnp.float32)
    j, acc4, t_run, dead = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((p, 4), jnp.float32), zero + 1.0, zero)
    )

    # early exit leaves one prefetch in flight (started for chunk j during chunk j-1's
    # body) — drain it, or its semaphore signal corrupts the next grid step
    @pl.when(j < nch)
    def _():
        get_dma(jax.lax.rem(j, 2), j).wait()

    chk_ref[0] = chk_s[:]
    out_ref[0] = jnp.concatenate(
        [acc4[:, 0:3], t_run, acc4[:, 3:4], jnp.zeros((p, 3), jnp.float32)], axis=-1
    )  # [P, 8]: rgb, final transmittance, accumulated depth


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "grid_w", "tile_size", "max_chunks", "chunk",
                              "interpret", "block_scan", "sigma_mm", "base2", "lowp")
)
def blend_forward(
    flat: jax.Array,  # [16, M_pad] f32 (or bf16 in the hi/lo feature layout),
    # feature-major, tile-sorted instance order, padded by >= chunk columns
    seg_start: jax.Array,  # [T] int32 UNALIGNED element offsets into flat
    tile_count: jax.Array,  # [T] int32 (already capped at k_max)
    *,
    n_tiles: int,
    grid_w: int,
    tile_size: int,
    max_chunks: int,
    chunk: int = CHUNK,
    interpret: bool = False,
    tile_y0=None,  # traced [] int32 tile-row offset (multi-chip windows); None = 0
    block_scan: bool = True,  # 128-block-decomposed MXU prefix at chunk > 128
    sigma_mm: bool = False,  # quadratic-form sigma on the MXU (A/B'd on hardware)
    base2: bool = False,  # base-2 transcendentals (LOG2E folded into [1,C] rows);
    # measured a WASH at garden scale (195.9 vs 191.6 ms full step, within tunnel
    # noise) — the kernel transcendentals pipeline behind the DMA/matmul work. Kept
    # as an A/B lane, default off.
    lowp: bool = False,  # single-bf16 (non-split) prefix matmul: ~0.4% on the
    # compositing weights; A/B lane
) -> tuple[jax.Array, jax.Array]:
    """Returns (out [T, P, 8], chk [T, P, max_chunks])."""
    p = tile_size * tile_size
    feat_bf16 = flat.dtype == jnp.bfloat16
    y0 = (jnp.zeros((1,), jnp.int32) if tile_y0 is None
          else jnp.asarray(tile_y0, jnp.int32).reshape(1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, p, max_chunks), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, chunk + 128), flat.dtype),
            pltpu.VMEM((p, max_chunks), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, chk = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w=grid_w, tile_size=tile_size, chunk=chunk,
                          feat_bf16=feat_bf16, block_scan=block_scan, sigma_mm=sigma_mm,
                          base2=base2, lowp=lowp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, max_chunks), jnp.float32),
        ),
        # [P, chunk] intermediates at tile_size 32 / chunk 256 exceed the default
        # 16 MiB scoped-vmem budget; v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seg_start, tile_count, y0, flat)
    return out, chk


# ------------------------------------------------------------------------------ backward


def _bwd_kernel(
    seg_start_ref, count_ref, y0_ref,
    flat_ref,  # [16, M_pad] ANY (feature-major, tile-sorted order)
    chk_ref,  # [1, P, MAXC] VMEM
    out_ref,  # [1, P, 8] VMEM (forward outputs; col 3 = T_final)
    gout_ref,  # [1, P, 8] VMEM (cotangents: cols 0-2 d/drgb, col 3 d/dT_final)
    gzero_ref,  # [16, M_pad] ANY — zero-initialized, aliased to the output
    gflat_ref,  # [16, M_pad] ANY (output, one aligned rolled window write per tile)
    buf, gbuf, gacc, obuf, hbuf, sems, gsems, hsem, wsem, pend,
    *,
    grid_w: int,
    tile_size: int,
    chunk: int,
    feat_bf16: bool = False,
    red_sum: bool = False,
    block_scan: bool = True,
    approx_recip: bool = False,
    basis_red: bool = True,
    sigma_mm: bool = False,
    base2: bool = False,
    lowp: bool = False,
    acc_store: bool = False,
):
    del gzero_ref  # aliased storage; reads would race with our own writes
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        pend[0] = 0

    seg0 = seg_start_ref[t]
    count = count_ref[t]
    nch = (count + chunk - 1) // chunk
    # chunks past the forward's transmittance stop have all-zero checkpoints and zero
    # gradients (covered by the aliased zero-init) — replay only up to the last live
    # chunk (the forward early-exits; without this the backward walks every chunk)
    maxc_i = chk_ref.shape[2]
    live_cols = jnp.max(chk_ref[0], axis=0, keepdims=True)  # [1, maxc]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, maxc_i), 1)
    last_live = jnp.max(jnp.where(live_cols > 0.0, col_ids, -1))
    nch = jnp.minimum(nch, last_live + 1)
    p = tile_size * tile_size
    px, py = _pixel_coords(t, grid_w, tile_size, p, y0_ref[0])
    lane = _lane_iota_row(chunk)
    chk_col = jax.lax.broadcasted_iota(jnp.int32, (p, chk_ref.shape[2]), 1)
    u_strict = _strict_upper(min(chunk, 128) if block_scan else chunk)
    s_lower = _strict_lower(min(chunk, 128) if block_scan else chunk)

    gr = gout_ref[0, :, 0:1]  # [P, 1]
    gg = gout_ref[0, :, 1:2]
    gb = gout_ref[0, :, 2:3]
    gt = gout_ref[0, :, 3:4]
    gd = gout_ref[0, :, 4:5]
    t_final = out_ref[0, :, 3:4]
    s0 = t_final * gt  # dL through T_final, folded into the suffix term
    # cdotg = sum_k gout_k * color_k as ONE MXU matmul [P, 4] x [4, C] instead of 7 VPU
    # [P, C] passes per chunk. bf16 feature path: DEFAULT-precision bf16 operands (the
    # color rows are already bf16-quantized; the gout rounding adds nothing beyond the
    # existing pack budget). f32 path: hi/lo split of the hoisted gout matrix (3
    # matmuls, ~2^-16 relative — still far cheaper than the 7 VPU passes).
    if feat_bf16:
        gmat = jnp.concatenate([gr, gg, gb, gd], axis=-1).astype(jnp.bfloat16)  # [P, 4]
    else:
        gmh, gml = _hl(jnp.concatenate([gr, gg, gb, gd], axis=-1))
        gmh, gml = gmh.astype(jnp.float32), gml.astype(jnp.float32)
    if basis_red or sigma_mm:
        tile_cx = ((t % grid_w) * tile_size + tile_size // 2).astype(jnp.float32)
        tile_cy = ((t // grid_w + y0_ref[0]) * tile_size + tile_size // 2).astype(
            jnp.float32)
    if sigma_mm:
        bh, bl = _pixel_basis(px, py, tile_cx, tile_cy)
    if basis_red:
        bt_full, gt_full = _bwd_basis(px, py, tile_cx, tile_cy, (gr, gg, gb, gd))
        bth, btl = _hl(bt_full)
        gth, gtl = _hl(gt_full)
        bth, btl = bth.astype(jnp.float32), btl.astype(jnp.float32)
        gth, gtl = gth.astype(jnp.float32), gtl.astype(jnp.float32)

        if lowp:
            def _mm_presplit(lh, ll, rhs):
                # single bf16 matmul: rhs rounds at ~2^-8 pre-sum (inside the path's
                # existing bf16 gradient budget)
                return _mm(lh, rhs.astype(jnp.bfloat16).astype(jnp.float32))
        else:
            def _mm_presplit(lh, ll, rhs):
                rh, rl = _hl(rhs)
                rhf = rh.astype(jnp.float32)
                return _mm(lh, rhf) + _mm(lh, rl.astype(jnp.float32)) + _mm(ll, rhf)

    # UNALIGNED reads: 128-rounded-down window + positive-equivalent dynamic roll
    # (same scheme as the forward)
    base = pl.multiple_of((seg0 // 128) * 128, 128)
    off = seg0 - base
    l_acc = gacc.shape[1] - 128  # = max_chunks * chunk

    def in_dma(slot, j):
        return pltpu.make_async_copy(
            flat_ref.at[:, pl.ds(base + j * chunk, chunk + 128)], buf.at[slot],
            sems.at[slot],
        )

    def acc_dma(slot, j):
        # per-chunk gradients land at their ALIGNED chunk slot of the per-tile VMEM
        # accumulator; the roll to the residue offset happens once per tile
        return pltpu.make_async_copy(
            gbuf.at[slot], gacc.at[:, pl.ds(pl.multiple_of(j * chunk, 128), chunk)],
            gsems.at[slot],
        )

    # NOTE: gacc is NOT zero-filled per tile — stale lanes (earlier tiles / first-use
    # garbage) are killed by the epilogue's range select, which replaced the former
    # [16, l_acc] zero-store pass (chunks written this tile are complete: acc_dma
    # stores whole chunks and gbuf zero-masks the segment tail)

    @pl.when(nch > 0)
    def _():
        # slot must match the body's rem(j, 2) convention or the first wait deadlocks
        in_dma(jax.lax.rem(nch - 1, 2), nch - 1).start()

    def body(i, s_carry):
        j = nch - 1 - i  # reverse chunk order
        slot = jax.lax.rem(j, 2)
        in_dma(slot, j).wait()

        @pl.when(j - 1 >= 0)
        def _():
            in_dma(1 - slot, j - 1).start()

        # f32 roll: tpu.dynamic_rotate is 32-bit only (see the forward's aligned_window)
        data = pltpu.roll(
            buf[slot].astype(jnp.float32), (chunk + 128) - off, axis=1
        )[:, :chunk]
        # dynamic lane-index reads are unsupported: masked lane reduction instead
        t_in = jnp.sum(
            jnp.where(chk_col == j, chk_ref[0], 0.0), axis=-1, keepdims=True
        )  # [P, 1]; 0 where this chunk never ran (forward stopped earlier)

        lane_valid = lane < (count - j * chunk)
        rows = _feat_rows(data, feat_bf16)
        mx, my, ca, cb2, cc, op, cr, cg, cb_, cd = rows
        sig = (_sigma_mm(bh, bl, rows, tile_cx, tile_cy, base2=base2)
               if sigma_mm else None)
        a, valid, one_m, gauss = _chunk_alphas(rows, px, py, lane_valid, sigma=sig,
                                               base2=base2)
        # exclusive lane cumprod via exp(MXU prefix-sum of logs) — see _strict_upper
        log_fn, exp_fn = (jnp.log2, jnp.exp2) if base2 else (jnp.log, jnp.exp)
        pfx = _lane_exclusive_cumsum_bf16 if lowp else _lane_exclusive_cumsum_f32
        cp_excl = exp_fn(pfx(log_fn(one_m), u_strict))
        t_excl = t_in * cp_excl
        t_incl = t_excl * one_m
        # monotone t_incl: the stop or-scan collapses to the threshold predicate
        # (t_in = 0 encodes "chunk never ran": everything below, all grads zero)
        use = valid & (t_incl >= TRANSMITTANCE_THRESHOLD)
        usef = jnp.where(use, 1.0, 0.0)
        w = usef * a * t_excl  # [P, C]

        if feat_bf16:
            # [4, C] rows (r, g, b, depth): bf16-valued (the roll upcast them to f32);
            # the cast back is exact and keeps the matmul operands bf16
            col4 = data[B_R : B_R + 4, :].astype(jnp.bfloat16)
            cdotg = _mm(gmat, col4)  # [P, C] f32 accumulation
        else:
            c4h, c4l = _hl(data[F_R : F_R + 4, :])  # [4, C] — negligible next to [P, C]
            c4h, c4l = c4h.astype(jnp.float32), c4l.astype(jnp.float32)
            cdotg = _mm(gmh, c4h) + _mm(gmh, c4l) + _mm(gml, c4h)

        u = w * cdotg
        # strictly-later-lane suffix sum as one MXU matmul; total rides for free.
        # DEFAULT precision (u truncated to bf16, ~2^-8 relative) is deliberate: the
        # suffix feeds dL_da whose other term (t_excl * cdotg) is exact, and the
        # emission-order gradient gather adds a second ~0.4% pre-sum rounding
        # (raster.py). Combined budget: <=~0.8% relative on dL_da pre-reduction,
        # unbiased; bounded by the 2e-2 TPU parity tests and the e2e PSNR floor.
        # (A hi/lo split here would double the suffix matmul cost for a path whose
        # accuracy is gated by the gather rounding anyway; GUT uses its own kernels.)
        sfx = _lane_strict_suffix_sum(u, s_lower)  # [P, C]: sum over lanes i > c
        total_u = sfx[:, 0:1] + u[:, 0:1]
        suffix = sfx + s_carry  # strictly-later gaussians (+ later chunks)

        if approx_recip:
            # VPU divides are multi-pass; the approx reciprocal (~2^-12 relative) is
            # well inside the path's bf16 error budget (see suffix-sum comment above)
            dL_da = usef * (t_excl * cdotg - suffix * pl.reciprocal(one_m, approx=True))
        else:
            dL_da = usef * (t_excl * cdotg - suffix / one_m)

        # chain rule through alpha = min(op * exp(-max(sigma, 0)), 0.999); gauss is the
        # SAME exp the alpha came from (_chunk_alphas), so the clamp test is exact and
        # the sigma chain is evaluated once per chunk
        not_clamped = jnp.where(op * gauss < MAX_FRAGMENT_ALPHA, 1.0, 0.0)
        dL_dsigma = dL_da * (-a) * not_clamped

        if basis_red:
            # moment form (see _bwd_basis): two skinny MXU matmuls replace the ten
            # [P, C] product passes + the [P, 10C] reduction
            r6 = _mm_presplit(bth, btl, dL_dsigma)  # [6, C] moments of dLs
            r4 = _mm_presplit(gth, gtl, w)  # [4, C] color/depth grads
            s1 = r6[0:1]
            sx = r6[1:2]
            sy = r6[2:3]
            sxx = r6[3:4]
            sxy = r6[4:5]
            syy = r6[5:6]
            mxl = mx - tile_cx  # [1, C]
            myl = my - tile_cy
            ex = mxl * s1 - sx  # = sum_p dLs * dx
            ey = myl * s1 - sy
            # d/dopacity: dL_da * gauss * nc == -dLs / op wherever dLs != 0 (a = op*gauss
            # on the unclamped support; both sides vanish on the clamp/invalid set)
            g_op = -s1 * (pl.reciprocal(op, approx=True) if approx_recip else 1.0 / op)
            grads = jnp.concatenate(
                [
                    ca * ex + cb2 * ey,  # d/dmx
                    cc * ey + cb2 * ex,  # d/dmy
                    0.5 * (mxl * ex - sx * mxl + sxx),  # d/dca: 0.5*sum dLs*dx^2
                    mxl * ey - myl * sx + sxy,  # d/dcb: sum dLs*dx*dy
                    0.5 * (myl * ey - sy * myl + syy),  # d/dcc
                    g_op,
                    r4,
                    jnp.zeros((NFEAT - 10, chunk), jnp.float32),
                ],
                axis=0,
            )  # [16, chunk]
        else:
            ones_p = jnp.ones((1, p), jnp.float32)
            dx = mx - px
            dy = my - py

            # pixel-axis column sums for all 10 gradient features as ONE MXU matmul
            # ([1,P] x [P,10*C]) — ten separate tiny matmuls pay ~10x launch latency
            stacked = jnp.concatenate(
                [
                    dL_dsigma * (ca * dx + cb2 * dy),
                    dL_dsigma * (cc * dy + cb2 * dx),
                    dL_dsigma * 0.5 * dx * dx,
                    dL_dsigma * dx * dy,
                    dL_dsigma * 0.5 * dy * dy,
                    dL_da * gauss * not_clamped,
                    w * gr,
                    w * gg,
                    w * gb,
                    w * gd,
                ],
                axis=1,
            )  # [P, 10*C]
            if red_sum:
                # sublane tree-reduce variant: the [1, P] x [P, 10C] matmul uses 1 of the
                # MXU's 128 result rows; whether Mosaic's reduce or the M=1 matmul wins is
                # an empirical question (A/B'd on hardware, tools/profiling)
                red10 = jnp.sum(stacked, axis=0, keepdims=True)  # [1, 10*C]
            else:
                red10 = jax.lax.dot_general(
                    ones_p, stacked, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [1, 10*C]

            grads = jnp.concatenate(
                [red10[:, i * chunk : (i + 1) * chunk] for i in range(10)]
                + [jnp.zeros((NFEAT - 10, chunk), jnp.float32)],
                axis=0,
            )  # [16, chunk] (lane slices are chunk-aligned -> cheap relayout)

        # The lane mask is a CORRECTNESS requirement of the unaligned layout, not
        # hygiene: tail lanes hold the next tile's (or sentinel junk) features, whose
        # g_op reciprocal / inf-feature products can produce non-finite values that
        # nothing downstream would mask once written past this tile's segment.
        # (The bf16 grad rounding happens once, at the staging-buffer cast in the
        # epilogue — same single-rounding numerics as the former per-chunk cast.)
        if acc_store:
            # direct dynamic-offset VMEM store (A/B vs the gbuf+DMA pipeline)
            gacc[:, pl.ds(pl.multiple_of(j * chunk, 128), chunk)] = jnp.where(
                lane_valid, grads, 0.0)
        else:
            # wait for this slot's previous accumulator flight before overwriting gbuf
            @pl.when(i >= 2)
            def _():
                acc_dma(slot, j + 2).wait()

            gbuf[slot] = jnp.where(lane_valid, grads, 0.0)
            acc_dma(slot, j).start()

        return s_carry + total_u

    _ = jax.lax.fori_loop(0, nch, body, s0)

    # drain the last two accumulator copies (j = 1, 0), roll the tile's gradients to
    # the residue offset, ADD-merge the head 128-lane tile with the previous tiles'
    # already-written values, and write ONE aligned [16, L+128] window. Zero-masked
    # lanes beyond this tile's segment clobber only columns whose owning (later) tile
    # rewrites them — grid steps execute sequentially in tile order.
    if not acc_store:
        @pl.when(nch >= 2)
        def _():
            acc_dma(1, 1).wait()

        @pl.when(nch >= 1)
        def _():
            acc_dma(0, 0).wait()

    @pl.when(nch >= 1)
    def _():
        # roll runs on the f32 accumulator (tpu.dynamic_rotate is 32-bit only); the
        # grad_dtype cast happens once, into the staging buffer
        rolled = pltpu.roll(gacc[:], off, axis=1)

        # wait for the PREVIOUS writing tile's window write before reading any of its
        # region (head read) or reusing obuf — that write overlapped this tile's whole
        # chunk loop instead of serializing its own epilogue (the wait descriptor only
        # needs the byte count, which every window write shares)
        @pl.when(pend[0] == 1)
        def _():
            pltpu.make_async_copy(
                obuf, gflat_ref.at[:, pl.ds(base, l_acc + 128)], wsem
            ).wait()

        rd = pltpu.make_async_copy(gflat_ref.at[:, pl.ds(base, 128)], hbuf, hsem)
        rd.start()
        rd.wait()
        # range select: head lanes [0, off) merge the previous tiles' written values,
        # [off, off + nch*chunk) carry this tile's rolled grads, everything past is
        # zeroed (stale accumulator lanes never reach HBM; later tiles rewrite their
        # own columns in sequential grid order)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1)
        headp = jnp.concatenate(
            [hbuf[:].astype(jnp.float32),
             jnp.zeros((gacc.shape[0], l_acc), jnp.float32)], axis=1)
        obuf[:] = jnp.where(
            lane_w < off, headp,
            jnp.where(lane_w < off + nch * chunk, rolled, 0.0),
        ).astype(obuf.dtype)
        wr = pltpu.make_async_copy(obuf, gflat_ref.at[:, pl.ds(base, l_acc + 128)],
                                   wsem)
        wr.start()  # waited by the next writing tile, or the last-step drain below
        pend[0] = 1

    # drain the overlapped window write before kernel exit
    @pl.when((t == pl.num_programs(0) - 1) & (pend[0] == 1))
    def _():
        pltpu.make_async_copy(
            obuf, gflat_ref.at[:, pl.ds(base, l_acc + 128)], wsem
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "grid_w", "tile_size", "max_chunks", "chunk",
                              "interpret", "grad_dtype", "red_sum", "block_scan",
                              "approx_recip", "basis_red", "sigma_mm", "base2", "lowp",
                              "acc_store")
)
def blend_backward(
    flat: jax.Array,  # [16, M_pad] f32 (or bf16 in the hi/lo feature layout)
    seg_start: jax.Array,  # [T] int32 UNALIGNED element offsets
    tile_count: jax.Array,
    chk: jax.Array,  # [T, P, MAXC]
    out: jax.Array,  # [T, P, 8]
    gout: jax.Array,  # [T, P, 8]
    *,
    n_tiles: int,
    grid_w: int,
    tile_size: int,
    max_chunks: int,
    chunk: int = CHUNK,
    interpret: bool = False,
    tile_y0=None,
    grad_dtype=jnp.float32,  # bf16 = pre-reduction rounding, half the output DMA
    red_sum: bool = False,
    block_scan: bool = True,
    approx_recip: bool = True,  # ~2^-12 reciprocals on dL_da/g_op (-3.4 ms, inside budget)
    basis_red: bool = True,  # moment-form gradient reduction (two skinny MXU matmuls)
    sigma_mm: bool = False,  # quadratic-form sigma on the MXU: WON in the r3 aligned
    # layout (46.8 vs 48.5 ms) but LOSES in the r5 unaligned bf16 layout (37.9 vs
    # 47.0 ms isolated, tools/profiling/profile_r5h.py) — the VPU sigma chain fuses
    # with the roll/upcast passes while the hi/lo basis matmuls do not
    base2: bool = False,  # base-2 transcendentals (see blend_forward) — wash, lane only
    acc_store: bool = True,  # direct dynamic-offset VMEM stores for the per-chunk
    # accumulator instead of the gbuf+DMA pipeline (32.9 -> 31.1 ms isolated,
    # profile_r5h.py; value-exact — same numbers, different transport)
    lowp: bool = True,  # single-bf16 (non-split) prefix + moment matmuls: 38.1 ->
    # 32.9 ms isolated (profile_r5h.py). Adds ~2^-8 pre-sum rounding on t_excl and
    # the moment RHS — inside the path's existing bf16 gradient budget (grads are
    # bf16-gathered downstream anyway); guarded by the 2e-2 grad parity tests and
    # the e2e PSNR floors. The FORWARD keeps the hi/lo split (lowp there measured
    # SLOWER, 30.5 vs 24.6 — the prefix matmul is not its bottleneck).
) -> jax.Array:
    """Returns gflat [16, M_pad] in `grad_dtype`; columns never owned by any tile stay
    zero (zero-init via input-output aliasing + the in-kernel lane mask)."""
    p = tile_size * tile_size
    feat_bf16 = flat.dtype == jnp.bfloat16
    y0 = (jnp.zeros((1,), jnp.int32) if tile_y0 is None
          else jnp.asarray(tile_y0, jnp.int32).reshape(1))
    gzero = jnp.zeros(flat.shape, grad_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, p, max_chunks), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NFEAT, chunk + 128), flat.dtype),
            pltpu.VMEM((2, NFEAT, chunk), jnp.float32),  # per-chunk grads (pre-cast)
            pltpu.VMEM((NFEAT, max_chunks * chunk + 128), jnp.float32),  # accumulator
            pltpu.VMEM((NFEAT, max_chunks * chunk + 128), grad_dtype),  # staging
            pltpu.VMEM((NFEAT, 128), grad_dtype),  # head-merge read
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),  # pending-window-write flag (persists across
            # the sequential grid; see the epilogue's overlapped write)
        ],
    )
    gflat = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w=grid_w, tile_size=tile_size, chunk=chunk,
                          feat_bf16=feat_bf16, red_sum=red_sum, block_scan=block_scan,
                          approx_recip=approx_recip, basis_red=basis_red,
                          sigma_mm=sigma_mm, base2=base2, lowp=lowp,
                          acc_store=acc_store),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, grad_dtype),
        input_output_aliases={7: 0},  # gzero -> output (indices include scalar-prefetch args)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seg_start, tile_count, y0, flat, chk, out, gout, gzero)
    return gflat
