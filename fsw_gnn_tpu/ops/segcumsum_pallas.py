"""Pallas TPU kernel: segmented inclusive cumulative sum.

TPU-native equivalent of the reference CUDA kernels `segcumsum_kernel` /
`add_block_sums_kernel` (/root/reference/fsw_embedding.cu:35-117) and their
host hierarchy driver (fsw_embedding.py:2878-3012).  Where the CUDA version
runs a Hillis-Steele shared-memory scan per block plus a multi-level
block-sum fixup with full device syncs between launches, the TPU version is
ONE kernel with a sequential grid:

  * the flat value array is viewed as (rows, 128) lanes;
  * each grid step owns a (ROWS, 128) tile in VMEM;
  * within a row: log-stride doubling scan across lanes, masked by
    segment-id equality (the reference's `segment_ids[i-s] == segment_ids[i]`
    zeroing, fsw_embedding.cu:68-75);
  * across the rows of a tile: the inter-row carry C_r satisfies the affine
    recurrence C_r = g_r*(t_{r-1} + m_{r-1}*C_{r-1}) (g = chains into row r,
    m = row single-segment, t = row's last-segment total), solved with an
    affine-map doubling scan along the sublane axis -- rolls + masks only,
    no dynamic indexing (Mosaic forbids dynamic_slice on values);
  * across tiles: a (total, last_segment_id) carry in SMEM -- TPU grid
    steps run sequentially on a core, so the carry needs no atomics or
    multi-kernel hierarchy.

Unlike the cumsum-minus-segment-base formulation in ops.segment, this scan
restarts accumulation at every boundary, so its rounding error does not grow
with the global prefix magnitude.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _shift_in(x, stride, fill):
    """Shift x right by `stride` along lanes, filling with `fill` (no wrap)."""
    pad = jnp.full(x.shape[:-1] + (stride,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-stride]], axis=-1)


def _row_segscan(vals, segs, max_stride):
    """Segmented inclusive scan along the last (lane) axis via doubling.

    `max_stride` caps the lookback window: after passes with strides
    1..2^{k-1} each element has accumulated its full segment prefix provided
    segments are no longer than 2^k, so the loop runs while stride <
    max_stride (the reference's cap, fsw_embedding.py:2869-2872 /
    fsw_embedding.cu:56).

    Per pass: shift-in (no wraparound, so no lane-iota validity mask is
    needed; the fill id -2 never equals a real segment id) and fold the
    segment-equality mask into a multiply-add.  Measured ~9% faster than
    the roll+where formulation (benchmarks/probe_segscan_variants.py).
    """
    stride = 1
    while stride < max_stride:
        shifted_v = _shift_in(vals, stride, jnp.zeros((), vals.dtype))
        shifted_s = _shift_in(segs, stride, jnp.int32(-2))
        ok = (shifted_s == segs).astype(vals.dtype)
        vals = vals + shifted_v * ok
        stride *= 2
    return vals


def _affine_carry_scan(a, b, max_depth):
    """Solve C_r = a_r + b_r * C_{r-1} (C_{-1} treated as 0) along axis 0 of
    (ROWS, 1) arrays by composing affine maps with doubling.

    `max_depth` bounds how many rows back a carry can chain: b_r = 1 needs
    row r-1 to be entirely one segment, so a chain of depth d needs a
    segment covering d full rows (>= d*LANES elements).  With max_seg_size
    < LANES no row is single-segment, b == 0 everywhere and C = a with zero
    passes.
    """
    if max_depth <= 0:
        return a
    pos = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    stride = 1
    while stride <= max_depth:
        a_sh = jnp.roll(a, stride, axis=0)
        b_sh = jnp.roll(b, stride, axis=0)
        valid = pos >= stride
        a = a + jnp.where(valid, b * a_sh, jnp.zeros_like(a))
        b = b * jnp.where(valid, b_sh, jnp.zeros_like(b))
        stride *= 2
    return a


def _tri_prefix_matmul(vals, tri, precision):
    """Full in-row inclusive prefix via the triangular-ones matmul.

    precision='highest': XLA's 6-pass f32 emulation (the scan-exact
    default; see the round-4 HW finding below).  'bf16x3': a manual
    3-term lossless bf16 split of `vals` (8+8+8 mantissa bits >= f32's
    24; the tri operand is exactly bf16-representable), 3 native MXU
    passes with f32 accumulation -- the SAME error class as 'highest'
    (eps x in-row prefix; HW max rel diff 1.5e-5 = ~2*128*eps on N(0,1)
    data).  Wall-clock on the 16M bench it is NEUTRAL (ABA runs scatter
    both precisions across 0.45-0.53 ms; the MXU passes are not the
    binding stage) -- it halves MXU occupancy, which only matters when
    the surrounding program is MXU-saturated.  Exists because Mosaic
    rejects precision=HIGH inside kernels.  'default' stays available
    for bf16-class tolerance."""
    dims = (((1,), (0,)), ((), ()))
    if precision == 'bf16x3':
        tri_b = tri.astype(jnp.bfloat16)
        b0 = vals.astype(jnp.bfloat16)
        r1 = vals - b0.astype(vals.dtype)
        b1 = r1.astype(jnp.bfloat16)
        b2 = (r1 - b1.astype(vals.dtype)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(
            b0, tri_b, dims, preferred_element_type=vals.dtype)
            + jax.lax.dot_general(
                b1, tri_b, dims, preferred_element_type=vals.dtype)
            + jax.lax.dot_general(
                b2, tri_b, dims, preferred_element_type=vals.dtype))
    return jax.lax.dot_general(vals, tri, dims,
                               preferred_element_type=vals.dtype,
                               precision=precision)


def _row_segscan_matmul(vals, segs, max_stride, nonnegative,
                        precision='highest'):
    """Within-row segmented scan via the MXU (one-pass formulation).

    The full in-row inclusive prefix rides the MXU as a triangular-ones
    matmul (the triangle built in-kernel from iotas -- Mosaic rejects
    captured array constants); segment restarts are recovered by
    subtracting the full prefix at each segment's start, obtained by
    FILL-FORWARDING the prefix at segment-end lanes.  For nonnegative
    values the full prefix is monotone, so the fill-forward collapses to
    a running max (1 shift + 1 max per doubling pass, vs the direct
    scan's 2 shifts + compare + multiply-add); for general sign it is a
    (value, seen) pair fill.  VPU work per element drops ~2.5x
    (nonnegative) while the value accumulation itself runs on the MXU in
    parallel.

    f32 error: ~eps x the in-row 128-element prefix AT precision
    'highest' -- which is therefore the default.  ROUND-4 HW FINDING: the
    TPU MXU's DEFAULT f32 matmul precision decomposes operands into bf16
    passes, so the round-3 formulation silently returned bf16-CLASS
    results on hardware (measured 3.9e-3 max rel err on 16M N(0,1)
    elements; interpret mode computes true f32 and hid it).  'highest'
    (6-pass f32 emulation) restores the scan-exact contract at ~6x the
    MXU cost of the triangle; 'default' stays available for callers that
    accept bf16-class sums (measured ladder in BENCH.md).
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = jnp.where(j <= i, jnp.ones((), vals.dtype),
                    jnp.zeros((), vals.dtype))
    p_full = _tri_prefix_matmul(vals, tri, precision)  # (ROWS, LANES)

    # ends of segments within the row: seg changes at the next lane
    next_s = jnp.concatenate(
        [segs[..., 1:], jnp.full(segs.shape[:-1] + (1,), -3, segs.dtype)],
        axis=-1)
    is_end = segs != next_s
    ends = jnp.where(is_end, p_full, jnp.zeros_like(p_full))
    # strict: element i's base is the prefix at the last end BEFORE i
    base = _shift_in(ends, 1, jnp.zeros((), vals.dtype))
    if nonnegative:
        stride = 1
        while stride < max_stride:
            base = jnp.maximum(base, _shift_in(base, stride,
                                               jnp.zeros((), vals.dtype)))
            stride *= 2
    else:
        seen = _shift_in(jnp.where(is_end, jnp.ones_like(p_full),
                                   jnp.zeros_like(p_full)),
                         1, jnp.zeros((), vals.dtype))
        stride = 1
        while stride < max_stride:
            b_sh = _shift_in(base, stride, jnp.zeros((), vals.dtype))
            s_sh = _shift_in(seen, stride, jnp.zeros((), vals.dtype))
            base = jnp.where(seen > 0, base, b_sh)
            seen = jnp.maximum(seen, s_sh)
            stride *= 2
    return p_full - base


def _fill_base_ends(p_full, is_end_f, max_stride):
    """Fill-forward the full prefix at segment-end lanes (nonnegative
    running-max form) and return the per-element base to subtract."""
    ends = jnp.where(is_end_f > 0, p_full, jnp.zeros_like(p_full))
    base = _shift_in(ends, 1, jnp.zeros((), p_full.dtype))
    stride = 1
    while stride < max_stride:
        base = jnp.maximum(
            base, _shift_in(base, stride, jnp.zeros((), base.dtype)))
        stride *= 2
    return base


def _segcumsum_mask_kernel(v_ref, m_ref, out_ref, carry_v, carry_m,
                           *, max_seg_size, precision='highest'):
    """Boundary-mask-driven matmul segcumsum (round 4, nonnegative only).

    Takes an int8 is_end mask instead of int32 segment ids: 9 B/element
    of stream instead of 12, and the whole id-comparison layer
    (in-kernel is_end, first/last extraction) drops out.  Honest
    benchmark (bench_segcumsum differenced protocol, 16M elements,
    rows=1024, f32-exact precision): **1.10x** over the ids matmul
    kernel and 1.19x over the scan at long segments (avg 4096, max
    4326: 0.638 vs 0.702 / 0.757 ms); parity at max-seg ~600 (0.651 vs
    0.63).  An earlier probe measured "3x" -- that was a harness
    artifact in probe_segcumsum_fill's ids timing, retracted (BENCH.md).
    The leading-segment mask comes from an end-count prefix that rides
    the SAME triangular matmul (0/1 inputs, integer sums <= 128: exact
    even at default MXU precision).

    Worth it only when the caller holds the boundaries (static segment
    structure, e.g. a fixed CSR graph): building the mask from ids costs
    a 5 B/element pass that erases the win for a one-shot call.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_v[0] = jnp.zeros((), v_ref.dtype)
        carry_m[0] = jnp.int32(1)          # nothing chains into tile 0

    vals = v_ref[:]                        # (ROWS, LANES)
    is_end_f = m_ref[:].astype(vals.dtype)
    rows = vals.shape[0]
    max_stride = min(max_seg_size, LANES)

    jj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = jnp.where(jj <= ii, jnp.ones((), vals.dtype),
                    jnp.zeros((), vals.dtype))
    p_full = _tri_prefix_matmul(vals, tri, precision)
    cnt_incl = jax.lax.dot_general(
        is_end_f, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=vals.dtype)
    cnt_strict = cnt_incl - is_end_f

    scanned = p_full - _fill_base_ends(p_full, is_end_f, max_stride)

    # inter-row carries from boundary info only: g_r = no end at row
    # r-1's last lane; single-segment row = no end in lanes 0..126
    last_end = is_end_f[:, LANES - 1:LANES]
    inner_ends = cnt_strict[:, LANES - 1:LANES]
    t = scanned[:, LANES - 1:LANES]
    prev_last_end = jnp.roll(last_end, 1, axis=0)
    prev_t = jnp.roll(t, 1, axis=0)
    prev_single = jnp.roll(
        jnp.where(inner_ends == 0, jnp.ones_like(t), jnp.zeros_like(t)),
        1, axis=0)
    pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    is_row0 = pos == 0
    prev_last_end = jnp.where(
        is_row0,
        jnp.full_like(prev_last_end, carry_m[0].astype(vals.dtype)),
        prev_last_end)
    prev_t = jnp.where(is_row0, jnp.full_like(prev_t, carry_v[0]), prev_t)
    prev_single = jnp.where(is_row0, jnp.zeros_like(prev_single),
                            prev_single)
    g = 1.0 - prev_last_end
    C = _affine_carry_scan(g * prev_t, g * prev_single,
                           min(max_seg_size // LANES, rows - 1))
    scanned = scanned + jnp.where(cnt_strict == 0, C,
                                  jnp.zeros_like(scanned))
    out_ref[:] = scanned
    carry_v[0] = scanned[rows - 1, LANES - 1]
    carry_m[0] = is_end_f[rows - 1, LANES - 1].astype(jnp.int32)


def _segcumsum_kernel(v_ref, s_ref, out_ref, carry_v, carry_s,
                      *, max_seg_size, method='scan', nonnegative=False,
                      precision='highest'):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_v[0] = jnp.zeros((), v_ref.dtype)
        carry_s[0] = jnp.full((), -1, jnp.int32)

    vals = v_ref[:]                        # (ROWS, LANES)
    segs = s_ref[:]
    rows = vals.shape[0]

    # 1) lane-wise segmented scan within each row
    if method == 'matmul':
        scanned = _row_segscan_matmul(vals, segs, min(max_seg_size, LANES),
                                      nonnegative, precision)
    else:
        scanned = _row_segscan(vals, segs, min(max_seg_size, LANES))

    # 2) inter-row carries.  Row summaries as (ROWS, 1) sublane vectors:
    t = scanned[:, LANES - 1:LANES]        # last-segment running total
    first_s = segs[:, 0:1]
    last_s = segs[:, LANES - 1:LANES]

    prev_last_s = jnp.roll(last_s, 1, axis=0)
    prev_t = jnp.roll(t, 1, axis=0)
    prev_single = jnp.roll(
        jnp.where(first_s == last_s, jnp.ones_like(t), jnp.zeros_like(t)),
        1, axis=0)
    # row 0 chains from the previous tile's carry
    pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    is_row0 = pos == 0
    prev_last_s = jnp.where(is_row0,
                            jnp.full_like(prev_last_s, carry_s[0]),
                            prev_last_s)
    prev_t = jnp.where(is_row0, jnp.full_like(prev_t, carry_v[0]), prev_t)
    prev_single = jnp.where(is_row0, jnp.zeros_like(prev_single), prev_single)

    g = jnp.where(first_s == prev_last_s, jnp.ones_like(t),
                  jnp.zeros_like(t))       # chains into row r
    a = g * prev_t
    b = g * prev_single
    # carry chains b_r deep only through full single-segment rows, so the
    # chain depth is bounded by floor(max_seg_size / LANES)
    C = _affine_carry_scan(a, b, min(max_seg_size // LANES, rows - 1))

    # 3) apply: the carry adds to each row's leading segment
    scanned = scanned + jnp.where(segs == first_s, C,
                                  jnp.zeros_like(scanned))

    out_ref[:] = scanned
    # 4) next tile's carry: the (now corrected) last element of this tile
    carry_v[0] = scanned[rows - 1, LANES - 1]
    carry_s[0] = segs[rows - 1, LANES - 1]


def segment_boundaries(segment_ids: jax.Array) -> jax.Array:
    """int8 is_end mask from sorted segment ids: mask[i] = 1 iff element
    i is the LAST of its segment (the final element always is).  Compute
    once for a static segment structure and pass as `boundaries=` --
    the mask kernel then streams 9 B/element instead of 12 and skips the
    id-comparison layer (1.10-1.19x at long segments, see
    _segcumsum_mask_kernel)."""
    n = segment_ids.shape[0]
    return jnp.concatenate([
        (segment_ids[1:] != segment_ids[:-1]),
        jnp.ones((1,), bool)]).astype(jnp.int8) if n else \
        jnp.zeros((0,), jnp.int8)


@functools.partial(jax.jit, static_argnames=('rows_per_block', 'interpret',
                                             'max_seg_size', 'method',
                                             'nonnegative', 'precision'))
def segcumsum_pallas(values: jax.Array, segment_ids: jax.Array,
                     rows_per_block: int | None = None,
                     interpret: bool = False,
                     max_seg_size: int | None = None,
                     method: str = 'scan',
                     nonnegative: bool = False,
                     precision: str = 'highest',
                     boundaries: jax.Array | None = None) -> jax.Array:
    """Segmented inclusive cumsum of a flat array (sorted segment ids).

    Pads to a multiple of rows_per_block*128 internally; returns the original
    length.

    `rows_per_block=None` auto-picks the largest power-of-two tile that the
    input fills (up to 1024 rows = 512 KB/f32 buffer): the sequential grid
    is the kernel's main overhead, so fewer, bigger steps win -- measured
    2.00 ms (rows 64) -> 0.80 ms (rows 1024) on 16M elements, and a
    max_seg_size < 128 additionally kills the inter-row carry scan
    (0.49 ms, 411 GB/s effective).

    `max_seg_size`: static upper bound on the longest segment, the same
    contract as the reference (fsw_embedding.py:2795, 2812-2820: computed
    from the data when absent; here None means "unbounded").  A tight bound
    prunes doubling passes: the lane scan runs ceil(log2(min(max_seg_size,
    128))) passes instead of 7, and for max_seg_size < 128 the inter-row
    affine carry scan vanishes entirely (no row can be a single segment).
    Results are exact whenever the bound is honest; like the reference, a
    too-small bound silently truncates long segments.

    `method`: 'scan' (default) = masked lane-doubling scan; 'matmul' = the
    one-pass MXU formulation (triangular-ones matmul full prefix +
    fill-forward base subtraction, see _row_segscan_matmul).  'matmul'
    moves the value accumulation to the MXU; its f32 error is eps x the
    in-row 128-element prefix rather than eps x the segment prefix, so
    prefer 'scan' when adjacent segments differ by many orders of
    magnitude.  `nonnegative=True` (caller-asserted values >= 0, e.g.
    weights) lets 'matmul' use the running-max fill (~2.5x fewer VPU ops
    per doubling pass).  `precision` ('highest' default) controls the
    MXU triangle's f32 decomposition -- see _row_segscan_matmul's
    round-4 HW finding before lowering it.  'bf16x3' (round 5): 3
    lossless-split MXU passes instead of 6 at the same
    eps-x-in-row-prefix error class; wall-neutral on the standalone
    bench, halves MXU occupancy (_tri_prefix_matmul).

    `boundaries`: optional int8 is_end mask (see `segment_boundaries`);
    when given (requires nonnegative=True) the boundary-mask matmul
    kernel runs instead -- 9 B/element of stream instead of 12 and no
    id-comparison layer; measured 1.10-1.19x at long segments, parity
    below (see _segcumsum_mask_kernel).  Pass it when the segment
    structure is static (the mask is computed once); `segment_ids` may
    then be None.
    """
    n = values.shape[0]
    if boundaries is not None:
        assert nonnegative, 'the mask kernel uses the running-max fill'
        assert boundaries.shape == (n,)
    else:
        assert segment_ids.shape == (n,)
    if rows_per_block is None:
        rows_per_block = 8
        while rows_per_block < 1024 and rows_per_block * 2 * LANES <= n:
            rows_per_block *= 2
    block = rows_per_block * LANES
    n_pad = -(-max(n, 1) // block) * block
    v = jnp.pad(values, (0, n_pad - n))
    v2 = v.reshape(-1, LANES)
    n_blocks = v2.shape[0] // rows_per_block
    if max_seg_size is None:
        max_seg_size = rows_per_block * LANES
    max_seg_size = max(1, min(max_seg_size, rows_per_block * LANES))

    common = dict(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v2.shape, values.dtype),
        scratch_shapes=[
            pltpu.SMEM((1,), values.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )

    if boundaries is not None:
        # pad lanes are their own one-element segments: mask 1, value 0
        m = jnp.pad(boundaries.astype(jnp.int8), (0, n_pad - n),
                    constant_values=1)
        out = pl.pallas_call(
            functools.partial(_segcumsum_mask_kernel,
                              max_seg_size=max_seg_size,
                              precision=precision),
            **common)(v2, m.reshape(-1, LANES))
        return out.reshape(-1)[:n]

    # padding gets a sentinel segment id so it never chains into real data
    s = jnp.pad(segment_ids.astype(jnp.int32), (0, n_pad - n),
                constant_values=jnp.iinfo(jnp.int32).max)
    out = pl.pallas_call(
        functools.partial(_segcumsum_kernel, max_seg_size=max_seg_size,
                          method=method, nonnegative=nonnegative,
                          precision=precision),
        **common)(v2, s.reshape(-1, LANES))
    return out.reshape(-1)[:n]
