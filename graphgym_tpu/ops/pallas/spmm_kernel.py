"""Pallas TPU SpMM: scatter-free segmented reduction via packed chunks.

Why: XLA lowers COO scatter-add (jax.ops.segment_sum) to a serialized
scatter on TPU — measured 53M edges/s fwd (83M with sorted indices) at
D=128 on v5e, a few percent of HBM speed-of-light.  This formulation
removes every scatter and every unaligned memory access:

  * Host-side (once per graph, ``pack_csr``): edges are sorted by
    receiver and packed into fixed-size chunks of C edges.  Each chunk
    owns one R-row-aligned output tile (tile t covers rows
    [t*R, (t+1)*R)); dense tiles span several chunks, sparse tiles get
    one padded chunk.  Padding edges carry weight 0 and point at row 0
    of the tile.
  * Device-side: the per-edge messages x[senders]*w are one XLA gather
    (the only random-access pass), reshaped to [NC, C, D].  The kernel
    runs a sequential grid over chunks; the output BlockSpec maps chunk
    i to row tile tiles[i], so consecutive chunks of the same tile
    accumulate in VMEM (the K-loop matmul pattern) and each tile is
    written back exactly once.  The segmented reduction itself is
    onehot[C, R]^T @ msg[C, D] on the MXU — no scatter, no dynamic DMA.

Cost at (C=512, R=256, D=128): 16.8 MFLOP per chunk, ~E/C chunks -> the
MXU does ~C*R/ (C) = R flops per edge-element, well under the HBM time
to stream the messages, so the kernel is gather/bandwidth-bound as it
should be.

Reference counterpart: tf unsorted_segment_sum inside SparseAdj.matmul
(reference sparse_adj.py:91-97).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_TILE = 128     # R: output rows per tile
EDGES_PER_CHUNK = 1024  # C: edges per chunk
EDGE_GROUP = 1          # G: slots pre-reduced on the VPU per MXU row
# (R, C) retuned round 3: with the weight multiply in-kernel the MXU
# contraction (total work E*R*D*2passes) dominates, so halving R halves
# MXU work — R=128 keeps full lane occupancy in the one-hot operand and
# measured ~2.4x over R=256 fwd+bwd; C=1024 halves per-chunk grid
# overhead at equal FLOPs (docs/KERNELS.md round-3 notes).


class PackedCSR(NamedTuple):
    """Chunked, receiver-sorted edge layout (host-built).

    senders    [NC, C] int32 — gather indices (padding -> num_nodes slot)
    weights    [NC, C] f32   — edge weights (0 on padding)
    local_rows [NC, C] int32 — receiver row within the chunk's tile
    tiles      [NC]    int32 — output tile index of each chunk (ascending)

    All fields are arrays (a clean jit-traversable pytree); the tile
    count is derived from the static num_nodes at call sites.  Host-side
    construction keeps them as NUMPY arrays — packs ride into jit as
    batch-pytree leaves and are transferred in one bulk device_put per
    batch; building them as device arrays would issue one small host->
    device dispatch per field, which dominates wall-clock on
    high-latency device links (measured ~0.2 s per dispatch over a
    remote-TPU tunnel)."""
    senders: jnp.ndarray
    weights: jnp.ndarray
    local_rows: jnp.ndarray
    tiles: jnp.ndarray


def pack_csr(senders: np.ndarray, receivers: np.ndarray,
             weights: Optional[np.ndarray], num_nodes: int,
             pad_chunks_to: Optional[int] = None,
             rows_per_tile: int = ROWS_PER_TILE,
             edges_per_chunk: int = EDGES_PER_CHUNK,
             group: Optional[int] = None) -> PackedCSR:
    """Host-side packing (numpy).  Deterministic: edges sorted by
    (receiver, original order), so partial sums accumulate in a fixed
    order — reproducible across runs and shardings.

    group > 1 pads each row's slot span to a multiple of `group` so the
    kernel can pre-reduce aligned groups on the VPU before the one-hot
    matmul (every group is row-pure)."""
    R, C = rows_per_tile, edges_per_chunk
    G = EDGE_GROUP if group is None else group
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = len(senders)
    if weights is None:
        weights = np.ones(e, np.float32)
    weights = np.asarray(weights, np.float32)

    # native packer (graphgym_tpu/native): same layout, C++ inner loops
    try:
        from graphgym_tpu import native
        packed = native.pack_csr_arrays(senders, receivers, weights,
                                        num_nodes, R, C, G)
    except Exception:
        packed = None
    if packed is not None:
        out_s, out_w, out_l, out_t = packed
        num_tiles = (num_nodes + R - 1) // R
        nc = out_s.shape[0]
        if pad_chunks_to is not None and pad_chunks_to > nc:
            extra = pad_chunks_to - nc
            out_s = np.concatenate(
                [out_s, np.full((extra, C), num_nodes, np.int32)])
            out_w = np.concatenate(
                [out_w, np.zeros((extra, C), np.float32)])
            out_l = np.concatenate(
                [out_l, np.zeros((extra, C), np.int32)])
            out_t = np.concatenate(
                [out_t, np.full(extra, num_tiles - 1, np.int32)])
        return PackedCSR(out_s, out_w, out_l, out_t)

    # numpy fallback: fully vectorized slot assignment.  Sort edges by
    # (receiver, sender) — sender order within a row is free (same
    # receiver) and gives gather locality; then pad each row's span to
    # a multiple of G and lay spans consecutively within each tile.
    order = np.lexsort((senders, receivers))
    s_s, r_s, w_s = senders[order], receivers[order], weights[order]
    num_tiles = (num_nodes + R - 1) // R

    deg = np.bincount(r_s, minlength=num_nodes).astype(np.int64)
    padded = (deg + G - 1) // G * G
    tile_of_row = np.arange(num_nodes) // R
    tile_slots = np.bincount(tile_of_row, weights=padded,
                             minlength=num_tiles).astype(np.int64)
    chunks_per_tile = np.maximum((tile_slots + C - 1) // C, 1)
    nc = int(chunks_per_tile.sum())
    chunk_start = np.concatenate([[0], np.cumsum(chunks_per_tile)])

    # slot offset of each row within its tile = running padded sizes
    # minus the tile's base
    cum = np.concatenate([[0], np.cumsum(padded)])[:-1]
    tile_base_cum = cum[::R][:num_tiles]
    rows_in_tile = np.minimum(R, num_nodes - np.arange(num_tiles) * R)
    row_off_in_tile = cum - np.repeat(tile_base_cum, rows_in_tile)
    # global slot of edge k: tile's first chunk * C + row offset + rank
    # within the row (rank = position - first position of that row)
    first_pos = np.concatenate([[0], np.cumsum(deg)])[:-1]
    rank = np.arange(e) - first_pos[r_s]
    slot = (chunk_start[tile_of_row[r_s]] * C
            + row_off_in_tile[r_s] + rank)

    out_s = np.full((nc, C), num_nodes, np.int32).reshape(-1)
    out_w = np.zeros(nc * C, np.float32)
    out_l = np.zeros(nc * C, np.int32)
    out_s[slot] = s_s
    out_w[slot] = w_s
    out_l[slot] = (r_s - tile_of_row[r_s] * R).astype(np.int32)
    # padding slots of partially-filled groups keep their row's local
    # index (zero weight): fill per-row pad ranges
    pad_amt = padded - deg
    pr = np.repeat(np.arange(num_nodes), pad_amt)
    if len(pr):
        pad_rank = np.arange(len(pr)) - np.repeat(
            np.concatenate([[0], np.cumsum(pad_amt)])[:-1], pad_amt)
        pslot = (chunk_start[tile_of_row[pr]] * C
                 + row_off_in_tile[pr] + deg[pr] + pad_rank)
        out_l[pslot] = (pr - tile_of_row[pr] * R).astype(np.int32)
    out_s = out_s.reshape(nc, C)
    out_w = out_w.reshape(nc, C)
    out_l = out_l.reshape(nc, C)
    out_t = np.repeat(np.arange(num_tiles, dtype=np.int32),
                      chunks_per_tile)
    if pad_chunks_to is not None and pad_chunks_to > nc:
        extra = pad_chunks_to - nc
        out_s = np.concatenate(
            [out_s, np.full((extra, C), num_nodes, np.int32)])
        out_w = np.concatenate([out_w, np.zeros((extra, C), np.float32)])
        out_l = np.concatenate([out_l, np.zeros((extra, C), np.int32)])
        # padding chunks re-target the last tile with zero weight
        out_t = np.concatenate(
            [out_t, np.full(extra, num_tiles - 1, np.int32)])
    return PackedCSR(out_s, out_w, out_l, out_t)


def pad_pack(pack: PackedCSR, pad_chunks_to: int, num_nodes: int,
             rows_per_tile: int = ROWS_PER_TILE) -> PackedCSR:
    """Pad an existing pack with no-op chunks (zero weight, last tile)
    up to a common chunk count — shard-uniform shapes without repacking.
    Pure numpy (see PackedCSR docstring on host-side construction)."""
    nc, c = pack.senders.shape
    if pad_chunks_to <= nc:
        return pack
    extra = pad_chunks_to - nc
    num_tiles = (num_nodes + rows_per_tile - 1) // rows_per_tile
    cat = np.concatenate
    return PackedCSR(
        cat([np.asarray(pack.senders),
             np.full((extra, c), num_nodes, np.int32)]),
        cat([np.asarray(pack.weights),
             np.zeros((extra, c), np.float32)]),
        cat([np.asarray(pack.local_rows),
             np.zeros((extra, c), np.int32)]),
        cat([np.asarray(pack.tiles),
             np.full((extra,), num_tiles - 1, np.int32)]))


# MXU precision note (applies to every dot below): the MXU's DEFAULT
# f32 path rounds operands through bfloat16 (observed ~1e-2 relative
# error on sums) and Mosaic only offers DEFAULT or 6-pass HIGHEST.
# The one-hot side is exact in bf16 (entries 0/1), so splitting the
# message into hi/lo bf16 planes and summing DEFAULT passes recovers
# ~f32 fidelity at a fraction of the HIGHEST cost.  Precision is
# pinned to DEFAULT explicitly so a global
# jax_default_matmul_precision=highest (set e.g. by the parity runner
# for the non-kernel matmuls) cannot leak in — Mosaic rejects fp32
# contract precision on bf16 operands ("Bad lhs type") and HIGHEST
# would triple the pass count for nothing.
_DN_T = (((1,), (0,)), ((), ()))   # onehotT [R, C] contracts with [C, D]
_PREC = jax.lax.Precision.DEFAULT


def _dot_t(lhs, rhs):
    return jax.lax.dot_general(lhs, rhs, _DN_T,
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _accumulate(onehot_t, msgw, acc_ref):
    """acc += onehot_t @ msgw on the MXU (onehot_t is [R, C], exact
    bf16; msgw [C, D]).  f32 messages run the two-pass hi/lo scheme,
    bf16 messages (mixed-precision training) one pass."""
    if msgw.dtype == jnp.bfloat16:
        acc_ref[...] += _dot_t(onehot_t, msgw)
    else:
        hi, lo = _split_hi_lo(msgw)
        acc_ref[...] += _dot_t(onehot_t, hi) + _dot_t(onehot_t, lo)


def _flush_bounds(tiles_ref):
    i = pl.program_id(0)
    nc = pl.num_programs(0)
    first = jnp.logical_or(i == 0, tiles_ref[i] != tiles_ref[i - 1])
    last = jnp.logical_or(i == nc - 1, tiles_ref[i] != tiles_ref[i + 1])
    return first, last


def _onehot_t(local_row, rows_per_tile):
    """Transposed one-hot [R, C] from a LANE-major local-row vector
    [1, C]: rows iota along sublanes compared against the broadcast
    slot values.  Lane-major scalars matter for memory, not math: a
    [NC, C, 1] operand's HBM tiled layout pads the unit minor dim to
    128 lanes (measured 1.98 GiB of pure padding at the ID-GAT/ba
    ego-union shapes — the round-4 OOM); the [NC, C] layout pads
    nothing and the sublane broadcast here is free on the VPU."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (rows_per_tile, local_row.shape[-1]), 0)
    # arithmetic form (max(1-|rows-local|, 0)) instead of a boolean
    # compare: Mosaic cannot replicate-relayout packed i1 vectors
    # ("Invalid relayout ... vector<128x1024xi1>"), while the int32
    # broadcast subtract is supported
    return jnp.maximum(1 - jnp.abs(rows - local_row), 0).astype(
        jnp.float32)                              # [R, C] 0/1


def _chunk_row(ref):
    """This grid step's [1, C] slice of a 2-D lane-major per-slot
    stream.  Blocks are (8, C) at index i//8 — Mosaic requires the
    sublane dim of a block to be 8-divisible (a (1, C) block is
    rejected) — so step i selects sublane i % 8 of its block; the
    block itself is refetched only every 8 steps."""
    sub = jax.lax.rem(pl.program_id(0), 8)
    return ref[pl.ds(sub, 1), :]


def _pad8_rows(a):
    """Pad dim 0 up to a multiple of 8 so (8, C) scalar blocks never
    read past the array (values in the pad rows are never selected)."""
    pad = (-a.shape[0]) % 8
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a


def _group_reduce(msgw, local_row, group):
    """VPU pre-reduction: sum aligned groups of `group` slots (each
    row-pure by pack construction), cutting the MXU contraction depth
    by `group`.  Exact f32 adds in fixed order.

    The reshape [C, D] -> [C/G, G*D] is layout-free (G consecutive
    slots land side-by-side in lanes), so the reduction is G-1 adds of
    contiguous 128-lane blocks — no sublane striding.  The grouped
    local-row vector is the strided lane slice [:, ::G] (group slots
    are row-pure by construction); G=1 (the shipped default) skips
    everything."""
    if group <= 1:
        return msgw, local_row
    c, d = msgw.shape
    wide = msgw.reshape(c // group, group * d)
    acc = wide[:, :d]
    for gi in range(1, group):
        acc = acc + wide[:, gi * d:(gi + 1) * d]
    return acc, local_row[:, ::group]


def _kernel(tiles_ref, local_ref, msg_ref, out_ref, acc_ref, *,
            rows_per_tile, group):
    """One chunk per grid step: acc += onehot_t @ msg; flush on last
    chunk of each tile (pallas writes out_ref back when the out block
    index changes)."""
    first, last = _flush_bounds(tiles_ref)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    msg = msg_ref[0]
    in_bf16 = msg.dtype == jnp.bfloat16
    msgw, local = _group_reduce(msg.astype(jnp.float32),
                                _chunk_row(local_ref), group)
    if in_bf16:
        msgw = msgw.astype(jnp.bfloat16)
    _accumulate(_onehot_t(local, rows_per_tile).astype(jnp.bfloat16),
                msgw, acc_ref)

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...]


def _kernel_weighted(tiles_ref, local_ref, w_ref, msg_ref, out_ref,
                     acc_ref, *, rows_per_tile, group, out_dtype):
    """Weighted variant: the per-edge weight rides the ONE-HOT operand
    (weighted-hot: whot_t[r, c] = w[c] where local[c] == r, else 0), so
    the caller feeds the *raw* gather output — no separate XLA multiply
    pass over the [E, D] message stream, and no sublane-major weight
    vector (the [NC, C, 1] layout whose 128x HBM padding OOM'd the
    ID-GAT/ba cells).

    Precision: w and msg are split into bf16 hi/lo planes; the three
    products w_hi*m_hi + w_hi*m_lo + w_lo*m_hi reconstruct the f32
    product up to the dropped w_lo*m_lo term (~2^-16 relative — same
    order as the two-pass scheme's residual).  bf16 messages take a
    one-pass path with bf16 weights."""
    first, last = _flush_bounds(tiles_ref)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    msg = msg_ref[0]
    msgw, local = _group_reduce(msg.astype(jnp.float32),
                                _chunk_row(local_ref), group)
    onehot = _onehot_t(local, rows_per_tile)        # [R, C] 0/1 f32
    w = _chunk_row(w_ref).astype(jnp.float32)       # [1, C]
    if group > 1:
        w = w[:, ::group]
    whot = onehot * w                               # exact f32 products
    if msg.dtype == jnp.bfloat16:
        acc_ref[...] += _dot_t(whot.astype(jnp.bfloat16),
                               msgw.astype(jnp.bfloat16))
    else:
        w_hi, w_lo = _split_hi_lo(whot)
        m_hi, m_lo = _split_hi_lo(msgw)
        acc_ref[...] += (_dot_t(w_hi, m_hi) + _dot_t(w_hi, m_lo)
                         + _dot_t(w_lo, m_hi))

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "interpret", "rows_per_tile", "group"))
def packed_segment_matmul(msg: jnp.ndarray, local_rows: jnp.ndarray,
                          tiles: jnp.ndarray, num_tiles: int,
                          weights: Optional[jnp.ndarray] = None,
                          interpret: bool = False,
                          rows_per_tile: int = ROWS_PER_TILE,
                          group: int = 1) -> jnp.ndarray:
    """out[t*R + j] = sum over chunks i with tiles[i]==t of
    onehot(local_rows[i])^T @ (msg[i] * weights[i]).

    weights=None skips the in-kernel multiply (callers with
    pre-weighted messages, e.g. the attention value path).
    group > 1 requires a pack built with the same group alignment."""
    nc, c, d = msg.shape
    R = rows_per_tile
    assert c % max(group, 1) == 0
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    # guard the tiles[i+1] / tiles[i-1] neighbor reads at the ends
    tiles = jnp.concatenate([tiles, tiles[-1:]])
    chunk1 = lambda i, tiles: (i, 0, 0)  # noqa: E731
    # per-slot scalar streams stay 2-D [NC, C] (lane-major): a [NC, C,
    # 1] layout's HBM tiling pads the unit minor dim 128x (the round-4
    # ID-GAT/ba OOM — 1.98 GiB of padding); [NC, C] pads nothing.
    # Blocks are (8, C) at i//8 (Mosaic rejects 1-sublane blocks);
    # _chunk_row selects the step's sublane
    row2 = lambda i, tiles: (i // 8, 0)  # noqa: E731
    local_spec = pl.BlockSpec((8, c), row2, memory_space=pltpu.VMEM)
    msg_spec = pl.BlockSpec((1, c, d), chunk1, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, d), lambda i, tiles: (tiles[i], 0),
                            memory_space=pltpu.VMEM)
    if weights is None:
        kernel = functools.partial(_kernel, rows_per_tile=R,
                                   group=group)
        in_specs = [local_spec, msg_spec]
        args = (tiles, _pad8_rows(local_rows), msg)
    else:
        assert group <= 1, (
            "weighted packed_segment_matmul does not support group>1 "
            "(per-slot weights ride the one-hot operand; grouped slots "
            "would need uniform weights)")
        kernel = functools.partial(_kernel_weighted, rows_per_tile=R,
                                   group=group, out_dtype=jnp.float32)
        in_specs = [local_spec,
                    pl.BlockSpec((8, c), row2, memory_space=pltpu.VMEM),
                    msg_spec]
        args = (tiles, _pad8_rows(local_rows), _pad8_rows(weights), msg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((R, d), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * R, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)


def spmm_packed(pack: PackedCSR, x: jnp.ndarray, num_nodes: int,
                interpret: bool = False) -> jnp.ndarray:
    """Forward SpMM from a packed layout.  x must have a padding row at
    index num_nodes (GraphBatch guarantees one).  On CPU backends the
    kernel runs in interpreter mode automatically (tests / debugging)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if x.shape[0] == num_nodes:
        x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
    # raw gather only — the weight multiply (and the f32 hi/lo split)
    # happens inside the kernel, so the [E, D] stream crosses HBM once
    # in each direction instead of twice
    msg = jnp.take(x, pack.senders.reshape(-1), axis=0)
    msg = msg.reshape(pack.senders.shape + (x.shape[1],))
    num_tiles = (num_nodes + ROWS_PER_TILE - 1) // ROWS_PER_TILE
    out = packed_segment_matmul(msg, pack.local_rows, pack.tiles,
                                num_tiles, weights=pack.weights,
                                interpret=interpret, group=EDGE_GROUP)
    return out[:num_nodes].astype(x.dtype)


# --------------------------------------------------------------------------
# Differentiable COO-style API over precomputed fwd/bwd packs
# --------------------------------------------------------------------------

class BidirPack(NamedTuple):
    """Forward (A) + transpose (A^T) packed layouts, plus the original
    COO indices for the edge-weight gradient (SDDMM)."""
    fwd: PackedCSR
    bwd: PackedCSR
    senders: jnp.ndarray
    receivers: jnp.ndarray


def pack_bidir(senders: np.ndarray, receivers: np.ndarray,
               weights: Optional[np.ndarray], num_nodes: int
               ) -> BidirPack:
    fwd = pack_csr(senders, receivers, weights, num_nodes)
    bwd = pack_csr(receivers, senders, weights, num_nodes)
    return BidirPack(fwd, bwd, np.asarray(senders, np.int32),
                     np.asarray(receivers, np.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def spmm_bidir(pack: BidirPack, x: jnp.ndarray, num_nodes: int):
    """Differentiable SpMM (wrt x): out = A @ x via the packed kernel,
    d/dx = A^T @ g via the transpose pack.  The weights baked into the
    packs are treated as constants; layers that differentiate wrt
    per-edge weights (attention) use the weight-outside formulation:
    spmm(alpha * msg) with alpha from segment_softmax in XLA."""
    return spmm_packed(pack.fwd, x, num_nodes)


def _spmm_fwd_rule(pack, x, num_nodes):
    return spmm_packed(pack.fwd, x, num_nodes), None


def _spmm_bwd_rule(pack, num_nodes, _, g):
    return (spmm_packed(pack.bwd, g, num_nodes),)


spmm_bidir.defvjp(_spmm_fwd_rule, _spmm_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_matmul_vjp(msg: jnp.ndarray, local_rows: jnp.ndarray,
                       tiles: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Differentiable packed segmented-sum: out[rows] += msg, where
    rows = tiles*R + local_rows.  Forward runs the Pallas kernel; the
    VJP wrt msg is a plain gather d_msg[i,c] = g[rows[i,c]] — so any
    traced per-edge weighting (attention!) folded into msg
    differentiates for free."""
    num_tiles = (num_nodes + ROWS_PER_TILE - 1) // ROWS_PER_TILE
    return packed_segment_matmul(msg, local_rows, tiles,
                                 num_tiles)[:num_nodes]


def _segmm_fwd(msg, local_rows, tiles, num_nodes):
    return segment_matmul_vjp(msg, local_rows, tiles, num_nodes), \
        (local_rows, tiles)


def _segmm_bwd(num_nodes, res, g):
    local_rows, tiles = res
    rows = tiles[:, None] * ROWS_PER_TILE + local_rows  # [NC, C]
    rows = jnp.minimum(rows, g.shape[0] - 1)
    d_msg = jnp.take(g, rows.reshape(-1), axis=0).reshape(
        rows.shape + g.shape[1:])
    zero_i = np.zeros(local_rows.shape, dtype=jax.dtypes.float0)
    zero_t = np.zeros(tiles.shape, dtype=jax.dtypes.float0)
    return d_msg, zero_i, zero_t


segment_matmul_vjp.defvjp(_segmm_fwd, _segmm_bwd)


def _kernel_headed(tiles_ref, local_ref, w_ref, msg_ref, out_ref,
                   acc_ref, *, rows_per_tile, heads):
    """Per-head weighted variant for attention: head h's traced
    coefficient w[c, h] (delivered lane-major as [1, H*C] — see the
    layout note on _onehot_t) rides the one-hot operand exactly like
    _kernel_weighted; for H > 1 each head runs its own weighted-hot
    matmul and a column mask keeps only that head's dv output lanes
    (every practical config here is H=1, which skips the mask and the
    loop; multi-head pays H matmul sets).  Traced weights (softmax'd
    attention coefficients) differentiate through
    segment_matmul_headed_vjp."""
    first, last = _flush_bounds(tiles_ref)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    msg = msg_ref[0]
    c, hd = msg.shape
    dv = hd // heads
    onehot = _onehot_t(_chunk_row(local_ref), rows_per_tile)  # [R, C]
    in_bf16 = msg.dtype == jnp.bfloat16
    if in_bf16:
        m = msg
    else:
        m_hi, m_lo = _split_hi_lo(msg.astype(jnp.float32))
    w_all = _chunk_row(w_ref)                              # [1, H*C]
    for h in range(heads):
        w_h = w_all[:, h * c:(h + 1) * c].astype(jnp.float32)
        whot = onehot * w_h                                # [R, C]
        if in_bf16:
            part = _dot_t(whot.astype(jnp.bfloat16), m)
        else:
            w_hi, w_lo = _split_hi_lo(whot)
            part = (_dot_t(w_hi, m_hi) + _dot_t(w_hi, m_lo)
                    + _dot_t(w_lo, m_hi))
        if heads > 1:
            cols = jax.lax.broadcasted_iota(jnp.int32,
                                            (rows_per_tile, hd), 1)
            part = jnp.where(cols // dv == h, part, 0.0)
        acc_ref[...] += part

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "heads", "interpret", "rows_per_tile"))
def packed_segment_matmul_headed(msg: jnp.ndarray, weights: jnp.ndarray,
                                 local_rows: jnp.ndarray,
                                 tiles: jnp.ndarray, num_tiles: int,
                                 heads: int, interpret: bool = False,
                                 rows_per_tile: int = ROWS_PER_TILE
                                 ) -> jnp.ndarray:
    """out[t*R + j, h*dv + k] = sum over slots of row j of
    weights[slot, h] * msg[slot, h*dv + k]."""
    nc, c, hd = msg.shape
    R = rows_per_tile
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    tiles = jnp.concatenate([tiles, tiles[-1:]])
    chunk1 = lambda i, tiles: (i, 0, 0)  # noqa: E731
    row2 = lambda i, tiles: (i // 8, 0)  # noqa: E731
    # lane-major scalar streams (see _onehot_t layout note): weights
    # arrive [NC, C, H] from the caller and are re-laid head-major to
    # a padding-free 2-D [NC, H*C] before the kernel
    w2 = jnp.transpose(weights, (0, 2, 1)).reshape(nc, heads * c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((8, c), row2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, heads * c), row2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hd), chunk1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, hd), lambda i, tiles: (tiles[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, hd), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_headed, rows_per_tile=R, heads=heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * R, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tiles, _pad8_rows(local_rows), _pad8_rows(w2), msg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def segment_matmul_headed_vjp(msg: jnp.ndarray, weights: jnp.ndarray,
                              local_rows: jnp.ndarray,
                              tiles: jnp.ndarray, num_nodes: int,
                              heads: int) -> jnp.ndarray:
    """Differentiable per-head weighted packed aggregation:
    out[row(s), h, :] += weights[s, h] * msg[s, h, :].

    Both msg and weights are traced: d_msg[s, h, :] = w[s, h] *
    g[row(s), h, :] (gather) and d_w[s, h] = <g[row(s), h, :],
    msg[s, h, :]> (SDDMM) — no scatters anywhere, so attention
    coefficients from softmax (incl. dropout masks) flow straight
    through the kernel (replaces the XLA [E, H*dv] multiply pass of the
    previous packed_attention; reference counterpart
    TfgIDLayer.py:333-355 virtual-node attention)."""
    num_tiles = (num_nodes + ROWS_PER_TILE - 1) // ROWS_PER_TILE
    return packed_segment_matmul_headed(
        msg, weights, local_rows, tiles, num_tiles,
        heads)[:num_nodes]


def _segmm_headed_fwd(msg, weights, local_rows, tiles, num_nodes, heads):
    out = segment_matmul_headed_vjp(msg, weights, local_rows, tiles,
                                    num_nodes, heads)
    return out, (msg, weights, local_rows, tiles)


def _segmm_headed_bwd(num_nodes, heads, res, g):
    msg, weights, local_rows, tiles = res
    nc, c, hd = msg.shape
    dv = hd // heads
    rows = tiles[:, None] * ROWS_PER_TILE + local_rows      # [NC, C]
    rows = jnp.minimum(rows, g.shape[0] - 1)
    g_rows = jnp.take(g, rows.reshape(-1), axis=0).reshape(
        nc, c, heads, dv)
    w_wide = weights[..., None]                             # [NC,C,H,1]
    d_msg = (g_rows * w_wide).reshape(nc, c, hd).astype(msg.dtype)
    d_w = jnp.sum(g_rows * msg.reshape(nc, c, heads, dv),
                  axis=-1).astype(weights.dtype)            # [NC, C, H]
    zero_i = np.zeros(local_rows.shape, dtype=jax.dtypes.float0)
    zero_t = np.zeros(tiles.shape, dtype=jax.dtypes.float0)
    return d_msg, d_w, zero_i, zero_t


segment_matmul_headed_vjp.defvjp(_segmm_headed_fwd, _segmm_headed_bwd)


def pack_rows(pack: PackedCSR) -> jnp.ndarray:
    """Receiver row of every packed slot: tiles*R + local."""
    return (pack.tiles[:, None] * ROWS_PER_TILE
            + pack.local_rows).astype(jnp.int32)


@jax.custom_vjp
def spmm_pack_vjp(fwd_pack: PackedCSR, bwd_pack: PackedCSR,
                  x: jnp.ndarray) -> jnp.ndarray:
    """SpMM over batch-carried packs (both packs are pytree *arguments*
    so they can flow through jit as traced data — unlike spmm_bidir
    whose packs are static).  Gradients: dx = A^T g; the pack arrays get
    symbolic-zero cotangents."""
    return spmm_packed(fwd_pack, x, x.shape[0])


def _pack_vjp_fwd(fwd_pack, bwd_pack, x):
    return spmm_packed(fwd_pack, x, x.shape[0]), (fwd_pack, bwd_pack)


def _zero_cotangent(pack: PackedCSR):
    def zero(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, dtype=jax.dtypes.float0)
    return PackedCSR(zero(pack.senders), zero(pack.weights),
                     zero(pack.local_rows), zero(pack.tiles))


def _pack_vjp_bwd(res, g):
    fwd_pack, bwd_pack = res
    dx = spmm_packed(bwd_pack, g, g.shape[0])
    return (_zero_cotangent(fwd_pack), _zero_cotangent(bwd_pack), dx)


spmm_pack_vjp.defvjp(_pack_vjp_fwd, _pack_vjp_bwd)


def sddmm_edge_grad(pack: BidirPack, x: jnp.ndarray,
                    g: jnp.ndarray) -> jnp.ndarray:
    """dL/dw[e] = <g[receivers[e]], x[senders[e]]> — the edge-weight
    gradient companion (one SDDMM pass)."""
    return jnp.sum(jnp.take(g, pack.receivers, axis=0) *
                   jnp.take(x, pack.senders, axis=0), axis=-1)


def spmm_pallas(senders, receivers, edge_weight, x, num_nodes,
                interpret: bool = False):
    """COO-compatible entry (packs on host — only usable outside jit;
    jitted paths should carry PackedCSR in the batch)."""
    pack = pack_csr(np.asarray(senders), np.asarray(receivers),
                    None if edge_weight is None
                    else np.asarray(edge_weight), num_nodes)
    return spmm_packed(pack, x, num_nodes, interpret=interpret)
