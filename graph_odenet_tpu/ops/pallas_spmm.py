"""Pallas/Mosaic TPU SpMM — MXU segment reduction over CSR row tiles.

The TPU-native replacement for the reference's ATen sparse kernels
(SURVEY.md §2 T5, §7 hard part 2).  Key observations:

  * the per-edge **gather** ``x[senders]`` is a pure HBM-bandwidth op that
    XLA already emits well — we leave it outside the kernel (fused with the
    weight multiply);
  * the per-edge **scatter-add** is where XLA's lowering loses: TPU scatter
    serialises.  But with edges sorted by receiver, each 128-row receiver
    block owns a *contiguous* span of the message array, so the reduction
    becomes a chain of dense MXU matmuls:

        out[block] = Σ_chunks  onehot(rel_chunk) @ msgs_chunk
                     [128, E_CHUNK]   @  [E_CHUNK, F]

    with the one-hot built on the fly from the receiver-relative indices by
    a VPU compare — no scatter anywhere, degree skew handled by a
    data-dependent chunk count per block (Pallas TPU grids are sequential).

Backward: dx = Âᵀ·g is the same kernel over the sender-sorted (CSC) view;
the normalised adjacency itself is non-differentiable state, enforced by
``custom_vjp``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graph_odenet_tpu.graph import Graph

__all__ = ["PallasCSR", "prepare", "spmm_pallas"]

import os

# Receiver rows per grid step.  The one-hot matmul costs BLOCK_ROWS·F MACs
# per edge, so the kernel is MXU-bound and 128 (the MXU tile minimum) is
# optimal — measured 11.8 ms fwd at 128 vs 19.9 ms at 1024 (arxiv scale).
# Env-tunable for A/B benchmarking.
BLOCK_ROWS = int(os.environ.get("GODE_BLOCK_ROWS", 128))
# Edges per inner DMA chunk; starts stay E_CHUNK-aligned because the
# [E/128, 128] i32 rel rows are (8,128)-tiled.  Env-tunable for A/B
# benchmarking the per-chunk issue-overhead floor (VERDICT r4 #8).
E_CHUNK = int(os.environ.get("GODE_E_CHUNK", 1024))

# MXU precision for the one-hot reduction matmuls — the main speed knob
# (the kernel is MXU-pass-bound).  The one-hot side is exact in bf16, so
# only the message operand is split into bf16 mantissa segments:
#   "highest" (default): 3 segments (8+8+8 ≥ f32's 24 mantissa bits) —
#              f32-exact to roundoff at HALF the MXU passes of a
#              Precision.HIGHEST f32 matmul (which must split both sides).
#   "bf16x2":  2 segments, ~1e-6 relative, 2 passes.
#   "default": single bf16 pass — ~1e-3 relative rounding, idiomatic for
#              bf16 training runs.
_MODE = os.environ.get("GODE_PRECISION", "highest").lower()
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "bf16x2": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
}[_MODE]

# One K=E_CHUNK matmul per chunk instead of SUBS unrolled K=128 matmuls —
# identical math (both accumulate masked one-hot reductions in f32).
# Measured slightly SLOWER on v5e (64.1 vs 66.1 M edges/s fwd+bwd at arxiv
# scale): the [SUBS,128]→[1,E_CHUNK] rel relayout outweighs the win from
# fewer accumulate flushes.  Kept as an A/B knob; default off.
_WIDE = os.environ.get("GODE_SPMM_WIDE", "0") == "1"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasCSR:
    """Receiver-sorted (CSR) + sender-sorted (CSC) tile metadata.

    fwd view:  gather by ``senders``, reduce into receiver blocks.
    bwd view:  gather by ``t_receivers`` (original receivers reordered),
               reduce into *sender* blocks — Âᵀ with identical kernel.
    """

    senders: jax.Array        # i32[E_pad]
    receivers: jax.Array      # i32[E_pad]  (receiver-sorted = Graph order)
    weight: jax.Array         # f32[E_pad]
    rel: jax.Array            # i32[E_pad/128, 128]  receiver − 128·block
    blk_ptr: jax.Array        # i32[NB+1]   edge span of each receiver block
    t_receivers: jax.Array    # i32[E_pad]
    t_weight: jax.Array       # f32[E_pad]
    t_rel: jax.Array          # i32[E_pad/128, 128]  sender − 128·block (CSC)
    t_blk_ptr: jax.Array      # i32[NB+1]
    t_perm: jax.Array         # i32[E_pad]  CSC position → original edge id
    # Window-schedule metadata for the pipelined reduce (one entry per
    # 128-aligned E_CHUNK window per receiver block; see _sched_kernel).
    rel3: jax.Array           # i32[E_pad/E_CHUNK + 1, SUBS, 128] rel, 3-D view
    sched_blk: jax.Array      # i32[I]  out block of window i (nondecreasing)
    sched_orig: jax.Array     # i32[I]  128-aligned window start
    t_rel3: jax.Array
    t_sched_blk: jax.Array
    t_sched_orig: jax.Array
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    n_edge: int = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(
        default=128, metadata=dict(static=True)
    )

    @property
    def n_blocks(self) -> int:
        return -(-self.n_node_pad // self.block_rows)

    # Duck-type the Graph surface that edge-wise ops (ops.sddmm.edge_scores)
    # use, so a PallasCSR can stand in for a Graph in GAT layers.
    def edge_mask(self) -> jax.Array:
        return jnp.arange(self.senders.shape[0]) < self.n_edge


def _build_view(dst, src, w, n_pad):
    """Sort edges by dst, return (src_sorted, w_sorted, rel, blk_ptr, order)."""
    order = np.argsort(dst, kind="stable")
    dst, src, w = dst[order], src[order], w[order]
    rel = (dst - (dst // BLOCK_ROWS) * BLOCK_ROWS).astype(np.int32)
    nb = -(-n_pad // BLOCK_ROWS)  # blocks may overhang n_pad; sliced off later
    counts = np.bincount(dst // BLOCK_ROWS, minlength=nb)
    blk_ptr = np.zeros(nb + 1, dtype=np.int32)
    np.cumsum(counts, out=blk_ptr[1:])
    return src.astype(np.int32), w.astype(np.float32), rel, blk_ptr, order


def _build_schedule(blk_ptr, e_pad):
    """Global window schedule: one (block, 128-aligned start) entry per
    E_CHUNK window each receiver block's edge span touches.

    Empty blocks still get one (fully masked) entry so their output rows
    are zeroed by the first-visit write.  Block ids are nondecreasing, as
    the output-revisit machinery requires.
    """
    ptr = blk_ptr.astype(np.int64)
    p0, p1 = ptr[:-1], ptr[1:]
    s0 = p0 // 128 * 128
    n_win = np.maximum(1, -(-(p1 - s0) // E_CHUNK))
    blks = np.repeat(np.arange(len(n_win), dtype=np.int32), n_win)
    # Window k within its block starts at s0[b] + k*E_CHUNK.
    csum = np.zeros(len(n_win) + 1, np.int64)
    np.cumsum(n_win, out=csum[1:])
    k = np.arange(csum[-1], dtype=np.int64) - csum[blks]
    origs = (s0[blks] + k * E_CHUNK).astype(np.int32)
    return blks, origs


def _rel3_view(rel, e_pad):
    """[E_pad/128, 128] rel → [C+1, SUBS, 128] leading-dim-sliceable view
    (one zero pad chunk so the 2-chunk window DMA never runs off the end)."""
    c = -(-e_pad // E_CHUNK)
    pad_rows = (c + 1) * SUBS - e_pad // 128
    return np.concatenate(
        [rel, np.zeros((pad_rows, 128), np.int32)]
    ).reshape(c + 1, SUBS, 128)


def prepare(g: Graph) -> PallasCSR:
    """Host-side, one-time tiling of a Graph for the Pallas kernel."""
    if g.n_node_pad % 8:
        raise ValueError(
            f"n_node_pad={g.n_node_pad} must be a multiple of 8 "
            "(sublane tile); the default node_multiple=128 satisfies this"
        )
    s = np.asarray(g.senders)[: g.n_edge]
    r = np.asarray(g.receivers)[: g.n_edge]
    w = np.asarray(g.weight)[: g.n_edge]
    e_pad = _round_up(max(g.n_edge, 1), E_CHUNK)

    def pad(a, fill=0):
        return np.concatenate(
            [a, np.full(e_pad - len(a), fill, dtype=a.dtype)]
        )

    f_src, f_w, f_rel, f_ptr, f_order = _build_view(r, s, w, g.n_node_pad)
    b_src, b_w, b_rel, b_ptr, b_order = _build_view(s, r, w, g.n_node_pad)
    # Graph edges are already receiver-sorted, so f_order is the identity and
    # original edge order == fwd kernel order; b_order maps CSC position →
    # original edge id (needed to permute per-edge attention data for bwd).
    # rel is stored 2-D [E_pad/128, 128] so chunk DMAs are row slices whose
    # start (a multiple of E_CHUNK/128 = 8 rows) satisfies Mosaic's (8, 128)
    # int32 tiling alignment.
    f_rel2d = pad(f_rel).reshape(-1, 128)
    b_rel2d = pad(b_rel).reshape(-1, 128)
    f_sblk, f_sorig = _build_schedule(f_ptr, e_pad)
    b_sblk, b_sorig = _build_schedule(b_ptr, e_pad)
    csr = PallasCSR(
        senders=jnp.asarray(pad(f_src)),
        receivers=jnp.asarray(pad(r[f_order].astype(np.int32))),
        weight=jnp.asarray(pad(f_w)),
        rel=jnp.asarray(f_rel2d),
        blk_ptr=jnp.asarray(f_ptr),
        t_receivers=jnp.asarray(pad(b_src)),
        t_weight=jnp.asarray(pad(b_w)),
        t_rel=jnp.asarray(b_rel2d),
        t_blk_ptr=jnp.asarray(b_ptr),
        t_perm=jnp.asarray(pad(b_order.astype(np.int32))),
        rel3=jnp.asarray(_rel3_view(f_rel2d, e_pad)),
        sched_blk=jnp.asarray(f_sblk),
        sched_orig=jnp.asarray(f_sorig),
        t_rel3=jnp.asarray(_rel3_view(b_rel2d, e_pad)),
        t_sched_blk=jnp.asarray(b_sblk),
        t_sched_orig=jnp.asarray(b_sorig),
        n_node_pad=g.n_node_pad,
        n_edge=g.n_edge,
        block_rows=BLOCK_ROWS,
    )
    # Kernel index math trusts these invariants; violations would read out
    # of bounds in VMEM (SURVEY.md §5 sanitizer row).
    from graph_odenet_tpu.utils.sanitize import validate_tiling

    validate_tiling(csr)
    return csr


SUBS = E_CHUNK // 128  # 128-edge sub-chunks per chunk (one rel row each)


def _segment_reduce_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    msgs_hbm,           # ANY/HBM [E_pad, F]
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128]
    alpha_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] per-edge/head scale
                        #   (dummy [1, 1, 128] when weighted=False)
    out_ref,            # VMEM [BLOCK_ROWS, F]
    msg_scratch,        # VMEM [2, E_CHUNK, F]
    rel_scratch,        # VMEM [2, SUBS, 128] (leading dim = DMA slot)
    alpha_scratch,      # VMEM [2, H, SUBS, 128] (or [2, 1, 1, 128] dummy)
    sems,               # DMA sems [2, 2 (+1)]
    *,
    heads: int = 0,     # weighted: number of per-edge scale rows
    feat: int = 0,      # weighted: lanes [h·feat, (h+1)·feat) scale by α_h
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weighted = heads > 0
    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)  # keep all index math int32 (x64-safe)
    # Chunk starts are aligned DOWN to E_CHUNK so every DMA slice satisfies
    # Mosaic's tiling alignment (f32 rows 8-aligned; rel rows 8-aligned in
    # the [E/128, 128] view); edges before p0 / past p1 are masked in the
    # one-hot.  E_pad is a multiple of E_CHUNK, so aligned starts can never
    # run off the end.
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)

    def dma_start(k):
        return base + k * chunk

    def issue(k, slot):
        start = dma_start(k)
        copies = [
            pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(start, E_CHUNK), :],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                rel_hbm.at[pl.ds(start // 128, SUBS), :],
                rel_scratch.at[slot],
                sems.at[slot, 1],
            ),
        ]
        if weighted:
            copies.append(
                pltpu.make_async_copy(
                    alpha_hbm.at[:, pl.ds(start // 128, SUBS), :],
                    alpha_scratch.at[slot],
                    sems.at[slot, 2],
                )
            )
        return copies

    if weighted:
        # head_expand[h, l] = 1 where value lane l belongs to head h: the
        # per-edge [H, 128e] scale rows expand onto value lanes with ONE
        # K=heads MXU contraction per sub-chunk — no [E, F] scale array is
        # ever materialised in HBM (the XLA-side expand measured ~12 ms at
        # arxiv scale for 45 MB of actual information).
        lanes_i = jax.lax.broadcasted_iota(
            jnp.int32, (heads, msg_scratch.shape[-1]), 1
        )
        heads_i = jax.lax.broadcasted_iota(
            jnp.int32, (heads, msg_scratch.shape[-1]), 0
        )
        head_expand = ((lanes_i // feat) == heads_i) & (
            lanes_i < heads * feat
        )

    @pl.when(n_chunks > 0)
    def _():
        for c in issue(0, 0):
            c.start()

    def body(k, acc):
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for c in issue(k + 1, nxt):
                c.start()

        for c in issue(k, slot):  # same descriptors → wait on the sems
            c.wait()

        rel = rel_scratch[slot]                        # [SUBS, 128] registers
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
        dn = (((1,), (0,)), ((), ()))

        def reduce_dot(mask, m):
            """One-hot segment reduction matmul at the selected precision."""
            if _MODE in ("highest", "bf16x2") and m.dtype == jnp.float32:
                # The one-hot is exact in bf16, so only the messages need
                # splitting.  hi/mid/lo are three non-overlapping ≤8-bit
                # mantissa segments (8+8+8 ≥ f32's 24), so at "highest" the
                # 3-pass sum reproduces the f32 product to f32 roundoff —
                # half the passes of a Precision.HIGHEST f32 matmul (6).
                # "bf16x2" drops the lo segment: 2 passes, ~1e-6 relative.
                oh = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
                hi = m.astype(jnp.bfloat16)
                r1 = m - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                parts = [hi, mid]
                if _MODE == "highest":
                    parts.append((r1 - mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    ))
                acc = None
                for p in parts:
                    d = jax.lax.dot_general(
                        oh, p, dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                return acc
            oh = jnp.where(mask, 1.0, 0.0).astype(m.dtype)
            # NOTE: per-operand tuple precision (DEFAULT, HIGHEST) hangs the
            # Mosaic remote compiler on this toolchain — keep it symmetric;
            # bf16 operands are single-pass regardless.
            return jax.lax.dot_general(
                oh, m, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        def expand_scale(a_sub):
            """[H, 128e] per-edge/head α → [128e, L] lane scales via one
            K=heads contraction against the exact 0/1 head_expand (same
            mantissa-split tiers as reduce_dot)."""
            exp16 = head_expand.astype(jnp.bfloat16)
            dn_e = (((0,), (0,)), ((), ()))
            if _MODE in ("highest", "bf16x2"):
                hi = a_sub.astype(jnp.bfloat16)
                r1 = a_sub - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                parts = [hi, mid]
                if _MODE == "highest":
                    parts.append(
                        (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    )
                s = None
                for p in parts:
                    d = jax.lax.dot_general(
                        p, exp16, dimension_numbers=dn_e,
                        preferred_element_type=jnp.float32,
                    )
                    s = d if s is None else s + d
                return s
            return jax.lax.dot_general(
                a_sub, head_expand.astype(a_sub.dtype),
                dimension_numbers=dn_e,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        if _WIDE and not weighted:
            # One (128×E_CHUNK)@(E_CHUNK×F) MXU matmul per chunk: K=E_CHUNK
            # replaces SUBS small ops (small-matmul issue overhead dominates
            # the unrolled path).  The wide one-hot is built by concatenating
            # the per-sub masks along lanes — no sublane→lane relayout.
            masks = []
            for sub in range(SUBS):
                e_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                    + dma_start(k) + sub * 128
                )
                valid = (e_idx >= p0) & (e_idx < p1)           # [1, 128]
                masks.append((rows == rel[sub][None, :]) & valid)
            return acc + reduce_dot(
                jnp.concatenate(masks, axis=1), msg_scratch[slot]
            )
        # 8 unrolled (128×128)@(128×F) MXU matmuls — identical FLOPs, every
        # operand slice tile-aligned.
        for sub in range(SUBS):
            e_idx = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                + dma_start(k) + sub * 128
            )
            valid = (e_idx >= p0) & (e_idx < p1)               # [1, 128]
            m_sub = msg_scratch[slot, pl.ds(sub * 128, 128), :]
            if weighted:
                m_sub = m_sub * expand_scale(alpha_scratch[slot][:, sub, :])
            acc = acc + reduce_dot(
                (rows == rel[sub][None, :]) & valid, m_sub
            )
        return acc

    acc = jnp.zeros((BLOCK_ROWS, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _segment_reduce(
    msgs, rel, blk_ptr, n_blocks, *, alpha3d=None, feat=0, interpret=False
):
    """One-hot MXU segment reduction; ``alpha3d`` ([H, E_pad/128, 128] in
    the same edge order as ``msgs``) selects the weighted variant: value
    lane ``l`` of edge ``e`` is scaled by ``alpha3d[l // feat, e]`` before
    the reduction, with the expansion done in-VMEM (see
    ``_segment_reduce_kernel``)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic requires 128-multiple lane widths for VMEM blocks/slices.
    f_in = msgs.shape[1]
    if f_in % 128:
        msgs = jnp.pad(msgs, ((0, 0), (0, 128 - f_in % 128)))
        return _segment_reduce(
            msgs, rel, blk_ptr, n_blocks,
            alpha3d=alpha3d, feat=feat, interpret=interpret,
        )[:, :f_in]
    f = msgs.shape[1]
    weighted = alpha3d is not None
    heads = alpha3d.shape[0] if weighted else 0
    if not weighted:
        alpha3d = jnp.zeros((1, 1, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, f), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E_CHUNK, f), msgs.dtype),
            pltpu.VMEM((2, SUBS, 128), jnp.int32),
            pltpu.VMEM(
                (2, heads, SUBS, 128) if weighted else (2, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2, 3 if weighted else 2)),
        ],
    )
    return pl.pallas_call(
        partial(_segment_reduce_kernel, heads=heads, feat=feat),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, f), msgs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(blk_ptr, msgs, rel, alpha3d)


def _sched_kernel(
    sblk_ref,           # scalar prefetch: i32[I] out block per window
    sorig_ref,          # scalar prefetch: i32[I] 128-aligned window start
    ptr_ref,            # scalar prefetch: i32[NB+1] block edge spans
    msgs_hbm,           # ANY/HBM [E_pad, F]
    rel3_hbm,           # i32 ANY/HBM [C+1, SUBS, 128]
    alpha4_hbm,         # f32 ANY/HBM [H, C+1, SUBS, 128] (dummy [1,1,1,128])
    out_ref,            # VMEM [BLOCK_ROWS, F] — revisit-accumulated
    msg_scratch,        # VMEM [2, E_CHUNK, F]
    rel_scratch,        # VMEM [2, 2, SUBS, 128]
    alpha_scratch,      # VMEM [2, H, 2, SUBS, 128] (or [2,1,1,1,128] dummy)
    sems,               # DMA sems [2, 2 (+1)]
    *,
    heads: int,         # weighted: number of per-edge scale rows (0 = plain)
    feat: int,          # weighted: lanes [h·feat, (h+1)·feat) scale by α_h
    n_windows: int,
):
    """Schedule-driven segment reduce (round-3 redesign).

    The per-receiver-block grid paid two structural DMA costs at arxiv
    scale (measured, scripts/exp_reduce_floor.py): E_CHUNK-aligned window
    starts re-read ~50% of the edge stream at block boundaries (2679 chunk
    iterations vs the 1357 minimum → 1.40 GB DMA for a 0.71 GB payload),
    and each block's first chunk waited on a just-issued DMA because manual
    DMAs issued inside a kernel body do not pipeline across grid steps
    (1323 exposed-latency bubbles).  Here the grid runs over a host-built
    global window list (`PallasCSR.sched_*`): window starts are 128-aligned
    (waste ≤127 edges/block), every step issues step i+1's copies before
    waiting on its own (the pipeline crosses grid steps — one warmup bubble
    total), and the output BlockSpec's index_map reads the window's
    receiver block from the scalar-prefetched schedule, accumulating
    revisited blocks in VMEM and flushing on block change.  Measured 1.57×
    the per-block kernel at f32-exact precision (6.57 → 4.17 ms).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    weighted = heads > 0
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    e_pad = msgs_hbm.shape[0]

    def issue(j, s):
        orig = sorig_ref[j]
        # The last block's final window may overhang E_pad (starts are
        # 128-aligned, E_pad is E_CHUNK-aligned): clamp the DMA window
        # left; masking below uses absolute edge ids, so the re-covered
        # edges stay excluded.
        # multiple_of: schedule starts are 128-aligned by construction but
        # arrive via SMEM, so Mosaic cannot prove sublane divisibility for
        # >128-lane message tables (memref_slice tiling check) without it.
        dma = pl.multiple_of(
            jnp.minimum(orig, jnp.int32(e_pad - E_CHUNK)), 128
        )
        c0 = dma // jnp.int32(E_CHUNK)
        copies = [
            pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(dma, E_CHUNK), :],
                msg_scratch.at[s],
                sems.at[s, 0],
            ),
            pltpu.make_async_copy(
                rel3_hbm.at[pl.ds(c0, 2)],
                rel_scratch.at[s],
                sems.at[s, 1],
            ),
        ]
        if weighted:
            copies.append(
                pltpu.make_async_copy(
                    alpha4_hbm.at[:, pl.ds(c0, 2)],
                    alpha_scratch.at[s],
                    sems.at[s, 2],
                )
            )
        return copies

    @pl.when(i == 0)
    def _():
        for cp in issue(0, 0):
            cp.start()

    @pl.when(i + 1 < n_windows)
    def _():
        for cp in issue(i + 1, jax.lax.rem(i + 1, jnp.int32(2))):
            cp.start()

    for cp in issue(i, slot):
        cp.wait()

    b = sblk_ref[i]
    orig = sorig_ref[i]
    dma = pl.multiple_of(jnp.minimum(orig, jnp.int32(e_pad - E_CHUNK)), 128)
    c0 = dma // jnp.int32(E_CHUNK)
    p0 = ptr_ref[b]
    p1 = ptr_ref[b + 1]
    lo = jnp.maximum(p0, orig)
    hi = jnp.minimum(p1, orig + jnp.int32(E_CHUNK))
    first = orig == (p0 // 128 * 128)

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    if weighted:
        lanes_i = jax.lax.broadcasted_iota(
            jnp.int32, (heads, msg_scratch.shape[-1]), 1
        )
        heads_i = jax.lax.broadcasted_iota(
            jnp.int32, (heads, msg_scratch.shape[-1]), 0
        )
        head_expand = ((lanes_i // feat) == heads_i) & (
            lanes_i < heads * feat
        )

    acc = jnp.where(first, 0.0, out_ref[:].astype(jnp.float32))
    for sub in range(SUBS):
        e0 = dma + sub * 128
        e_idx = lane + e0
        valid = (e_idx >= lo) & (e_idx < hi)
        r = e0 // 128 - c0 * SUBS          # rel row in the 2-chunk slice
        rel_row = rel_scratch[
            slot, r // SUBS, pl.ds(jax.lax.rem(r, jnp.int32(SUBS)), 1), :
        ]                                                    # [1, 128]
        mask = (rows == rel_row) & valid
        m_sub = msg_scratch[slot, pl.ds(sub * 128, 128), :]
        if weighted:
            a_sub = alpha_scratch[
                slot, :, r // SUBS,
                pl.ds(jax.lax.rem(r, jnp.int32(SUBS)), 1), :,
            ].reshape(heads, 128)
            scale = _mask_dot_spmm(
                head_expand, a_sub, (((0,), (0,)), ((), ())),
                exact_lhs=False,
            )                                                 # [128e, L]
            m_sub = m_sub * scale
        acc = acc + _reduce_dot_spmm(mask, m_sub)
    out_ref[:] = acc


def _segment_reduce_sched(
    msgs, rel3, blk_ptr, sched_blk, sched_orig, n_blocks,
    *, alpha4=None, feat=0, interpret=False,
):
    """Schedule-driven reduce — drop-in for ``_segment_reduce`` given the
    ``PallasCSR.sched_*`` metadata.  Output accumulates in f32 across
    window revisits regardless of the message dtype (cast at the end)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f_in = msgs.shape[1]
    if f_in % 128:
        msgs = jnp.pad(msgs, ((0, 0), (0, 128 - f_in % 128)))
        return _segment_reduce_sched(
            msgs, rel3, blk_ptr, sched_blk, sched_orig, n_blocks,
            alpha4=alpha4, feat=feat, interpret=interpret,
        )[:, :f_in]
    f = msgs.shape[1]
    weighted = alpha4 is not None
    heads = alpha4.shape[0] if weighted else 0
    if not weighted:
        alpha4 = jnp.zeros((1, 1, 1, 128), jnp.float32)
    n_windows = sched_blk.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, f),
            lambda i, sblk, sorig, ptr: (sblk[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E_CHUNK, f), msgs.dtype),
            pltpu.VMEM((2, 2, SUBS, 128), jnp.int32),
            pltpu.VMEM(
                (2, heads, 2, SUBS, 128) if weighted else (2, 1, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2, 3 if weighted else 2)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _sched_kernel, heads=heads, feat=feat, n_windows=n_windows
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * BLOCK_ROWS, f), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sched_blk, sched_orig, blk_ptr, msgs, rel3, alpha4)
    return out.astype(msgs.dtype)


def _alpha4_view(alpha3d):
    """[H, E_pad/128, 128] α rows → [H, C+1, SUBS, 128] window view."""
    h, rows128, _ = alpha3d.shape
    c = -(-(rows128 * 128) // E_CHUNK)
    pad_rows = (c + 1) * SUBS - rows128
    return jnp.concatenate(
        [alpha3d, jnp.zeros((h, pad_rows, 128), alpha3d.dtype)], axis=1
    ).reshape(h, c + 1, SUBS, 128)


# Schedule-driven reduce on by default; GODE_SPMM_SCHED=0 restores the
# per-receiver-block kernel (A/B and fallback knob).
_SCHED = os.environ.get("GODE_SPMM_SCHED", "1") != "0"


def _segment_reduce_weighted(
    msgs, alpha3d, rel, blk_ptr, n_blocks, feat, *, interpret=False
):
    """CSC reduce with per-edge/head α folded into the message scaling
    in-kernel (the GAT backward's dWh reduction, ops/pallas_gat._dwh_csc)."""
    return _segment_reduce(
        msgs, rel, blk_ptr, n_blocks,
        alpha3d=alpha3d, feat=feat, interpret=interpret,
    )


def segment_reduce_csr(
    csr: "PallasCSR", msgs, *, transpose=False, alpha3d=None, feat=0,
    interpret=False,
):
    """Segment reduce over a prepared graph view — the single dispatch
    point between the schedule-driven kernel (default) and the legacy
    per-receiver-block kernel (``GODE_SPMM_SCHED=0``).

    ``transpose=False`` reduces receiver-sorted messages into receiver
    blocks (the SpMM forward); ``transpose=True`` uses the CSC view (the
    backward / GAT dWh).  ``alpha3d`` ([H, E_pad/128, 128], same edge
    order as ``msgs``) selects the weighted variant.
    """
    rel, rel3, ptr = (
        (csr.t_rel, csr.t_rel3, csr.t_blk_ptr) if transpose
        else (csr.rel, csr.rel3, csr.blk_ptr)
    )
    sblk, sorig = (
        (csr.t_sched_blk, csr.t_sched_orig) if transpose
        else (csr.sched_blk, csr.sched_orig)
    )
    if _SCHED:
        return _segment_reduce_sched(
            msgs, rel3, ptr, sblk, sorig, csr.n_blocks,
            alpha4=None if alpha3d is None else _alpha4_view(alpha3d),
            feat=feat, interpret=interpret,
        )
    return _segment_reduce(
        msgs, rel, ptr, csr.n_blocks,
        alpha3d=alpha3d, feat=feat, interpret=interpret,
    )


def _segment_reduce_recompute_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    seed_ref,           # scalar prefetch: i32[1] dropout seed (unused if off)
    msgs_hbm,           # ANY/HBM [E_pad, 128]: lanes [g(hf) | s_dst(H) |
                        #   m(H) | l(H) | rid(1)? | pad] gathered by CSC recv
                        #   (wide mode: g fills all 128 lanes, side values
                        #   arrive on the separate side plane)
    side_hbm,           # ANY/HBM [E_pad, 128] side plane, lanes [s_dst(H) |
                        #   m(H) | l(H) | rid(1)?] — dummy [1, 128] if !wide
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128] sender − 128·block
    src_blk,            # VMEM [BLOCK_ROWS, 128] s_src rows of this sender
                        #   block — ``src_parts`` mantissa parts at lane
                        #   groups [H·p, H·(p+1)) (1 part: lanes 0..H−1)
    out_ref,            # VMEM [BLOCK_ROWS, 128]
    msg_scratch,        # VMEM [2, E_CHUNK, 128]
    side_scratch,       # VMEM [2, E_CHUNK, 128] (or [2, 1, 128] if !wide)
    rel_scratch,        # VMEM [2, SUBS, 128]
    sems,               # DMA sems [2, 3]
    *,
    heads: int,
    feat: int,
    slope: float,       # LeakyReLU negative slope of the edge scores
    drop_keep24: int = 0,   # >0: regenerate attention dropout in-kernel
    inv_keep: float = 1.0,  # 1/(1-rate)
    wide: bool = False,     # H·F fills the whole g plane (e.g. H=1 F=128):
                            #   side values ride a second 128-lane gather
                            #   plane instead of spare lanes
    src_parts: int = 1,     # mantissa parts pre-split into src_blk lanes
    interleaved: bool = False,  # g lanes are f·H+h (power-of-two H): the α
                            #   expansion becomes log2(128/H) VPU lane-roll
                            #   doublings instead of 3 MXU split passes
):
    """dWh CSC reduction with α *recomputed in-kernel* from node tables.

    The GAT backward needs per-edge α in CSC (sender-sorted) order, but α is
    produced in CSR order — and the [E, H] permute gather is narrow, which
    XLA lowers per-element (~8–15 ms at arxiv scale).  When the logits are
    the standard decomposed GAT scores ``LeakyReLU(s_src[s] + s_dst[r])``
    (ops/sddmm.edge_scores), α is a pure function of node-indexed tables:

        α_e = exp(min(LeakyReLU(s_src[s_e] + s_dst[r_e]) − m[r_e], 0)) / l[r_e]

    so the CSC pass needs NO edge-order permute at all: s_dst/m/l ride the
    existing wide g[r] gather (lanes hf..hf+3H of the msgs table — free, the
    table was lane-padded to 128 anyway), and s_src is block-local, expanded
    onto edge lanes by the same one-hot contraction that does the reduction.
    The exponent clamp is exact for real edges (m is the receiver's running
    max, so logit ≤ m) and keeps padding receivers (m = −1e30) finite; the
    one-hot zeroes their contribution.  Requires H·F + 3H ≤ 128.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hf = heads * feat
    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)

    def issue(k, slot):
        start = base + k * chunk
        copies = [
            pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(start, E_CHUNK), :],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                rel_hbm.at[pl.ds(start // 128, SUBS), :],
                rel_scratch.at[slot],
                sems.at[slot, 1],
            ),
        ]
        if wide:
            copies.append(
                pltpu.make_async_copy(
                    side_hbm.at[pl.ds(start, E_CHUNK), :],
                    side_scratch.at[slot],
                    sems.at[slot, 2],
                )
            )
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for c in issue(0, 0):
            c.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    head_live = lane128 < heads                                  # [1, 128]
    # expand128[j, l] = 1 where value lane l belongs to head j (j < H).
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    heads_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    expand128 = ((lanes_i // feat) == heads_i) & (lanes_i < hf)

    def body(k, acc):
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for c in issue(k + 1, nxt):
                c.start()

        for c in issue(k, slot):
            c.wait()

        rel = rel_scratch[slot]                        # [SUBS, 128]
        for sub in range(SUBS):
            e_idx = lane128 + base + k * chunk + sub * 128
            valid = (e_idx >= p0) & (e_idx < p1)               # [1, 128]
            oh = (rows == rel[sub][None, :]) & valid           # [R, 128e]
            m_sub = msg_scratch[slot, pl.ds(sub * 128, 128), :]  # [128e, 128]
            # s_src expanded onto edge rows: pre-split parts → ONE exact
            # bf16 one-hot contraction + lane-roll recombines (vs 3 split
            # passes); lanes 0..H−1 live, invalid edges → 0 rows.
            if src_parts > 1:
                raw = _exact_dot_spmm(
                    oh, src_blk[:], (((0,), (0,)), ((), ()))
                )                                               # [128e, 128]
                src_em = raw
                for p in range(1, src_parts):
                    src_em = src_em + pltpu.roll(
                        raw, shift=128 - p * heads, axis=1
                    )
            else:
                src_em = _mask_dot_spmm(
                    oh, src_blk[:], (((0,), (0,)), ((), ()))
                )                                               # [128e, 128]
            # s_dst / m / l extracted by lane rolls (VPU-cheap; garbage
            # beyond lane H is masked below) — from the gather tile's spare
            # lanes, or from the dedicated side plane in wide mode.
            if wide:
                side = side_scratch[slot, pl.ds(sub * 128, 128), :]
                dst_em = side
                m_em = pltpu.roll(side, shift=(128 - heads) % 128, axis=1)
                l_em = pltpu.roll(
                    side, shift=(128 - 2 * heads) % 128, axis=1
                )
            else:
                dst_em = pltpu.roll(m_sub, shift=(128 - hf) % 128, axis=1)
                m_em = pltpu.roll(
                    m_sub, shift=(128 - hf - heads) % 128, axis=1
                )
                l_em = pltpu.roll(
                    m_sub, shift=(128 - hf - 2 * heads) % 128, axis=1
                )
            logit = src_em + dst_em
            logit = jnp.where(logit >= 0.0, logit, slope * logit)
            expo = jnp.minimum(logit - m_em, 0.0)   # exact: logit ≤ m[r]
            l_safe = jnp.where(head_live, l_em, 1.0)
            alpha = jnp.where(head_live, jnp.exp(expo), 0.0) / l_safe
            if drop_keep24:
                # Regenerate the counter-based attention-dropout mask
                # (ops.dropmask — same hash, same key) in CSC order:
                # sender = 128·b + row, expanded onto edge rows by a single
                # exact bf16 one-hot pass (row ids ≤ 127 are bf16-exact);
                # receiver rides the gather table as the rid lane.
                from graph_odenet_tpu.ops import dropmask as _dm

                rowid = jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_ROWS, 1), 0
                ).astype(jnp.float32)
                snd = jax.lax.dot_general(
                    jnp.where(oh, 1.0, 0.0).astype(jnp.bfloat16),
                    rowid.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jnp.float32(BLOCK_ROWS) * b.astype(jnp.float32)  # [128e,1]
                if wide:
                    rid = pltpu.roll(
                        side, shift=(128 - 3 * heads) % 128, axis=1
                    )[:, :1]                                      # [128e, 1]
                else:
                    rid = pltpu.roll(
                        m_sub, shift=(128 - hf - 3 * heads) % 128, axis=1
                    )[:, :1]                                      # [128e, 1]
                # Mosaic has no f32→u32 cast: go f32→i32 (indices are
                # non-negative, exact) then bitcast to u32.
                as_u32 = lambda v: jax.lax.bitcast_convert_type(
                    v.astype(jnp.int32), jnp.uint32
                )
                x = (
                    as_u32(snd) * jnp.uint32(_dm.K_SND)
                    ^ as_u32(rid) * jnp.uint32(_dm.K_RCV)
                )
                hl = (
                    as_u32(lane128) * jnp.uint32(_dm.K_HEAD)
                    ^ seed_ref[0].astype(jnp.uint32)
                )
                x = x ^ hl                                        # [128e, 128]
                x = x ^ (x >> 16)
                x = x * jnp.uint32(_dm.F1)
                x = x ^ (x >> 15)
                x = x * jnp.uint32(_dm.F2)
                x = x ^ (x >> 16)
                keep = (x >> 8) < jnp.uint32(drop_keep24)
                alpha = alpha * keep.astype(jnp.float32) * inv_keep
            # α expanded onto value lanes ([e, j] @ [j, l] → [e, l]): rows
            # ≥ H of expand128 are zero, so garbage α lanes never reach the
            # messages; lanes ≥ hf of the scale are zero, so the table's
            # s_dst/m/l lanes drop out of the reduction automatically.
            # Single head: plain lane broadcast; power-of-two H with the
            # interleaved g layout: roll-doubling replication (VPU-only,
            # exact — α lanes ≥ H are zero so each step adds onto zeros).
            # Either way the expand's MXU passes vanish.  Lanes ≥ hf of
            # the output then carry α-weighted side-lane sums, which is
            # fine: the caller slices ``out[:, :hf]``.
            if heads == 1:
                scale = jnp.broadcast_to(alpha[:, :1], (128, 128))
            elif interleaved:
                scale = alpha
                w = heads
                while w < 128:
                    scale = scale + pltpu.roll(scale, shift=w, axis=1)
                    w *= 2
            else:
                scale = _mask_dot_spmm(
                    expand128, alpha, (((1,), (0,)), ((), ())),
                    exact_lhs=False,
                )                                               # [128e, 128]
            acc = acc + _reduce_dot_spmm(oh, m_sub * scale)
        return acc

    acc = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
    acc = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, acc)
    out_ref[:] = acc


def _reduce_dot_spmm(mask, m):
    """Standalone one-hot reduction matmul (same tiers as the in-kernel
    ``reduce_dot`` closure; shared by the recompute kernel)."""
    dn = (((1,), (0,)), ((), ()))
    if _MODE in ("highest", "bf16x2") and m.dtype == jnp.float32:
        oh = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
        hi = m.astype(jnp.bfloat16)
        r1 = m - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        parts = [hi, mid]
        if _MODE == "highest":
            parts.append((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
        acc = None
        for p in parts:
            d = jax.lax.dot_general(
                oh, p, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc
    oh = jnp.where(mask, 1.0, 0.0).astype(m.dtype)
    return jax.lax.dot_general(
        oh, m, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _split3_spmm(x, n_parts=3):
    """Mantissa-split an f32 array into bf16-representable f32 parts (each
    part casts to bf16 losslessly) — lets a kernel matmul pre-split node
    tables in ONE exact bf16 MXU pass instead of splitting in-kernel."""
    parts = []
    rest = x
    for _ in range(n_parts - 1):
        hi = rest.astype(jnp.bfloat16).astype(jnp.float32)
        parts.append(hi)
        rest = rest - hi
    parts.append(rest.astype(jnp.bfloat16).astype(jnp.float32))
    return parts


def _exact_dot_spmm(exact01, presplit, dn, *, exact_lhs=True):
    """One-pass matmul of a 0/1 mask against bf16-representable f32 values
    (see ``_split3_spmm``): both casts are lossless, so a single bf16 MXU
    pass is f32-exact."""
    a = (
        jnp.where(exact01, 1.0, 0.0).astype(jnp.bfloat16)
        if exact01.dtype == jnp.bool_ else exact01.astype(jnp.bfloat16)
    )
    b = presplit.astype(jnp.bfloat16)
    x, y = (a, b) if exact_lhs else (b, a)
    return jax.lax.dot_general(
        x, y, dimension_numbers=dn, preferred_element_type=jnp.float32
    )


def _mask_dot_spmm(exact, other, dn, *, exact_lhs=True):
    """Matmul where ``exact`` is a 0/1 mask; only ``other`` is mantissa-split
    (3 segments at "highest", 2 at "bf16x2").  ``exact`` may be boolean.
    ``dn`` is written for the (exact, other) order when ``exact_lhs`` else
    the (other, exact) order."""
    if _MODE in ("highest", "bf16x2"):
        e16 = jnp.where(exact, 1.0, 0.0).astype(jnp.bfloat16) \
            if exact.dtype == jnp.bool_ else exact.astype(jnp.bfloat16)
        hi = other.astype(jnp.bfloat16)
        r1 = other - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        parts = [hi, mid]
        if _MODE == "highest":
            parts.append((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
        acc = None
        for p in parts:
            a, b = (e16, p) if exact_lhs else (p, e16)
            d = jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc
    ex = jnp.where(exact, 1.0, 0.0) if exact.dtype == jnp.bool_ else exact
    a, b = (ex, other) if exact_lhs else (other, ex)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _segment_reduce_recompute(
    msgs, src_blk, rel, blk_ptr, n_blocks, heads, feat, slope,
    *, dropout=None, side=None, src_parts=1, interleaved=False,
    interpret=False,
):
    """CSC dWh reduction with in-kernel α recompute from node tables —
    no [E, H] edge-order permute anywhere (see the kernel docstring).

    ``msgs``:    [E_pad, 128] gathered table rows (g | s_dst | m | l | pad,
                 plus a receiver-id lane when ``dropout`` is given; when
                 ``side`` is passed, all 128 lanes are g).
    ``side``:    optional [E_pad, 128] second gather plane holding
                 [s_dst | m | l | rid?] for shapes where H·F fills the g
                 plane (two 128-lane-row gathers are ~5× cheaper than one
                 256-lane gather — XLA's fast gather form stops at 128).
    ``src_blk``: [n_blocks·BLOCK_ROWS, 128] s_src rows — ``src_parts``
                 mantissa parts at lane groups [H·p, H·(p+1)).
    ``dropout``: optional ``(seed, rate)`` — seed a traced u32/i32 scalar,
                 rate a static float; the kernel regenerates the
                 counter-based attention-dropout scale (ops.dropmask).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from graph_odenet_tpu.ops import dropmask as _dm

    if dropout is None:
        seed_arr = jnp.zeros((1,), jnp.int32)
        drop_keep24, inv_keep = 0, 1.0
    else:
        # The in-kernel mask reconstructs sender ids with a bf16 one-hot
        # dot of row ids — exact only while row ids fit bf16's integer
        # range (≤ 256).  BLOCK_ROWS is env-tunable (GODE_BLOCK_ROWS);
        # beyond 256 the forward/backward masks would silently disagree.
        if BLOCK_ROWS > 256:
            raise ValueError(
                "in-kernel dropout regeneration requires BLOCK_ROWS <= 256 "
                f"(got {BLOCK_ROWS}); unset GODE_BLOCK_ROWS or use the "
                "permute dWh path (GODE_GAT_DWH=permute)"
            )
        seed, rate = dropout
        seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32)[None]
        drop_keep24, inv_keep = _dm.keep24(rate), 1.0 / (1.0 - rate)

    wide = side is not None
    if not wide:
        side = jnp.zeros((1, 128), msgs.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (BLOCK_ROWS, 128), lambda b, *_: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, 128), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E_CHUNK, 128), msgs.dtype),
            pltpu.VMEM((2, E_CHUNK, 128) if wide else (2, 1, 128),
                       msgs.dtype),
            pltpu.VMEM((2, SUBS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        partial(
            _segment_reduce_recompute_kernel,
            heads=heads, feat=feat, slope=slope,
            drop_keep24=drop_keep24, inv_keep=inv_keep,
            wide=wide, src_parts=src_parts, interleaved=interleaved,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(blk_ptr, seed_arr, msgs, side, rel, src_blk)


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


@jax.custom_vjp
def spmm_pallas(csr: PallasCSR, x: jax.Array) -> jax.Array:
    return _fwd_impl(csr, x)


def _check_block(csr):
    if csr.block_rows != BLOCK_ROWS:
        raise ValueError(
            f"PallasCSR built with block_rows={csr.block_rows} but module "
            f"BLOCK_ROWS={BLOCK_ROWS}; re-run prepare()"
        )


def _fwd_impl(csr, x):
    _check_block(csr)
    msgs = jnp.take(x, csr.senders, axis=0) * csr.weight[:, None].astype(x.dtype)
    out = segment_reduce_csr(csr, msgs, interpret=not _is_tpu())
    return out[: csr.n_node_pad]


def _bwd_impl(csr, g):
    msgs = jnp.take(g, csr.t_receivers, axis=0) * csr.t_weight[:, None].astype(
        g.dtype
    )
    out = segment_reduce_csr(
        csr, msgs, transpose=True, interpret=not _is_tpu()
    )
    return out[: csr.n_node_pad]


def _spmm_fwd(csr, x):
    return _fwd_impl(csr, x), csr


def _spmm_bwd(csr, g):
    # Adjacency (csr) is non-differentiable state → zero cotangent pytree.
    zeros = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a) if isinstance(a, jax.Array) else a, csr
    )
    return zeros, _bwd_impl(csr, g)


spmm_pallas.defvjp(_spmm_fwd, _spmm_bwd)
