"""Pallas/Mosaic TPU fused GAT attention — SDDMM→softmax→SpMM in one kernel.

The reference's sparse GAT (``SpGraphAttentionLayer``, SURVEY.md §3.3) does
three host-dispatched sparse ops per layer: edge-score exp, rowsum via a
custom ``torch.sparse.mm`` autograd Function, and the attention-weighted
SpMM.  Here the whole sandwich runs as ONE Pallas kernel over the same
receiver-block CSR tiling as ``pallas_spmm``:

  * per 128-receiver block, stream edge chunks HBM→VMEM (double-buffered);
  * **online (flash-style) segmented softmax**: per chunk, a masked VPU
    row-max updates the per-receiver running max ``m``; probabilities are
    renormalised on the fly (``l``, ``acc`` rescaled by ``exp(m−m_new)``)
    so no second pass over edges is needed;
  * the weighted aggregation is a dense MXU matmul of the probability-scaled
    one-hot against the value chunk — no scatter anywhere.

The kernel also emits the per-receiver ``m``/``l`` statistics so the
backward can reconstruct α without segment_max/scatter:

    α     = exp(logit − m[recv]) / l[recv]
    β[r]  = Σ_f g[r]·out[r]                  (the softmax Jacobian term)
    dlogit= α · (⟨g[recv], v⟩ − β[recv])
    dWh   = Âᵀ-style segment reduction of α·g[recv]   (pallas_spmm kernel)

The default backward (``GODE_GAT_BWD=fused``) computes α and dlogit in a
SECOND Pallas pass over the same receiver-block tiling: the block's
``g``/``m``/``l``/``β`` rows sit in VMEM; each 128-edge sub-chunk's m/l/β
rows come from one one-hot MXU contraction and its ``g[recv]`` rows from
another (edge-major, so the per-edge ⟨g, v⟩ multiplies the value chunk in
the layout it is DMA'd in — no feature-major transpose ever materialises),
replacing the [E, H·F] XLA gather that dominated the XLA backward.  The
dWh reduction streams α into ``pallas_spmm._segment_reduce_weighted`` on
the CSC view, where it is expanded onto the value lanes in-VMEM (one
K=heads MXU contraction per 128-edge sub-chunk).  Chunk windows of
adjacent receiver blocks can overlap by one E_CHUNK; the TPU grid is
sequential, so each block resolves the overlap with a select-merge
read-modify-write of its first chunk's output tile.  ``GODE_GAT_BWD=xla``
selects the gather-based fallback.  (Why not compute α/dlogit in XLA?
Measured: each [E, 1] XLA gather is dispatch-bound, ~5 ms at 1.4M edges —
three of them cost more than this whole kernel.)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from graph_odenet_tpu.ops.pallas_spmm import (
    _segment_reduce,
    BLOCK_ROWS,
    E_CHUNK,
    SUBS,
    _MODE,
    PallasCSR,
    _is_tpu,
    _segment_reduce_recompute,
    segment_reduce_csr,
)

# Precision tiers (GODE_PRECISION, shared with pallas_spmm):
#   highest — f32-exact to roundoff: 3-segment bf16 split when one operand
#             is an exact 0/1 mask (half the passes of Precision.HIGHEST),
#             6-pass HIGHEST when both operands are inexact.
#   bf16x2  — hi/lo bf16 split: 3 passes when both operands are inexact
#             (probabilities × values; the ~2^-32 lo·lo term is dropped),
#             2 passes when one operand is an exact 0/1 mask.  ~1e-5 rel.
#   default — single bf16 pass, ~1e-3 rel.
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "bf16x2": jax.lax.Precision.HIGHEST,   # used only where no split applies
    "default": jax.lax.Precision.DEFAULT,
}[_MODE]


def _hilo(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dg(a, b, dn):
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32
    )


def _att_dot(a, b, dn):
    """Matmul of two inexact f32 operands at the selected tier."""
    if _MODE == "bf16x2":
        ah, al = _hilo(a)
        bh, bl = _hilo(b)
        return _dg(ah, bh, dn) + _dg(ah, bl, dn) + _dg(al, bh, dn)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


def _mask_dot(exact, other, dn, *, exact_lhs=True):
    """Matmul where ``exact`` is a 0/1 mask (exactly representable in bf16).

    Only ``other`` needs mantissa splitting: 3 non-overlapping bf16 segments
    at "highest" (8+8+8 ≥ f32's 24 bits — exact to f32 roundoff at half the
    passes of a Precision.HIGHEST f32 matmul), 2 at "bf16x2" (~1e-6)."""
    if _MODE in ("highest", "bf16x2"):
        e16 = exact.astype(jnp.bfloat16)
        hi, lo = _hilo(other)
        parts = [hi, lo]
        if _MODE == "highest":
            r2 = other - hi.astype(jnp.float32) - lo.astype(jnp.float32)
            parts.append(r2.astype(jnp.bfloat16))
        acc = None
        for p in parts:
            d = _dg(e16, p, dn) if exact_lhs else _dg(p, e16, dn)
            acc = d if acc is None else acc + d
        return acc
    a, b = (exact, other) if exact_lhs else (other, exact)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )

__all__ = [
    "gat_aggregate_pallas",
    "gat_aggregate_pallas_dropout",
    "gat_aggregate_pallas_scores",
    "gat_aggregate_pallas_scores_dropout",
]

_NEG = -1e30  # python float: jnp scalars would be captured consts in-kernel

# Packed-kernel softmax shift (GODE_GAT_SOFTMAX):
#   "scan"       — exact per-receiver chunk-local max via segmented scan
#                  (default; robust to any logit spread).
#   "chunkshift" — uniform per-sub-chunk/head shift; ~19% faster at the
#                  reference's H=8/F=8 shape, loses receivers whose whole
#                  chunk-local logit set sits ≥88 below the sub-chunk max
#                  (still strictly safer than the reference's unshifted exp).
_PACKED_SOFTMAX = os.environ.get("GODE_GAT_SOFTMAX", "scan").lower()


def _gat_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [HV, E_pad, Fp]  (HV=1 when packed)
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128]
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
                        #   (dummy [H, 1, 128] when use_dmask=False)
    out_ref,            # VMEM [BLOCK_ROWS, HV*... = packed? 128 : H*Fp]
    m_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    l_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    logit_scratch,      # VMEM [2, H, SUBS, 128]
    val_scratch,        # VMEM [2, HV, E_CHUNK, Fp]
    rel_scratch,        # VMEM [2, SUBS, 128]
    dmask_scratch,      # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    sems,               # DMA sems [2, 1 + H + HV (+ H)]
    *,
    heads: int,
    feat: int,          # Fp (lane-padded per-head width; 128 when packed)
    true_feat: int,     # logical per-head F (lane stride in packed mode)
    packed: bool,       # all heads share one 128-lane value plane
    use_dmask: bool,    # post-softmax attention dropout scales streamed in
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_val = 1 if packed else heads
    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)

    def dma_start(k):
        return base + k * chunk

    def issue(k, slot):
        start = dma_start(k)
        copies = [
            pltpu.make_async_copy(
                rel_hbm.at[pl.ds(start // 128, SUBS), :],
                rel_scratch.at[slot],
                sems.at[slot, 0],
            )
        ]
        for h in range(heads):
            copies.append(
                pltpu.make_async_copy(
                    logits_hbm.at[h, pl.ds(start // 128, SUBS), :],
                    logit_scratch.at[slot, h],
                    sems.at[slot, 1 + h],
                )
            )
        for v in range(n_val):
            copies.append(
                pltpu.make_async_copy(
                    vals_hbm.at[v, pl.ds(start, E_CHUNK), :],
                    val_scratch.at[slot, v],
                    sems.at[slot, 1 + heads + v],
                )
            )
        if use_dmask:
            for h in range(heads):
                copies.append(
                    pltpu.make_async_copy(
                        dmask_hbm.at[h, pl.ds(start // 128, SUBS), :],
                        dmask_scratch.at[slot, h],
                        sems.at[slot, 1 + heads + n_val + h],
                    )
                )
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for c in issue(0, 0):
            c.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def head_stats(mask, le, m_h, l_h):
        """One head's online-softmax update; returns (p, scale, m', l')."""
        le_m = jnp.where(mask, le, _NEG)                     # [R, 128]
        m_c = jnp.max(le_m, axis=1, keepdims=True)           # [R, 1]
        m_n = jnp.maximum(m_h, m_c)
        scale = jnp.exp(m_h - m_n)                           # [R, 1]
        p = jnp.where(mask, jnp.exp(le - m_n), 0.0)          # [R, 128]
        l_n = l_h * scale + jnp.sum(p, axis=1, keepdims=True)
        return p, scale, m_n, l_n

    def body(k, carry):
        accs, ms, ls = carry
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for c in issue(k + 1, nxt):
                c.start()

        for c in issue(k, slot):
            c.wait()

        rel_all = rel_scratch[slot]          # [SUBS, 128]
        accs, ms, ls = list(accs), list(ms), list(ls)
        for sub in range(SUBS):
            e_idx = lane + dma_start(k) + sub * 128
            valid = (e_idx >= p0) & (e_idx < p1)                 # [1, 128]
            mask = (rows == rel_all[sub][None, :]) & valid       # [R, 128]
            if packed:
                v_sub = val_scratch[slot, 0, pl.ds(sub * 128, 128), :]
                acc_scale = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
                pv_sum = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
                for h in range(heads):
                    le = logit_scratch[slot, h][sub][None, :]
                    p, scale, ms[h], ls[h] = head_stats(mask, le, ms[h], ls[h])
                    if use_dmask:
                        # Dropout scales α numerators only; the softmax
                        # denominator (l) keeps every edge (GAT convention).
                        p = p * dmask_scratch[slot, h][sub][None, :]
                    headmask = (
                        (lane >= h * true_feat) & (lane < (h + 1) * true_feat)
                    ).astype(jnp.float32)                        # [1, 128]
                    pv = _att_dot(
                        p, v_sub, (((1,), (0,)), ((), ()))
                    )                                            # [R, 128]
                    acc_scale = acc_scale + scale * headmask
                    pv_sum = pv_sum + pv * headmask
                accs[0] = accs[0] * acc_scale + pv_sum
            else:
                for h in range(heads):
                    le = logit_scratch[slot, h][sub][None, :]
                    p, scale, ms[h], ls[h] = head_stats(mask, le, ms[h], ls[h])
                    if use_dmask:
                        p = p * dmask_scratch[slot, h][sub][None, :]
                    v_sub = val_scratch[slot, h, pl.ds(sub * 128, 128), :]
                    accs[h] = accs[h] * scale + _att_dot(
                        p, v_sub, (((1,), (0,)), ((), ()))       # [R, Fp]
                    )
        return tuple(accs), tuple(ms), tuple(ls)

    init = (
        tuple(
            jnp.zeros((BLOCK_ROWS, 128 if packed else feat), jnp.float32)
            for _ in range(n_val)
        ),
        tuple(jnp.full((BLOCK_ROWS, 1), _NEG, jnp.float32) for _ in range(heads)),
        tuple(jnp.zeros((BLOCK_ROWS, 1), jnp.float32) for _ in range(heads)),
    )
    accs, ms, ls = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, init)
    denoms = [jnp.maximum(l, 1e-30) for l in ls]
    if packed:
        # Per-lane denominator: head h's value lanes divide by denom_h;
        # dead lanes (≥ H·F) divide by 1 (their acc is 0 anyway).
        denom_full = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
        covered = jnp.zeros((1, 128), jnp.float32)
        for h in range(heads):
            headmask = (
                (lane >= h * true_feat) & (lane < (h + 1) * true_feat)
            ).astype(jnp.float32)
            denom_full = denom_full + denoms[h] * headmask
            covered = covered + headmask
        out_ref[:] = accs[0] / (denom_full + (1.0 - covered))
    else:
        out_ref[:] = jnp.concatenate(
            [a / d for a, d in zip(accs, denoms)], axis=1
        )
    pad = [jnp.zeros((BLOCK_ROWS, 1), jnp.float32)] * (128 - heads)
    m_ref[:] = jnp.concatenate(list(ms) + pad, axis=1)
    l_ref[:] = jnp.concatenate(list(denoms) + pad, axis=1)


def _to3d(a2d, e_pad):
    """[E, H] edge-major → [H, E_pad/128, 128] row-major DMA layout."""
    h = a2d.shape[1]
    return (
        jnp.pad(a2d.astype(jnp.float32), ((0, e_pad - a2d.shape[0]), (0, 0)))
        .T.reshape(h, e_pad // 128, 128)
    )


def _pack_interleaved(x):
    """[N, H, F] → [N, F·H] with lane l = f·H + h (head-minor).

    The packed kernels expand per-head scalars onto value lanes with a
    tile-repeat ([s_0..s_{H-1}] × F), which lands on exactly this
    interleaved layout."""
    if 1 in x.shape[1:]:
        # Singleton head or feature axis: the interleave is a pure reshape
        # (a swapaxes here makes XLA materialise a minor-dim-1 transpose).
        return x.reshape(x.shape[0], -1)
    return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)


def _unpack_interleaved(x2d, heads, feat):
    """[N, F·H] (+ dead lanes) → [N, H, F]."""
    n = x2d.shape[0]
    if heads == 1 or feat == 1:
        return x2d[:, : heads * feat].reshape(n, heads, feat)
    return jnp.swapaxes(
        x2d[:, : heads * feat].reshape(n, feat, heads), 1, 2
    )


def _gat_kernel_packed(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [1, E_pad, 128] interleaved lanes f·H+h
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128]
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
    out_ref,            # VMEM [BLOCK_ROWS, 128]
    m_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    l_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    logit_scratch,      # VMEM [2, H, SUBS, 128]
    val_scratch,        # VMEM [2, 1, E_CHUNK, 128]
    rel_scratch,        # VMEM [2, SUBS, 128]
    dmask_scratch,      # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    sems,               # DMA sems [2, 2 + (H if use_dmask)]
    *,
    heads: int,
    true_feat: int,     # logical per-head F (H·F ≤ 128)
    use_dmask: bool,
):
    """Packed (H·F ≤ 128) fused GAT forward — lane-local segmented softmax.

    The general kernel's per-head [R, 128] probability planes cost 8 MXU
    matmuls + 8·16K transcendentals per 128-edge sub-chunk at the
    reference's H=8/F=8 shape, almost all masked out.  Here everything
    per-edge stays in the [H, 128-edge-lane] layout:

      * per-receiver chunk-local max via a 7-step segmented doubling scan
        over lanes (edges are receiver-sorted, so segments are contiguous
        lane runs; invalid lanes get unique negative seg-ids);
      * q = exp(le − m_seg) — H·128 transcendentals, not H·128·128;
      * ONE one-hot MXU contraction per sub-chunk gathers the receiver-row
        stats [l_c ‖ m_c ‖ count], and ONE main contraction aggregates
        the probability-scaled values;
      * the chunk-local (m_c, l_c, pv) merge into the running (m, l, acc)
        with the standard flash rescale, per-head scales expanded onto the
        interleaved value lanes by ``pltpu.repeat`` (exact, VPU-only).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)
    hf = heads * true_feat

    def issue(k, slot):
        start = base + k * chunk
        copies = [
            pltpu.make_async_copy(
                rel_hbm.at[pl.ds(start // 128, SUBS), :],
                rel_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                logits_hbm.at[:, pl.ds(start // 128, SUBS), :],
                logit_scratch.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                vals_hbm.at[0, pl.ds(start, E_CHUNK), :],
                val_scratch.at[slot, 0],
                sems.at[slot, 2],
            ),
        ]
        if use_dmask:
            copies.append(
                pltpu.make_async_copy(
                    dmask_hbm.at[:, pl.ds(start // 128, SUBS), :],
                    dmask_scratch.at[slot],
                    sems.at[slot, 3],
                )
            )
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for c in issue(0, 0):
            c.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    lanes_e = jax.lax.broadcasted_iota(jnp.int32, (heads, 128), 1)
    heads_e = jax.lax.broadcasted_iota(jnp.int32, (heads, 128), 0)
    expand_f32 = (
        ((lanes_e % heads) == heads_e) & (lanes_e < hf)
    ).astype(jnp.float32)

    def rep(s):
        """[R, H] per-head scalars → [R, 128] interleaved value lanes.

        Single head: plain lane broadcast (a 128-way pltpu.repeat of a
        1-lane array blows the compiler's scoped-vmem budget).  Dead lanes
        past H·F may carry a live scale — harmless, they only ever multiply
        zeros (Q/acc are zero there)."""
        if heads == 1:
            return jnp.broadcast_to(s, (s.shape[0], 128))
        # Native K=heads MXU contraction — measured 16 ms/pass faster than
        # pltpu.repeat at arxiv scale (the repeat lowers to per-tile copies).
        return _mask_dot(
            expand_f32, s, (((1,), (0,)), ((), ())), exact_lhs=False
        )

    def body(k, carry):
        acc, m, l = carry
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for c in issue(k + 1, nxt):
                c.start()

        for c in issue(k, slot):
            c.wait()

        rel_all = rel_scratch[slot]                       # [SUBS, 128]
        for sub in range(SUBS):
            e_idx = lane + base + k * chunk + sub * 128
            valid = (e_idx >= p0) & (e_idx < p1)          # [1, 128]
            relv = rel_all[sub][None, :]                  # [1, 128]
            oh = ((rows == relv) & valid)                 # [R, 128e]
            # Unique negative seg-ids on invalid lanes: edges of adjacent
            # blocks in the overlap window share the [0, 128) rel range and
            # must never merge into this block's segments.
            seg = jnp.where(valid, relv, -1 - lane)       # [1, 128]
            le = logit_scratch[slot][:, sub, :]           # [H, 128e]
            if _PACKED_SOFTMAX == "chunkshift":
                # Uniform per-(sub-chunk, head) shift: one lane max-reduce
                # instead of the segmented scan (~19% of the H=8/F=8 fwd).
                # A receiver whose chunk-local logits all sit ≥88 below the
                # sub-chunk max underflows out of that chunk's sums (its
                # m_c is masked to NEG below, so previously accumulated
                # mass is never destroyed) — still strictly safer than the
                # reference's UNSHIFTED exp (pyGAT SpGraphAttentionLayer),
                # which overflows at logit > 88.  The default "scan" mode
                # is exact for any logit spread.
                mseg = jnp.broadcast_to(
                    jnp.max(jnp.where(valid, le, _NEG), axis=1, keepdims=True),
                    le.shape,
                )
            else:
                # Chunk-local per-segment max: bidirectional doubling scan.
                # Receiver-sorted edges ⇒ segments are contiguous lane
                # runs, so a seg-id match at distance d implies everything
                # between matches; circular wrap can only match when the
                # whole sub-chunk is one segment (harmless).
                mseg = jnp.where(valid, le, _NEG)
                for d in (1, 2, 4, 8, 16, 32, 64):
                    for sh in (d, 128 - d):  # circular roll: −d ≡ 128−d
                        ok = pltpu.roll(seg, shift=sh, axis=1) == seg
                        mseg = jnp.maximum(
                            mseg,
                            jnp.where(
                                ok, pltpu.roll(mseg, shift=sh, axis=1), _NEG
                            ),
                        )
            q = jnp.where(valid, jnp.exp(le - mseg), 0.0)  # [H, 128e]
            # Last lane of each segment carries the segment max (in
            # chunkshift mode every lane does; the select still works).
            is_last = (
                (pltpu.roll(seg, shift=127, axis=1) != seg) | (lane == 127)
            ).astype(jnp.float32)                          # [1, 128]
            # Pre-transpose the stats bundle so the contraction is in
            # native MXU form (lhs dim1 × rhs dim0) — contracting the rhs
            # on its lane axis made Mosaic transpose it inside EVERY
            # mantissa-split pass (~20 ms of the kernel, measured).
            bundleT = jnp.concatenate(
                [q, mseg * is_last], axis=0
            ).T                                            # [128e, 2H]
            stats = _mask_dot(
                oh, bundleT, (((1,), (0,)), ((), ())), exact_lhs=True
            )                                              # [R, 2H]
            l_c = stats[:, :heads]
            # l_c > 0 ⟺ the receiver has (non-underflowed) edges in this
            # sub-chunk; in "scan" mode q's segment max is exactly 1 so
            # this is precisely "has edges".
            m_c = jnp.where(
                l_c > 0.0, stats[:, heads : 2 * heads], _NEG
            )                                              # [R, H]
            m_n = jnp.maximum(m, m_c)
            s_old = jnp.exp(m - m_n)
            s_c = jnp.exp(m_c - m_n)
            l = l * s_old + l_c * s_c
            q_pv = q * dmask_scratch[slot][:, sub, :] if use_dmask else q
            # Q[e, f·H+h] = q[h, e]: lane-transpose then tile-repeat
            # (broadcast when single-head — see rep()).
            qT = q_pv.T                                    # [128e, H]
            if heads == 1:
                Q = jnp.broadcast_to(qT, (128, 128))
            else:
                Q = pltpu.repeat(qT, true_feat, axis=1)    # [128e, H·F]
                if hf < 128:
                    Q = jnp.pad(Q, ((0, 0), (0, 128 - hf)))
            v_sub = val_scratch[slot, 0, pl.ds(sub * 128, 128), :]
            pv = _mask_dot(
                oh, Q * v_sub, (((1,), (0,)), ((), ())), exact_lhs=True
            )                                              # [R, 128]
            acc = acc * rep(s_old) + pv * rep(s_c)
            m = m_n
        return acc, m, l

    init = (
        jnp.zeros((BLOCK_ROWS, 128), jnp.float32),
        jnp.full((BLOCK_ROWS, heads), _NEG, jnp.float32),
        jnp.zeros((BLOCK_ROWS, heads), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, init)
    denom = jnp.maximum(l, 1e-30)                          # [R, H]
    denom_l = rep(denom)
    out_ref[:] = acc / (denom_l + (denom_l == 0.0))        # dead lanes ÷ 1
    pad = ((0, 0), (0, 128 - heads))
    m_ref[:] = jnp.pad(m, pad)
    l_ref[:] = jnp.pad(denom, pad)


def _gat_call(
    csr: PallasCSR, logits3d, vals3d, dmask3d, heads, featp, true_feat,
    packed, *, interpret,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = csr.n_blocks
    n_val = 1 if packed else heads
    hf = 128 if packed else heads * featp
    use_dmask = dmask3d is not None
    if not use_dmask:
        dmask3d = jnp.zeros((heads, 1, 128), jnp.float32)
    if packed and heads > 1:
        # Multi-head packed: the segmented-scan kernel (one main MXU
        # contraction per sub-chunk).  Single head sticks with the general
        # kernel — its per-head work IS the whole job there, and the scan/
        # stats machinery costs more than it saves (measured 22 vs 11 ms
        # fwd at arxiv scale, H=1 F=128).
        kernel = partial(
            _gat_kernel_packed, heads=heads, true_feat=true_feat,
            use_dmask=use_dmask,
        )
        n_sems = 3 + (1 if use_dmask else 0)
    else:
        kernel = partial(
            _gat_kernel, heads=heads, feat=featp, true_feat=true_feat,
            packed=packed, use_dmask=use_dmask,
        )
        n_sems = 1 + heads + n_val + (heads if use_dmask else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, hf), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 128), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 128), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, heads, SUBS, 128), jnp.float32),
            pltpu.VMEM((2, n_val, E_CHUNK, featp), jnp.float32),
            pltpu.VMEM((2, SUBS, 128), jnp.int32),
            pltpu.VMEM(
                (2, heads, SUBS, 128) if use_dmask else (2, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2, n_sems)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, hf), jnp.float32),
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(csr.blk_ptr, logits3d, vals3d, csr.rel, dmask3d)


def _vals_edge_major(csr: PallasCSR, wh: jax.Array, packed: bool, featp: int):
    """Gathered sender values in the kernels' edge-major DMA layout:
    ``[1, E_pad, 128]`` packed / ``[H, E_pad, Fp]`` otherwise.  Shared by
    forward and backward (the backward computes its per-edge dot edge-major,
    so no feature-major copy is ever materialised).

    The gather is shaped so XLA emits its fast form — full 128-lane rows
    out of a 2-D node-major table (pad BEFORE gathering: the pad touches
    [N, ·], the gather output needs no post-copy).  The previous
    gather-then-pad form ([E, H, F] rows then lane pad) measured ~30 ms at
    arxiv scale vs ~6 ms for this one."""
    heads, feat = wh.shape[-2], wh.shape[-1]
    n = wh.shape[0]
    if packed:
        table = jnp.pad(
            _pack_interleaved(wh.astype(jnp.float32)),
            ((0, 0), (0, 128 - heads * feat)),
        )                                                     # [N, 128]
        return jnp.take(table, csr.senders, axis=0)[None]     # [1, E_pad, 128]
    table = jnp.pad(
        wh.astype(jnp.float32), ((0, 0), (0, 0), (0, featp - feat))
    ).reshape(n, heads * featp)                               # [N, H·Fp]
    gathered = jnp.take(table, csr.senders, axis=0)           # [E_pad, H·Fp]
    return gathered.reshape(-1, heads, featp).transpose(1, 0, 2)


def _fwd_impl(
    csr: PallasCSR, logits: jax.Array, wh: jax.Array, dmask=None
):
    """logits: [E, H] (Graph edge order, any 128-multiple ≥ n_edge);
    wh: [N_pad, H, F]; dmask: optional [E, H] post-softmax α scale."""
    e_pad = csr.senders.shape[0]  # prepare() pads edges to E_CHUNK multiples
    heads = logits.shape[1]
    feat = wh.shape[-1]
    packed = heads * feat <= 128  # all heads share one 128-lane value plane
    logits3d = _to3d(logits, e_pad)
    dmask3d = None if dmask is None else _to3d(dmask, e_pad)
    featp = 128 if packed else -(-feat // 128) * 128
    vals = _vals_edge_major(csr, wh, packed, featp)
    out, m, l = _gat_call(
        csr, logits3d, vals, dmask3d, heads, featp, feat, packed,
        interpret=not _is_tpu(),
    )
    n = csr.n_node_pad
    if packed:
        out = _unpack_interleaved(out[:n], heads, feat)
    else:
        out = out.reshape(out.shape[0], heads, featp)[:n, :, :feat]
    return out, m[:n, :heads], l[:n, :heads]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def gat_aggregate_pallas(
    csr: PallasCSR, logits: jax.Array, wh: jax.Array
) -> jax.Array:
    """Fused masked-softmax attention aggregation over incoming edges.

    Equivalent to ``ops.sddmm.attention_aggregate(g, logits, wh)`` without
    attention dropout; ``gat_aggregate_pallas_dropout`` adds it.

    Args:
      csr:    prepared ``PallasCSR`` tiling of the graph.
      logits: ``[E_pad, H]`` per-edge attention logits in Graph edge order.
      wh:     ``[N_pad, H, F]`` per-head node values.

    Returns ``[N_pad, H, F]``.
    """
    out, _, _ = _fwd_impl(csr, logits, wh)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def gat_aggregate_pallas_dropout(
    csr: PallasCSR, logits: jax.Array, wh: jax.Array, dmask: jax.Array
) -> jax.Array:
    """Fused attention aggregation with post-softmax attention dropout.

    ``dmask``: ``[E, H]`` per-edge/head α scale — the GAT convention is
    ``keep / (1 - rate)`` with ``keep ~ Bernoulli(1 - rate)``; the softmax
    denominator keeps every edge.  The mask is generated by the caller
    (XLA-side RNG) so the same mask flows through forward and backward and
    tests can inject known masks.  ``dmask`` gets a zero cotangent.
    """
    out, _, _ = _fwd_impl(csr, logits, wh, dmask)
    return out


def _gat_bwd_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [HV, E_pad, Fp]  edge-major v=Wh[send]
                        #   (same layout the forward kernel streams — the
                        #   per-edge dot is computed edge-major below, so no
                        #   feature-major transpose ever materialises in HBM)
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128]
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
    g_blk,              # VMEM [BLOCK_ROWS, hf]   upstream cotangent rows
    mlb_blk,            # VMEM [BLOCK_ROWS, 128]  lanes [m_h | l_h | beta_h]
    dl_hbm,             # out ANY [H, E_pad/128, 128]  dlogits (row layout)
    al_hbm,             # out ANY [H, E_pad/128, 128]  α·D     (row layout)
    logit_scr,          # VMEM [2, H, SUBS, 128]
    val_scr,            # VMEM [2, HV, E_CHUNK, Fp]
    rel_scr,            # VMEM [2, SUBS, 128]
    dmask_scr,          # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    dl_scr,             # VMEM [2, H, SUBS, 128]
    al_scr,             # VMEM [2, H, SUBS, 128]
    old_dl,             # VMEM [H, SUBS, 128]   predecessor's first-chunk tile
    old_al,             # VMEM [H, SUBS, 128]
    in_sems,            # DMA sems [2, 1 + H + HV (+ H)]
    out_sems,           # DMA sems [2]
    old_sems,           # DMA sems [2]
    *,
    heads: int,
    featp: int,         # per-plane lane width (128 when packed)
    true_feat: int,     # logical per-head F
    packed: bool,
    use_dmask: bool,
):
    """α and dlogit per edge, in one pass over the receiver-block tiling.

    Everything per-edge stays in row layout (lane = edge): m/l/β rows come
    from one one-hot MXU contraction per 128-edge sub-chunk, g[recv] rows
    from another (edge-major, so the per-edge ⟨g, v⟩ multiplies the value
    chunk in the layout it is DMA'd in), and the per-head dots land
    row-major by contracting the feature axis against head_sel.  XLA-side
    per-edge gathers are dispatch-bound on TPU (~5 ms per [E, 1] gather at
    1.4M edges — measured), which is why α is NOT reconstructed outside."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_val = 1 if packed else heads
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
                rel_hbm.at[pl.ds(start // 128, SUBS), :],
                rel_scr.at[slot],
                in_sems.at[slot, 0],
            )
        ]
        for h in range(heads):
            copies.append(
                pltpu.make_async_copy(
                    logits_hbm.at[h, pl.ds(start // 128, SUBS), :],
                    logit_scr.at[slot, h],
                    in_sems.at[slot, 1 + h],
                )
            )
        for v in range(n_val):
            copies.append(
                pltpu.make_async_copy(
                    vals_hbm.at[v, pl.ds(start, E_CHUNK), :],
                    val_scr.at[slot, v],
                    in_sems.at[slot, 1 + heads + v],
                )
            )
        if use_dmask:
            for h in range(heads):
                copies.append(
                    pltpu.make_async_copy(
                        dmask_hbm.at[h, pl.ds(start // 128, SUBS), :],
                        dmask_scr.at[slot, h],
                        in_sems.at[slot, 1 + heads + n_val + h],
                    )
                )
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for c in issue(0, 0):
            c.start()
        # Predecessors already wrote (and waited on) the overlapping tile.
        pltpu.make_async_copy(
            dl_hbm.at[:, pl.ds(base // 128, SUBS), :], old_dl, old_sems.at[0]
        ).start()
        pltpu.make_async_copy(
            al_hbm.at[:, pl.ds(base // 128, SUBS), :], old_al, old_sems.at[1]
        ).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    hf = n_val * (128 if packed else featp)
    # head_sel[f, h] = 1 where value lane f belongs to head h (static).
    # Packed planes are head-minor interleaved (lane = f·H + h, the
    # pltpu.repeat layout of the packed forward); non-packed planes are one
    # featp-wide block per head.
    fsel = jax.lax.broadcasted_iota(jnp.int32, (hf, heads), 0)
    hsel = jax.lax.broadcasted_iota(jnp.int32, (hf, heads), 1)
    if packed:
        head_sel = (
            ((fsel % heads) == hsel) & (fsel < heads * true_feat)
        ).astype(jnp.float32)
    else:
        head_sel = ((fsel // featp) == hsel).astype(jnp.float32)

    def body(k, _):
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for c in issue(k + 1, nxt):
                c.start()

        for c in issue(k, slot):
            c.wait()

        rel_all = rel_scr[slot]                           # [SUBS, 128]
        for sub in range(SUBS):
            start_e = base + k * chunk + sub * 128
            e_idx = lane + start_e
            valid = (e_idx >= p0) & (e_idx < p1)          # [1, 128]
            onehot = (
                (rows == rel_all[sub][None, :]) & valid
            ).astype(jnp.float32)                         # [R, 128e]
            # Row-layout stats for this sub's 128 edges.
            mlb_rows = _mask_dot(
                onehot, mlb_blk[:], (((0,), (0,)), ((), ())), exact_lhs=False
            )                                             # [128mlb, 128e]
            # Edge-major g[recv] rows (contract R the other way) so the
            # per-edge ⟨g, v⟩ multiplies the value chunk in the layout it is
            # DMA'd in — no feature-major transpose anywhere.
            g_em = _mask_dot(
                onehot, g_blk[:], (((0,), (0,)), ((), ())), exact_lhs=True
            )                                             # [128e, hf]
            if packed:
                v_em = val_scr[slot, 0, pl.ds(sub * 128, 128), :]
            else:
                v_em = jnp.concatenate(
                    [
                        val_scr[slot, v, pl.ds(sub * 128, 128), :]
                        for v in range(n_val)
                    ],
                    axis=1,
                )                                         # [128e, hf]
            # dots[h, e] = Σ_{l∈head h} g_em[e, l]·v_em[e, l]: contract the
            # feature axis against head_sel — lands row-major directly.
            dots = _mask_dot(
                head_sel, g_em * v_em, (((0,), (1,)), ((), ())),
                exact_lhs=True,
            )                                             # [H, 128e]
            for h in range(heads):
                le = logit_scr[slot, h][sub][None, :]     # [1, 128e]
                m_r = mlb_rows[h][None, :]
                l_r = mlb_rows[heads + h][None, :]
                be = mlb_rows[2 * heads + h][None, :]
                # l is pre-clamped ≥ 1e-30 on real rows; invalid lanes are
                # masked before any inf can meet a 0.
                alpha = jnp.where(valid, jnp.exp(le - m_r) / l_r, 0.0)
                if use_dmask:
                    # out = Σ D·α·v, so β = ⟨g, out⟩ already carries D;
                    # dlogit = α (D·⟨g,v⟩ − β) and the CSC dWh pass needs
                    # the dropped coefficients α·D.
                    d_r = dmask_scr[slot, h][sub][None, :]
                    al_scr[slot, h, pl.ds(sub, 1), :] = alpha * d_r
                    dl_scr[slot, h, pl.ds(sub, 1), :] = (
                        alpha * (d_r * dots[h][None, :] - be)
                    )
                else:
                    al_scr[slot, h, pl.ds(sub, 1), :] = alpha
                    dl_scr[slot, h, pl.ds(sub, 1), :] = (
                        alpha * (dots[h][None, :] - be)
                    )

        # First chunk may overlap the predecessor block's range: keep its
        # rows for edges < p0 (ours are zero there), overwrite the rest.
        @pl.when(k == 0)
        def _():
            pltpu.make_async_copy(
                dl_hbm.at[:, pl.ds(base // 128, SUBS), :], old_dl,
                old_sems.at[0],
            ).wait()
            pltpu.make_async_copy(
                al_hbm.at[:, pl.ds(base // 128, SUBS), :], old_al,
                old_sems.at[1],
            ).wait()
            srow = jax.lax.broadcasted_iota(jnp.int32, (SUBS, 128), 0)
            slane = jax.lax.broadcasted_iota(jnp.int32, (SUBS, 128), 1)
            keep_old = (base + srow * 128 + slane < p0)[None]  # [1,SUBS,128]
            dl_scr[slot] = jnp.where(keep_old, old_dl[:], dl_scr[slot])
            al_scr[slot] = jnp.where(keep_old, old_al[:], al_scr[slot])

        start = base + k * chunk
        wdl = pltpu.make_async_copy(
            dl_scr.at[slot], dl_hbm.at[:, pl.ds(start // 128, SUBS), :],
            out_sems.at[0],
        )
        wal = pltpu.make_async_copy(
            al_scr.at[slot], al_hbm.at[:, pl.ds(start // 128, SUBS), :],
            out_sems.at[1],
        )
        wdl.start()
        wal.start()
        # Wait before the next chunk reuses this slot's scratch (and so the
        # successor block's overlap read observes our write).
        wdl.wait()
        wal.wait()
        return 0

    jax.lax.fori_loop(jnp.int32(0), n_chunks, body, 0)


def _gat_bwd_call(
    csr: PallasCSR, logits3d, vals, dmask3d, g_blk, mlb_blk, heads, featp,
    true_feat, packed, *, interpret,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = csr.n_blocks
    n_val = 1 if packed else heads
    hf = g_blk.shape[1]
    e_rows = csr.senders.shape[0] // 128
    use_dmask = dmask3d is not None
    if not use_dmask:
        dmask3d = jnp.zeros((heads, 1, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (BLOCK_ROWS, hf), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 128), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, heads, SUBS, 128), jnp.float32),
            pltpu.VMEM((2, n_val, E_CHUNK, 128 if packed else featp),
                       jnp.float32),
            pltpu.VMEM((2, SUBS, 128), jnp.int32),
            pltpu.VMEM(
                (2, heads, SUBS, 128) if use_dmask else (2, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.VMEM((2, heads, SUBS, 128), jnp.float32),
            pltpu.VMEM((2, heads, SUBS, 128), jnp.float32),
            pltpu.VMEM((heads, SUBS, 128), jnp.float32),
            pltpu.VMEM((heads, SUBS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(
                (2, 1 + heads + n_val + (heads if use_dmask else 0))
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(
            _gat_bwd_kernel, heads=heads, featp=featp, true_feat=true_feat,
            packed=packed, use_dmask=use_dmask,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((heads, e_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((heads, e_rows, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(csr.blk_ptr, logits3d, vals, csr.rel, dmask3d, g_blk, mlb_blk)


def _use_recompute(heads, feat, scores_ml, with_dropout=False):
    """The recompute-α CSC path applies when the caller supplied the
    decomposed score tables AND the gather table has lane room for them
    (one extra receiver-id lane when the dropout mask is regenerated)."""
    return (
        scores_ml is not None
        and heads * feat + 3 * heads + (1 if with_dropout else 0) <= 128
        and os.environ.get("GODE_GAT_DWH", "auto").lower() != "permute"
    )


def _dwh_csc_recompute(csr, g, heads, feat, scores_ml, dropout=None):
    """dWh via the recompute-α CSC kernel — NO [E, H] edge permute: s_dst,
    m, l ride the g[recv] wide gather (spare lanes of the same table) and
    s_src is sender-block-local (see pallas_spmm._segment_reduce_recompute).
    Exact for the decomposed GAT scores ``LeakyReLU(s_src[s] + s_dst[r])``
    the reference's layers use (SURVEY.md §3.3).  ``dropout=(seed, rate)``
    additionally regenerates the counter-based attention-dropout scale
    in-kernel (ops.dropmask) — the receiver id rides the table as one more
    lane, so training with the reference's attn dropout keeps this path."""
    s_src, s_dst, m, l, slope = scores_ml
    hf = heads * feat
    n = csr.n_node_pad
    nb_rows = csr.n_blocks * BLOCK_ROWS
    cols = [
        g.reshape(g.shape[0], hf),
        s_dst.astype(jnp.float32),
        m,
        l,
    ]
    extra = 0
    if dropout is not None:
        # Receiver-id lane (f32-exact for N < 2^24): the in-kernel hash
        # keys on (sender, receiver, head) — ops.dropmask.
        cols.append(
            jnp.arange(g.shape[0], dtype=jnp.float32)[:, None]
        )
        extra = 1
    table = jnp.pad(
        jnp.concatenate(cols, axis=1),
        ((0, 0), (0, 128 - hf - 3 * heads - extra)),
    )                                                            # [N, 128]
    msgs = jnp.take(table, csr.t_receivers, axis=0)              # [E_pad, 128]
    src_blk = jnp.pad(
        s_src.astype(jnp.float32),
        ((0, nb_rows - s_src.shape[0]), (0, 128 - heads)),
    )
    out = _segment_reduce_recompute(
        msgs, src_blk, csr.t_rel, csr.t_blk_ptr, csr.n_blocks,
        heads, feat, slope, dropout=dropout, interpret=not _is_tpu(),
    )
    return out[:n, :hf].reshape(n, heads, feat)


def _dwh_csc(csr, alpha, g, heads, feat):
    """dWh[s] = Σ_{e: sender=s} α_e g[recv_e] — the Âᵀ segment reduction on
    the CSC view, with α folded in by the weighted reduce kernel.  The
    g[recv] gather stays in XLA (the one unavoidable gather of the
    backward) but in its fast form: full 128-lane rows out of a node-major
    table padded *before* the gather."""
    e_pad = csr.senders.shape[0]
    hf = heads * feat
    lanes = -(-hf // 128) * 128
    # Node-major pad BEFORE the gather so XLA emits its fast full-lane-row
    # gather form (same trick as _vals_edge_major; the gather-then-pad form
    # cost ~30 ms of the backward at arxiv scale).
    table = jnp.pad(g.reshape(g.shape[0], hf), ((0, 0), (0, lanes - hf)))
    gv_csc = jnp.take(table, csr.t_receivers, axis=0)            # [E_pad, L]
    alpha_csc = jnp.take(alpha, csr.t_perm, axis=0)              # [E_pad, H]
    if heads == 1:
        # Single head: the lane expansion is a plain broadcast — XLA fuses
        # it into the gather's elementwise consumer for free; the weighted
        # kernel's MXU expansion would be 3 wasted outer-product passes.
        return segment_reduce_csr(
            csr, gv_csc * alpha_csc, transpose=True,
            interpret=not _is_tpu(),
        )[: csr.n_node_pad, :hf].reshape(csr.n_node_pad, heads, feat)
    # α (already α·D under dropout) permuted to CSC edge order, streamed
    # into the reduce kernel as [H, E/128, 128] rows and expanded onto the
    # value lanes in-VMEM (one K=heads MXU contraction per 128-edge
    # sub-chunk) — no [E, L] scale array in HBM (the XLA-side expand
    # measured ~12 ms at arxiv scale for 45 MB of information).
    alpha3d = _to3d(alpha_csc, e_pad)
    return segment_reduce_csr(
        csr, gv_csc, transpose=True, alpha3d=alpha3d, feat=feat,
        interpret=not _is_tpu(),
    )[: csr.n_node_pad, :hf].reshape(csr.n_node_pad, heads, feat)


def _bwd_fused(csr, res, g, dmask=None, scores=None, drop=None):
    """Fused α/dlogit backward — one Pallas pass, then the CSC dWh
    reduction: recompute-α kernel when the decomposed score tables are
    available (``scores=(s_src, s_dst, slope)``; with ``drop=(seed, rate)``
    the counter-based dropout is regenerated in-kernel so the fast path
    covers training too), else the weighted reduce over the permuted α."""
    logits, wh, out, m, l = res
    e_orig = logits.shape[0]
    e_pad = csr.senders.shape[0]
    heads, feat = wh.shape[-2], wh.shape[-1]
    packed = heads * feat <= 128
    featp = 128 if packed else -(-feat // 128) * 128
    n = csr.n_node_pad
    nb_rows = csr.n_blocks * BLOCK_ROWS
    g = g.astype(jnp.float32)

    logits3d = _to3d(logits, e_pad)
    dmask3d = None if dmask is None else _to3d(dmask, e_pad)
    # Recompute the sender gather (same op the XLA path pays), in the same
    # edge-major layout the forward streams — the kernel's dot is edge-major.
    vals = _vals_edge_major(csr, wh, packed, featp)

    def pad_rows(a):
        return jnp.pad(a, ((0, nb_rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

    if packed:
        # Interleaved lanes (f·H + h) — must match the vals plane layout.
        g_blk = pad_rows(
            jnp.pad(_pack_interleaved(g), ((0, 0), (0, 128 - heads * feat)))
        )
    else:
        g_blk = pad_rows(
            jnp.pad(g, ((0, 0), (0, 0), (0, featp - feat))).reshape(
                n, heads * featp
            )
        )
    beta = jnp.sum(g * out.astype(jnp.float32), axis=-1)         # [N_pad, H]
    mlb_blk = pad_rows(
        jnp.concatenate(
            [m, l, beta, jnp.zeros((n, 128 - 3 * heads), jnp.float32)], axis=1
        )
    )

    dl3, al3 = _gat_bwd_call(
        csr, logits3d, vals, dmask3d, g_blk, mlb_blk, heads, featp, feat,
        packed, interpret=not _is_tpu(),
    )
    dlogits = dl3.reshape(heads, e_pad).T[:e_orig]
    scores_ml = (
        None if (scores is None or (dmask is not None and drop is None))
        else (scores[0], scores[1], m, l, scores[2])
    )
    if _use_recompute(heads, feat, scores_ml, with_dropout=drop is not None):
        dwh = _dwh_csc_recompute(csr, g, heads, feat, scores_ml, dropout=drop)
    else:
        alpha = al3.reshape(heads, e_pad).T         # [E_pad, H] (α·D if drop)
        dwh = _dwh_csc(csr, alpha, g, heads, feat)
    return dlogits.astype(logits.dtype), dwh.astype(wh.dtype)


def _gat_fwd(csr, logits, wh):
    out, m, l = _fwd_impl(csr, logits, wh)
    return out, (logits, wh, out, m, l)


def _bwd_xla(csr, res, g, dmask=None, scores=None, drop=None):
    """Gather-based backward fallback: α from the saved softmax statistics
    and the per-edge dots via [E, H·F] XLA gathers — the costs the fused
    kernel's one-hot MXU contractions avoid."""
    logits, wh, out, m, l = res
    e_orig = logits.shape[0]
    e_pad = csr.senders.shape[0]
    heads, feat = wh.shape[-2], wh.shape[-1]
    g = g.astype(jnp.float32)
    emask = csr.edge_mask()[:, None]                             # [E_pad, 1]
    logits_p = jnp.pad(
        logits.astype(jnp.float32), ((0, e_pad - e_orig), (0, 0))
    )

    alpha = jnp.where(
        emask,
        jnp.exp(logits_p - jnp.take(m, csr.receivers, axis=0))
        / jnp.take(l, csr.receivers, axis=0),
        0.0,
    )                                                            # [E_pad, H]
    gv = jnp.take(g, csr.receivers, axis=0)                      # [E_pad,H,F]
    v = jnp.take(wh.astype(jnp.float32), csr.senders, axis=0)    # [E_pad,H,F]
    dot = jnp.sum(gv * v, axis=-1)                               # [E_pad, H]
    beta = jnp.sum(g * out.astype(jnp.float32), axis=-1)         # [N_pad, H]
    if dmask is not None:
        d_p = jnp.pad(
            dmask.astype(jnp.float32), ((0, e_pad - dmask.shape[0]), (0, 0))
        )
        dot = dot * d_p            # dlogit = α (D·⟨g,v⟩ − β); β carries D
    dlogits = alpha * (dot - jnp.take(beta, csr.receivers, axis=0))
    dlogits = jnp.where(emask, dlogits, 0.0)[:e_orig]
    if dmask is not None:
        alpha = alpha * d_p        # the CSC dWh pass reduces α·D coefficients
    scores_ml = (
        None if (scores is None or (dmask is not None and drop is None))
        else (scores[0], scores[1], m, l, scores[2])
    )
    if _use_recompute(heads, feat, scores_ml, with_dropout=drop is not None):
        dwh = _dwh_csc_recompute(csr, g, heads, feat, scores_ml, dropout=drop)
    else:
        dwh = _dwh_csc(csr, alpha, g, heads, feat)
    return dlogits.astype(logits.dtype), dwh.astype(wh.dtype)


def _use_fused():
    return os.environ.get("GODE_GAT_BWD", "fused").lower() != "xla"


def _gat_bwd(csr, res, g):
    return (_bwd_fused if _use_fused() else _bwd_xla)(csr, res, g)


gat_aggregate_pallas.defvjp(_gat_fwd, _gat_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gat_aggregate_pallas_scores(
    csr: PallasCSR, negative_slope: float, logits: jax.Array,
    wh: jax.Array, s_src: jax.Array, s_dst: jax.Array,
) -> jax.Array:
    """``gat_aggregate_pallas`` with the decomposed-score hint.

    ``s_src``/``s_dst`` (``[N_pad, H]``) must satisfy
    ``logits = leaky_relu(s_src[senders] + s_dst[receivers],
    negative_slope)`` — i.e. the standard GAT scores ``ops.edge_scores``
    produces (SURVEY.md §3.3).  The forward is identical to the plain op
    (it uses ``logits`` as given); the hint lets the backward *recompute*
    α in CSC order from node-indexed tables instead of paying the narrow
    [E, H] edge-permute gather (~8–15 ms at arxiv scale).  Gradients flow
    through ``logits``/``wh``; the hint tensors get zero cotangents (their
    gradient arrives through ``logits`` via ``edge_scores``'s own vjp).
    """
    out, _, _ = _fwd_impl(csr, logits, wh)
    return out


def _gat_scores_fwd(csr, slope, logits, wh, s_src, s_dst):
    out, m, l = _fwd_impl(csr, logits, wh)
    return out, (logits, wh, out, m, l, s_src, s_dst)


def _gat_scores_bwd(csr, slope, res, g):
    *res5, s_src, s_dst = res
    fn = _bwd_fused if _use_fused() else _bwd_xla
    dlogits, dwh = fn(csr, tuple(res5), g, scores=(s_src, s_dst, slope))
    return dlogits, dwh, jnp.zeros_like(s_src), jnp.zeros_like(s_dst)


gat_aggregate_pallas_scores.defvjp(_gat_scores_fwd, _gat_scores_bwd)


def _gat_drop_fwd(csr, logits, wh, dmask):
    out, m, l = _fwd_impl(csr, logits, wh, dmask)
    return out, (logits, wh, out, m, l, dmask)


def _gat_drop_bwd(csr, res, g):
    *res5, dmask = res
    fn = _bwd_fused if _use_fused() else _bwd_xla
    dlogits, dwh = fn(csr, tuple(res5), g, dmask)
    return dlogits, dwh, jnp.zeros_like(dmask)


gat_aggregate_pallas_dropout.defvjp(_gat_drop_fwd, _gat_drop_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def gat_aggregate_pallas_scores_dropout(
    csr: PallasCSR, negative_slope: float, rate: float,
    logits: jax.Array, wh: jax.Array, s_src: jax.Array, s_dst: jax.Array,
    seed: jax.Array,
) -> jax.Array:
    """Scores-hinted aggregation with *regenerable* attention dropout.

    The dropout scale is the counter-based mask ``ops.dropmask.
    attention_dropout_scale(seed, senders, receivers, H, rate)`` — a pure
    function of (sender, receiver, head, seed).  That lets the backward's
    CSC dWh pass regenerate the mask in sender order inside the recompute
    kernel instead of paying the narrow [E, H] α·D permute, so the fast
    dWh path covers the reference's training configuration (attn dropout
    0.6; round-2 VERDICT #2).  The residuals carry only the u32 seed — no
    [E, H] mask array is stored.

    ``seed``: traced u32 scalar (``dropmask.seed_from_key(rng)``).
    """
    from graph_odenet_tpu.ops import dropmask as _dm

    heads = logits.shape[1]
    dmask = _dm.attention_dropout_scale(
        seed, csr.senders, csr.receivers, heads, rate
    )
    out, _, _ = _fwd_impl(csr, logits, wh, dmask)
    return out


def _gat_sd_fwd(csr, slope, rate, logits, wh, s_src, s_dst, seed):
    from graph_odenet_tpu.ops import dropmask as _dm

    heads = logits.shape[1]
    dmask = _dm.attention_dropout_scale(
        seed, csr.senders, csr.receivers, heads, rate
    )
    out, m, l = _fwd_impl(csr, logits, wh, dmask)
    return out, (logits, wh, out, m, l, s_src, s_dst, seed)


def _gat_sd_bwd(csr, slope, rate, res, g):
    import numpy as np

    from graph_odenet_tpu.ops import dropmask as _dm

    logits, wh, out, m, l, s_src, s_dst, seed = res
    heads = logits.shape[1]
    dmask = _dm.attention_dropout_scale(
        seed, csr.senders, csr.receivers, heads, rate
    )
    fn = _bwd_fused if _use_fused() else _bwd_xla
    dlogits, dwh = fn(
        csr, (logits, wh, out, m, l), g, dmask,
        scores=(s_src, s_dst, slope), drop=(seed, rate),
    )
    zero_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return (
        dlogits, dwh, jnp.zeros_like(s_src), jnp.zeros_like(s_dst), zero_seed
    )


gat_aggregate_pallas_scores_dropout.defvjp(_gat_sd_fwd, _gat_sd_bwd)
