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


def _split3(x, n_parts=3):
    """Mantissa-split an f32 array into bf16-representable f32 parts.

    Each part is exactly representable in bf16, so a kernel can cast and
    matmul them in ONE exact MXU pass instead of the 3 passes `_mask_dot`
    spends splitting in-kernel — the XLA-side split is a cheap elementwise
    prepass on small node tables (round-4 backward-pass diet)."""
    parts = []
    rest = x
    for _ in range(n_parts - 1):
        hi = rest.astype(jnp.bfloat16).astype(jnp.float32)
        parts.append(hi)
        rest = rest - hi
    parts.append(rest.astype(jnp.bfloat16).astype(jnp.float32))
    return parts


def _n_parts():
    return {"highest": 3, "bf16x2": 2, "default": 1}[_MODE]


def _exact_dot(exact01, presplit, dn, *, exact_lhs=True):
    """One-pass matmul: ``exact01`` a 0/1 mask, ``presplit`` f32 values that
    are already bf16-representable (see ``_split3``) — both sides cast to
    bf16 losslessly, so a single MXU pass is f32-exact."""
    a = exact01.astype(jnp.bfloat16)
    b = presplit.astype(jnp.bfloat16)
    x, y = (a, b) if exact_lhs else (b, a)
    return jax.lax.dot_general(
        x, y, dimension_numbers=dn, preferred_element_type=jnp.float32
    )


def _inkernel_drop_scale(snd_i32, rcv_i32, heads, seed_u32, keep24, inv_keep):
    """Regenerate the counter-based attention-dropout scale in-kernel:
    ``[H, 128e]`` f32 — exactly ``ops.dropmask.attention_dropout_scale``
    for the same (sender, receiver, head, seed)."""
    from graph_odenet_tpu.ops import dropmask as _dm

    as_u32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    x = (
        as_u32(snd_i32) * jnp.uint32(_dm.K_SND)
        ^ as_u32(rcv_i32) * jnp.uint32(_dm.K_RCV)
    )                                                   # [1, 128e]
    h_i = jax.lax.broadcasted_iota(jnp.int32, (heads, 1), 0)
    hx = as_u32(h_i) * jnp.uint32(_dm.K_HEAD) ^ seed_u32
    x = x ^ hx                                          # [H, 128e]
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_dm.F1)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(_dm.F2)
    x = x ^ (x >> 16)
    keep = (x >> 8) < jnp.uint32(keep24)
    return keep.astype(jnp.float32) * inv_keep

# Packed-kernel softmax shift (GODE_GAT_SOFTMAX):
#   "chunkshift" — uniform per-sub-chunk/head shift (one lane max-reduce);
#                  ~19% faster at the reference's H=8/F=8 shape.  Exact:
#                  an exponent-headroom bias plus a count-plane detector
#                  re-runs any sub-chunk where a receiver's whole mass
#                  would flush to zero through the segmented scan
#                  (default since round 5 — VERDICT r4 #5).
#   "scan"       — exact per-receiver chunk-local max via segmented scan
#                  on every sub-chunk (the conservative fallback).
_PACKED_SOFTMAX = os.environ.get("GODE_GAT_SOFTMAX", "chunkshift").lower()
# Chunkshift exponent headroom: shifting by (sub-chunk max − 44) moves the
# f32 flush-to-zero point from ~87 to ~131 below the max while q ≤ e⁴⁴
# ≈ 1.8e19 keeps Σ q·v far from f32 overflow (≈3.4e38).
_CS_BIAS = 44.0


def _gat_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    seed_ref,           # scalar prefetch: i32[1] dropout seed (0 if unused)
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [HV, E_pad, Fp]  (HV=1 when packed)
    meta_hbm,           # i32 ANY/HBM [2, E_pad/128, 128]: rel | sender id
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
                        #   (dummy [H, 1, 128] when use_dmask=False)
    out_ref,            # VMEM [BLOCK_ROWS, HV*... = packed? 128 : H*Fp]
    m_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    l_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    logit_scratch,      # VMEM [2, H, SUBS, 128]
    val_scratch,        # VMEM [2, HV, E_CHUNK, Fp]
    meta_scratch,       # VMEM [2, 2, SUBS, 128] i32
    dmask_scratch,      # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    sems,               # DMA sems [2, 2 + HV (+ 1)]
    *,
    heads: int,
    feat: int,          # Fp (lane-padded per-head width; 128 when packed)
    true_feat: int,     # logical per-head F (lane stride in packed mode)
    packed: bool,       # all heads share one 128-lane value plane
    use_dmask: bool,    # post-softmax attention dropout scales streamed in
    drop_keep24: int = 0,   # >0: regenerate the counter mask in-kernel
    inv_keep: float = 1.0,
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
                meta_hbm.at[:, pl.ds(start // 128, SUBS), :],
                meta_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                logits_hbm.at[:, pl.ds(start // 128, SUBS), :],
                logit_scratch.at[slot],
                sems.at[slot, 1],
            ),
        ]
        for v in range(n_val):
            copies.append(
                pltpu.make_async_copy(
                    vals_hbm.at[v, pl.ds(start, E_CHUNK), :],
                    val_scratch.at[slot, v],
                    sems.at[slot, 2 + v],
                )
            )
        if use_dmask:
            copies.append(
                pltpu.make_async_copy(
                    dmask_hbm.at[:, pl.ds(start // 128, SUBS), :],
                    dmask_scratch.at[slot],
                    sems.at[slot, 2 + n_val],
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

        rel_all = meta_scratch[slot, 0]      # [SUBS, 128]
        snd_all = meta_scratch[slot, 1]      # [SUBS, 128]
        accs, ms, ls = list(accs), list(ms), list(ls)
        for sub in range(SUBS):
            e_idx = lane + dma_start(k) + sub * 128
            valid = (e_idx >= p0) & (e_idx < p1)                 # [1, 128]
            relv = rel_all[sub][None, :]
            mask = (rows == relv) & valid                        # [R, 128]
            if drop_keep24:
                d_all = _inkernel_drop_scale(
                    snd_all[sub][None, :], relv + 128 * b, heads,
                    seed_ref[0].astype(jnp.uint32), drop_keep24, inv_keep,
                )                                                # [H, 128e]
            if packed:
                v_sub = val_scratch[slot, 0, pl.ds(sub * 128, 128), :]
                acc_scale = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
                pv_sum = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
                for h in range(heads):
                    le = logit_scratch[slot, h][sub][None, :]
                    p, scale, ms[h], ls[h] = head_stats(mask, le, ms[h], ls[h])
                    if drop_keep24:
                        # Dropout scales α numerators only; the softmax
                        # denominator (l) keeps every edge (GAT convention).
                        p = p * d_all[h][None, :]
                    elif use_dmask:
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
                    if drop_keep24:
                        p = p * d_all[h][None, :]
                    elif use_dmask:
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
    seed_ref,           # scalar prefetch: i32[1] dropout seed (0 if unused)
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [1, E_pad, 128] interleaved lanes f·H+h
    meta_hbm,           # i32 ANY/HBM [2, E_pad/128, 128]: rel | sender id
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
    out_ref,            # VMEM [BLOCK_ROWS, 128]
    m_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    l_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    logit_scratch,      # VMEM [2, H, SUBS, 128]
    val_scratch,        # VMEM [2, 1, E_CHUNK, 128]
    meta_scratch,       # VMEM [2, 2, SUBS, 128] i32
    dmask_scratch,      # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    sems,               # DMA sems [2, 3 (+ 1 if use_dmask)]
    *,
    heads: int,
    true_feat: int,     # logical per-head F (H·F ≤ 128)
    use_dmask: bool,
    drop_keep24: int = 0,   # >0: regenerate the counter mask in-kernel
    inv_keep: float = 1.0,
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
                meta_hbm.at[:, pl.ds(start // 128, SUBS), :],
                meta_scratch.at[slot],
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
        1-lane array blows the compiler's scoped-vmem budget).  Multi-head:
        the K=heads MXU contraction — measured faster than BOTH
        pltpu.repeat (16 ms/pass slower: per-tile copies) and log2 lane-
        roll doubling (round 4: 4 rolls of [128, 128] cost more than the
        3 split passes — cross-lane rotates go through the shuffle unit).
        Dead lanes past H·F may carry a live scale — harmless, they only
        ever multiply zeros (Q/acc are zero there)."""
        if heads == 1:
            return jnp.broadcast_to(s, (s.shape[0], 128))
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

        rel_all = meta_scratch[slot, 0]                   # [SUBS, 128]
        snd_all = meta_scratch[slot, 1]                   # [SUBS, 128]
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
            # Last lane of each segment carries the segment max (in
            # chunkshift mode every lane does; the select still works).
            is_last = (
                (pltpu.roll(seg, shift=127, axis=1) != seg) | (lane == 127)
            ).astype(jnp.float32)                          # [1, 128]

            def scan_mseg():
                # Chunk-local per-segment max: bidirectional doubling scan.
                # Receiver-sorted edges ⇒ segments are contiguous lane
                # runs, so a seg-id match at distance d implies everything
                # between matches; circular wrap can only match when the
                # whole sub-chunk is one segment (harmless).
                ms = jnp.where(valid, le, _NEG)
                for d in (1, 2, 4, 8, 16, 32, 64):
                    for sh in (d, 128 - d):  # circular roll: −d ≡ 128−d
                        ok = pltpu.roll(seg, shift=sh, axis=1) == seg
                        ms = jnp.maximum(
                            ms,
                            jnp.where(
                                ok, pltpu.roll(ms, shift=sh, axis=1), _NEG
                            ),
                        )
                return ms

            def stats_of(mseg):
                q = jnp.where(valid, jnp.exp(le - mseg), 0.0)  # [H, 128e]
                # Pre-transpose the stats bundle so the contraction is in
                # native MXU form (lhs dim1 × rhs dim0) — contracting the
                # rhs on its lane axis made Mosaic transpose it inside
                # EVERY mantissa-split pass (~20 ms of the kernel,
                # measured).  Planes: Σq (l_c) ‖ seg-max (m_c) ‖ edge count
                # (rescue detection: exactly one is_last lane per segment).
                bundleT = jnp.concatenate(
                    [q, mseg * is_last, jnp.broadcast_to(is_last, (1, 128))],
                    axis=0,
                ).T                                        # [128e, 2H+1]
                st = _mask_dot(
                    oh, bundleT, (((1,), (0,)), ((), ())), exact_lhs=True
                )                                          # [R, 2H+1]
                return q, st

            if _PACKED_SOFTMAX == "chunkshift":
                # Uniform per-(sub-chunk, head) shift: one lane max-reduce
                # instead of the segmented scan (~19% of the H=8/F=8 fwd),
                # biased by _CS_BIAS exponent headroom so only receivers
                # whose whole chunk-local logit set sits ≥ ~131 below the
                # sub-chunk max would flush to zero — and those are caught
                # by the count plane (l_c == 0 but count > 0) and re-done
                # with the exact segmented scan under a lax.cond that, on
                # benign data, never fires.  Exact for any logit spread;
                # the reference's UNSHIFTED exp (pyGAT
                # SpGraphAttentionLayer) overflows at logit > 88.
                mseg_u = jnp.broadcast_to(
                    jnp.max(jnp.where(valid, le, _NEG), axis=1, keepdims=True)
                    - _CS_BIAS,
                    le.shape,
                )
                q_u, st_u = stats_of(mseg_u)
                lost = jnp.any(
                    (st_u[:, :heads] <= 0.0)
                    & (st_u[:, 2 * heads: 2 * heads + 1] > 0.5)
                )

                def rescue():
                    ms = scan_mseg()
                    q_r, st_r = stats_of(ms)
                    return ms, q_r, st_r

                mseg, q, stats = jax.lax.cond(
                    lost, rescue, lambda: (mseg_u, q_u, st_u)
                )
            else:
                mseg = scan_mseg()
                q, stats = stats_of(mseg)
            if drop_keep24:
                q_pv = q * _inkernel_drop_scale(
                    snd_all[sub][None, :], relv + 128 * b, heads,
                    seed_ref[0].astype(jnp.uint32), drop_keep24, inv_keep,
                )
            elif use_dmask:
                q_pv = q * dmask_scratch[slot][:, sub, :]
            else:
                q_pv = q
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
            # (Round-4 note: fusing the stats columns into the value
            # contraction as lanes [hf, hf+2H) of one matmul saved 3 MXU
            # passes but measured ~3 ms SLOWER — the off-tile lane slices
            # extracting l_c/m_c relayout through the shuffle unit.)
            pv = _mask_dot(
                oh, Q * v_sub, (((1,), (0,)), ((), ())), exact_lhs=True
            )                                              # [R, 128]
            l_c = stats[:, :heads]
            m_raw = stats[:, heads : 2 * heads]
            # l_c > 0 ⟺ the receiver has (non-underflowed) edges in this
            # sub-chunk; in "scan" mode q's segment max is exactly 1 so
            # this is precisely "has edges".
            m_c = jnp.where(l_c > 0.0, m_raw, _NEG)        # [R, H]
            m_n = jnp.maximum(m, m_c)
            s_old = jnp.exp(m - m_n)
            s_c = jnp.exp(m_c - m_n)
            l = l * s_old + l_c * s_c
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
    if _PACKED_SOFTMAX == "chunkshift":
        # Externalise the _CS_BIAS headroom before writing the flash state:
        # consumers (the recompute-α backward's ``min(logit − m, 0)`` clamp,
        # pallas_spmm.py:882) rely on m ≥ every incoming logit, which the
        # biased in-kernel shift violates by up to _CS_BIAS.  (m + B,
        # l·e^(−B)) is the identical softmax state under the standard
        # convention — α = exp(le − m)/l is shift-invariant.
        m = m + _CS_BIAS
        denom = jnp.maximum(denom * jnp.exp(jnp.float32(-_CS_BIAS)), 1e-30)
    pad = ((0, 0), (0, 128 - heads))
    m_ref[:] = jnp.pad(m, pad)
    l_ref[:] = jnp.pad(denom, pad)


def _gat_call(
    csr: PallasCSR, logits3d, vals3d, dmask3d, heads, featp, true_feat,
    packed, *, interpret, drop=None,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from graph_odenet_tpu.ops import dropmask as _dm

    nb = csr.n_blocks
    n_val = 1 if packed else heads
    hf = 128 if packed else heads * featp
    use_dmask = dmask3d is not None
    if not use_dmask:
        dmask3d = jnp.zeros((heads, 1, 128), jnp.float32)
    if drop is None:
        seed_arr = jnp.zeros((1,), jnp.int32)
        drop_keep24, inv_keep = 0, 1.0
    else:
        seed, rate = drop
        seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32)[None]
        drop_keep24, inv_keep = _dm.keep24(rate), 1.0 / (1.0 - rate)
    meta = jnp.stack([csr.rel, csr.senders.reshape(-1, 128)])
    if packed and heads > 1:
        # Multi-head packed: the segmented-scan kernel (one main MXU
        # contraction per sub-chunk).  Single head sticks with the general
        # kernel — its per-head work IS the whole job there, and the scan/
        # stats machinery costs more than it saves (measured 22 vs 11 ms
        # fwd at arxiv scale, H=1 F=128).
        kernel = partial(
            _gat_kernel_packed, heads=heads, true_feat=true_feat,
            use_dmask=use_dmask, drop_keep24=drop_keep24, inv_keep=inv_keep,
        )
    else:
        kernel = partial(
            _gat_kernel, heads=heads, feat=featp, true_feat=true_feat,
            packed=packed, use_dmask=use_dmask, drop_keep24=drop_keep24,
            inv_keep=inv_keep,
        )
    n_sems = 2 + n_val + (1 if use_dmask else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
            pltpu.VMEM((2, 2, SUBS, 128), jnp.int32),
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
    )(csr.blk_ptr, seed_arr, logits3d, vals3d, meta, dmask3d)


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
    csr: PallasCSR, logits: jax.Array, wh: jax.Array, dmask=None, drop=None
):
    """logits: [E, H] (Graph edge order, any 128-multiple ≥ n_edge);
    wh: [N_pad, H, F]; dmask: optional [E, H] post-softmax α scale;
    drop: optional (seed, rate) — the counter-based training dropout,
    regenerated INSIDE the kernel (no mask array, no extra DMA plane).

    Returns ``(out, m, l, logits3d, vals)`` — the last two are the kernel's
    own HBM input layouts, handed back so the backward can reuse them as
    residuals instead of re-paying the _to3d relayout and the sender
    gather (~1.3 + 6 ms at arxiv scale)."""
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
        interpret=not _is_tpu(), drop=drop,
    )
    n = csr.n_node_pad
    if packed:
        out = _unpack_interleaved(out[:n], heads, feat)
    else:
        out = out.reshape(out.shape[0], heads, featp)[:n, :, :feat]
    return out, m[:n, :heads], l[:n, :heads], logits3d, vals


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
    out, *_ = _fwd_impl(csr, logits, wh)
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
    out, *_ = _fwd_impl(csr, logits, wh, dmask)
    return out


def _g_packing(live: int):
    """How the pre-split g parts pack into 128-lane MXU operands.

    Returns (n_parts, per_op, n_ops): ``per_op`` mantissa parts ride one
    [R, 128] operand at lane offsets j·live, so each operand costs ONE
    exact bf16 MXU pass (vs 3 in-kernel split passes).  live=64 (the
    reference's 8×8 recipe): 3 parts → 2 ops; live=128: 3 ops (same pass
    count as before, still skips the in-kernel splitting); live≤42: all 3
    parts in one op.  live>128 (multi-tile planes): no pre-split —
    (0, 0, 0) sentinel, callers keep the in-kernel `_mask_dot` path."""
    if live > 128:
        return 0, 0, 0
    p = _n_parts()
    per_op = max(1, 128 // live)
    n_ops = -(-p // per_op)
    return p, per_op, n_ops


def _gat_bwd_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    seed_ref,           # scalar prefetch: i32[1] dropout seed (0 if unused)
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [HV, E_pad, Fp]  edge-major v=Wh[send]
                        #   (same layout the forward kernel streams — the
                        #   per-edge dot is computed edge-major below, so no
                        #   feature-major transpose ever materialises in HBM)
    meta_hbm,           # i32 ANY/HBM [2, E_pad/128, 128]: rel | sender id
    dmask_hbm,          # f32 ANY/HBM [H, E_pad/128, 128] α-dropout scale
                        #   (explicit-mask mode only; dummy otherwise)
    g_blk,              # VMEM [BLOCK_ROWS, n_ops·128] pre-split cotangent
                        #   parts, per_op parts per 128-lane operand
    mlb_blk,            # VMEM [BLOCK_ROWS, 128] pre-split [m|l|β] parts:
                        #   part p at lanes [3H·p, 3H·(p+1))
    dl_hbm,             # out ANY [H, E_pad/128, 128]  dlogits (row layout)
    al_hbm,             # out ANY [H, E_pad/128, 128]  α·D (row layout;
                        #   [H, 1, 128] dummy when emit_alpha=False)
    logit_scr,          # VMEM [2, H, SUBS, 128]
    val_scr,            # VMEM [2, HV, E_CHUNK, Fp]
    meta_scr,           # VMEM [2, 2, SUBS, 128] i32
    dmask_scr,          # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    dl_scr,             # VMEM [2, H, SUBS, 128]
    al_scr,             # VMEM [2, H, SUBS, 128] (or [2,1,1,128] dummy)
    old_dl,             # VMEM [H, SUBS, 128]   predecessor's first-chunk tile
    old_al,             # VMEM [H, SUBS, 128] (or [1,1,128] dummy)
    in_sems,            # DMA sems [2, 2 + HV (+ H)]
    out_sems,           # DMA sems [2]
    old_sems,           # DMA sems [2]
    *,
    heads: int,
    featp: int,         # per-plane lane width (128 when packed)
    true_feat: int,     # logical per-head F
    packed: bool,
    use_dmask: bool,    # stream an explicit [E, H] mask (test injection)
    drop_keep24: int,   # >0: regenerate the counter-based mask in-kernel
    inv_keep: float,
    emit_alpha: bool,   # write the α·D plane (False when the recompute-α
                        #   dWh pass regenerates α itself — saves an output
                        #   stream and its per-chunk write barrier)
):
    """α and dlogit per edge, in one pass over the receiver-block tiling.

    Everything per-edge stays in row layout (lane = edge): m/l/β rows come
    from one one-hot MXU contraction per 128-edge sub-chunk, g[recv] rows
    from another (edge-major, so the per-edge ⟨g, v⟩ multiplies the value
    chunk in the layout it is DMA'd in), and the per-head dots land
    row-major by contracting the feature axis against head_sel.  XLA-side
    per-edge gathers are dispatch-bound on TPU (~5 ms per [E, 1] gather at
    1.4M edges — measured), which is why α is NOT reconstructed outside.

    Round-4 diet: mlb/g arrive mantissa-PRE-SPLIT (XLA-side `_split3`) so
    their one-hot contractions are single exact bf16 passes recombined by
    VPU rolls; rel+sender ride ONE merged i32 DMA plane; training dropout
    is regenerated in-kernel from (sender, receiver, head, seed) instead of
    streaming a mask plane."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_val = 1 if packed else heads
    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)
    hf = n_val * (128 if packed else featp)
    # g's live lane count (packed planes zero-pad beyond H·F): parts pack
    # at multiples of this width.
    live = heads * true_feat if packed else hf
    n_parts, per_op, n_ops = _g_packing(live)
    mlb_parts = _n_parts() if 3 * heads * _n_parts() <= 128 else 1

    def issue(k, slot):
        start = base + k * chunk
        copies = [
            pltpu.make_async_copy(
                meta_hbm.at[:, pl.ds(start // 128, SUBS), :],
                meta_scr.at[slot],
                in_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                logits_hbm.at[:, pl.ds(start // 128, SUBS), :],
                logit_scr.at[slot],
                in_sems.at[slot, 1],
            ),
        ]
        for v in range(n_val):
            copies.append(
                pltpu.make_async_copy(
                    vals_hbm.at[v, pl.ds(start, E_CHUNK), :],
                    val_scr.at[slot, v],
                    in_sems.at[slot, 2 + v],
                )
            )
        if use_dmask:
            copies.append(
                pltpu.make_async_copy(
                    dmask_hbm.at[:, pl.ds(start // 128, SUBS), :],
                    dmask_scr.at[slot],
                    in_sems.at[slot, 2 + n_val],
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
        if emit_alpha:
            pltpu.make_async_copy(
                al_hbm.at[:, pl.ds(base // 128, SUBS), :], old_al,
                old_sems.at[1],
            ).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
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

        rel_all = meta_scr[slot, 0]                       # [SUBS, 128]
        snd_all = meta_scr[slot, 1]                       # [SUBS, 128]
        for sub in range(SUBS):
            start_e = base + k * chunk + sub * 128
            e_idx = lane + start_e
            valid = (e_idx >= p0) & (e_idx < p1)          # [1, 128]
            relv = rel_all[sub][None, :]
            onehot = ((rows == relv) & valid).astype(jnp.float32)  # [R,128e]
            # Row-layout stats for this sub's 128 edges — pre-split parts
            # recombined by static sublane slices (exact f32 adds).
            if mlb_parts > 1:
                mlb_raw = _exact_dot(
                    onehot, mlb_blk[:], (((0,), (0,)), ((), ())),
                    exact_lhs=False,
                )                                         # [128, 128e]
                mlb_rows = mlb_raw[0 : 3 * heads, :]
                for p in range(1, mlb_parts):
                    mlb_rows = mlb_rows + mlb_raw[
                        3 * heads * p : 3 * heads * (p + 1), :
                    ]
            else:
                mlb_rows = _mask_dot(
                    onehot, mlb_blk[:], (((0,), (0,)), ((), ())),
                    exact_lhs=False,
                )
            # Edge-major g[recv] rows: one exact pass per packed operand,
            # parts within an operand recombined by lane rolls (live>128:
            # no pre-split fits — in-kernel split as before).
            if n_ops == 0:
                g_em = _mask_dot(
                    onehot, g_blk[:], (((0,), (0,)), ((), ())),
                    exact_lhs=True,
                )                                         # [128e, hf]
            else:
                g_em = None
                for op in range(n_ops):
                    raw = _exact_dot(
                        onehot, g_blk[:, op * 128 : (op + 1) * 128],
                        (((0,), (0,)), ((), ())), exact_lhs=True,
                    )                                     # [128e, 128]
                    acc_op = raw
                    lo = op * per_op
                    hi = min((op + 1) * per_op, n_parts)
                    for j in range(1, hi - lo):
                        acc_op = acc_op + pltpu.roll(
                            raw, shift=128 - j * live, axis=1
                        )
                    g_em = acc_op if g_em is None else g_em + acc_op
            # (lanes ≥ hf of g_em are garbage from the rolls — harmless,
            # v_em is zero there so the dots product masks them.)
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
            # All heads at once ([H, 128e] VPU ops — one exp for the whole
            # sub-chunk instead of H sublane-starved [1, 128] passes).
            le_all = logit_scr[slot][:, sub, :]           # [H, 128e]
            m_all = mlb_rows[0:heads, :]
            l_all = mlb_rows[heads : 2 * heads, :]
            be_all = mlb_rows[2 * heads : 3 * heads, :]
            # l is pre-clamped ≥ 1e-30 on real rows; invalid lanes are
            # masked before any inf can meet a 0.
            alpha = jnp.where(valid, jnp.exp(le_all - m_all) / l_all, 0.0)
            if use_dmask or drop_keep24:
                # out = Σ D·α·v, so β = ⟨g, out⟩ already carries D;
                # dlogit = α (D·⟨g,v⟩ − β) and the CSC dWh pass needs
                # the dropped coefficients α·D.
                d_all = (
                    _inkernel_drop_scale(
                        snd_all[sub][None, :], relv + 128 * b, heads,
                        seed_ref[0].astype(jnp.uint32), drop_keep24,
                        inv_keep,
                    )
                    if drop_keep24 else dmask_scr[slot][:, sub, :]
                )                                         # [H, 128e]
                if emit_alpha:
                    al_scr[slot, :, pl.ds(sub, 1), :] = (
                        (alpha * d_all)[:, None, :]
                    )
                dl_scr[slot, :, pl.ds(sub, 1), :] = (
                    (alpha * (d_all * dots - be_all))[:, None, :]
                )
            else:
                if emit_alpha:
                    al_scr[slot, :, pl.ds(sub, 1), :] = alpha[:, None, :]
                dl_scr[slot, :, pl.ds(sub, 1), :] = (
                    (alpha * (dots - be_all))[:, None, :]
                )

        # First chunk may overlap the predecessor block's range: keep its
        # rows for edges < p0 (ours are zero there), overwrite the rest.
        @pl.when(k == 0)
        def _():
            pltpu.make_async_copy(
                dl_hbm.at[:, pl.ds(base // 128, SUBS), :], old_dl,
                old_sems.at[0],
            ).wait()
            if emit_alpha:
                pltpu.make_async_copy(
                    al_hbm.at[:, pl.ds(base // 128, SUBS), :], old_al,
                    old_sems.at[1],
                ).wait()
            srow = jax.lax.broadcasted_iota(jnp.int32, (SUBS, 128), 0)
            slane = jax.lax.broadcasted_iota(jnp.int32, (SUBS, 128), 1)
            keep_old = (base + srow * 128 + slane < p0)[None]  # [1,SUBS,128]
            dl_scr[slot] = jnp.where(keep_old, old_dl[:], dl_scr[slot])
            if emit_alpha:
                al_scr[slot] = jnp.where(keep_old, old_al[:], al_scr[slot])

        start = base + k * chunk
        wdl = pltpu.make_async_copy(
            dl_scr.at[slot], dl_hbm.at[:, pl.ds(start // 128, SUBS), :],
            out_sems.at[0],
        )
        wdl.start()
        if emit_alpha:
            wal = pltpu.make_async_copy(
                al_scr.at[slot], al_hbm.at[:, pl.ds(start // 128, SUBS), :],
                out_sems.at[1],
            )
            wal.start()
        # Wait before the next chunk reuses this slot's scratch (and so the
        # successor block's overlap read observes our write).
        wdl.wait()
        if emit_alpha:
            wal.wait()
        return 0

    jax.lax.fori_loop(jnp.int32(0), n_chunks, body, 0)


def _gat_bwd_call(
    csr: PallasCSR, logits3d, vals, dmask3d, g_blk, mlb_blk, heads, featp,
    true_feat, packed, *, interpret, drop=None, emit_alpha=True,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from graph_odenet_tpu.ops import dropmask as _dm

    nb = csr.n_blocks
    n_val = 1 if packed else heads
    g_lanes = g_blk.shape[1]
    e_rows = csr.senders.shape[0] // 128
    use_dmask = dmask3d is not None
    if not use_dmask:
        dmask3d = jnp.zeros((heads, 1, 128), jnp.float32)
    if drop is None:
        seed_arr = jnp.zeros((1,), jnp.int32)
        drop_keep24, inv_keep = 0, 1.0
    else:
        seed, rate = drop
        seed_arr = jnp.asarray(seed, jnp.uint32).astype(jnp.int32)[None]
        drop_keep24, inv_keep = _dm.keep24(rate), 1.0 / (1.0 - rate)
    meta = jnp.stack([csr.rel, csr.senders.reshape(-1, 128)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (BLOCK_ROWS, g_lanes), lambda b, *_: (b, 0),
                memory_space=pltpu.VMEM,
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
            pltpu.VMEM((2, 2, SUBS, 128), jnp.int32),
            pltpu.VMEM(
                (2, heads, SUBS, 128) if use_dmask else (2, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.VMEM((2, heads, SUBS, 128), jnp.float32),
            pltpu.VMEM(
                (2, heads, SUBS, 128) if emit_alpha else (2, 1, 1, 128),
                jnp.float32,
            ),
            pltpu.VMEM((heads, SUBS, 128), jnp.float32),
            pltpu.VMEM(
                (heads, SUBS, 128) if emit_alpha else (1, 1, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2, 2 + n_val + (1 if use_dmask else 0))),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(
            _gat_bwd_kernel, heads=heads, featp=featp, true_feat=true_feat,
            packed=packed, use_dmask=use_dmask, drop_keep24=drop_keep24,
            inv_keep=inv_keep, emit_alpha=emit_alpha,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((heads, e_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct(
                (heads, e_rows, 128) if emit_alpha else (heads, 1, 128),
                jnp.float32,
            ),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(csr.blk_ptr, seed_arr, logits3d, vals, meta, dmask3d, g_blk, mlb_blk)


def _use_recompute(heads, feat, scores_ml, with_dropout=False):
    """The recompute-α CSC path applies whenever the caller supplied the
    decomposed score tables and the value plane fits one 128-lane tile:
    side values (s_dst/m/l + receiver id under dropout) ride spare lanes
    of the same gather when there is room, or a second 128-lane gather
    plane when H·F fills the tile (e.g. the H=1/F=128 shape — round-3
    VERDICT #2's lane-oriented design)."""
    del with_dropout  # the wide plane removes the lane-budget constraint
    return (
        scores_ml is not None
        and heads * feat <= 128
        and os.environ.get("GODE_GAT_DWH", "auto").lower() != "permute"
    )


def _dwh_csc_recompute(csr, g, heads, feat, scores_ml, dropout=None):
    """dWh via the recompute-α CSC kernel — NO [E, H] edge permute: s_dst,
    m, l ride the g[recv] wide gather (spare lanes of the same table, or a
    second 128-lane gather plane when H·F fills the tile) and s_src is
    sender-block-local (see pallas_spmm._segment_reduce_recompute).
    Exact for the decomposed GAT scores ``LeakyReLU(s_src[s] + s_dst[r])``
    the reference's layers use (SURVEY.md §3.3).  ``dropout=(seed, rate)``
    additionally regenerates the counter-based attention-dropout scale
    in-kernel (ops.dropmask) — the receiver id rides as one more lane, so
    training with the reference's attn dropout keeps this path."""
    from graph_odenet_tpu.ops.pallas_spmm import _split3_spmm

    s_src, s_dst, m, l, slope = scores_ml
    hf = heads * feat
    n = csr.n_node_pad
    nb_rows = csr.n_blocks * BLOCK_ROWS
    extra = 1 if dropout is not None else 0
    wide = hf + 3 * heads + extra > 128
    # (Round-4 note: an interleaved-g + lane-roll-doubling α expansion was
    # tried and measured SLOWER than the 3-pass MXU expand — cross-lane
    # rotates of [128, 128] tiles go through the shuffle unit and cost
    # more than the mantissa-split passes they replace.)
    inter = False
    g2d = g.reshape(g.shape[0], hf)

    side_cols = [s_dst.astype(jnp.float32), m, l]
    if dropout is not None:
        # Receiver-id lane (f32-exact for N < 2^24): the in-kernel hash
        # keys on (sender, receiver, head) — ops.dropmask.
        side_cols.append(jnp.arange(g.shape[0], dtype=jnp.float32)[:, None])
    if wide:
        # Two 128-lane-row gathers: XLA's fast full-row gather form stops
        # at 128 lanes (a 256-lane take measured 4.8× slower than two
        # 128-lane takes at arxiv scale).
        gtab = jnp.pad(g2d, ((0, 0), (0, 128 - hf)))
        side_tab = jnp.pad(
            jnp.concatenate(side_cols, axis=1),
            ((0, 0), (0, 128 - 3 * heads - extra)),
        )
        msgs = jnp.take(gtab, csr.t_receivers, axis=0)       # [E_pad, 128]
        side = jnp.take(side_tab, csr.t_receivers, axis=0)   # [E_pad, 128]
    else:
        table = jnp.pad(
            jnp.concatenate([g2d] + side_cols, axis=1),
            ((0, 0), (0, 128 - hf - 3 * heads - extra)),
        )                                                    # [N, 128]
        msgs = jnp.take(table, csr.t_receivers, axis=0)      # [E_pad, 128]
        side = None

    # Pre-split s_src mantissa parts into lane groups [H·p, H·(p+1)) so the
    # kernel's expansion is ONE exact bf16 pass instead of 3 split passes.
    src_parts = _n_parts() if heads * _n_parts() <= 128 else 1
    if src_parts > 1:
        src_packed = jnp.concatenate(
            _split3_spmm(s_src.astype(jnp.float32), src_parts), axis=1
        )                                                    # [N, H·P]
    else:
        src_packed = s_src.astype(jnp.float32)
    src_blk = jnp.pad(
        src_packed,
        ((0, nb_rows - src_packed.shape[0]),
         (0, 128 - src_packed.shape[1])),
    )
    out = _segment_reduce_recompute(
        msgs, src_blk, csr.t_rel, csr.t_blk_ptr, csr.n_blocks,
        heads, feat, slope, dropout=dropout, side=side,
        src_parts=src_parts, interleaved=inter, interpret=not _is_tpu(),
    )
    if inter:
        return _unpack_interleaved(out[:n, :hf], heads, feat)
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
    covers training too), else the weighted reduce over the permuted α.

    ``res`` carries the forward's own kernel input layouts (logits3d,
    vals) so the backward pays no _to3d relayout and no sender re-gather;
    g/mlb are mantissa-pre-split XLA-side (``_split3``) so the kernel's
    one-hot contractions run at one exact bf16 pass per operand."""
    logits, wh, out, m, l, logits3d, vals = res
    e_orig = logits.shape[0]
    e_pad = csr.senders.shape[0]
    heads, feat = wh.shape[-2], wh.shape[-1]
    packed = heads * feat <= 128
    featp = 128 if packed else -(-feat // 128) * 128
    n = csr.n_node_pad
    nb_rows = csr.n_blocks * BLOCK_ROWS
    g = g.astype(jnp.float32)

    # Explicit [E, H] mask mode (test injection) streams the mask plane;
    # training dropout (``drop``) is regenerated in-kernel instead.
    dmask3d = (
        None if (dmask is None or drop is not None) else _to3d(dmask, e_pad)
    )

    def pad_rows(a):
        return jnp.pad(a, ((0, nb_rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

    if packed:
        # Interleaved lanes (f·H + h) — must match the vals plane layout.
        g2d = _pack_interleaved(g)
        live = heads * feat
    else:
        g2d = jnp.pad(g, ((0, 0), (0, 0), (0, featp - feat))).reshape(
            n, heads * featp
        )
        live = heads * featp
    n_parts, per_op, n_ops = _g_packing(live)
    if n_ops == 0:
        # Multi-tile plane (live > 128): unsplit, in-kernel _mask_dot.
        g_blk = pad_rows(g2d)
    else:
        g_parts = _split3(g2d, n_parts)
        ops = []
        for k in range(n_ops):
            chunk = g_parts[k * per_op : (k + 1) * per_op]
            opk = jnp.concatenate(chunk, axis=1)
            ops.append(jnp.pad(opk, ((0, 0), (0, 128 - opk.shape[1]))))
        g_blk = pad_rows(jnp.concatenate(ops, axis=1))  # [nb_rows, n_ops·128]

    beta = jnp.sum(g * out.astype(jnp.float32), axis=-1)         # [N_pad, H]
    mlb = jnp.concatenate([m, l, beta], axis=1)                  # [N_pad, 3H]
    mlb_parts = _n_parts() if 3 * heads * _n_parts() <= 128 else 1
    if mlb_parts > 1:
        mlb = jnp.concatenate(_split3(mlb, mlb_parts), axis=1)
    mlb_blk = pad_rows(
        jnp.pad(mlb, ((0, 0), (0, 128 - mlb.shape[1])))
    )

    scores_ml = (
        None if (scores is None or (dmask is not None and drop is None))
        else (scores[0], scores[1], m, l, scores[2])
    )
    use_rec = _use_recompute(
        heads, feat, scores_ml, with_dropout=drop is not None
    )
    dl3, al3 = _gat_bwd_call(
        csr, logits3d, vals, dmask3d, g_blk, mlb_blk, heads, featp, feat,
        packed, interpret=not _is_tpu(), drop=drop, emit_alpha=not use_rec,
    )
    dlogits = dl3.reshape(heads, e_pad).T[:e_orig]
    if use_rec:
        dwh = _dwh_csc_recompute(csr, g, heads, feat, scores_ml, dropout=drop)
    else:
        alpha = al3.reshape(heads, e_pad).T         # [E_pad, H] (α·D if drop)
        dwh = _dwh_csc(csr, alpha, g, heads, feat)
    return dlogits.astype(logits.dtype), dwh.astype(wh.dtype)


def _gat_fwd(csr, logits, wh):
    out, m, l, logits3d, vals = _fwd_impl(csr, logits, wh)
    return out, (logits, wh, out, m, l, logits3d, vals)


def _bwd_xla(csr, res, g, dmask=None, scores=None, drop=None):
    """Gather-based backward fallback: α from the saved softmax statistics
    and the per-edge dots via [E, H·F] XLA gathers — the costs the fused
    kernel's one-hot MXU contractions avoid."""
    logits, wh, out, m, l, _logits3d, _vals = res
    e_orig = logits.shape[0]
    e_pad = csr.senders.shape[0]
    heads, feat = wh.shape[-2], wh.shape[-1]
    g = g.astype(jnp.float32)
    if dmask is None and drop is not None:
        # The fused path regenerates the mask in-kernel; this fallback
        # needs it materialised.
        from graph_odenet_tpu.ops import dropmask as _dm

        seed, rate = drop
        dmask = _dm.attention_dropout_scale(
            seed, csr.senders, csr.receivers, heads, rate
        )
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
    out, *_ = _fwd_impl(csr, logits, wh)
    return out


def _gat_scores_fwd(csr, slope, logits, wh, s_src, s_dst):
    out, m, l, logits3d, vals = _fwd_impl(csr, logits, wh)
    return out, (logits, wh, out, m, l, logits3d, vals, s_src, s_dst)


def _gat_scores_bwd(csr, slope, res, g):
    *res5, s_src, s_dst = res
    fn = _bwd_fused if _use_fused() else _bwd_xla
    dlogits, dwh = fn(csr, tuple(res5), g, scores=(s_src, s_dst, slope))
    return dlogits, dwh, jnp.zeros_like(s_src), jnp.zeros_like(s_dst)


gat_aggregate_pallas_scores.defvjp(_gat_scores_fwd, _gat_scores_bwd)


def _gat_drop_fwd(csr, logits, wh, dmask):
    out, m, l, logits3d, vals = _fwd_impl(csr, logits, wh, dmask)
    return out, (logits, wh, out, m, l, logits3d, vals, dmask)


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
    out, *_ = _fwd_impl(csr, logits, wh, drop=(seed, rate))
    return out


def _gat_sd_fwd(csr, slope, rate, logits, wh, s_src, s_dst, seed):
    # The forward kernel regenerates the counter mask in-kernel too — no
    # [E, H] mask materialisation, no _to3d relayout, no mask DMA plane.
    out, m, l, logits3d, vals = _fwd_impl(csr, logits, wh, drop=(seed, rate))
    return out, (logits, wh, out, m, l, logits3d, vals, s_src, s_dst, seed)


def _gat_sd_bwd(csr, slope, rate, res, g):
    import numpy as np

    *res7, s_src, s_dst, seed = res
    # No XLA-side mask here: the fused dlogits kernel AND the recompute dWh
    # kernel both regenerate the counter-based mask from the seed in-kernel
    # (the _bwd_xla fallback materialises it itself from ``drop``).
    fn = _bwd_fused if _use_fused() else _bwd_xla
    dlogits, dwh = fn(
        csr, tuple(res7), g, None,
        scores=(s_src, s_dst, slope), drop=(seed, rate),
    )
    zero_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return (
        dlogits, dwh, jnp.zeros_like(s_src), jnp.zeros_like(s_dst), zero_seed
    )


gat_aggregate_pallas_scores_dropout.defvjp(_gat_sd_fwd, _gat_sd_bwd)
