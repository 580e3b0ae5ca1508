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
backward can reconstruct α with gathers only (no segment_max/scatter):

    α     = exp(logit − m[recv]) / l[recv]
    β[r]  = Σ_f g[r]·out[r]                  (the softmax Jacobian term)
    dlogit= α · (⟨g[recv], v⟩ − β[recv])
    dWh   = Âᵀ-style segment reduction of α·g[recv]   (pallas_spmm kernel)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from graph_odenet_tpu.ops.pallas_spmm import (
    BLOCK_ROWS,
    E_CHUNK,
    SUBS,
    _PRECISION,
    PallasCSR,
    _is_tpu,
    _segment_reduce,
)

__all__ = ["gat_aggregate_pallas"]

_NEG = -1e30  # python float: jnp scalars would be captured consts in-kernel


def _gat_kernel(
    blk_ptr_ref,        # scalar prefetch: i32[NB+1] in SMEM
    logits_hbm,         # f32 ANY/HBM [H, E_pad/128, 128]
    vals_hbm,           # f32 ANY/HBM [HV, E_pad, Fp]  (HV=1 when packed)
    rel_hbm,            # i32 ANY/HBM [E_pad/128, 128]
    out_ref,            # VMEM [BLOCK_ROWS, HV*... = packed? 128 : H*Fp]
    m_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    l_ref,              # VMEM [BLOCK_ROWS, 128]  (first H lanes live)
    logit_scratch,      # VMEM [2, H, SUBS, 128]
    val_scratch,        # VMEM [2, HV, E_CHUNK, Fp]
    rel_scratch,        # VMEM [2, SUBS, 128]
    sems,               # DMA sems [2, H + HV + 1]
    *,
    heads: int,
    feat: int,          # Fp (lane-padded per-head width; 128 when packed)
    true_feat: int,     # logical per-head F (lane stride in packed mode)
    packed: bool,       # all heads share one 128-lane value plane
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
                    headmask = (
                        (lane >= h * true_feat) & (lane < (h + 1) * true_feat)
                    ).astype(jnp.float32)                        # [1, 128]
                    pv = jax.lax.dot_general(
                        p, v_sub,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION,
                    )                                            # [R, 128]
                    acc_scale = acc_scale + scale * headmask
                    pv_sum = pv_sum + pv * headmask
                accs[0] = accs[0] * acc_scale + pv_sum
            else:
                for h in range(heads):
                    le = logit_scratch[slot, h][sub][None, :]
                    p, scale, ms[h], ls[h] = head_stats(mask, le, ms[h], ls[h])
                    v_sub = val_scratch[slot, h, pl.ds(sub * 128, 128), :]
                    accs[h] = accs[h] * scale + jax.lax.dot_general(
                        p, v_sub,                                # [R, Fp]
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_PRECISION,
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


def _gat_call(
    csr: PallasCSR, logits3d, vals3d, heads, featp, true_feat, packed,
    *, interpret,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = csr.n_blocks
    n_val = 1 if packed else heads
    hf = 128 if packed else heads * featp
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
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
            pltpu.SemaphoreType.DMA((2, heads + n_val + 1)),
        ],
    )
    return pl.pallas_call(
        partial(
            _gat_kernel, heads=heads, feat=featp, true_feat=true_feat,
            packed=packed,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, hf), jnp.float32),
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb * BLOCK_ROWS, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(csr.blk_ptr, logits3d, vals3d, csr.rel)


def _fwd_impl(csr: PallasCSR, logits: jax.Array, wh: jax.Array):
    """logits: [E, H] (Graph edge order, any 128-multiple ≥ n_edge);
    wh: [N_pad, H, F]."""
    e_pad = csr.senders.shape[0]  # prepare() pads edges to E_CHUNK multiples
    heads = logits.shape[1]
    feat = wh.shape[-1]
    packed = heads * feat <= 128  # all heads share one 128-lane value plane
    logits3d = (
        jnp.pad(
            logits.astype(jnp.float32), ((0, e_pad - logits.shape[0]), (0, 0))
        )
        .T.reshape(heads, e_pad // 128, 128)
    )
    gathered = jnp.take(wh.astype(jnp.float32), csr.senders, axis=0)
    if packed:
        featp = 128
        vals = jnp.pad(
            gathered.reshape(e_pad, heads * feat),
            ((0, 0), (0, 128 - heads * feat)),
        )[None]                                               # [1, E_pad, 128]
    else:
        featp = -(-feat // 128) * 128  # lane-pad per-head features
        vals = jnp.pad(
            gathered, ((0, 0), (0, 0), (0, featp - feat))
        ).transpose(1, 0, 2)                                  # [H, E_pad, Fp]
    out, m, l = _gat_call(
        csr, logits3d, vals, heads, featp, feat, packed,
        interpret=not _is_tpu(),
    )
    n = csr.n_node_pad
    if packed:
        out = out[:n, : heads * feat].reshape(n, heads, feat)
    else:
        out = out.reshape(out.shape[0], heads, featp)[:n, :, :feat]
    return out, m[:n, :heads], l[:n, :heads]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def gat_aggregate_pallas(
    csr: PallasCSR, logits: jax.Array, wh: jax.Array
) -> jax.Array:
    """Fused masked-softmax attention aggregation over incoming edges.

    Equivalent to ``ops.sddmm.attention_aggregate(g, logits, wh)`` (minus
    attention dropout, which the trainers only use on the segment path).

    Args:
      csr:    prepared ``PallasCSR`` tiling of the graph.
      logits: ``[E_pad, H]`` per-edge attention logits in Graph edge order.
      wh:     ``[N_pad, H, F]`` per-head node values.

    Returns ``[N_pad, H, F]``.
    """
    out, _, _ = _fwd_impl(csr, logits, wh)
    return out


def _gat_fwd(csr, logits, wh):
    out, m, l = _fwd_impl(csr, logits, wh)
    return out, (logits, wh, out, m, l)


def _gat_bwd(csr, res, g):
    logits, wh, out, m, l = res
    e_orig = logits.shape[0]
    heads, feat = wh.shape[-2], wh.shape[-1]
    g = g.astype(jnp.float32)
    emask = csr.edge_mask()[:, None]                             # [E_pad, 1]
    logits_p = jnp.pad(
        logits.astype(jnp.float32),
        ((0, csr.senders.shape[0] - e_orig), (0, 0)),
    )

    # α from the saved softmax statistics — gathers only, no segment ops.
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
    dlogits = alpha * (dot - jnp.take(beta, csr.receivers, axis=0))
    dlogits = jnp.where(emask, dlogits, 0.0)[:e_orig]

    # dWh[s] = Σ_{e: sender=s} α_e g[recv_e] — the Âᵀ segment reduction on
    # the CSC view.  Build the messages directly in CSC order: permute only
    # the [E, H] α (t_perm) and gather g rows by t_receivers — avoids
    # permuting a full [E, H·F] array (the dominant bwd HBM cost).
    alpha_csc = jnp.take(alpha, csr.t_perm, axis=0)              # [E_pad, H]
    gv_csc = jnp.take(g, csr.t_receivers, axis=0)                # [E_pad,H,F]
    msgs_csc = (alpha_csc[..., None] * gv_csc).reshape(
        alpha.shape[0], heads * feat
    )
    dwh = _segment_reduce(
        msgs_csc, csr.t_rel, csr.t_blk_ptr, csr.n_blocks,
        interpret=not _is_tpu(),
    )[: csr.n_node_pad].reshape(csr.n_node_pad, heads, feat)

    return dlogits.astype(logits.dtype), dwh.astype(wh.dtype)


gat_aggregate_pallas.defvjp(_gat_fwd, _gat_bwd)
