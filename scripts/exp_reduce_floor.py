"""Bisect the segment-reduce floor: DMA-only vs +mask vs +dot variants.

  F0  DMA msgs only, VPU touch (no rel DMA, no mask, no dot)
  F1  F0 + rel DMA
  F2  F1 + wide mask build + 1-pass K=1024 dot   (== exp_wide_reduce R3)
All share the current per-receiver-block grid (2679 chunk iterations at
arxiv scale; minimum would be 1357).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.experimental.pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from graph_odenet_tpu.bench import powerlaw_graph  # noqa: E402
from graph_odenet_tpu.ops.pallas_spmm import (  # noqa: E402
    prepare, BLOCK_ROWS, E_CHUNK,
)


def t(fn, *a, iters=10):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def _kernel(
    blk_ptr_ref, msgs_hbm, relw_hbm, out_ref, msg_scratch, rel_scratch, sems,
    *, level: int,
):
    b = pl.program_id(0)
    p0 = blk_ptr_ref[b]
    p1 = blk_ptr_ref[b + 1]
    chunk = jnp.int32(E_CHUNK)
    base = (p0 // chunk) * chunk
    n_chunks = pl.cdiv(p1 - base, chunk)

    def issue(k, slot):
        start = base + k * chunk
        c = start // chunk
        copies = [
            pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(start, E_CHUNK), :],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
        ]
        if level >= 1:
            copies.append(
                pltpu.make_async_copy(
                    relw_hbm.at[pl.ds((c // 8) * 8, 8), :],
                    rel_scratch.at[slot],
                    sems.at[slot, 1],
                )
            )
        return copies

    @pl.when(n_chunks > 0)
    def _():
        for cp in issue(0, 0):
            cp.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, E_CHUNK), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, E_CHUNK), 1)

    def body(k, acc):
        k = jnp.int32(k)
        slot = jax.lax.rem(k, jnp.int32(2))
        nxt = jax.lax.rem(k + 1, jnp.int32(2))

        @pl.when(k + 1 < n_chunks)
        def _():
            for cp in issue(k + 1, nxt):
                cp.start()

        for cp in issue(k, slot):
            cp.wait()

        if level < 2:
            return acc + msg_scratch[slot, 0:BLOCK_ROWS, :]
        c = base // chunk + k
        rel_row = rel_scratch[slot, pl.ds(jax.lax.rem(c, jnp.int32(8)), 1), :]
        e_idx = lane + c * chunk
        mask = (rows == rel_row) & (e_idx >= p0) & (e_idx < p1)
        oh = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            oh, msg_scratch[slot].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((BLOCK_ROWS, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, acc)
    out_ref[:] = acc


def run(msgs, relw, blk_ptr, n_blocks, level):
    f = msgs.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, f), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E_CHUNK, f), msgs.dtype),
            pltpu.VMEM((2, 8, E_CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel, level=level),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, f), msgs.dtype),
        grid_spec=grid_spec,
    )(blk_ptr, msgs, relw)


def main():
    n_nodes, n_edges, feat = 169_343, 1_166_243, 128
    g = powerlaw_graph(n_nodes, n_edges)
    csr = prepare(g)
    E = csr.senders.shape[0]
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.standard_normal((E, feat)), jnp.float32)

    rel_np = np.asarray(csr.rel).reshape(-1)
    C = E // E_CHUNK
    C8 = -(-C // 8) * 8
    relw = np.full((C8, E_CHUNK), -1, np.int32)
    relw[:C] = rel_np.reshape(C, E_CHUNK)
    relw = jnp.asarray(relw)

    tot_gb = 2679 * E_CHUNK * feat * 4 / 1e9
    for level, name in [(0, "DMA msgs only"), (1, "+rel DMA"),
                        (2, "+mask+1p dot")]:
        fn = jax.jit(lambda m, lv=level: run(m, relw, csr.blk_ptr,
                                             csr.n_blocks, lv))
        ms = t(fn, msgs)
        print(f"F{level} {name:14s} {ms:7.3f} ms  "
              f"({tot_gb/ms*1e3:5.0f} GB/s of actually-DMAd msg bytes)")


if __name__ == "__main__":
    main()
