"""Round-3 experiment: wide-K one-hot segment reduce with a lane-major rel.

Round 2's GODE_SPMM_WIDE=1 built the [128, E_CHUNK] mask by concatenating 8
per-sub [128, 128] masks (a sublane->lane relayout) and measured SLOWER.
Here rel is PRE-STORED lane-major ([E_pad/E_CHUNK, E_CHUNK] padded to
8-row DMA groups), so the wide mask is one direct compare and each chunk
issues ONE K=1024 dot per mantissa pass instead of 8 K=128 dots.

Variants (same process, same data):
  R0  current kernel (8 x K=128 per pass)
  R1  wide-rel kernel, 3-pass (f32-exact "highest")
  R2  wide-rel kernel, 2-pass ("bf16x2")
  R3  wide-rel kernel, 1-pass (bf16 "default")
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
    _segment_reduce, prepare, BLOCK_ROWS, E_CHUNK,
)


def t(fn, *a, iters=10):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def _wide_kernel(
    blk_ptr_ref, msgs_hbm, relw_hbm, out_ref, msg_scratch, rel_scratch, sems,
    *, passes: int,
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
        return [
            pltpu.make_async_copy(
                msgs_hbm.at[pl.ds(start, E_CHUNK), :],
                msg_scratch.at[slot],
                sems.at[slot, 0],
            ),
            # 8-aligned group of chunk rows (32 KB; ~6% of the msgs bytes).
            pltpu.make_async_copy(
                relw_hbm.at[pl.ds((c // 8) * 8, 8), :],
                rel_scratch.at[slot],
                sems.at[slot, 1],
            ),
        ]

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

        c = base // chunk + k
        rel_row = rel_scratch[slot, pl.ds(jax.lax.rem(c, jnp.int32(8)), 1), :]
        e_idx = lane + c * chunk
        mask = (rows == rel_row) & (e_idx >= p0) & (e_idx < p1)
        oh = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
        m = msg_scratch[slot]
        dn = (((1,), (0,)), ((), ()))
        hi = m.astype(jnp.bfloat16)
        parts = [hi]
        if passes >= 2:
            r1 = m - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            parts.append(mid)
            if passes >= 3:
                parts.append((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
        for p in parts:
            acc = acc + jax.lax.dot_general(
                oh, p, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jnp.zeros((BLOCK_ROWS, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(jnp.int32(0), n_chunks, body, acc)
    out_ref[:] = acc


def wide_reduce(msgs, relw, blk_ptr, n_blocks, passes):
    f = msgs.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
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
        partial(_wide_kernel, passes=passes),
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

    # Lane-major rel, padded to 8-row groups.
    rel_np = np.asarray(csr.rel).reshape(-1)          # [E_pad]
    C = E // E_CHUNK
    C8 = -(-C // 8) * 8
    relw = np.full((C8, E_CHUNK), -1, np.int32)
    relw[:C] = rel_np.reshape(C, E_CHUNK)
    relw = jnp.asarray(relw)

    ref = jax.jit(
        lambda m: _segment_reduce(m, csr.rel, csr.blk_ptr, csr.n_blocks)
    )
    out_ref = ref(msgs)
    ms = t(ref, msgs)
    print(f"R0 current (mode from env)    {ms:7.3f} ms")

    for passes, name in [(3, "highest"), (2, "bf16x2"), (1, "default")]:
        fn = jax.jit(
            lambda m, p=passes: wide_reduce(m, relw, csr.blk_ptr,
                                            csr.n_blocks, p)
        )
        out = fn(msgs)
        if passes == 3:
            err = float(jnp.max(jnp.abs(out - out_ref)) /
                        (jnp.max(jnp.abs(out_ref)) + 1e-30))
            print(f"   wide-3pass vs current max rel err: {err:.2e}")
        ms = t(fn, msgs)
        print(f"R{4-passes} wide-rel {name:8s} ({passes}p) {ms:7.3f} ms")


if __name__ == "__main__":
    main()
