"""Round-3 experiment: schedule-driven segment reduce.

Replaces the per-receiver-block grid (per-block DMA pipeline bubbles +
1024-aligned window waste: 2679 chunk iterations, 1.40 GB DMA for a 0.71 GB
payload at arxiv scale) with a host-precomputed global window schedule:

  * grid = (n_windows,), one 128-aligned E_CHUNK window per step;
  * out BlockSpec index_map reads the window's receiver block from a
    scalar-prefetched array -> revisit-accumulate in VMEM, flush on change;
  * each step issues step i+1's DMA before waiting on its own -> the DMA
    pipeline crosses grid steps (ONE warmup bubble total);
  * rel is viewed [C+1, 8, 128] so leading-dim slices land on any
    128-aligned start without sublane-alignment constraints.

Variants: S1 = schedule kernel 3-pass, S2 = 2-pass, S3 = 1-pass.
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
    _segment_reduce, prepare, BLOCK_ROWS,
)

E_CHUNK = int(os.environ.get("EC", 1024))
SUBS = E_CHUNK // 128


def t(fn, *a, iters=10):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def build_schedule(blk_ptr, e_pad):
    """(sched_blk, sched_orig) int32 arrays: one entry per 128-aligned
    E_CHUNK window per receiver block (empty blocks get one masked entry)."""
    ptr = np.asarray(blk_ptr).astype(np.int64)
    blks, origs = [], []
    for b in range(len(ptr) - 1):
        p0, p1 = ptr[b], ptr[b + 1]
        s0 = p0 // 128 * 128
        n = max(1, -(-(p1 - s0) // E_CHUNK))
        for k in range(n):
            blks.append(b)
            origs.append(s0 + k * E_CHUNK)
    return (np.asarray(blks, np.int32), np.asarray(origs, np.int32))


def _sched_kernel(
    sblk_ref, sorig_ref, ptr_ref,   # scalar prefetch
    msgs_hbm, rel3_hbm,             # ANY/HBM
    out_ref,                        # VMEM [BLOCK_ROWS, F], revisit-accum
    msg_scratch, rel_scratch, sems,
    *, passes: int, n_windows: int,
):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, jnp.int32(2))

    def issue(j, s):
        orig = sorig_ref[j]
        dma = jnp.minimum(orig, jnp.int32(msgs_hbm.shape[0] - E_CHUNK))
        c0 = dma // jnp.int32(E_CHUNK)
        return [
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
    dma = jnp.minimum(orig, jnp.int32(msgs_hbm.shape[0] - E_CHUNK))
    c0 = dma // jnp.int32(E_CHUNK)
    p0 = ptr_ref[b]
    p1 = ptr_ref[b + 1]
    lo = jnp.maximum(p0, orig)
    hi = jnp.minimum(p1, orig + jnp.int32(E_CHUNK))
    first = orig == (p0 // 128 * 128)

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dn = (((1,), (0,)), ((), ()))

    acc = jnp.where(first, 0.0, out_ref[:])
    for sub in range(SUBS):
        e0 = dma + sub * 128
        e_idx = lane + e0
        valid = (e_idx >= lo) & (e_idx < hi)
        r = e0 // 128 - c0 * SUBS          # rel row within the 2-chunk slice
        rel_row = rel_scratch[slot, r // SUBS, pl.ds(jax.lax.rem(r, jnp.int32(SUBS)), 1), :]
        mask = (rows == rel_row) & valid
        oh = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
        m = msg_scratch[slot, pl.ds(sub * 128, 128), :]
        hi16 = m.astype(jnp.bfloat16)
        parts = [hi16]
        if passes >= 2:
            r1 = m - hi16.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            parts.append(mid)
            if passes >= 3:
                parts.append((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
        for p in parts:
            acc = acc + jax.lax.dot_general(
                oh, p, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc


def sched_reduce(msgs, rel3, blk_ptr, sblk, sorig, n_blocks, passes):
    f = msgs.shape[1]
    n_windows = sblk.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_windows,),
        in_specs=[
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
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        partial(_sched_kernel, passes=passes, n_windows=n_windows),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, f), msgs.dtype),
        grid_spec=grid_spec,
    )(sblk, sorig, blk_ptr, msgs, rel3)


def main():
    n_nodes, n_edges, feat = 169_343, 1_166_243, 128
    g = powerlaw_graph(n_nodes, n_edges)
    csr = prepare(g)
    E = csr.senders.shape[0]
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(rng.standard_normal((E, feat)), jnp.float32)

    C = -(-E // E_CHUNK)
    pad_rows = (C + 1) * SUBS - E // 128
    rel3 = jnp.asarray(
        np.concatenate(
            [np.asarray(csr.rel), np.zeros((pad_rows, 128), np.int32)]
        ).reshape(C + 1, SUBS, 128)
    )
    sblk, sorig = build_schedule(csr.blk_ptr, E)
    print(f"windows: {len(sblk)} (min {C}); "
          f"DMA {len(sblk) * E_CHUNK * feat * 4 / 1e6:.0f} MB "
          f"vs payload {E * feat * 4 / 1e6:.0f} MB")
    sblk, sorig = jnp.asarray(sblk), jnp.asarray(sorig)

    ref = jax.jit(
        lambda m: _segment_reduce(m, csr.rel, csr.blk_ptr, csr.n_blocks)
    )
    out_ref = ref(msgs)
    ms = t(ref, msgs)
    print(f"R0 current (env mode)       {ms:7.3f} ms")

    for passes, name in [(3, "highest"), (2, "bf16x2"), (1, "default")]:
        fn = jax.jit(
            lambda m, p=passes: sched_reduce(
                m, rel3, csr.blk_ptr, sblk, sorig, csr.n_blocks, p)
        )
        out = fn(msgs)
        if passes == 3:
            err = float(jnp.max(jnp.abs(out - out_ref)) /
                        (jnp.max(jnp.abs(out_ref)) + 1e-30))
            print(f"   sched-3pass vs current max rel err: {err:.2e}")
        ms = t(fn, msgs)
        print(f"S{passes} sched {name:8s} ({passes}p)  {ms:7.3f} ms")


if __name__ == "__main__":
    main()
