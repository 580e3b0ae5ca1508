"""Edge partitioning for multi-device graph aggregation (SURVEY.md §7 hard
part 3).

Strategy (BASELINE-mandated): partition edges by **receiver block** so each
device owns a contiguous slice of output rows — the SpMM write side is then
purely local and the only communication is reading remote *source* features
(the halo).  Edges are further bucketed by **sender block**, every bucket
padded to one static size, so the ring-overlap kernel can consume exactly
the feature chunk that just arrived at each ppermute step with fully static
shapes.

Host-side numpy preprocessing, one-time per graph; outputs are stacked
static-shape arrays ``[P, P, E_bucket]`` ready for ``shard_map``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graph_odenet_tpu.graph import Graph

__all__ = ["PartitionedGraph", "partition_by_receiver"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Edges grouped by (receiver block, sender block), equal-size buckets.

    For P partitions with node-block size B = n_node_pad / P, bucket
    ``[p, b]`` holds the edges received by block p whose sender lies in
    block b:

      senders_rel:   i32[P, P, E_b]  sender − b·B   (index into block b's
                                     feature chunk; padding slots → 0)
      receivers_rel: i32[P, P, E_b]  receiver − p·B (local output row)
      weight:        f32[P, P, E_b]  0 on padding slots.

    Buckets are sorted by local receiver, so each also carries the Pallas
    CSR-tile metadata for the in-shard MXU segment-reduction kernel
    (``halo.spmm_sharded(mode="ring_pallas")``):

      tile_rel:     i32[P, P, E_b/128, 128]  receiver − tile·BLOCK_ROWS
      tile_blk_ptr: i32[P, P, NB+1]          edge span per 128-row tile

    Each bucket also carries a **transpose (CSC) view** — the same edges
    sorted by local *sender* — so the training-step backward can reduce the
    gather cotangent ``dchunk[s] = Σ_{e: s_e=s} w_e·g[r_e]`` with the same
    sorted segment kernel instead of an XLA scatter-add (the scatter was
    ~50% of config-4 step time before this existed):

      t_senders_rel:   i32[P, P, E_b]  sender − b·B, CSC edge order
      t_receivers_rel: i32[P, P, E_b]  receiver − p·B, CSC edge order
      t_weight:        f32[P, P, E_b]  0 on padding slots
      t_tile_rel:      i32[P, P, E_b/128, 128]  sender − tile·BLOCK_ROWS
      t_tile_blk_ptr:  i32[P, P, NB+1]          edge span per sender tile
      t_perm:          i32[P, P, E_b]  CSC position → CSR position, so
                       traced per-edge data (attention numerators) can be
                       permuted into CSC order for the transpose reduce;
                       padding slots map to padding slots.

    ``senders_global`` reconstructs global ids on the fly (b·B offset), so
    the all-gather path needs no second copy.
    """

    senders_rel: jax.Array
    receivers_rel: jax.Array
    weight: jax.Array
    tile_rel: jax.Array
    tile_blk_ptr: jax.Array
    t_senders_rel: jax.Array
    t_receivers_rel: jax.Array
    t_weight: jax.Array
    t_tile_rel: jax.Array
    t_tile_blk_ptr: jax.Array
    t_perm: jax.Array
    block_size: int = dataclasses.field(metadata=dict(static=True))
    n_parts: int = dataclasses.field(metadata=dict(static=True))
    n_node_pad: int = dataclasses.field(metadata=dict(static=True))
    n_edge: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_bucket(self) -> int:
        return self.senders_rel.shape[2]

    def senders_global(self) -> jax.Array:
        """i32[P, P, E_b] global sender ids."""
        offs = (jnp.arange(self.n_parts, dtype=jnp.int32) * self.block_size)
        return self.senders_rel + offs[None, :, None]


def partition_by_receiver(
    g: Graph, n_parts: int, *, edge_multiple: int = 1024
) -> PartitionedGraph:
    """Split a Graph into P receiver-block shards × P sender-block buckets,
    all padded to the globally maximal bucket size (degree skew across
    blocks costs padding, not correctness — SURVEY.md §7 hard part 2).

    Buckets are receiver-sorted.  The default ``edge_multiple`` (= Pallas
    E_CHUNK) keeps buckets tile-aligned for ``mode="ring_pallas"``; smaller
    multiples are fine for the segment-sum modes.
    """
    from graph_odenet_tpu.ops.pallas_spmm import BLOCK_ROWS

    if g.n_node_pad % n_parts:
        raise ValueError(
            f"n_node_pad={g.n_node_pad} not divisible by n_parts={n_parts}; "
            "re-pad the graph (pad_graph with node_multiple=n_parts*k)"
        )
    B = g.n_node_pad // n_parts
    s = np.asarray(g.senders)[: g.n_edge]
    r = np.asarray(g.receivers)[: g.n_edge]
    w = np.asarray(g.weight)[: g.n_edge]
    rb, sb = r // B, s // B

    buckets = {}
    e_bucket = 1
    for p in range(n_parts):
        for b in range(n_parts):
            sel = (rb == p) & (sb == b)
            rp = r[sel] - p * B
            order = np.argsort(rp, kind="stable")
            buckets[(p, b)] = (
                (s[sel] - b * B)[order], rp[order], w[sel][order]
            )
            e_bucket = max(e_bucket, int(sel.sum()))
    e_bucket = _round_up(e_bucket, edge_multiple)

    nb_local = -(-B // BLOCK_ROWS)
    senders_rel = np.zeros((n_parts, n_parts, e_bucket), dtype=np.int32)
    receivers_rel = np.zeros((n_parts, n_parts, e_bucket), dtype=np.int32)
    weight = np.zeros((n_parts, n_parts, e_bucket), dtype=np.float32)
    blk_ptr = np.zeros((n_parts, n_parts, nb_local + 1), dtype=np.int32)
    t_senders_rel = np.zeros((n_parts, n_parts, e_bucket), dtype=np.int32)
    t_receivers_rel = np.zeros((n_parts, n_parts, e_bucket), dtype=np.int32)
    t_weight = np.zeros((n_parts, n_parts, e_bucket), dtype=np.float32)
    t_blk_ptr = np.zeros((n_parts, n_parts, nb_local + 1), dtype=np.int32)
    t_perm = np.tile(
        np.arange(e_bucket, dtype=np.int32), (n_parts, n_parts, 1)
    )
    for (p, b), (sp, rp, wp) in buckets.items():
        L = len(sp)
        senders_rel[p, b, :L] = sp
        receivers_rel[p, b, :L] = rp
        weight[p, b, :L] = wp
        counts = np.bincount(rp // BLOCK_ROWS, minlength=nb_local)
        np.cumsum(counts, out=blk_ptr[p, b, 1:])
        # CSC view: same edges sorted by local sender.
        order = np.argsort(sp, kind="stable")
        t_senders_rel[p, b, :L] = sp[order]
        t_receivers_rel[p, b, :L] = rp[order]
        t_weight[p, b, :L] = wp[order]
        t_counts = np.bincount(sp[order] // BLOCK_ROWS, minlength=nb_local)
        np.cumsum(t_counts, out=t_blk_ptr[p, b, 1:])
        t_perm[p, b, :L] = order

    def _as_tiles(rel):
        rel = rel.astype(np.int32)
        if e_bucket % 128 == 0:
            return rel.reshape(n_parts, n_parts, e_bucket // 128, 128)
        # tiny-test buckets; Pallas mode will reject these anyway
        return rel.reshape(n_parts, n_parts, 1, e_bucket)

    tile_rel = _as_tiles(receivers_rel % BLOCK_ROWS)
    t_tile_rel = _as_tiles(t_senders_rel % BLOCK_ROWS)

    return PartitionedGraph(
        senders_rel=jnp.asarray(senders_rel),
        receivers_rel=jnp.asarray(receivers_rel),
        weight=jnp.asarray(weight),
        tile_rel=jnp.asarray(tile_rel),
        tile_blk_ptr=jnp.asarray(blk_ptr),
        t_senders_rel=jnp.asarray(t_senders_rel),
        t_receivers_rel=jnp.asarray(t_receivers_rel),
        t_weight=jnp.asarray(t_weight),
        t_tile_rel=jnp.asarray(t_tile_rel),
        t_tile_blk_ptr=jnp.asarray(t_blk_ptr),
        t_perm=jnp.asarray(t_perm),
        block_size=B,
        n_parts=n_parts,
        n_node_pad=g.n_node_pad,
        n_edge=g.n_edge,
    )
