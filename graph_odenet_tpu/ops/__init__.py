"""Sparse aggregation ops: the TPU-native replacement for the reference's
``torch.spmm`` / ``torch.sparse.mm`` / ``scatter_add`` usage (SURVEY.md §2 T5).

Three tiers, one API:
  * ``segment.py``  — pure-JAX gather + ``segment_sum`` (reference semantics,
    runs anywhere, is what XLA already compiles well);
  * ``spmm.py``     — ``spmm(graph, x)`` dispatcher with a dense-Â MXU path
    for small graphs and the Pallas path for large ones;
  * ``sddmm.py``    — per-edge score computation (GAT attention logits) and
    the fused SDDMM→softmax→SpMM sandwich;
  * ``pallas_spmm.py`` — hand-written Mosaic/TPU kernels behind the above.
"""

from graph_odenet_tpu.ops.segment import (  # noqa: F401
    gather,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from graph_odenet_tpu.ops.spmm import spmm  # noqa: F401
from graph_odenet_tpu.ops.sddmm import edge_scores, attention_aggregate  # noqa: F401
