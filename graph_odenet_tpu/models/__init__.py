"""Model zoo — capability parity with the reference's ``models.py`` and
physics models (SURVEY.md §2 R5/R6/R9/R10):

  discrete:   GCN, GAT (multi-head), residual variants (ResGCN / ResGAT —
              the paper's discrete h ← h + f(h) baseline)
  continuous: ODEBlock + GCNODE / GATODE (dh/dt = gnn(h), integrated with
              any solver from ``graph_odenet_tpu.ode``)
  physics:    InteractionNetwork (Battaglia et al. 2016) and its ODE form.

All modules are ``flax.linen`` modules over static-shape ``Graph`` pytrees;
matmuls accept a ``param_dtype``/``dtype`` pair so the MXU path can run
bfloat16 while solver state stays float32 (SURVEY.md §7 hard part 4).
"""

from graph_odenet_tpu.models.gcn import GCN, GCNLayer, ResGCN  # noqa: F401
from graph_odenet_tpu.models.gat import GAT, GATLayer, ResGAT  # noqa: F401
from graph_odenet_tpu.models.odeblock import ODEBlock, GCNODE, GATODE  # noqa: F401
from graph_odenet_tpu.models.interaction import (  # noqa: F401
    InteractionNetwork,
    INODE,
)
