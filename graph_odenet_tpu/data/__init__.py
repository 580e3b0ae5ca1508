"""Data layer (SURVEY.md §2 R1/R8).

``planetoid``: Cora/Citeseer/Pubmed citation networks — parses the pygcn
``.content``/``.cites`` file format with the reference's fixed splits, and
provides a deterministic synthetic generator with the same statistics for
environments without the raw files (this repo's CI — see SURVEY.md §4.3 on
golden fixtures).

``nbody``: the spring n-body simulator (reference R8) re-written as a
vmapped ``lax.scan`` — thousands of trajectories integrate in parallel on
device instead of a host numpy loop.
"""

from graph_odenet_tpu.data.planetoid import (  # noqa: F401
    NodeClassificationData,
    load_planetoid,
    synthetic_planetoid,
)
from graph_odenet_tpu.data.nbody import SpringSystem, generate_trajectories  # noqa: F401
