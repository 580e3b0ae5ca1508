"""Training harnesses (SURVEY.md §2 R7/R11): full-batch node classification
(citation networks) and physics one-step + rollout training."""

from graph_odenet_tpu.train.node_classification import (  # noqa: F401
    NodeClassConfig,
    build_model,
    fit_node_classifier,
)
