"""L0 numerical core: causal-OT costs, Sinkhorn solvers, martingale penalty."""

from .cost import (
    bi_causal_modified_cost,
    causal_penalty,
    cost_xy,
    modified_cost,
)
from .martingale import delta_m, martingale_regularization
from .sinkhorn import (
    benchmark_sinkhorn,
    compute_sinkhorn,
    compute_sinkhorn_loss,
    flatten_video,
    sinkhorn_from_cost,
)

__all__ = [
    "cost_xy",
    "causal_penalty",
    "modified_cost",
    "bi_causal_modified_cost",
    "sinkhorn_from_cost",
    "compute_sinkhorn",
    "benchmark_sinkhorn",
    "compute_sinkhorn_loss",
    "flatten_video",
    "martingale_regularization",
    "delta_m",
]
