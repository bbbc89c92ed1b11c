from .select import (
    select_pr_filters,
    selected_pr_geometry,
    compute_pr_stats,
    compute_pj_stats,
)
from .pr_rda import PRState, pr_init, pr_train, pr_train_chunk, pr_validate
from .pj_rda import PJState, pj_init, pj_train, pj_train_chunk, pj_validate

__all__ = [
    "select_pr_filters",
    "selected_pr_geometry",
    "compute_pr_stats",
    "compute_pj_stats",
    "PRState",
    "pr_init",
    "pr_train",
    "pr_train_chunk",
    "pr_validate",
    "PJState",
    "pj_init",
    "pj_train",
    "pj_train_chunk",
    "pj_validate",
]
