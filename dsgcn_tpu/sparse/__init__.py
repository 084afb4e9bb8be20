"""Sparse (supermask / lottery-ticket) training subsystem."""
from .models import (SparseCTRGCN, SparseSTGCN, SparseSTGCNExact)
from .nested import (SparseAAGCN, SparseDGSTGCN)
from .supermask import (get_sparsity, group_lasso_penalty,
                        make_sparse_optimizer, rerandomize_tree,
                        sparsity_schedule, supermask, supermask_at)

__all__ = ["SparseCTRGCN", "SparseSTGCN", "SparseSTGCNExact", "SparseAAGCN",
           "SparseDGSTGCN", "get_sparsity", "group_lasso_penalty",
           "make_sparse_optimizer", "rerandomize_tree", "sparsity_schedule",
           "supermask", "supermask_at"]
