"""Training-time sparsity tooling (dynamic sparse training)."""

from .sparsity import (
    cubic_sparsity_schedule,
    dense_linear_grad,
    magnitude_prune,
    remap_values,
    rigl_update,
    rigl_update_linear,
    topology_from_dense,
)

__all__ = [
    "cubic_sparsity_schedule",
    "dense_linear_grad",
    "magnitude_prune",
    "remap_values",
    "rigl_update",
    "rigl_update_linear",
    "topology_from_dense",
]
