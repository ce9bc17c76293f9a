from .attention import SparseAttention
from .linear import SparseLinear, sparse_kaiming_values
from .transformer import (
    MLP,
    SparseCoreAttention,
    SparseSelfAttention,
    SparseTransformer,
    TransformerLayer,
)

__all__ = [
    "MLP",
    "SparseAttention",
    "SparseCoreAttention",
    "SparseLinear",
    "SparseSelfAttention",
    "SparseTransformer",
    "TransformerLayer",
    "sparse_kaiming_values",
]
