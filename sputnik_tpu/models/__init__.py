from .attention import SparseAttention
from .linear import SparseLinear, sparse_kaiming_values
from .moe import SparseMoE
from .serving import SparseDecoder
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
    "SparseDecoder",
    "SparseLinear",
    "SparseMoE",
    "SparseSelfAttention",
    "SparseTransformer",
    "TransformerLayer",
    "sparse_kaiming_values",
]
