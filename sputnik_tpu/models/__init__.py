from .attention import SparseAttention
from .linear import SparseLinear, sparse_kaiming_values
from .lm import (LMServer, SparseLM, apply_repetition_penalty,
                 sample_logits)
from .moe import SparseMoE
from .serving import SparseDecoder
from .serving_paged import PagedDecoder
from .transformer import (
    MLP,
    SparseCoreAttention,
    SparseSelfAttention,
    SparseTransformer,
    TransformerLayer,
)

__all__ = [
    "LMServer",
    "MLP",
    "SparseAttention",
    "SparseCoreAttention",
    "SparseDecoder",
    "PagedDecoder",
    "SparseLM",
    "SparseLinear",
    "SparseMoE",
    "SparseSelfAttention",
    "SparseTransformer",
    "TransformerLayer",
    "apply_repetition_penalty",
    "sample_logits",
    "sparse_kaiming_values",
]
