"""SparseLinear: a linear layer with a CSR-sparse weight matrix.

Capability parity with the reference's ``SparseLinear``
(``modules/sparse_linear.py:69-89``): the weight is ``W_sp [out, in]`` in CSR
form, the trainable parameter is the nonzero *value vector*, and the layer
computes ``y = (W_sp @ x^T)^T + b`` through the shared-sparse ``left_spmm``
path. Differences, TPU-first:

  * The sparsity pattern is a static ``SparseTopology`` fixed at module
    construction (the reference re-derives CSR from a dense param via
    ``setup_sparse_tensors``; here topology is structure, values are state).
  * Bias + ReLU fuse into the ``spmm_bias_relu`` epilogue (the reference
    aspired to this via the phantom ``spmm_bias`` binding,
    ``tests/test_spmm_bias_relu.py:37``).
  * Gradients flow through ``jax.custom_vjp`` (values grad via SDDMM, input
    grad via transposed SpMM) instead of a hand-written autograd.Function.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import api as ops
from ..topology import SparseTopology

__all__ = ["SparseLinear", "sparse_kaiming_values"]


def sparse_kaiming_values(topo: SparseTopology, *, gain: float = 1.0):
    """Kaiming/He-uniform init over the *nonzero slots* of a topology.

    Scales by the effective fan-in (mean nonzeros per output row) so sparse
    layers start with the same output variance as their dense counterparts.
    Returns a flax-style ``init(key, shape, dtype)`` callable.
    """
    fan_in = max(float(topo.nnz) / max(topo.m, 1), 1.0)
    bound = gain * np.sqrt(3.0 / fan_in)
    valid = topo.valid

    def init(key, shape=(topo.nnz_pad,), dtype=jnp.float32):
        import jax

        vals = jax.random.uniform(key, shape, dtype, -bound, bound)
        return vals * jnp.asarray(valid, dtype)

    return init


class SparseLinear(nn.Module):
    """``y = act(W_sp @ x^T + b)^T`` with static weight sparsity.

    Attributes:
      topology: ``SparseTopology`` of the weight, shape ``[features_out,
        features_in]`` (``m = out``, ``n = in``).
      use_bias: add a per-output-feature bias.
      fuse_relu: apply the fused bias+ReLU SpMM epilogue.
      param_dtype: dtype of the value vector.
    """

    topology: SparseTopology
    use_bias: bool = True
    fuse_relu: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_mask(cls, mask: np.ndarray, **kwargs) -> "SparseLinear":
        return cls(topology=SparseTopology.from_dense_mask(mask), **kwargs)

    @property
    def features_out(self) -> int:
        return self.topology.m

    @property
    def features_in(self) -> int:
        return self.topology.n

    @nn.compact
    def __call__(self, x):
        t = self.topology
        if x.shape[-1] != t.n:
            raise ValueError(f"input features {x.shape[-1]} != {t.n}")
        values = self.param(
            "values", sparse_kaiming_values(t), (t.nnz_pad,), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (t.m,), self.param_dtype)
            if self.use_bias
            else None
        )

        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]  # [1, n_rows, in]
        if x.ndim != 3:
            raise ValueError(f"expected 2-D or 3-D input, got {x.shape}")

        xt = jnp.swapaxes(x, -1, -2)  # [b, in, rows]
        if self.fuse_relu:
            b = bias if bias is not None else jnp.zeros((t.m,), x.dtype)
            y = ops.spmm_bias_relu(t, values, xt, b)  # [b, out, rows]
        else:
            y = ops.left_spmm(t, values, xt)
            if bias is not None:
                y = y + bias[:, None]
        y = jnp.swapaxes(y, -1, -2)  # [b, rows, out]
        return y[0] if squeeze else y
