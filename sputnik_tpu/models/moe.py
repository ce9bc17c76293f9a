"""Sparse Mixture-of-Experts: per-expert CSR-sparse FFNs + expert parallelism.

New capability beyond the reference (which has no conditional compute):
a top-1-routed MoE layer whose expert FFN weights are CSR-sparse with a
SHARED topology and per-expert values — exactly the replicated-values
semantics of the reference's batched SpMM (``src/spmm_cuda.cu:29-30``:
``values [r, nnz] x dense [r, k, n]``), so the whole expert bank computes
as ONE batched sparse op per projection.

TPU-first design choices:
  * dense one-hot dispatch/combine (einsum onto a ``[tokens, E, capacity]``
    tensor) — MXU-friendly, static shapes, no gathers (TPU element gathers
    are catastrophic) — the Mesh-TensorFlow/GShard MoE formulation;
  * expert parallelism via ``shard_map`` over an ``ep`` mesh axis: each
    device holds ``E/ndev`` experts' values and computes their batched
    sparse FFN locally; the only collective is one ``psum`` of the
    combined ``[tokens, hidden]`` output;
  * the router's load-balance auxiliary loss is sown under
    ``intermediates/aux_loss`` (GShard aux: ``E * sum(f_e * p_e)``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import api as ops
from ..topology import SparseTopology

__all__ = ["SparseMoE"]


class SparseMoE(nn.Module):
    """Top-1 / top-2 MoE with CSR-sparse expert FFNs.

    Attributes:
      topo_in: ``SparseTopology [ffn, hidden]`` of every expert's first
        projection (shared pattern; per-expert values).
      topo_out: ``SparseTopology [hidden, ffn]`` of the second projection.
      num_experts: expert count ``E`` (divisible by the ``ep`` axis size
        when expert-parallel).
      top_k: experts per token — 1 (Switch-style) or 2 (the GShard/Mixtral
        standard). With ``top_k=2`` the two gates are renormalised to sum
        to 1 and second choices queue BEHIND every first choice in the
        capacity buffer (GShard's location offset), so congestion sheds
        second opinions before first ones.
      capacity_factor: per-expert token capacity multiplier
        (``C = ceil(tokens / E * top_k * capacity_factor)``; overflow
        tokens pass through with that expert contribution zeroed, the
        standard behaviour).
      activation: nonlinearity between the projections.
      mesh / axis: optional expert-parallel mesh axis; values are sharded
        ``P('ep')`` and the expert compute runs under ``shard_map``.
    """

    topo_in: SparseTopology
    topo_out: SparseTopology
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    activation: Optional[str] = "gelu"
    mesh: Optional[Mesh] = None
    axis: str = "ep"

    def _act(self, y):
        if self.activation == "gelu":
            return jax.nn.gelu(y)
        if self.activation == "relu":
            return jax.nn.relu(y)
        if self.activation is None:
            return y
        raise ValueError(f"unknown activation {self.activation}")

    @nn.compact
    def __call__(self, x):
        """``x [..., hidden] -> [..., hidden]``."""
        h = self.topo_in.n
        f = self.topo_in.m
        if self.topo_out.m != h or self.topo_out.n != f:
            raise ValueError(
                f"topo_out must be [{h}, {f}], got "
                f"[{self.topo_out.m}, {self.topo_out.n}]")
        if x.shape[-1] != h:
            raise ValueError(f"input features {x.shape[-1]} != {h}")
        E = self.num_experts
        if self.top_k not in (1, 2):
            raise ValueError(f"top_k must be 1 or 2, got {self.top_k}")
        lead = x.shape[:-1]
        xf = x.reshape(-1, h)
        T = xf.shape[0]
        C = max(int(np.ceil(T / E * self.top_k * self.capacity_factor)), 1)

        # --- router (dense; tiny) ---------------------------------------
        logits = nn.Dense(E, use_bias=False, name="router")(xf)   # [T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        # routing math stays int32/f32: a bf16 cumsum is only exact to
        # 256, so with capacity > 256 two tokens would silently share a
        # capacity slot (their inputs SUM in the dispatch einsum)
        expert1 = jnp.argmax(probs, axis=-1)                       # [T]
        gate1 = jnp.max(probs, axis=-1)                            # [T]
        oh1 = jax.nn.one_hot(expert1, E, dtype=jnp.int32)          # [T, E]

        # GShard load-balance aux loss (first-choice assignment fractions):
        # E * sum_e(frac_tokens * mean_prob)
        frac = jnp.mean(oh1.astype(probs.dtype), axis=0)
        mean_p = jnp.mean(probs, axis=0)
        self.sow("intermediates", "aux_loss", E * jnp.sum(frac * mean_p))

        # position of each token within its expert; one_hot itself zeroes
        # unrouted (-1) and over-capacity (>= C) slots
        pos1 = jnp.cumsum(oh1, axis=0) * oh1 - 1                   # [T, E]
        if self.top_k == 1:
            dispatch = jax.nn.one_hot(pos1, C, dtype=xf.dtype)     # [T, E, C]
            combine = dispatch * gate1[:, None, None]
        else:
            # second choice: mask the winner, renormalise the two gates
            probs2 = probs * (1 - oh1.astype(probs.dtype))
            expert2 = jnp.argmax(probs2, axis=-1)
            gate2 = jnp.max(probs2, axis=-1)
            oh2 = jax.nn.one_hot(expert2, E, dtype=jnp.int32)
            denom = jnp.maximum(gate1 + gate2, 1e-9)
            g1n, g2n = gate1 / denom, gate2 / denom
            # GShard location offset: second choices queue behind ALL of
            # an expert's first choices, so overflow sheds them first
            cnt1 = jnp.sum(oh1, axis=0)                            # [E]
            pos2 = (jnp.cumsum(oh2, axis=0) + cnt1[None, :]) * oh2 - 1
            disp1 = jax.nn.one_hot(pos1, C, dtype=xf.dtype)
            disp2 = jax.nn.one_hot(pos2, C, dtype=xf.dtype)
            dispatch = disp1 + disp2                               # [T, E, C]
            combine = (disp1 * g1n[:, None, None]
                       + disp2 * g2n[:, None, None])

        # --- per-expert sparse values (shared topology) ------------------
        from .linear import sparse_kaiming_values

        init_in = sparse_kaiming_values(self.topo_in)
        init_out = sparse_kaiming_values(self.topo_out)
        v_in = self.param("w_in_values",
                          lambda k, s, d=jnp.float32: jax.vmap(
                              lambda kk: init_in(kk, s[1:], d))(
                                  jax.random.split(k, E)),
                          (E, self.topo_in.nnz_pad))
        v_out = self.param("w_out_values",
                           lambda k, s, d=jnp.float32: jax.vmap(
                               lambda kk: init_out(kk, s[1:], d))(
                                   jax.random.split(k, E)),
                           (E, self.topo_out.nnz_pad))

        def expert_bank(disp, comb, v1, v2, xflat):
            """[T,E',C] dispatch over E' (possibly local) experts."""
            xin = jnp.einsum("tec,th->ehc", disp, xflat)   # [E', h, C]
            y1 = ops.spmm(self.topo_in, v1, xin)           # [E', f, C]
            y2 = ops.spmm(self.topo_out, v2, self._act(y1))
            return jnp.einsum("tec,ehc->th", comb, y2)     # [T, h]

        if self.mesh is None:
            out = expert_bank(dispatch, combine, v_in, v_out, xf)
        else:
            ax = self.axis

            def local(disp, comb, v1, v2, xflat):
                part = expert_bank(disp, comb, v1, v2, xflat)
                return jax.lax.psum(part, ax)

            out = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(None, ax, None), P(None, ax, None),
                          P(ax), P(ax), P()),
                out_specs=P(),
                check_vma=False,
            )(dispatch, combine, v_in, v_out, xf)

        return out.reshape(*lead, h)
