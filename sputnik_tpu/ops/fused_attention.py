"""Differentiable fused sparse attention (sparse-flash forward).

``fused_sparse_attention(spec, q, k, v)`` computes masked softmax attention
with the score topology of ``spec`` without ever materialising scores in
HBM (one fused Pallas kernel, ``pallas/flash_sparse.py``). The backward
pass recomputes through the unfused batched-panel chain — the same algebra
as the reference's three-op composition, so gradients are exact; a fused
backward kernel is a later optimisation.

Off-TPU (and as the correctness oracle) the forward runs the unfused
batched-panel chain, which is itself validated against dense attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import batched_panel as bp
from .pallas import flash_sparse as fs

__all__ = ["fused_sparse_attention"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_meta(spec: bp.BatchedPanelSpec):
    cached = getattr(spec, "_flash_meta", None)
    if cached is None:
        cached = fs.build_flash_meta(spec.views)
        spec._flash_meta = cached
    return cached


def _unfused(spec, q, k, v, scale):
    scores = bp.sddmm_bh(spec, q, k) * scale
    w = bp.sparse_softmax_bh(spec, scores)
    return bp.spmm_bh(spec, w, v)


def _fused_fwd_impl(spec, q, k, v, scale):
    if not bp._use_kernels():
        return _unfused(spec, q, k, v, scale)
    meta = _flash_meta(spec)
    R, s, hd = q.shape
    hd_pad = _round_up(max(hd, 1), 128)

    def pad(x, rows):
        out = jnp.zeros((R, rows, hd_pad), x.dtype)
        return out.at[:, : x.shape[1], :hd].set(x)

    q_p = pad(q * scale, spec.m_pad)
    k_p = pad(k, spec.n_pad)
    v_p = pad(v, spec.n_pad)
    out, _, _ = fs.flash_sparse_attention_fwd(
        jnp.asarray(meta["block_cols"]),
        jnp.asarray(meta["nblocks"]),
        jnp.asarray(meta["mask_slot"]),
        jnp.asarray(meta["is_partial"]),
        jnp.asarray(meta["pmask"]),
        q_p, k_p, v_p,
        R=R, heads=spec.heads, mb=spec.mb,
        max_bpr=meta["max_bpr"], bm=meta["bm"], bk=meta["bk"],
        interpret=bp._interp(),
    )
    return out[:, :s, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def _fused(spec, q, k, v, scale):
    return _fused_fwd_impl(spec, q, k, v, scale)


def _fused_f(spec, q, k, v, scale):
    return _fused_fwd_impl(spec, q, k, v, scale), (q, k, v)


def _fused_b(spec, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _unfused(spec, q_, k_, v_, scale), q, k, v)
    return vjp(g)


_fused.defvjp(_fused_f, _fused_b)


def fused_sparse_attention(spec: bp.BatchedPanelSpec, q, k, v,
                           scale=None):
    """``q, k, v: [R, s, hd]`` with ``R = spec.B * spec.heads`` ->
    ``[R, s, hd]``; softmax over the nonzeros of each replica's mask row."""
    if q.shape[0] != spec.R:
        raise ValueError(f"replica dim {q.shape[0]} != spec.R {spec.R}")
    if q.shape[1] != spec.m:
        raise ValueError(f"seq {q.shape[1]} != mask rows {spec.m}")
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _fused(spec, q, k, v, float(scale))
