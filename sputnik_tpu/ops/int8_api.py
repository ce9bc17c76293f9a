"""Int8 serving-mode API: the W8A8 op family over the panel layout.

Weights (sparse values) are blockwise-quantized int8 with per-tile
symmetric absmax scales — 4x less HBM traffic than fp32 and the MXU's
int8 path runs at 2x the bf16 rate on v5e. Dense activations are
dynamically quantized per tile inside the kernels. Accumulation is int32
per tile, rescaled to f32 before cross-block accumulation (standard W8A8;
~1e-2 relative error). fp32/bf16 stays the default everywhere — this
module is opt-in for serving.

The reference is fp32-only (``src/spmm_cuda.cu:41-44`` hardcodes f32);
this is new capability for the BASELINE's "large-scale production
deployment and serving" goal. Covers the full forward op family:
``spmm_int8`` (+ fused bias/relu via the f32 epilogue), ``spmm_t_int8``,
``sddmm_int8``, and the fused int8 sparse-flash attention forward
(``attention_int8``). For quantized training, ``spmm_qat`` runs the W8A8
forward with an int8 backward (straight-through estimator for the panel
gradient); full-precision fp32/bf16 training remains the default.
"""

from __future__ import annotations

import dataclasses
import functools as _functools

import jax
import jax.numpy as jnp
import numpy as np

from ._common import interp as _interp
from ._common import round_up as _round_up
from ._common import use_kernels as _use_kernels
from .panel_api import PanelSpec, _spec
from .pallas import bsr_spmm_int8 as _k8

__all__ = ["QuantizedPanel", "quantize_panel", "quantize_panel_jnp",
           "spmm_int8", "spmm_t_int8", "sddmm_int8", "attention_int8",
           "spmm_qat", "attention_qat"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedPanel:
    """Blockwise int8 panel + per-tile scales (host- or device-resident).

    Registered as a pytree so it can flow through jit/vjp (the quantized
    -training path stashes it in custom_vjp residuals)."""

    values_q: object            # i8 [mb, max_bpr, bm, bk]
    scales: object              # f32[mb, max_bpr]


def quantize_panel(spec: PanelSpec, panel) -> QuantizedPanel:
    """fp32 panel -> int8 panel + scales (symmetric per-tile absmax)."""
    q, s = _k8.quantize_panel_np(np.asarray(panel, np.float32))
    return QuantizedPanel(jnp.asarray(q), jnp.asarray(s))


def quantize_panel_jnp(panel) -> QuantizedPanel:
    """Device-side (traceable) per-tile symmetric absmax quantization —
    the in-graph quantizer for the quantized-training path."""
    absmax = jnp.max(jnp.abs(panel.astype(jnp.float32)), axis=(-1, -2))
    scales = (absmax / 127.0).astype(jnp.float32)
    safe = jnp.where(scales > 0, scales, 1.0)[..., None, None]
    q = jnp.clip(jnp.round(panel.astype(jnp.float32) / safe),
                 -127, 127).astype(jnp.int8)
    return QuantizedPanel(q, scales)


def _dq(spec, qp):
    """Dequantized f32 panel (oracle path)."""
    return (jnp.asarray(qp.values_q, jnp.float32)
            * jnp.asarray(qp.scales)[:, :, None, None])


def spmm_int8(spec, qp: QuantizedPanel, dense):
    """W8A8 SpMM: int8 weights x dynamically-quantized dense -> f32."""
    spec = _spec(spec)
    t, bv = spec.topo, spec.view
    if not _use_kernels():
        from . import xla_ops
        from .panel_api import _flat

        vals = _flat(spec, _dq(spec, qp))
        return xla_ops.spmm(vals, t.column_indices, t.row_ids, t.m, dense)
    n_out = dense.shape[-1]
    bn = spec.bn or (1024 if n_out >= 4096 else
                     512 if n_out >= 2048 else 128)
    n_pad = _round_up(max(n_out, 1), bn)
    if dense.shape == (bv.n_pad, n_pad):
        dense_pad = dense
    else:
        dense_pad = jnp.zeros((bv.n_pad, n_pad), dense.dtype)
        dense_pad = dense_pad.at[: dense.shape[0], :n_out].set(dense)
    out = _k8.bsr_spmm_panel_int8(
        jnp.asarray(bv.block_cols.reshape(-1)),
        jnp.asarray(bv.nblocks),
        qp.values_q, qp.scales, dense_pad,
        mb=bv.mb, max_bpr=bv.max_bpr, kb=bv.kb,
        bm=spec.bm, bk=spec.bk, bn=bn, interpret=_interp(),
    )
    return out[: t.m, :n_out]


def spmm_t_int8(spec, qp: QuantizedPanel, g):
    """W8A8 transposed SpMM: ``A^T @ G`` off the int8 panel (block
    metadata transpose — no value movement, like the fp32 kernel)."""
    spec = _spec(spec)
    t, bv = spec.topo, spec.view
    if not _use_kernels():
        from . import xla_ops
        from .panel_api import _flat

        vals = _flat(spec, _dq(spec, qp))
        topo_t, perm = t.transpose()
        vals_t = jnp.take(vals, jnp.asarray(perm))
        return xla_ops.spmm(vals_t, topo_t.column_indices, topo_t.row_ids,
                            topo_t.m, g)
    t_nblocks, t_src = bv.transpose_meta()
    max_bpc = t_src.shape[1]
    q_out = g.shape[-1]
    bq = spec.bn or (1024 if q_out >= 4096 else
                     512 if q_out >= 2048 else 128)
    q_pad = _round_up(max(q_out, 1), bq)
    if g.shape == (bv.m_pad, q_pad):
        g_pad = g
    else:
        g_pad = jnp.zeros((bv.m_pad, q_pad), g.dtype)
        g_pad = g_pad.at[: g.shape[0], :q_out].set(g)
    out = _k8.bsr_spmm_t_panel_int8(
        jnp.asarray(t_src[:, :, 0].reshape(-1)),
        jnp.asarray(t_src[:, :, 1].reshape(-1)),
        jnp.asarray(t_nblocks),
        qp.values_q, qp.scales, g_pad,
        kb=bv.kb, max_bpc=max_bpc, mb=bv.mb,
        bm=spec.bm, bk=spec.bk, bq=bq, interpret=_interp(),
    )
    return out[: t.n, :q_out]


def sddmm_int8(spec, lhs, rhs):
    """Int8 SDDMM: both dense operands dynamically quantized per tile;
    sampled product returned as an f32 panel."""
    spec = _spec(spec)
    t, bv = spec.topo, spec.view
    if not _use_kernels():
        from .panel_api import _sddmm_impl

        return _sddmm_impl(spec, lhs, rhs)
    d = lhs.shape[-1]
    bd = 128
    d_pad = _round_up(max(d, 1), bd)
    if lhs.shape == (bv.m_pad, d_pad):
        lhs_pad = lhs
    else:
        lhs_pad = jnp.zeros((bv.m_pad, d_pad), lhs.dtype)
        lhs_pad = lhs_pad.at[: lhs.shape[0], :d].set(lhs)
    if rhs.shape == (bv.n_pad, d_pad):
        rhs_pad = rhs
    else:
        rhs_pad = jnp.zeros((bv.n_pad, d_pad), rhs.dtype)
        rhs_pad = rhs_pad.at[: rhs.shape[0], :d].set(rhs)
    return _k8.bsr_sddmm_panel_int8(
        jnp.asarray(bv.block_cols.reshape(-1)),
        jnp.asarray(bv.nblocks),
        lhs_pad, rhs_pad, jnp.asarray(bv.mask, jnp.float32),
        mb=bv.mb, max_bpr=bv.max_bpr,
        bm=spec.bm, bk=spec.bk, bd=bd, interpret=_interp(),
    )


# ---------------------------------------------------------------------------
# Quantized training (the r1 "int8 backward" follow-up): W8A8 forward with
# an int8 backward — grad_dense rides the int8 transposed kernel off the
# SAME quantized weights as the forward, grad_values is a
# straight-through-estimator panel gradient via the int8 SDDMM. Master
# weights stay f32 (the optimizer's copy); quantization happens in-graph.
# ---------------------------------------------------------------------------


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_qat(spec, panel, dense):
    """Differentiable W8A8 SpMM for quantized training.

    Forward quantizes the f32 master ``panel`` per tile in-graph and runs
    the int8 kernel; backward computes ``grad_dense = A_q^T @ g`` on the
    int8 transposed kernel and a straight-through ``grad_panel`` via the
    int8 SDDMM (all three matmuls on the MXU's 2x int8 path). ~1e-2
    gradient error vs the fp32 chain — the documented W8A8 class.
    """
    return spmm_int8(spec, quantize_panel_jnp(panel), dense)


def _qat_fwd(spec, panel, dense):
    qp = quantize_panel_jnp(panel)
    # zero-size dtype token: residuals must be JAX types, not dtypes
    tok = jnp.zeros((0,), panel.dtype)
    return spmm_int8(spec, qp, dense), (qp, dense, tok)


def _qat_bwd(spec, res, g):
    qp, dense, tok = res
    # int8 kernels emit f32; cotangents must match the primal dtypes
    # (bf16 activations are the default streaming dtype)
    grad_dense = spmm_t_int8(spec, qp, g).astype(dense.dtype)
    grad_panel = sddmm_int8(spec, g, dense).astype(tok.dtype)  # STE
    return grad_panel, grad_dense


spmm_qat.defvjp(_qat_fwd, _qat_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention_qat(spec, scale, q, k, v):
    return attention_int8(spec, q, k, v, scale=scale)


def _attn_qat_fwd(spec, scale, q, k, v):
    return attention_int8(spec, q, k, v, scale=scale), (q, k, v)


def _attn_qat_bwd(spec, scale, res, g):
    # straight-through estimator: gradients of the fp32 fused chain at the
    # same (q, k, v) — the standard fake-quant training recipe; the int8
    # rounding is treated as identity in the backward
    from .fused_attention import fused_sparse_attention

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: fused_sparse_attention(spec, q_, k_, v_,
                                                  scale=scale), q, k, v)
    return vjp(g)


_attention_qat.defvjp(_attn_qat_fwd, _attn_qat_bwd)


def _int8_fwd_stats(spec, q, k, v, scale):
    """Padded int8 flash forward returning (out_padded, stats, shapes)."""
    from .fused_attention import _flash_meta, _hd_pad, _pad
    from .pallas import flash_sparse_int8 as fsi

    meta = _flash_meta(spec)
    R, s, hd = q.shape
    hd_pad = _hd_pad(max(hd, 1))
    q_p = _pad(spec, q * scale, spec.m_pad, hd_pad)
    k_p = _pad(spec, k, spec.n_pad, hd_pad)
    v_p = _pad(spec, v, spec.n_pad, hd_pad)
    out, stats = fsi.flash_sparse_attention_fwd_int8(
        meta["block_cols"], meta["nblocks"], meta["mask_slot"],
        meta["is_partial"], meta["pmask"],
        q_p, k_p, v_p,
        R=R, heads=spec.heads, mb=spec.mb,
        max_bpr=int(meta["max_bpr"]), bm=int(meta["bm"]),
        bk=int(meta["bk"]), interpret=_interp())
    return out, stats, (q_p, k_p, v_p)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention_int8_train(spec, scale, q, k, v):
    return attention_int8(spec, q, k, v, scale=scale)


def _attn_i8t_fwd(spec, scale, q, k, v):
    if not _use_kernels():
        # oracle path: fp32 chain both ways (re-run the vjp in backward)
        from .fused_attention import fused_sparse_attention

        out = fused_sparse_attention(spec, q, k, v, scale=scale)
        return out, (q, k, v, None, None)
    out_p, stats, padded = _int8_fwd_stats(spec, q, k, v, scale)
    s, hd = q.shape[1], q.shape[2]
    q_p, k_p, v_p = padded
    return out_p[:, :s, :hd], (q_p, k_p, v_p, out_p, stats)


def _attn_i8t_bwd(spec, scale, res, g):
    q_p, k_p, v_p, out_p, stats = res
    if out_p is None:  # oracle path: q_p/k_p/v_p hold the raw operands
        from .fused_attention import fused_sparse_attention

        _, vjp = jax.vjp(
            lambda q_, k_, v_: fused_sparse_attention(spec, q_, k_, v_,
                                                      scale=scale),
            q_p, k_p, v_p)
        return vjp(g)
    from .fused_attention import _flash_bwd_meta, _hd_pad, _pad
    from .pallas import flash_sparse_int8 as fsi

    R, s, hd = g.shape
    meta = _flash_bwd_meta(spec)
    g_p = _pad(spec, g, spec.m_pad, _hd_pad(max(hd, 1)))

    # stats arrive pre-packed (lane 0 = max, lane 1 = denom)
    d_rows = jnp.sum(g_p * out_p, axis=-1)               # [R, m_pad]
    dcoef = jnp.broadcast_to(d_rows[:, :, None], (R, spec.m_pad, 128))

    common = dict(R=R, heads=spec.heads, bm=int(meta["bm"]),
                  bk=int(meta["bk"]), interpret=_interp())
    dq_p = fsi.flash_sparse_bwd_dq_int8(
        meta["block_cols"], meta["nblocks"], meta["mask_slot"],
        meta["is_partial"], meta["pmask"],
        q_p, k_p, v_p, g_p, stats, dcoef,
        mb=spec.mb, max_bpr=int(meta["max_bpr"]), **common)
    dk_p, dv_p = fsi.flash_sparse_bwd_dkv_int8(
        meta["t_src_i"], meta["t_nblocks"], meta["t_mask_slot"],
        meta["t_is_partial"], meta["pmask"],
        q_p, k_p, v_p, g_p, stats, dcoef,
        kb=spec.kb, max_bpc=int(meta["max_bpc"]), **common)
    # kernels emit f32; cotangents must match the primal q/k/v dtypes
    dq = (dq_p[:, :s, :hd] * scale).astype(q_p.dtype)
    dk = dk_p[:, : spec.n, :hd].astype(k_p.dtype)
    dv = dv_p[:, : spec.n, :hd].astype(v_p.dtype)
    return dq, dk, dv


_attention_int8_train.defvjp(_attn_i8t_fwd, _attn_i8t_bwd)


def attention_qat(spec, q, k, v, scale=None, backward="fp32"):
    """Quantization-aware-training sparse attention: int8 fused FORWARD
    (what serving will run), with a choice of backward:

    * ``backward="fp32"`` (default): fp32 fused-flash gradients via the
      straight-through estimator — the standard fake-quant recipe (train
      with the deployed quantization noise, backprop at full precision).
    * ``backward="int8"``: the full-int8 training path — the backward's
      four contractions (QK^T recompute, GV^T, dS@K / dS^T@Q, P^T@G)
      also ride the 2x int8 MXU path, recomputing p from the forward's
      saved stats with the identical per-tile quantization. ~5e-2
      gradient error vs fp32 (the W8A8 class). Measured (v5e, causal
      16x2048 hd=64): 3.19 ms vs fp32's 2.89 — the flash backward is
      VPU-bound (softmax recompute + dynamic quantization), not
      MXU-bound, so the int8 MXU rate does NOT pay for the added
      quantization work; fp32 STE stays the recommended default and
      this path exists for algebra completeness (and for operands that
      arrive pre-quantized)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if backward == "int8":
        return _attention_int8_train(spec, float(scale), q, k, v)
    if backward != "fp32":
        raise ValueError(f"backward must be 'fp32' or 'int8', "
                         f"got {backward!r}")
    return _attention_qat(spec, float(scale), q, k, v)


def attention_int8(spec, q, k, v, scale=None):
    """Fused int8 sparse-flash attention FORWARD (serving): int8 QK^T and
    PV contractions on the MXU's 2x-rate int8 path, f32 online softmax.
    q/k/v arrive f32/bf16 and are dynamically quantized per tile in the
    kernel. ~1e-2 relative error; use the fp32 fused kernel for training.
    """
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    scale = float(scale)
    if not _use_kernels():
        from .fused_attention import fused_sparse_attention

        return fused_sparse_attention(spec, q, k, v, scale=scale)
    out, _, _ = _int8_fwd_stats(spec, q, k, v, scale)
    s, hd = q.shape[1], q.shape[2]
    return out[:, :s, :hd]
