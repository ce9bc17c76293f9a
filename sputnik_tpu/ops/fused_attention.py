"""Differentiable fused sparse attention (sparse-flash fwd AND bwd).

``fused_sparse_attention(spec, q, k, v)`` computes masked softmax attention
over the score topology of ``spec`` without materialising scores in HBM:

  * forward: one Pallas kernel walking only the occupied key blocks with an
    online softmax (``pallas/flash_sparse.flash_sparse_attention_fwd``);
  * backward: two Pallas kernels recomputing score tiles from the saved row
    stats — dq accumulates along the row direction (forward's grid), dk/dv
    along the column direction via the transposed block metadata (the same
    no-value-movement trick as ``bsr_spmm_t``).

Off-TPU (and as the correctness oracle) both passes run the unfused
batched-panel chain, itself validated against dense attention. The
reference computes this chain as three CUDA dispatches with a *broken*
softmax backward (``tests/transformer/functions.py:105-115``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import batched_panel as bp
from ._common import interp as _interp
from ._common import round_up as _round_up
from ._common import use_kernels as _use_kernels
from .pallas import flash_sparse as fs

__all__ = ["fused_sparse_attention"]


def _trace_clean() -> bool:
    try:
        from jax._src import core as _core

        return bool(_core.trace_state_clean())
    except Exception:
        return False


def _to_device(meta: dict) -> dict:
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in meta.items()}


def _flash_meta(spec: bp.BatchedPanelSpec):
    """Flash metadata as DEVICE arrays (cached on the spec).

    Device-resident metadata enters a surrounding ``jit`` as a hoisted
    runtime buffer, not an HLO literal — keeping the compile payload O(1)
    in topology size (numpy constants at s=32768 previously blew the
    remote-compile payload limit). The device cache is only populated
    outside a trace; the numpy build is always cached.
    """
    cached = getattr(spec, "_flash_meta_dev", None)
    if cached is not None:
        return cached
    np_meta = getattr(spec, "_flash_meta", None)
    if np_meta is None:
        np_meta = fs.build_flash_meta(spec.views)
        spec._flash_meta = np_meta
    dev = _to_device(np_meta)
    if _trace_clean():
        spec._flash_meta_dev = dev
    return dev


def _flash_bwd_meta(spec: bp.BatchedPanelSpec):
    cached = getattr(spec, "_flash_bwd_meta_dev", None)
    if cached is not None:
        return cached
    np_meta = getattr(spec, "_flash_bwd_meta", None)
    if np_meta is None:
        np_meta = fs.build_flash_bwd_meta(spec.views)
        spec._flash_bwd_meta = np_meta
    dev = _to_device(np_meta)
    if _trace_clean():
        spec._flash_bwd_meta_dev = dev
    return dev


def warm_flash_meta(spec: bp.BatchedPanelSpec, *,
                    backward: bool = True, hd: int = 128) -> None:
    """Eagerly build + device-place the flash metadata for ``spec``.

    Call once at model-construction time (outside ``jit``) so the first
    traced step does not bake the metadata into its compile payload.
    No-op under a trace. ``backward=False`` skips the backward-pass
    metadata (inference-only paths — serving prefill never
    differentiates, and the backward tables cost their own host build +
    permanent device residency). The transposed (two-kernel) tables are
    also skipped when the single-pass fused backward will handle ``hd``
    (the common case) — it consumes only the forward metadata.
    """
    if not _trace_clean():
        return
    _flash_meta(spec)
    if backward and not _use_fused_bwd(spec, _hd_pad(max(hd, 1))):
        _flash_bwd_meta(spec)


def _unfused(spec, q, k, v, scale, group=1):
    if group > 1:   # oracle expands KV to full query heads
        k = jnp.repeat(k, group, axis=0)
        v = jnp.repeat(v, group, axis=0)
    scores = bp.sddmm_bh(spec, q, k) * scale
    w = bp.sparse_softmax_bh(spec, scores)
    return bp.spmm_bh(spec, w, v)


def _hd_pad(hd: int) -> int:
    """Head-dim tile width: rounds to the 128-lane minor dim.

    Measured (v5e, causal 16x2048 hd=64): a 64-lane minor dim - which
    halves the q/k/v/g HBM traffic - does NOT speed the kernel up (0.39 ms
    vs 0.36 ms padded) and compiles ~3x slower. The MXU runs a 64-deep
    contraction in the same full pass as a 128-deep one, so the zero-padded
    half costs no compute; the kernel's cost is per-block-step score/softmax
    work, which is hd-independent. Tile size (bm, bk), not hd packing, is
    the perf lever (see RESULTS.md).
    """
    return _round_up(max(hd, 1), 128)


def _pad(spec, x, rows, hd_pad):
    R = x.shape[0]
    out = jnp.zeros((R, rows, hd_pad), x.dtype)
    return out.at[:, : x.shape[1], : x.shape[2]].set(x)


def _fused_fwd_impl(spec, q, k, v, scale, group, *, want_stats=False):
    meta = _flash_meta(spec)
    R, s, hd = q.shape
    # hd=64 runs NATIVE 64-lane tiles in the FORWARD: the kernel is not
    # faster (the MXU does a 64-deep contraction in a full pass, see
    # _hd_pad) but the XLA pad/slice ops around it vanish — measured
    # end-to-end fwd 0.227 -> 0.188 ms at the driver shapes (R=32,
    # s=512). The backward keeps 128-lane padding (measured noise-equal
    # there); fwd/bwd padding choices are independent because residuals
    # are stored unpadded.
    hd_pad = 64 if hd == 64 else _hd_pad(max(hd, 1))
    q_p = _pad(spec, q * scale, spec.m_pad, hd_pad)
    k_p = _pad(spec, k, spec.n_pad, hd_pad)
    v_p = _pad(spec, v, spec.n_pad, hd_pad)
    out, stats = fs.flash_sparse_attention_fwd(
        jnp.asarray(meta["block_cols"]),
        jnp.asarray(meta["nblocks"]),
        jnp.asarray(meta["mask_slot"]),
        jnp.asarray(meta["is_partial"]),
        jnp.asarray(meta["pmask"]),
        q_p, k_p, v_p,
        R=R, heads=spec.heads, mb=spec.mb,
        max_bpr=meta["max_bpr"], bm=meta["bm"], bk=meta["bk"],
        group=group, interpret=_interp(), packed_stats=True,
    )
    if want_stats:
        # stats: lane 0 = running max, lane 1 = denom — already the
        # backward kernels' operand layout (no per-backward concatenate)
        return out[:, :s, :hd], stats
    return out[:, :s, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def _fused(spec, q, k, v, scale, group):
    if not _use_kernels():
        return _unfused(spec, q, k, v, scale, group)
    return _fused_fwd_impl(spec, q, k, v, scale, group)


def _fused_f(spec, q, k, v, scale, group):
    if not _use_kernels():
        out = _unfused(spec, q, k, v, scale, group)
        return out, (q, k, v, None, None)
    out, stats = _fused_fwd_impl(spec, q, k, v, scale, group,
                                 want_stats=True)
    return out, (q, k, v, out, stats)


# dk/dv VMEM accumulator budget for the single-pass fused backward: two
# f32 scratches of (kb, bk, hd_pad) must coexist with the double-buffered
# block operands under the 100 MB scoped-VMEM request. Above it, fall back
# to the two-kernel (dq + transposed-walk dkv) path.
_FUSED_BWD_ACC_BYTES = 32 * 1024 * 1024


def _use_fused_bwd(spec, hd_pad: int) -> bool:
    return 2 * spec.n_pad * hd_pad * 4 <= _FUSED_BWD_ACC_BYTES


def _fused_b(spec, scale, group, res, g):
    q, k, v, out, stats = res
    if out is None:  # oracle path
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _unfused(spec, q_, k_, v_, scale, group),
            q, k, v)
        return vjp(g)

    R, s, hd = q.shape
    if _use_fused_bwd(spec, _hd_pad(max(hd, 1))):
        return _fused_b_single_pass(spec, scale, group, res, g)

    meta = _flash_bwd_meta(spec)
    hd_pad = _hd_pad(max(hd, 1))
    q_p = _pad(spec, q * scale, spec.m_pad, hd_pad)
    k_p = _pad(spec, k, spec.n_pad, hd_pad)
    v_p = _pad(spec, v, spec.n_pad, hd_pad)
    g_p = _pad(spec, g, spec.m_pad, hd_pad)

    # stats arrive pre-packed from the forward (lane 0 = max, 1 = denom)
    d_rows = jnp.sum(g * out, axis=-1)                       # [R, s]
    d_pad = jnp.zeros((R, spec.m_pad), jnp.float32)
    d_pad = d_pad.at[:, :s].set(d_rows)
    dcoef = jnp.broadcast_to(d_pad[:, :, None], (R, spec.m_pad, 128))

    common = dict(R=R, heads=spec.heads, bm=meta["bm"], bk=meta["bk"],
                  group=group, interpret=_interp())
    dq_p = fs.flash_sparse_bwd_dq(
        jnp.asarray(meta["block_cols"]),
        jnp.asarray(meta["nblocks"]),
        jnp.asarray(meta["mask_slot"]),
        jnp.asarray(meta["is_partial"]),
        jnp.asarray(meta["pmask"]),
        q_p, k_p, v_p, g_p, stats, dcoef,
        mb=spec.mb, max_bpr=meta["max_bpr"], **common)
    dk_p, dv_p = fs.flash_sparse_bwd_dkv(
        jnp.asarray(meta["t_src_i"]),
        jnp.asarray(meta["t_nblocks"]),
        jnp.asarray(meta["t_mask_slot"]),
        jnp.asarray(meta["t_is_partial"]),
        jnp.asarray(meta["pmask"]),
        q_p, k_p, v_p, g_p, stats, dcoef,
        kb=spec.kb, max_bpc=meta["max_bpc"], **common)
    if group > 1:
        # per-query-replica partials -> shared KV replica gradients
        R_kv = R // group
        dk_p = dk_p.reshape(R_kv, group, *dk_p.shape[1:]).sum(axis=1)
        dv_p = dv_p.reshape(R_kv, group, *dv_p.shape[1:]).sum(axis=1)

    dq = dq_p[:, :s, :hd] * scale
    dk = dk_p[:, : k.shape[1], :hd]
    dv = dv_p[:, : v.shape[1], :hd]
    return dq, dk, dv


def _fused_b_single_pass(spec, scale, group, res, g):
    """One kernel, one score/exp recompute, dq + dk/dv together.

    Needs only the FORWARD metadata (row-major walk) — no transposed
    tables, no ``max_bpc`` worst-column padding. See
    ``pallas/flash_sparse.flash_sparse_bwd_fused``.
    """
    q, k, v, out, stats = res
    meta = _flash_meta(spec)
    R, s, hd = q.shape
    hd_pad = _hd_pad(max(hd, 1))
    q_p = _pad(spec, q * scale, spec.m_pad, hd_pad)
    k_p = _pad(spec, k, spec.n_pad, hd_pad)
    v_p = _pad(spec, v, spec.n_pad, hd_pad)
    g_p = _pad(spec, g, spec.m_pad, hd_pad)

    d_rows = jnp.sum(g * out, axis=-1)                       # [R, s]
    d_pad = jnp.zeros((R, spec.m_pad), jnp.float32)
    d_pad = d_pad.at[:, :s].set(d_rows)
    dcoef = jnp.broadcast_to(d_pad[:, :, None], (R, spec.m_pad, 128))

    dq_p, dk_p, dv_p = fs.flash_sparse_bwd_fused(
        jnp.asarray(meta["block_cols"]),
        jnp.asarray(meta["nblocks"]),
        jnp.asarray(meta["mask_slot"]),
        jnp.asarray(meta["is_partial"]),
        jnp.asarray(meta["pmask"]),
        q_p, k_p, v_p, g_p, stats, dcoef,
        R=R, heads=spec.heads, mb=spec.mb, kb=spec.kb,
        max_bpr=meta["max_bpr"], bm=meta["bm"], bk=meta["bk"],
        group=group, interpret=_interp())
    dk_p = dk_p.reshape(R, spec.n_pad, hd_pad)
    dv_p = dv_p.reshape(R, spec.n_pad, hd_pad)
    if group > 1:
        R_kv = R // group
        dk_p = dk_p.reshape(R_kv, group, *dk_p.shape[1:]).sum(axis=1)
        dv_p = dv_p.reshape(R_kv, group, *dv_p.shape[1:]).sum(axis=1)

    dq = dq_p[:, :s, :hd] * scale
    dk = dk_p[:, : k.shape[1], :hd]
    dv = dv_p[:, : v.shape[1], :hd]
    return dq, dk, dv


_fused.defvjp(_fused_f, _fused_b)


def fused_sparse_attention(spec: bp.BatchedPanelSpec, q, k, v,
                           scale=None, group: int = 1):
    """``q: [R, s, hd]`` with ``R = spec.B * spec.heads`` -> ``[R, s, hd]``;
    softmax over the nonzeros of each replica's mask row.

    ``group`` (GQA): ``k``/``v`` carry ``R // group`` replicas; each run of
    ``group`` consecutive query replicas reads its shared KV replica
    (``r // group`` — the head-minor ``b*heads + h`` fold order, same
    convention as ``pallas/decode_attention``). KV HBM traffic and dk/dv
    accumulator memory shrink by ``group`` vs repeating K/V to full heads."""
    if q.shape[0] != spec.R:
        raise ValueError(f"replica dim {q.shape[0]} != spec.R {spec.R}")
    if q.shape[1] != spec.m:
        raise ValueError(f"seq {q.shape[1]} != mask rows {spec.m}")
    if group < 1 or spec.R % group or spec.heads % group:
        raise ValueError(f"group {group} must divide heads {spec.heads}")
    if k.shape[0] != q.shape[0] // group or v.shape[0] != q.shape[0] // group:
        raise ValueError(
            f"k/v replicas {k.shape[0]}/{v.shape[0]} != R // group "
            f"{q.shape[0] // group}")
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _fused(spec, q, k, v, float(scale), int(group))
