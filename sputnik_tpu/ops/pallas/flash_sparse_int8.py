"""Int8 fused sparse attention — flash forward AND backward kernels.

Same block-classified masking and online softmax as
``flash_sparse.flash_sparse_attention_fwd``, but every MXU contraction
runs on the int8 path (2x the bf16 rate on v5e): q/k/v/g tiles are
dynamically quantized per tile (symmetric absmax), QK^T accumulates
int32 and is rescaled to f32 before the softmax; the probability tile is
quantized with the fixed scale 127 (p in [0, 1]) for the PV contraction.
~1e-2 relative error.

The backward kernels mirror ``flash_sparse.flash_sparse_bwd_dq`` /
``_dkv``: p is recomputed per occupied block from the saved row stats
with the SAME deterministic per-tile quantization as the forward, so the
recomputed probabilities equal the forward's exactly; ds = p*(dp - D) is
quantized per tile for the dq/dk contractions. This is the full-int8
training path (``sputnik_tpu.int8.attention_qat(backward="int8")``) —
the default QAT recipe keeps the fp32 STE backward.

The reference is fp32-only (``src/spmm_cuda.cu:41-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

from .bsr_spmm_int8 import _quant_tile

__all__ = ["flash_sparse_attention_fwd_int8",
           "flash_sparse_bwd_dq_int8", "flash_sparse_bwd_dkv_int8"]

_NEG_LARGE = -1e30


def _qdot_nt(a, b):
    """f32 [m, d] x [n, d] -> a @ b.T via int8 MXU; returns f32."""
    a_q, a_s = _quant_tile(a)
    b_q, b_s = _quant_tile(b)
    r = jax.lax.dot_general(
        a_q, b_q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
    return r.astype(jnp.float32) * (a_s * b_s)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "interpret"))
def flash_sparse_attention_fwd_int8(
    block_cols,    # i32[B, mb*max_bpr]
    nblocks,       # i32[B, mb]
    mask_slot,     # i32[B, mb*max_bpr]
    is_partial,    # i32[B, mb*max_bpr]
    pmask,         # f32[B, n_partial_max, bm, bk]
    q,             # f32 [R, mb*bm, hd_pad] (pre-scaled by 1/sqrt(hd))
    k,             # f32 [R, kb*bk, hd_pad]
    v,             # f32 [R, kb*bk, hd_pad]
    *,
    R: int,
    heads: int,
    mb: int,
    max_bpr: int,
    bm: int,
    bk: int,
    interpret: bool = False,
):
    """Returns ``(out [R, mb*bm, hd_pad], stats [R, mb*bm, 128])`` —
    stats PACKED with the running max in lane 0 and the denominator in
    lane 1, the exact backward operand layout (same convention as the
    f32 forward's ``packed_stats=True``)."""
    hd_pad = q.shape[-1]

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, pm_ref,
               o_ref, st_ref,
               acc, m_scr, l_scr, q_i8, q_sc):
        i, s = pl.program_id(1), pl.program_id(2)
        r = pl.program_id(0)
        b = r // heads

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_scr[:] = jnp.full_like(m_scr, _NEG_LARGE)
            l_scr[:] = jnp.zeros_like(l_scr)
            # q is grid-invariant across the s slots: quantize ONCE per
            # block-row (the per-step dynamic quantization is the VPU
            # cost the int8 path pays; don't repeat it max_bpr times)
            qq, qs = _quant_tile(q_ref[0])
            q_i8[:] = qq
            q_sc[0] = qs

        @pl.when(s < nblk_ref[b, i])
        def _():
            q_q, q_s = q_i8[:], q_sc[0]
            k_q, k_s = _quant_tile(k_ref[0])
            sc_i32 = jax.lax.dot_general(
                q_q, k_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            sc = sc_i32.astype(jnp.float32) * (q_s * k_s)   # [bm, bk]
            partial = part_ref[b, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)

            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(sc, axis=1, keepdims=True))
            p = jnp.exp(sc - m_new)
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            corr = jnp.exp(m_prev - m_new)
            l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(
                p, axis=1, keepdims=True)
            m_scr[:, :1] = m_new

            p_q = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
            v_q, v_s = _quant_tile(v_ref[0])
            pv_i32 = jax.lax.dot(
                p_q, v_q, preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            acc[:] = acc[:] * corr + pv_i32.astype(jnp.float32) * (
                v_s / 127.0)

        @pl.when(s == max_bpr - 1)
        def _():
            denom = jnp.maximum(l_scr[:, :1], 1e-30)
            o_ref[0] = acc[:] / denom
            lane = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
            m_b = jnp.broadcast_to(m_scr[:, :1], (bm, 128))
            l_b = jnp.broadcast_to(l_scr[:, :1], (bm, 128))
            st_ref[0] = jnp.where(lane == 0, m_b,
                                  jnp.where(lane == 1, l_b, 0.0))

    grid = (R, mb, max_bpr)
    out, stats = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad),
                             lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // heads, sl[r // heads, i * max_bpr + s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
                pltpu.VMEM((bm, hd_pad), jnp.int8),
                pltpu.SMEM((1,), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, mb * bm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(3 * bm * hd_pad, 2 * bk * hd_pad, bm * bk, 5 * bm * 128),
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, pmask)
    return out, stats


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "interpret"))
def flash_sparse_bwd_dq_int8(
    block_cols, nblocks, mask_slot, is_partial, pmask,
    q, k, v, g, stats,  # stats f32[R, mb*bm, 128]: lanes 0/1 = m / l
    dcoef,              # f32[R, mb*bm, 128]: D = rowsum(g*out), broadcast
    *, R, heads, mb, max_bpr, bm, bk, interpret=False,
):
    """dq (w.r.t. the PRE-SCALED q): f32[R, mb*bm, hd_pad]. All three
    contractions (QK^T recompute, GV^T, dS@K) ride the int8 MXU path;
    the QK^T quantization is identical to the forward's so the
    recomputed p matches the saved stats exactly."""
    hd_pad = q.shape[-1]

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref, pm_ref,
               dq_ref, acc, q_i8, g_i8, qg_sc):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            # q and g are grid-invariant across the s slots (index maps
            # (r, i, 0)): quantize ONCE per block-row, not per slot —
            # the dynamic-quant VPU work is what makes the int8
            # backward lose to fp32 (RESULTS.md: 3.19 vs 2.89 ms)
            qq, qs = _quant_tile(q_ref[0])
            q_i8[:] = qq
            qg_sc[0] = qs
            gq, gs = _quant_tile(g_ref[0])
            g_i8[:] = gq
            qg_sc[1] = gs

        @pl.when(s < nblk_ref[b, i])
        def _():
            k_q, k_s = _quant_tile(k_ref[0])
            q_q, q_s = q_i8[:], qg_sc[0]
            sc = jax.lax.dot_general(
                q_q, k_q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (q_s * k_s)
            partial = part_ref[b, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            v_q, v_s = _quant_tile(v_ref[0])
            dp = jax.lax.dot_general(
                g_i8[:], v_q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (qg_sc[1] * v_s)
            ds = p * (dp - d_ref[0][:, :1])
            ds_q, ds_s = _quant_tile(ds)
            acc[:] += jax.lax.dot(
                ds_q, k_q, preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (ds_s * k_s)

        @pl.when(s == max_bpr - 1)
        def _():
            dq_ref[0] = acc[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(R, mb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // heads, sl[r // heads, i * max_bpr + s], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, hd_pad),
                                   lambda r, i, s, *p: (r, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((bm, hd_pad), jnp.int8),
                pltpu.VMEM((bm, hd_pad), jnp.int8),
                pltpu.SMEM((2,), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(4 * bm * hd_pad, 2 * bk * hd_pad, bm * bk, 2 * bm * 128),
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, g, stats,
      dcoef, pmask)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "kb", "max_bpc", "bm", "bk", "interpret"))
def flash_sparse_bwd_dkv_int8(
    t_src_i, t_nblocks, t_mask_slot, t_is_partial, pmask,
    q, k, v, g, stats, dcoef,
    *, R, heads, kb, max_bpc, bm, bk, interpret=False,
):
    """(dk, dv): each f32[R, kb*bk, hd_pad]; int8 contractions throughout
    (QK^T recompute, GV^T, dS^T@Q, P^T@G with the fixed 127 p-scale)."""
    hd_pad = q.shape[-1]

    def kernel(ti_ref, tn_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref, pm_ref,
               dk_ref, dv_ref, acck, accv, k_i8, v_i8, kv_sc):
        r, j, u = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads

        @pl.when(u == 0)
        def _():
            acck[:] = jnp.zeros_like(acck)
            accv[:] = jnp.zeros_like(accv)
            # k and v are grid-invariant across the u slots (index maps
            # (r, j, 0)): quantize ONCE per block-column
            kq, ks = _quant_tile(k_ref[0])
            k_i8[:] = kq
            kv_sc[0] = ks
            vq, vs = _quant_tile(v_ref[0])
            v_i8[:] = vq
            kv_sc[1] = vs

        @pl.when(u < tn_ref[b, j])
        def _():
            k_q, k_s = k_i8[:], kv_sc[0]
            q_q, q_s = _quant_tile(q_ref[0])
            sc = jax.lax.dot_general(
                q_q, k_q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (q_s * k_s)
            partial = part_ref[b, j * max_bpc + u] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            g_q, g_s = _quant_tile(g_ref[0])
            v_q, v_s = v_i8[:], kv_sc[1]
            dp = jax.lax.dot_general(
                g_q, v_q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (g_s * v_s)
            ds = p * (dp - d_ref[0][:, :1])
            ds_q, ds_s = _quant_tile(ds)
            acck[:] += jax.lax.dot_general(
                ds_q, q_q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (ds_s * q_s)
            p_q = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
            accv[:] += jax.lax.dot_general(
                p_q, g_q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT
            ).astype(jnp.float32) * (g_s / 127.0)

        @pl.when(u == max_bpc - 1)
        def _():
            dk_ref[0] = acck[:]
            dv_ref[0] = accv[:]

    dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(R, kb, max_bpc),
            in_specs=[
                pl.BlockSpec(
                    (1, bm, hd_pad),
                    lambda r, j, u, a, tn, sl, pt: (
                        r, a[r // heads, j * max_bpc + u], 0)),
                pl.BlockSpec((1, bk, hd_pad), lambda r, j, u, *p: (r, j, 0)),
                pl.BlockSpec((1, bk, hd_pad), lambda r, j, u, *p: (r, j, 0)),
                pl.BlockSpec(
                    (1, bm, hd_pad),
                    lambda r, j, u, a, tn, sl, pt: (
                        r, a[r // heads, j * max_bpc + u], 0)),
                pl.BlockSpec(
                    (1, bm, 128),
                    lambda r, j, u, a, tn, sl, pt: (
                        r, a[r // heads, j * max_bpc + u], 0)),
                pl.BlockSpec(
                    (1, bm, 128),
                    lambda r, j, u, a, tn, sl, pt: (
                        r, a[r // heads, j * max_bpc + u], 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, j, u, a, tn, sl, pt: (
                        r // heads, sl[r // heads, j * max_bpc + u], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, hd_pad), lambda r, j, u, *p: (r, j, 0)),
                pl.BlockSpec((1, bk, hd_pad), lambda r, j, u, *p: (r, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, hd_pad), jnp.float32),
                pltpu.VMEM((bk, hd_pad), jnp.float32),
                pltpu.VMEM((bk, hd_pad), jnp.int8),
                pltpu.VMEM((bk, hd_pad), jnp.int8),
                pltpu.SMEM((2,), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, kb * bk, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb * bk, hd_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(2 * bm * hd_pad, 6 * bk * hd_pad, bm * bk, 2 * bm * 128),
        ),
        interpret=interpret,
    )(t_src_i, t_nblocks, t_mask_slot, t_is_partial, q, k, v, g, stats,
      dcoef, pmask)
    return dk, dv
