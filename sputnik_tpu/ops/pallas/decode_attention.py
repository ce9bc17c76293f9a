"""Decode-time sparse attention kernel (single-query / small-qlen).

The reference has no serving path at all (SURVEY.md §1: "no scheduler, no
runtime, no serving path"); its fused-attention analogue covers prefill
only. This kernel closes the decode gap TPU-natively: each replica holds a
KV cache ``[s_max, hd]`` and a *block table* — the sparse set of KV blocks
its current query may attend to (attention sinks + local window, or any
topology-derived block list). The grid walks ``(replica, table slot)``,
streaming only the tabled KV blocks from HBM with an online softmax across
slots — decode cost is O(bytes of KV actually attended), not O(s_max).

Design notes (TPU-first):
  * Decode is HBM-bandwidth-bound: the MXU work per block (a
    ``[q_pad, hd] x [hd, bk]`` score tile with q_pad = 8 sublanes) is free
    next to the ``2 * bk * hd`` KV bytes streamed. Speed of light is the
    tabled KV bytes / HBM bandwidth.
  * One kernel serves fp32/bf16 AND int8 caches: per-token dequant scales
    fold into the score row (``sc * ks``) and the probability row
    (``p * vs``) — two (q_pad, bk) VPU multiplies, never a (bk, hd)
    dequant. An fp cache passes unit scales (a bk-wide f32 stream, 128x
    smaller than the KV traffic it rides along).
  * Grouped-query attention: ``group`` query replicas share one KV replica
    (cache indexed ``r // group``).
  * ``qlen > 1`` serves speculative-decode verification: the q tile holds
    the last ``qlen`` positions, causally masked against their global
    positions ``kv_len - qlen + row``.
  * Invalid table slots are clamped by the builder to an in-range block and
    predicated off by ``valid``; padding a slot with the *previous* slot's
    block id elides its DMA entirely (same trick as ``flash_sparse``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

__all__ = ["decode_attention_kernel", "QPAD"]

_NEG_LARGE = -1e30
QPAD = 8  # sublane padding of the query tile


@functools.partial(jax.jit, static_argnames=(
    "S", "bk", "qlen", "group", "interpret"))
def decode_attention_kernel(
    tbl,       # i32[R * S]   block ids into the KV cache (clamped in-range)
    valid,     # i32[R * S]   1 = slot participates
    kv_len,    # i32[R]       tokens currently in each cache
    q,         # f32[R, QPAD, hd_pad]    pre-scaled; rows >= qlen are junk
    k_cache,   # f32/bf16/int8 [R_kv, s_max, hd_pad]
    v_cache,   # same dtype/shape as k_cache
    k_scale,   # f32[R_kv, nb_pad8, bk]  per-token dequant scales, the
    v_scale,   # block rows padded to 8 (TPU sublane rule); the kernel
               # fetches the 8-row group holding block ``tbl`` and selects
               # row ``tbl % 8`` dynamically.
    *,
    S: int,
    bk: int,
    qlen: int,
    group: int,
    interpret: bool = False,
):
    """Returns ``out f32[R, QPAD, hd_pad]`` (rows >= qlen undefined)."""
    R = q.shape[0]
    hd_pad = q.shape[-1]

    def kernel(tbl_ref, val_ref, len_ref,
               q_ref, k_ref, v_ref, ks_ref, vs_ref,
               o_ref, acc, m_scr, l_scr):
        r, s = pl.program_id(0), pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_scr[:] = jnp.full_like(m_scr, _NEG_LARGE)
            l_scr[:] = jnp.zeros_like(l_scr)

        @pl.when(val_ref[r * S + s] == 1)
        def _():
            blk = tbl_ref[r * S + s]
            int8_cache = k_ref.dtype == jnp.int8
            # select scale row blk % 8 from the fetched 8-row group
            # (one-hot reduce: Mosaic has no dynamic_slice on values)
            row = jax.lax.broadcasted_iota(jnp.int32, (8, bk), 0)
            sel = (row == blk % 8).astype(jnp.float32)
            ks = jnp.sum(ks_ref[0] * sel, axis=0, keepdims=True)  # [1, bk]

            if int8_cache:
                # True int8 MXU path: quantize the (QPAD, hd) query tile
                # per row — tiny VPU work — and contract int8 x int8 to
                # int32. Dequantizing the whole KV block instead was
                # measured VPU-bound (it erases the bandwidth saving).
                qv = q_ref[0]
                qs = jnp.maximum(jnp.max(jnp.abs(qv), axis=1,
                                         keepdims=True), 1e-30) / 127.0
                q_i8 = jnp.clip(jnp.round(qv / qs), -127, 127
                                ).astype(jnp.int8)
                sc_i = jax.lax.dot_general(
                    q_i8, k_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)  # [QPAD, bk]
                sc = sc_i.astype(jnp.float32) * qs * ks
            else:
                sc = jax.lax.dot_general(
                    q_ref[0].astype(k_ref.dtype), k_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [QPAD, bk]
                sc = sc * ks                               # fold k dequant

            # causal mask vs each query row's global position
            kpos = blk * bk + jax.lax.broadcasted_iota(
                jnp.int32, (QPAD, bk), 1)
            qpos = (len_ref[r] - qlen) + jax.lax.broadcasted_iota(
                jnp.int32, (QPAD, bk), 0)
            sc = jnp.where(kpos <= qpos, sc, _NEG_LARGE)

            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
            p = jnp.exp(sc - m_new)
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            corr = jnp.exp(m_prev - m_new)
            l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(
                p, axis=1, keepdims=True)
            m_scr[:, :1] = m_new
            vs = jnp.sum(vs_ref[0] * sel, axis=0, keepdims=True)  # [1, bk]
            if int8_cache:
                # fold the per-token v scales into p BEFORE quantizing, so
                # the PV contraction stays int8 x int8 on the MXU.
                pv = p * vs
                ps = jnp.maximum(jnp.max(pv, axis=1, keepdims=True),
                                 1e-30) / 127.0
                p_i8 = jnp.clip(jnp.round(pv / ps), 0, 127
                                ).astype(jnp.int8)
                ctx_i = jax.lax.dot(p_i8, v_ref[0],
                                    preferred_element_type=jnp.int32,
                                    precision=jax.lax.Precision.DEFAULT)
                acc[:] = acc[:] * corr + ctx_i.astype(jnp.float32) * ps
            else:
                pv = (p * vs).astype(v_ref.dtype) \
                    if v_ref.dtype != jnp.float32 else p * vs
                acc[:] = acc[:] * corr + jax.lax.dot(
                    pv, v_ref[0], preferred_element_type=jnp.float32)

        @pl.when(s == S - 1)
        def _():
            o_ref[0] = acc[:] / jnp.maximum(l_scr[:, :1], 1e-30)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(R, S),
            in_specs=[
                pl.BlockSpec((1, QPAD, hd_pad),
                             lambda r, s, *p: (r, 0, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, s, tbl, val, ln: (r // group, tbl[r * S + s],
                                                0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, s, tbl, val, ln: (r // group, tbl[r * S + s],
                                                0)),
                pl.BlockSpec(
                    (1, 8, bk),
                    lambda r, s, tbl, val, ln: (r // group,
                                                tbl[r * S + s] // 8, 0)),
                pl.BlockSpec(
                    (1, 8, bk),
                    lambda r, s, tbl, val, ln: (r // group,
                                                tbl[r * S + s] // 8, 0)),
            ],
            out_specs=pl.BlockSpec((1, QPAD, hd_pad),
                                   lambda r, s, *p: (r, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((QPAD, hd_pad), jnp.float32),
                pltpu.VMEM((QPAD, 128), jnp.float32),
                pltpu.VMEM((QPAD, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, QPAD, hd_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vm(3 * QPAD * hd_pad, 2 * bk * hd_pad, 4 * QPAD * 128),
        ),
        interpret=interpret,
    )(tbl, valid, kv_len, q, k_cache, v_cache, k_scale, v_scale)
    return out
