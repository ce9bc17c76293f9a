"""Paged decode attention + paged append kernels (vLLM-class KV paging).

The block-KV decode path (``pallas/decode_attention.py``) gives each
sequence a contiguous ``[s_max, hd]`` cache — simple, but a serving pool
admitting ragged-length sequences strands ``s_max - len`` tokens of HBM
per slot. Here KV lives in a shared PAGE POOL ``[P, bk, hd_pad]`` and each
sequence owns a list of pages (``page_table``); fragmentation drops to
under one page per sequence and slots admit/evict without moving data.

TPU-native design:
  * the decode kernel already reads KV through a scalar-prefetched block
    table — paging only changes WHAT the table holds (physical page ids
    into the pool instead of in-cache block indices) plus a parallel
    array of LOGICAL block ids for the causal position math;
  * per-token dequant scales ride the same pool: stored ``[P, bk]`` f32,
    READ as the free reshape ``[P//8, 8, bk]`` (fetch the 8-page group,
    one-hot the ``page % 8`` row — Mosaic has no dynamic value indexing),
    WRITTEN as the free reshape ``[P, bk//128, 128]`` (full-page one-hot,
    no cross-page block sharing, so appends never revisit blocks);
  * the append kernel is the paged twin of ``ragged_append``: positions
    (page, offset) are scalar-prefetched into the block index maps, all
    four pool buffers update in place via ``input_output_aliases``, and
    an unallocated/frozen/full slot keeps the pool bit-identical.

Pool pages are shared across sequences AND kv-head replicas: replica r's
logical block b lives wherever ``page_table[r, b]`` points. Two replicas
never own the same page, so the append grid touches disjoint blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

from .decode_attention import QPAD
from .ragged_append import SUB

__all__ = ["paged_attention_kernel", "paged_append_kernel"]

_NEG_LARGE = -1e30


@functools.partial(jax.jit, static_argnames=("S", "bk", "group",
                                              "qlen", "interpret"))
def paged_attention_kernel(
    tbl,       # i32[R * S]  PHYSICAL page ids (clamped in-range)
    logical,   # i32[R * S]  logical block ids (position math)
    valid,     # i32[R * S]  1 = slot participates
    kv_len,    # i32[R]      tokens currently in each sequence replica
    q,         # f32[R, QPAD, hd_pad]  pre-scaled; rows >= qlen are junk
    k_pool,    # f32/bf16/int8 [P, bk, hd_pad]
    v_pool,    # same dtype/shape
    k_scale,   # f32[P_pad8 // 8, 8, bk]  (free reshape of [P_pad8, bk])
    v_scale,
    *,
    S: int,
    bk: int,
    group: int,
    qlen: int = 1,
    interpret: bool = False,
):
    """Paged decode attention; ``qlen > 1`` serves speculative
    verification (queries are the last ``qlen`` cache positions,
    causally masked). Returns ``out f32[R, QPAD, hd_pad]`` (rows >=
    ``qlen`` undefined)."""
    R = q.shape[0]
    hd_pad = q.shape[-1]

    def kernel(tbl_ref, log_ref, val_ref, len_ref,
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
            page = tbl_ref[r * S + s]
            int8_pool = k_ref.dtype == jnp.int8
            row = jax.lax.broadcasted_iota(jnp.int32, (8, bk), 0)
            sel = (row == page % 8).astype(jnp.float32)
            ks = jnp.sum(ks_ref[0] * sel, axis=0, keepdims=True)  # [1, bk]

            if int8_pool:
                qv = q_ref[0]
                qs = jnp.maximum(jnp.max(jnp.abs(qv), axis=1,
                                         keepdims=True), 1e-30) / 127.0
                q_i8 = jnp.clip(jnp.round(qv / qs), -127, 127
                                ).astype(jnp.int8)
                sc_i = jax.lax.dot_general(
                    q_i8, k_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                sc = sc_i.astype(jnp.float32) * qs * ks
            else:
                sc = jax.lax.dot_general(
                    q_ref[0].astype(k_ref.dtype), k_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sc = sc * ks

            kpos = log_ref[r * S + s] * bk + jax.lax.broadcasted_iota(
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
            vs = jnp.sum(vs_ref[0] * sel, axis=0, keepdims=True)
            if int8_pool:
                pv = p * vs
                ps = jnp.maximum(jnp.max(pv, axis=1, keepdims=True),
                                 1e-30) / 127.0
                p_i8 = jnp.clip(jnp.round(pv / ps), 0, 127).astype(jnp.int8)
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

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(R, S),
            in_specs=[
                pl.BlockSpec((1, QPAD, hd_pad),
                             lambda r, s, *p: (r, 0, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, s, tbl, lg, vl, ln: (tbl[r * S + s], 0, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, s, tbl, lg, vl, ln: (tbl[r * S + s], 0, 0)),
                pl.BlockSpec(
                    (1, 8, bk),
                    lambda r, s, tbl, lg, vl, ln: (tbl[r * S + s] // 8,
                                                   0, 0)),
                pl.BlockSpec(
                    (1, 8, bk),
                    lambda r, s, tbl, lg, vl, ln: (tbl[r * S + s] // 8,
                                                   0, 0)),
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
    )(tbl, logical, valid, kv_len, q, k_pool, v_pool, k_scale, v_scale)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_append_kernel(
    page,       # i32[R]   physical page per replica. MUST be in range and
                #          DISJOINT across replicas (skipped replicas get
                #          the caller's dump page): grid steps touching a
                #          shared page would read-modify-writeback it, and
                #          the pipeline's lookahead input DMA can fetch a
                #          STALE copy before an earlier step's store lands.
    off,        # i32[R]   token offset within the page, in [0, bk)
    ok,         # i32[R]   1 = write; 0 = keep the (dump) page's bytes
    tok_k,      # pool dtype [R, hd_pad]
    tok_v,      # pool dtype [R, hd_pad]
    tok_ks,     # f32[R, 128]  lane-broadcast per-token scale
    tok_vs,     # f32[R, 128]
    k_pool,     # pool dtype [P, bk, hd_pad]  (updated in place)
    v_pool,
    ks_pool,    # f32[P, bk]
    vs_pool,
    *,
    interpret: bool = False,
):
    """One token per replica into its (page, offset) slot."""
    P, bk, hd_pad = k_pool.shape
    if bk % 128:
        raise ValueError(f"page size bk={bk} must be a multiple of 128")
    nrow = bk // 128

    def kernel(pg_ref, off_ref, ok_ref, tk_ref, tv_ref, tks_ref, tvs_ref,
               k_ref, v_ref, ks_ref, vs_ref,
               ok_out, ov_out, oks_out, ovs_out):
        r = pl.program_id(0)
        o = off_ref[r]
        write = ok_ref[r] == 1

        row = jax.lax.broadcasted_iota(jnp.int32, (SUB, hd_pad), 0)
        m_kv = (row == o % SUB) & write
        ok_out[0] = jnp.where(m_kv, tk_ref[0], k_ref[0])
        ov_out[0] = jnp.where(m_kv, tv_ref[0], v_ref[0])

        srow = jax.lax.broadcasted_iota(jnp.int32, (nrow, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nrow, 128), 1)
        m_sc = (srow == o // 128) & (lane == o % 128) & write
        oks_out[0] = jnp.where(m_sc, tks_ref[0], ks_ref[0])
        ovs_out[0] = jnp.where(m_sc, tvs_ref[0], vs_ref[0])

    kv_spec = pl.BlockSpec(
        (1, SUB, hd_pad),
        lambda r, page, off, ok: (page[r], off[r] // SUB, 0))
    sc_spec = pl.BlockSpec(
        (1, nrow, 128), lambda r, page, off, ok: (page[r], 0, 0))
    tok_spec = pl.BlockSpec((1, 1, hd_pad),
                            lambda r, page, off, ok: (r, 0, 0))
    tsc_spec = pl.BlockSpec((1, 1, 128),
                            lambda r, page, off, ok: (r, 0, 0))
    R = tok_k.shape[0]
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(R,),
            in_specs=[tok_spec, tok_spec, tsc_spec, tsc_spec,
                      kv_spec, kv_spec, sc_spec, sc_spec],
            out_specs=[kv_spec, kv_spec, sc_spec, sc_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct((P, nrow, 128), ks_pool.dtype),
            jax.ShapeDtypeStruct((P, nrow, 128), vs_pool.dtype),
        ],
        # indices count the 3 scalar-prefetch operands
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        interpret=interpret,
    )(page, off, ok, tok_k[:, None, :], tok_v[:, None, :],
      tok_ks[:, None, :], tok_vs[:, None, :],
      k_pool, v_pool,
      ks_pool.reshape(P, nrow, 128), vs_pool.reshape(P, nrow, 128))
    k2, v2, ks2, vs2 = outs
    return k2, v2, ks2.reshape(P, bk), vs2.reshape(P, bk)
