"""Int8 fused sparse attention FORWARD — the serving-mode flash kernel.

Same block-classified masking and online softmax as
``flash_sparse.flash_sparse_attention_fwd``, but both MXU contractions run
on the int8 path (2x the bf16 rate on v5e): q/k/v tiles are dynamically
quantized per tile (symmetric absmax), QK^T accumulates int32 and is
rescaled to f32 before the softmax; the probability tile is quantized with
the fixed scale 127 (p in [0, 1]) for the PV contraction. ~1e-2 relative
error — serving only; training uses the fp32 kernel.

The reference is fp32-only (``src/spmm_cuda.cu:41-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr_spmm_int8 import _quant_tile

__all__ = ["flash_sparse_attention_fwd_int8"]

_NEG_LARGE = -1e30


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
    """Returns ``out [R, mb*bm, hd_pad]`` (f32)."""
    hd_pad = q.shape[-1]

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, pm_ref,
               o_ref,
               acc, m_scr, l_scr):
        i, s = pl.program_id(1), pl.program_id(2)
        r = pl.program_id(0)
        b = r // heads

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_scr[:] = jnp.full_like(m_scr, _NEG_LARGE)
            l_scr[:] = jnp.zeros_like(l_scr)

        @pl.when(s < nblk_ref[b, i])
        def _():
            q_q, q_s = _quant_tile(q_ref[0])
            k_q, k_s = _quant_tile(k_ref[0])
            sc_i32 = jax.lax.dot_general(
                q_q, k_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
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
                p_q, v_q, preferred_element_type=jnp.int32)
            acc[:] = acc[:] * corr + pv_i32.astype(jnp.float32) * (
                v_s / 127.0)

        @pl.when(s == max_bpr - 1)
        def _():
            denom = jnp.maximum(l_scr[:, :1], 1e-30)
            o_ref[0] = acc[:] / denom

    grid = (R, mb, max_bpr)
    return pl.pallas_call(
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
            out_specs=pl.BlockSpec((1, bm, hd_pad),
                                   lambda r, i, s, *p: (r, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, pmask)
