"""Int8 quantized block-CSR SpMM — the serving-mode kernel.

Weights are blockwise-quantized int8 (per-tile symmetric absmax scales,
the standard W8 serving layout: 4x less HBM traffic than fp32 values);
dense activations arrive bf16/f32 and are dynamically quantized per tile
inside the kernel, so the contraction runs on the MXU's int8 path (2x the
bf16 rate on v5e). Accumulation: int32 per tile, rescaled to f32 with the
product of the two scales before the cross-block accumulation — the usual
W8A8 recipe, ~1e-2 relative error.

The reference is fp32-only; this is a new capability for production
serving (BASELINE "intended for large-scale deployment and serving").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

__all__ = ["quantize_panel_np", "bsr_spmm_panel_int8",
           "bsr_spmm_t_panel_int8", "bsr_sddmm_panel_int8"]


def quantize_panel_np(panel: np.ndarray):
    """fp32 ELL panel [mb, max_bpr, bm, bk] -> (int8 panel, f32 scales
    [mb, max_bpr]) with symmetric per-tile absmax quantization."""
    panel = np.asarray(panel, np.float32)
    absmax = np.abs(panel).max(axis=(2, 3))
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    q = np.clip(np.rint(panel / safe[:, :, None, None]), -127, 127)
    return q.astype(np.int8), scales


@functools.partial(jax.jit, static_argnames=(
    "mb", "max_bpr", "kb", "bm", "bk", "bn", "interpret"))
def bsr_spmm_panel_int8(
    block_cols,            # i32[mb * max_bpr] (scalar prefetch)
    nblocks,               # i32[mb]
    values_q,              # i8 [mb, max_bpr, bm, bk]
    scales,                # f32[mb, max_bpr]
    dense,                 # f32/bf16 [kb*bk, n_pad]
    *,
    mb: int,
    max_bpr: int,
    kb: int,
    bm: int,
    bk: int,
    bn: int,
    interpret: bool = False,
):
    """Returns ``f32[mb*bm, n_pad]``."""
    n_pad = dense.shape[1]
    nb = n_pad // bn

    def kernel(cols_ref, nblk_ref, vq_ref, sc_ref, dense_ref, out_ref):
        i = pl.program_id(0)
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(s < nblk_ref[i])
        def _():
            d = dense_ref[:].astype(jnp.float32)          # [bk, bn]
            d_absmax = jnp.max(jnp.abs(d))
            d_scale = jnp.maximum(d_absmax / 127.0, 1e-30)
            d_q = jnp.clip(jnp.round(d / d_scale), -127, 127
                           ).astype(jnp.int8)
            acc_i32 = jax.lax.dot(
                vq_ref[0, 0], d_q,
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)         # int8 MXU path
            w_scale = sc_ref[i, s]
            out_ref[:] += acc_i32.astype(jnp.float32) * (w_scale * d_scale)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(mb, nb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, 1, bm, bk),
                             lambda i, j, s, c, nb_: (i, s, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((bk, bn),
                             lambda i, j, s, c, nb_: (
                                 c[i * max_bpr + s], j)),
            ],
            out_specs=pl.BlockSpec((bm, bn),
                                   lambda i, j, s, c, nb_: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((mb * bm, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bk, bk * bn, 2 * bm * bn),
        ),
        interpret=interpret,
    )(block_cols, nblocks, values_q, scales, dense)


def _quant_tile(x):
    """Dynamic symmetric absmax int8 quantization of a VMEM tile."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(absmax / 127.0, 1e-30)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit, static_argnames=(
    "kb", "max_bpc", "mb", "bm", "bk", "bq", "interpret"))
def bsr_spmm_t_panel_int8(
    t_src_i,               # i32[kb * max_bpc] (scalar prefetch)
    t_src_s,               # i32[kb * max_bpc]
    t_nblocks,             # i32[kb]
    values_q,              # i8 [mb, max_bpr, bm, bk]
    scales,                # f32[mb, max_bpr] (SMEM)
    g,                     # f32/bf16 [mb*bm, q_pad]
    *,
    kb: int,
    max_bpc: int,
    mb: int,
    bm: int,
    bk: int,
    bq: int,
    interpret: bool = False,
):
    """W8A8 ``A^T @ G``: int8 weights off the ORIGINAL panel via the
    transposed block metadata (no value movement), int8-quantized G tiles,
    f32 rescale + accumulate. Returns ``f32[kb*bk, q_pad]``."""
    q_pad = g.shape[1]
    qb = q_pad // bq

    def kernel(ti_ref, ts_ref, tn_ref, vq_ref, sc_ref, g_ref, out_ref,
               acc_ref):
        j = pl.program_id(0)
        u = pl.program_id(2)

        @pl.when(u == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(u < tn_ref[j])
        def _():
            g_q, g_scale = _quant_tile(g_ref[:])
            acc_i32 = jax.lax.dot_general(
                vq_ref[0, 0], g_q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            w_scale = sc_ref[ti_ref[j * max_bpc + u],
                             ts_ref[j * max_bpc + u]]
            acc_ref[:] += acc_i32.astype(jnp.float32) * (w_scale * g_scale)

        @pl.when(u == max_bpc - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(kb, qb, max_bpc),
            in_specs=[
                pl.BlockSpec((1, 1, bm, bk),
                             lambda j, q, u, ti, ts, tn: (
                                 ti[j * max_bpc + u], ts[j * max_bpc + u],
                                 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((bm, bq),
                             lambda j, q, u, ti, ts, tn: (
                                 ti[j * max_bpc + u], q)),
            ],
            out_specs=pl.BlockSpec((bk, bq),
                                   lambda j, q, u, ti, ts, tn: (j, q)),
            scratch_shapes=[pltpu.VMEM((bk, bq), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((kb * bk, q_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bk, bm * bq, 2 * bk * bq),
        ),
        interpret=interpret,
    )(t_src_i, t_src_s, t_nblocks, values_q, scales, g)


@functools.partial(jax.jit, static_argnames=(
    "mb", "max_bpr", "bm", "bk", "bd", "interpret"))
def bsr_sddmm_panel_int8(
    block_cols,            # i32[mb * max_bpr] (scalar prefetch)
    nblocks,               # i32[mb]
    lhs,                   # f32/bf16 [mb*bm, d_pad]
    rhs,                   # f32/bf16 [kb*bk, d_pad]
    mask,                  # f32[mb, max_bpr, bm, bk]
    *,
    mb: int,
    max_bpr: int,
    bm: int,
    bk: int,
    bd: int,
    interpret: bool = False,
):
    """Int8 SDDMM: both dense tiles dynamically quantized, int8 MXU
    contraction, f32 rescale. Output panel ``f32[mb, max_bpr, bm, bk]``."""
    d_pad = lhs.shape[1]
    dt = d_pad // bd

    def kernel(cols_ref, nblk_ref, lhs_ref, rhs_ref, mask_ref, out_ref,
               acc):
        i = pl.program_id(0)
        s = pl.program_id(1)
        t = pl.program_id(2)

        # accumulate into VMEM scratch; store the output block ONCE at
        # the last contraction slot (the measured ~6% revisited-out_ref
        # penalty — CLAUDE.md kernel pattern)
        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(s < nblk_ref[i])
        def _():
            l_q, l_scale = _quant_tile(lhs_ref[:])
            r_q, r_scale = _quant_tile(rhs_ref[:])
            acc_i32 = jax.lax.dot_general(
                l_q, r_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            acc[:] += acc_i32.astype(jnp.float32) * (l_scale * r_scale)

        @pl.when(t == dt - 1)
        def _():
            out_ref[0, 0] = acc[:] * mask_ref[0, 0]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(mb, max_bpr, dt),
            in_specs=[
                pl.BlockSpec((bm, bd), lambda i, s, t, cols, nblk: (i, t)),
                pl.BlockSpec((bk, bd),
                             lambda i, s, t, cols, nblk: (
                                 cols[i * max_bpr + s], t)),
                pl.BlockSpec((1, 1, bm, bk),
                             lambda i, s, t, cols, nblk: (i, s, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bm, bk), lambda i, s, t, cols, nblk: (i, s, 0, 0)),
            scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mb, max_bpr, bm, bk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bd, bk * bd, 3 * bm * bk),
        ),
        interpret=interpret,
    )(block_cols, nblocks, lhs, rhs, mask)
