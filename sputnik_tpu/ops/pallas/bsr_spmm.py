"""Block-CSR SpMM Pallas kernel (the TPU answer to ``sputnik::CudaSpmm``,
``/root/reference/src/spmm_cuda.cu:49``).

Formulation: the sparse operand is held as a block panel
``values_panel[mb, max_bpr, bm, bk]`` (see ``blocking.BlockView``); the
kernel's grid walks ``(row_block i, out_tile j, block_slot s)`` with ``s``
innermost, accumulating ``out[i, j] += A_block[i, s] @ B[block_cols[i, s], j]``
on the MXU. ``block_cols`` and ``nblocks`` are scalar-prefetched so the dense
operand's tile DMA is index-driven (grid-level gather — SURVEY.md §7 "Hard
parts" #1). Padded slots repeat the previous block column, so their DMA is
elided by the pipeline, and their matmul is predicated off.

The fused bias(+ReLU) epilogue implements the reference's phantom
``spmm_bias`` op (``tests/test_spmm_bias_relu.py:37``; Sputnik's
``CudaSpmmBiasRelu``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

__all__ = ["bsr_spmm_panel", "bsr_spmm_panel_sel", "bsr_spmm"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "bm", "bk", "bn", "precision", "epilogue", "interpret", "mb",
        "max_bpr", "kb",
    ),
)
def bsr_spmm_panel(
    block_cols,            # i32[mb * max_bpr]  (flattened, scalar prefetch)
    nblocks,               # i32[mb]
    values_panel,          # f32[mb, max_bpr, bm, bk]
    dense,                 # f32[kb * bk, n_pad]
    bias,                  # f32[mb * bm, 1] (ignored unless epilogue)
    *,
    mb: int,
    max_bpr: int,
    kb: int,
    bm: int,
    bk: int,
    bn: int,
    precision: str = "default",
    epilogue: str = "none",  # none | bias | bias_relu
    interpret: bool = False,
):
    """Core panel SpMM: returns ``f32[mb * bm, n_pad]``."""
    n_pad = dense.shape[1]
    nb = n_pad // bn
    prec = jax.lax.Precision[precision.upper()]
    with_bias = epilogue != "none"

    def kernel(cols_ref, nblk_ref, vals_ref, dense_ref, *rest):
        bias_ref = rest[0] if with_bias else None
        out_ref, acc_ref = rest[-2], rest[-1]
        i = pl.program_id(0)
        s = pl.program_id(2)

        # Accumulate in a VMEM scratch and store to the output block ONCE at
        # the last slot. Accumulating directly into ``out_ref`` measured ~6%
        # slower at 4096^3 (the revisited output block round-trips through
        # the pipeline's copy machinery; the scratch stays put).
        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(s < nblk_ref[i])
        def _():
            acc_ref[:] += jax.lax.dot(
                vals_ref[0, 0],
                dense_ref[:],
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        @pl.when(s == max_bpr - 1)
        def _():
            acc = acc_ref[:]
            if with_bias:
                acc = acc + bias_ref[:]
                if epilogue == "bias_relu":
                    acc = jnp.maximum(acc, 0.0)
            out_ref[:] = acc

    grid = (mb, nb, max_bpr)
    flops = 2 * int(np.sum(np.asarray(nblocks))) if isinstance(
        nblocks, np.ndarray) else 2 * mb * max_bpr
    # The (bm, 1) bias stream only exists when the epilogue needs it — a
    # sub-lane-width block DMA'd every grid step is measurable drag.
    in_specs = [
        pl.BlockSpec(
            (1, 1, bm, bk),
            lambda i, j, s, cols, nblk: (i, s, 0, 0),
        ),
        pl.BlockSpec(
            (bk, bn),
            lambda i, j, s, cols, nblk: (cols[i * max_bpr + s], j),
        ),
    ]
    operands = [values_panel, dense]
    if with_bias:
        in_specs.append(pl.BlockSpec(
            (bm, 1), lambda i, j, s, cols, nblk: (i, 0)))
        operands.append(bias)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, s, cols, nblk: (i, j)
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mb * bm, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bk, bk * bn, 2 * bm * bn),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * bm * bk * n_pad,
            bytes_accessed=(
                mb * max_bpr * bm * bk * 4 + kb * bk * n_pad * 4 * mb
                + mb * bm * n_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_cols, nblocks, *operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bm", "bk", "bn", "precision", "interpret", "mb", "max_bpr",
    ),
)
def bsr_spmm_panel_sel(
    block_cols,            # i32[mb * max_bpr]  (sub-walk, scalar prefetch)
    nblocks,               # i32[mb]
    slot_sel,              # i32[mb * max_bpr]  panel slot of each sub-block
    values_panel,          # f32[mb, max_bpr_full, bm, bk]
    dense,                 # f32[rows, n_pad]
    *,
    mb: int,
    max_bpr: int,          # the SUB-walk's max blocks/row (grid extent)
    bm: int,
    bk: int,
    bn: int,
    precision: str = "default",
    interpret: bool = False,
):
    """Panel SpMM over a SUBSET of each row's blocks, selected by slot.

    Same MXU loop as :func:`bsr_spmm_panel`, but the panel slot visited at
    grid step ``s`` is ``slot_sel[i * max_bpr + s]`` instead of ``s`` —
    the values panel keeps its canonical layout while the walk is
    reordered/filtered. This is what lets the halo-overlap split
    (``parallel/sharded_ops.sharded_spmm_halo``) run the interior blocks
    against the LOCAL dense shard while the halo rows are still in
    flight, without reshuffling parameters. Returns ``f32[mb*bm, n_pad]``
    holding ONLY the selected blocks' contributions (callers sum the
    interior and halo passes — SpMM is linear in the block set)."""
    n_pad = dense.shape[1]
    nb = n_pad // bn
    prec = jax.lax.Precision[precision.upper()]

    def kernel(cols_ref, nblk_ref, sel_ref, vals_ref, dense_ref,
               out_ref, acc_ref):
        i = pl.program_id(0)
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(s < nblk_ref[i])
        def _():
            acc_ref[:] += jax.lax.dot(
                vals_ref[0, 0],
                dense_ref[:],
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        @pl.when(s == max_bpr - 1)
        def _():
            out_ref[:] = acc_ref[:]

    grid = (mb, nb, max_bpr)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda i, j, s, cols, nblk, sel: (
                        i, sel[i * max_bpr + s], 0, 0),
                ),
                pl.BlockSpec(
                    (bk, bn),
                    lambda i, j, s, cols, nblk, sel: (
                        cols[i * max_bpr + s], j),
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, s, cols, nblk, sel: (i, j)
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mb * bm, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bk, bk * bn, 2 * bm * bn),
        ),
        interpret=interpret,
    )(block_cols, nblocks, slot_sel, values_panel, dense)


def _panel_consts(topo, bm, bk):
    """Host-side per-topology constants for the kernel (cached on the view)."""
    bv = topo.block(bm, bk)
    return bv


def bsr_spmm(
    topo,
    values,
    dense,
    bias=None,
    *,
    bm: int = 128,
    bk: int = 128,
    bn: int = 128,
    precision: str = "default",
    epilogue: str = "none",
    interpret: bool = False,
):
    """CSR SpMM via the block panel: ``values[nnz_pad] x dense[n, n_out]
    -> [m, n_out]`` (optionally fused ``+ bias`` / ``relu``)."""
    bv = _panel_consts(topo, bm, bk)
    m, n_out = topo.m, dense.shape[-1]
    n_pad = _round_up(max(n_out, 1), bn)

    # values -> panel. Scatter (nnz writes) beats the inverse gather (dump
    # reads) by >10x on TPU at scale — measured 11.8 ms vs 144 ms at 4096^3
    # d=0.1. (The panel-native API avoids this boundary cost entirely.)
    flat = jnp.zeros((bv.dump + 1,), values.dtype)
    flat = flat.at[jnp.asarray(bv.scatter_idx)].set(values)
    panel = flat[: bv.dump].reshape(bv.values_shape)

    dense_pad = jnp.zeros((bv.n_pad, n_pad), dense.dtype)
    dense_pad = dense_pad.at[: dense.shape[0], :n_out].set(dense)

    if bias is None:
        bias_pad = jnp.zeros((bv.m_pad, 1), jnp.float32)
    else:
        bias_pad = jnp.zeros((bv.m_pad, 1), jnp.float32)
        bias_pad = bias_pad.at[:m, 0].set(bias)

    out = bsr_spmm_panel(
        jnp.asarray(bv.block_cols.reshape(-1)),
        jnp.asarray(bv.nblocks),
        panel,
        dense_pad,
        bias_pad,
        mb=bv.mb,
        max_bpr=bv.max_bpr,
        kb=bv.kb,
        bm=bm,
        bk=bk,
        bn=bn,
        precision=precision,
        epilogue=epilogue,
        interpret=interpret,
    )
    return out[:m, :n_out]
