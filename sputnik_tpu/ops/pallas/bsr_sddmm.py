"""Block-CSR SDDMM Pallas kernel (TPU answer to ``sputnik::CudaSddmm``,
``/root/reference/src/sddmm_cuda.cu:46``).

Computes ``(lhs @ rhs^T)`` sampled at the topology's nonzeros (the rhs is
stored row-major ``[n, d]`` and transposed inside the contraction, matching
the reference semantics confirmed at ``tests/test_sddmm.py:9``). Output is
the block panel ``[mb, max_bpr, bm, bk]`` — only occupied tiles are computed,
each as an MXU ``lhs_tile[i] @ rhs_tile[block_cols[i, s]]^T`` with the
per-tile element mask applied on the last contraction step. The caller
gathers the panel back to the flat ``[nnz_pad]`` value vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

__all__ = ["bsr_sddmm_panel", "bsr_sddmm"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "mb", "max_bpr", "bm", "bk", "bd", "precision", "interpret"
    ),
)
def bsr_sddmm_panel(
    block_cols,            # i32[mb * max_bpr] (scalar prefetch)
    nblocks,               # i32[mb]
    lhs,                   # f32[mb * bm, d_pad]
    rhs,                   # f32[kb * bk, d_pad]
    mask,                  # f32[mb, max_bpr, bm, bk]  (1.0 at real nnz)
    *,
    mb: int,
    max_bpr: int,
    bm: int,
    bk: int,
    bd: int,
    precision: str = "default",
    interpret: bool = False,
):
    """Returns the sampled-product panel ``f32[mb, max_bpr, bm, bk]``."""
    d_pad = lhs.shape[1]
    dt = d_pad // bd
    prec = jax.lax.Precision[precision.upper()]

    def kernel(cols_ref, nblk_ref, lhs_ref, rhs_ref, mask_ref, out_ref,
               acc_ref):
        i = pl.program_id(0)
        s = pl.program_id(1)
        t = pl.program_id(2)

        # VMEM scratch accumulation over the contraction tiles, single
        # masked store at the last step (same win as bsr_spmm: a revisited
        # output block round-trips the pipeline's copy machinery).
        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(s < nblk_ref[i])
        def _():
            acc_ref[:] += jax.lax.dot_general(
                lhs_ref[:],
                rhs_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        @pl.when(t == dt - 1)
        def _():
            out_ref[0, 0] = acc_ref[:] * mask_ref[0, 0]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(mb, max_bpr, dt),
            in_specs=[
                pl.BlockSpec(
                    (bm, bd), lambda i, s, t, cols, nblk: (i, t)
                ),
                pl.BlockSpec(
                    (bk, bd),
                    lambda i, s, t, cols, nblk: (cols[i * max_bpr + s], t),
                ),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda i, s, t, cols, nblk: (i, s, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bm, bk), lambda i, s, t, cols, nblk: (i, s, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((mb, max_bpr, bm, bk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vm(bm * bd, bk * bd, 3 * bm * bk),
        ),
        interpret=interpret,
    )(block_cols, nblocks, lhs, rhs, mask)


def bsr_sddmm(
    topo,
    lhs,
    rhs,
    *,
    bm: int = 128,
    bk: int = 128,
    bd: int = 128,
    precision: str = "default",
    interpret: bool = False,
):
    """``lhs[m, d] x rhs[n, d] -> values[nnz_pad]`` sampled at the topology."""
    bv = topo.block(bm, bk)
    d = lhs.shape[-1]
    d_pad = _round_up(max(d, 1), bd)

    lhs_pad = jnp.zeros((bv.m_pad, d_pad), lhs.dtype)
    lhs_pad = lhs_pad.at[: lhs.shape[0], :d].set(lhs)
    rhs_pad = jnp.zeros((bv.n_pad, d_pad), rhs.dtype)
    rhs_pad = rhs_pad.at[: rhs.shape[0], :d].set(rhs)

    panel = bsr_sddmm_panel(
        jnp.asarray(bv.block_cols.reshape(-1)),
        jnp.asarray(bv.nblocks),
        lhs_pad,
        rhs_pad,
        jnp.asarray(bv.mask, jnp.float32),
        mb=bv.mb,
        max_bpr=bv.max_bpr,
        bm=bm,
        bk=bk,
        bd=bd,
        precision=precision,
        interpret=interpret,
    )
    # Panel -> flat values (padding slots read the appended zero).
    flat = jnp.concatenate([panel.reshape(-1), jnp.zeros((1,), panel.dtype)])
    return jnp.take(flat, jnp.asarray(bv.gather_idx))
