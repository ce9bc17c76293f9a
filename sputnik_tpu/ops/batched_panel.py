"""Batched panel ops — the many-mask family on the MXU block panel.

The reference's transformer calls phantom ``*_many_mask`` CUDA bindings:
per-batch-element masks, heads sharing their batch element's mask
(``tests/transformer/utils.py:17-38``). Here that family runs as real
batched Pallas kernels: one kernel launch for ALL replicas, with a batch
grid dimension whose index maps divide the replica id by ``heads`` to pick
the right mask's scalar-prefetched block metadata — so the ``h`` heads of a
batch element share its topology without duplicating it, and the whole
SDDMM -> softmax -> SpMM chain stays in panel layout.

Off-TPU the same ops run through the vmapped XLA oracle (``many_mask``)
with panel <-> flat conversion at the boundary, so one test suite covers
both paths.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..blocking import stack_block_meta
from . import xla_ops
from ._common import device_arrays as _device_arrays
from ._common import interp as _interp
from ._common import round_up as _round_up
from ._common import use_kernels as _use_kernels

__all__ = ["BatchedPanelSpec", "spmm_bh", "sddmm_bh", "sparse_softmax_bh"]

_NEG_LARGE = -1e30

# Scoped-VMEM request for the batched kernels: size to the working set
# (r5 — a blanket 100 MB request measured 1.8x slower on small-tile
# grids). One sizing formula for the whole codebase: _common.
from ._common import vmem_request as _vmem_for


class BatchedPanelSpec:
    """Static bundle for ``B`` same-shape topologies x ``heads`` replicas."""

    def __init__(self, topologies: List, *, heads: int = 1,
                 bm: int = 128, bk: int = 128):
        self.topologies = list(topologies)
        self.B = len(topologies)
        self.heads = heads
        self.bm, self.bk = bm, bk
        views = [t.block(bm, bk) for t in topologies]
        self.views = views
        self.meta = stack_block_meta(views)
        self.mb, self.kb = self.meta["mb"], self.meta["kb"]
        self.max_bpr = self.meta["max_bpr"]
        self.max_bpc = self.meta["max_bpc"]
        self.m = topologies[0].m
        self.n = topologies[0].n
        self.m_pad = self.mb * bm
        self.n_pad = self.kb * bk

    @classmethod
    def from_many_mask(cls, mt, *, heads: int = 1, bm: int = 128,
                       bk: int = 128) -> "BatchedPanelSpec":
        return cls(mt.topologies, heads=heads, bm=bm, bk=bk)

    @property
    def R(self) -> int:
        return self.B * self.heads

    @property
    def panel_shape(self):
        """Per-replica panel shape."""
        return (self.mb, self.max_bpr, self.bm, self.bk)

    def stack_values(self, values_r) -> np.ndarray:
        """Flat many-mask values ``[R, nnz_pad]`` -> panels ``[R, *]``
        (host-side boundary)."""
        values_r = np.asarray(values_r, np.float32)
        out = np.zeros((self.R,) + self.panel_shape, np.float32)
        for r in range(self.R):
            v = self.views[r // self.heads]
            flat = np.zeros(v.dump + 1, np.float32)
            take = min(v.scatter_idx.shape[0], values_r.shape[1])
            flat[v.scatter_idx[:take]] = values_r[r, :take]
            out[r, :, : v.max_bpr] = flat[: v.dump].reshape(v.values_shape)
        return out

    def unstack_values(self, panels, nnz_pad: int):
        """Panels ``[R, *]`` -> flat many-mask values ``[R, nnz_pad]``
        (device op; boundary only)."""
        outs = []
        for r in range(self.R):
            v = self.views[r // self.heads]
            p = panels[r, :, : v.max_bpr]
            flat = jnp.concatenate(
                [p.reshape(-1), jnp.zeros((1,), panels.dtype)])
            g = np.full(nnz_pad, v.dump, np.int32)
            take = min(nnz_pad, len(v.gather_idx))
            g[:take] = np.minimum(v.gather_idx[:take], v.dump)
            outs.append(jnp.take(flat, jnp.asarray(g)))
        return jnp.stack(outs)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# ---------------------------------------------------------------------------
# Batched Pallas kernels. Grid dim 0 is the replica id r; metadata index maps
# use r // heads.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "bn", "interpret",
    "vmem"))
def _k_spmm_bh(cols, nblk, panels, dense, *, R, heads, mb, max_bpr,
               bm, bk, bn, interpret, vmem=100 * 1024 * 1024):
    n_pad = dense.shape[-1]
    nb = n_pad // bn

    def kernel(cols_ref, nblk_ref, p_ref, d_ref, o_ref, acc):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(3)

        # VMEM-scratch accumulate, single store at the last slot (the
        # measured ~6% revisited-out_ref penalty; CLAUDE.md pattern)
        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(s < nblk_ref[r // heads, i])
        def _():
            acc[:] += jax.lax.dot(
                p_ref[0, 0, 0], d_ref[0],
                preferred_element_type=jnp.float32)

        @pl.when(s == max_bpr - 1)
        def _():
            o_ref[0] = acc[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R, mb, nb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, 1, 1, bm, bk),
                             lambda r, i, j, s, c, nb_: (r, i, s, 0, 0)),
                pl.BlockSpec(
                    (1, bk, bn),
                    lambda r, i, j, s, c, nb_: (
                        r, c[r // heads, i * max_bpr + s], j)),
            ],
            out_specs=pl.BlockSpec(
                (1, bm, bn), lambda r, i, j, s, c, nb_: (r, i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((R, mb * bm, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(cols, nblk, panels, dense)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "bd", "interpret",
    "vmem"))
def _k_sddmm_bh(cols, nblk, mask, lhs, rhs, *, R, heads, mb, max_bpr,
                bm, bk, bd, interpret, vmem=100 * 1024 * 1024):
    d_pad = lhs.shape[-1]
    dt = d_pad // bd

    def kernel(cols_ref, nblk_ref, m_ref, l_ref, r_ref, o_ref, acc):
        r, i = pl.program_id(0), pl.program_id(1)
        s, t = pl.program_id(2), pl.program_id(3)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(s < nblk_ref[r // heads, i])
        def _():
            acc[:] += jax.lax.dot_general(
                l_ref[0], r_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # single store; padded s slots store 0 * mask (mask is zero
        # there), keeping every output block defined
        @pl.when(t == dt - 1)
        def _():
            o_ref[0, 0, 0] = acc[:] * m_ref[0, 0, 0]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R, mb, max_bpr, dt),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, bm, bk),
                    lambda r, i, s, t, c, nb_: (r // heads, i, s, 0, 0)),
                pl.BlockSpec((1, bm, bd),
                             lambda r, i, s, t, c, nb_: (r, i, t)),
                pl.BlockSpec(
                    (1, bk, bd),
                    lambda r, i, s, t, c, nb_: (
                        r, c[r // heads, i * max_bpr + s], t)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, bm, bk),
                lambda r, i, s, t, c, nb_: (r, i, s, 0, 0)),
            scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (R, mb, max_bpr, bm, bk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(cols, nblk, mask, lhs, rhs)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "kb", "max_bpc", "bm", "bk", "bq", "interpret",
    "vmem"))
def _k_spmm_t_bh(ti, ts, tn, panels, g, *, R, heads, kb, max_bpc,
                 bm, bk, bq, interpret, vmem=100 * 1024 * 1024):
    q_pad = g.shape[-1]
    qb = q_pad // bq

    def kernel(ti_ref, ts_ref, tn_ref, p_ref, g_ref, o_ref, acc):
        r, j, u = pl.program_id(0), pl.program_id(1), pl.program_id(3)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(u < tn_ref[r // heads, j])
        def _():
            acc[:] += jax.lax.dot_general(
                p_ref[0, 0, 0], g_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(u == max_bpc - 1)
        def _():
            o_ref[0] = acc[:]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(R, kb, qb, max_bpc),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, bm, bk),
                    lambda r, j, q, u, a, b_, c: (
                        r, a[r // heads, j * max_bpc + u],
                        b_[r // heads, j * max_bpc + u], 0, 0)),
                pl.BlockSpec(
                    (1, bm, bq),
                    lambda r, j, q, u, a, b_, c: (
                        r, a[r // heads, j * max_bpc + u], q)),
            ],
            out_specs=pl.BlockSpec(
                (1, bk, bq), lambda r, j, q, u, a, b_, c: (r, j, q)),
            scratch_shapes=[pltpu.VMEM((bk, bq), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((R, kb * bk, q_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=interpret,
    )(ti, ts, tn, panels, g)


# ---------------------------------------------------------------------------
# Impl layer with oracle fallback.
# ---------------------------------------------------------------------------


def _meta_dev(spec):
    """``spec.meta`` as cached DEVICE arrays (see ``_common.device_arrays``:
    keeps the mask/block metadata out of jit compile payloads)."""
    return _device_arrays(spec, "_meta_dev_cache", lambda: spec.meta)


def _mask_r(spec):
    """Element mask broadcast to replicas without materialising ``heads``
    copies: ``[B, ...] -> [R, ...]`` via a broadcast + reshape (XLA keeps
    the broadcast lazy inside the consuming fusion)."""
    mask = _meta_dev(spec)["mask"]
    shape = (spec.B, spec.heads) + mask.shape[1:]
    return jnp.broadcast_to(mask[:, None], shape).reshape(
        (spec.R,) + mask.shape[1:])


def _pad_rows(spec, x, rows, d_pad):
    out = jnp.zeros((x.shape[0], rows, d_pad), x.dtype)
    return out.at[:, : x.shape[1], : x.shape[2]].set(x)


def _spmm_impl(spec, panels, dense):
    """panels [R, *] x dense [R, n, q] -> [R, m, q]."""
    q = dense.shape[-1]
    if _use_kernels():
        # Output-tile width: every column tile RE-STREAMS the whole
        # values panel (the j grid dim revisits all of a row's blocks),
        # so the widest VMEM-fitting divisor of the 128-padded width
        # minimises weight traffic — the r4 512-cap left the MoE bank
        # restreaming its panels nb times (see RESULTS.md r5 bank
        # rows). Tiny widths keep 128.
        q_pad = _round_up(max(q, 1), 128)
        bn = 128
        if q >= 512:
            budget = 48 * 1024 * 1024
            cand = q_pad
            while cand >= 512:
                ws = ((spec.bm + spec.bk) * cand * 4 * 2
                      + spec.bm * spec.bk * 4 * 2)
                if q_pad % cand == 0 and ws <= budget:
                    break
                cand -= 128
            bn = max(cand, 512)
        q_pad = _round_up(q_pad, bn)
        dense_p = _pad_rows(spec, dense, spec.n_pad, q_pad)
        out = _k_spmm_bh(
            _meta_dev(spec)["block_cols"],
            _meta_dev(spec)["nblocks"],
            panels, dense_p,
            R=spec.R, heads=spec.heads, mb=spec.mb,
            max_bpr=spec.max_bpr, bm=spec.bm, bk=spec.bk, bn=bn,
            interpret=_interp(),
            vmem=_vmem_for(spec.bm * spec.bk, spec.bk * bn,
                           spec.bm * bn))
        return out[:, : spec.m, :q]
    # oracle: per-replica gather/segment formulation
    nnz_pad = max(t.nnz_pad for t in spec.topologies)
    vals = spec.unstack_values(panels, nnz_pad)
    outs = []
    for r in range(spec.R):
        t = spec.topologies[r // spec.heads]
        outs.append(xla_ops.spmm(
            vals[r, : t.nnz_pad], t.column_indices, t.row_ids, t.m,
            dense[r]))
    return jnp.stack(outs)


def _spmm_t_impl(spec, panels, g_r):
    """A_r^T @ G_r: panels [R, *] x g [R, m_pad, q_pad] -> [R, n, q]."""
    q = g_r.shape[-1]
    if _use_kernels():
        # same restream economics as _spmm_impl: every output-column
        # tile rewalks the panel, so take the widest VMEM-fitting
        # divisor of the 128-padded width
        q_pad = _round_up(max(q, 1), 128)
        bq = 128
        if q >= 512:
            budget = 48 * 1024 * 1024
            cand = q_pad
            while cand >= 512:
                ws = ((spec.bm + spec.bk) * cand * 4 * 2
                      + spec.bm * spec.bk * 4 * 2)
                if q_pad % cand == 0 and ws <= budget:
                    break
                cand -= 128
            bq = max(cand, 512)
        q_pad = _round_up(q_pad, bq)
        g_p = _pad_rows(spec, g_r, spec.m_pad, q_pad)
        out = _k_spmm_t_bh(
            _meta_dev(spec)["t_src_i"],
            _meta_dev(spec)["t_src_s"],
            _meta_dev(spec)["t_nblocks"],
            panels, g_p,
            R=spec.R, heads=spec.heads, kb=spec.kb,
            max_bpc=spec.max_bpc, bm=spec.bm, bk=spec.bk, bq=bq,
            interpret=_interp(),
            vmem=_vmem_for(spec.bm * spec.bk, spec.bm * bq,
                           spec.bk * bq))
        return out[:, : spec.n, :q]
    nnz_pad = max(t.nnz_pad for t in spec.topologies)
    vals = spec.unstack_values(panels, nnz_pad)
    outs = []
    for r in range(spec.R):
        t = spec.topologies[r // spec.heads]
        tt, perm = t.transpose()
        vt = jnp.take(vals[r, : t.nnz_pad], jnp.asarray(perm))
        outs.append(xla_ops.spmm(
            vt, tt.column_indices, tt.row_ids, tt.m, g_r[r, : t.m]))
    return jnp.stack(outs)


def _sddmm_impl(spec, lhs_r, rhs_r):
    """lhs [R, m, d] x rhs [R, n, d] -> panels [R, *]."""
    d = lhs_r.shape[-1]
    if _use_kernels():
        bd = 128
        d_pad = _round_up(max(d, 1), bd)
        lhs_p = _pad_rows(spec, lhs_r, spec.m_pad, d_pad)
        rhs_p = _pad_rows(spec, rhs_r, spec.n_pad, d_pad)
        return _k_sddmm_bh(
            _meta_dev(spec)["block_cols"],
            _meta_dev(spec)["nblocks"],
            _meta_dev(spec)["mask"],
            lhs_p, rhs_p,
            R=spec.R, heads=spec.heads, mb=spec.mb,
            max_bpr=spec.max_bpr, bm=spec.bm, bk=spec.bk, bd=bd,
            interpret=_interp(),
            vmem=_vmem_for(spec.bm * spec.bk, spec.bm * bd,
                           spec.bk * bd))
    outs = []
    for r in range(spec.R):
        t = spec.topologies[r // spec.heads]
        v = spec.views[r // spec.heads]
        flat_vals = xla_ops.sddmm(
            lhs_r[r], rhs_r[r], t.row_ids, t.column_indices, t.valid)
        flat = jnp.zeros((v.dump + 1,), flat_vals.dtype)
        flat = flat.at[jnp.asarray(v.scatter_idx)].set(flat_vals)
        p = flat[: v.dump].reshape(v.values_shape)
        if v.max_bpr < spec.max_bpr:
            p = jnp.concatenate([
                p, jnp.zeros((spec.mb, spec.max_bpr - v.max_bpr,
                              spec.bm, spec.bk), p.dtype)], axis=1)
        outs.append(p)
    return jnp.stack(outs)


def _softmax_impl(spec, panels):
    mask = _mask_r(spec)
    v = jnp.where(mask != 0, panels, _NEG_LARGE)
    row_max = jnp.maximum(jnp.max(v, axis=(2, 4), keepdims=True), _NEG_LARGE)
    e = jnp.where(mask != 0, jnp.exp(v - row_max), 0.0)
    denom = jnp.sum(e, axis=(2, 4), keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(panels.dtype).tiny)


# ---------------------------------------------------------------------------
# custom_vjp ops.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_bh(spec, panels, dense):
    """Batched panel SpMM: ``[R,*] x [R, n, q] -> [R, m, q]``."""
    return _spmm_impl(spec, panels, dense)


def _spmm_bh_fwd(spec, panels, dense):
    return _spmm_impl(spec, panels, dense), (panels, dense)


def _spmm_bh_bwd(spec, res, g):
    panels, dense = res
    d_panels = _sddmm_impl(spec, g, dense)
    d_dense = _spmm_t_impl(spec, panels, g)
    return d_panels, d_dense[:, : dense.shape[1], : dense.shape[2]]


spmm_bh.defvjp(_spmm_bh_fwd, _spmm_bh_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sddmm_bh(spec, lhs, rhs):
    """Batched sampled product -> panels ``[R, *]``."""
    return _sddmm_impl(spec, lhs, rhs)


def _sddmm_bh_fwd(spec, lhs, rhs):
    return _sddmm_impl(spec, lhs, rhs), (lhs, rhs)


def _sddmm_bh_bwd(spec, res, g_panels):
    lhs, rhs = res
    d_lhs = _spmm_impl(spec, g_panels, rhs)
    d_rhs = _spmm_t_impl(spec, g_panels, lhs)
    return (d_lhs[:, : lhs.shape[1], : lhs.shape[2]],
            d_rhs[:, : rhs.shape[1], : rhs.shape[2]])


sddmm_bh.defvjp(_sddmm_bh_fwd, _sddmm_bh_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sparse_softmax_bh(spec, panels):
    """Batched row softmax on panels."""
    return _softmax_impl(spec, panels)


def _sm_bh_fwd(spec, panels):
    p = _softmax_impl(spec, panels)
    return p, p


def _sm_bh_bwd(spec, p, g):
    pg = p * g
    rs = jnp.sum(pg, axis=(2, 4), keepdims=True)
    return (p * (g - rs),)


sparse_softmax_bh.defvjp(_sm_bh_fwd, _sm_bh_bwd)
