"""Fused sparse attention kernel — "sparse flash" (forward).

The reference computes attention as three kernel dispatches with the score
matrix materialised in CSR form between them (SDDMM -> SparseSoftmax ->
SpMM, ``modules/sparse_attention.py:65-94``). On TPU the score traffic is
the whole cost, so this kernel fuses the chain: for each query row-block it
walks only the *occupied* key blocks of the mask topology, computes the
score tile on the MXU, applies a numerically-stable online softmax
(running max / denominator, flash-attention style), and accumulates the
context — scores never touch HBM.

Masking is block-classified: fully-dense blocks (the vast majority for
causal / local-window topologies) skip the element mask entirely; only
*partial* blocks fetch a mask tile, from a compacted mask array whose index
map repeats the previous slot on full blocks so their DMA is elided.

Batched like ``batched_panel``: grid dim 0 is the replica id; metadata
index maps divide by ``heads`` so heads share their batch element's mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._common import vmem_request as _vm

__all__ = ["flash_sparse_attention_fwd", "flash_sparse_bwd_dq",
           "flash_sparse_bwd_dkv", "flash_sparse_bwd_fused",
           "flash_sparse_ring_band_fwd", "flash_sparse_ring_band_bwd",
           "build_flash_meta", "build_flash_bwd_meta"]

_NEG_LARGE = -1e30


def build_flash_meta(views):
    """Per-mask metadata for the fused kernel from stacked BlockViews.

    Returns dict of stacked arrays (B leading dim):
      block_cols   i32[B, mb*max_bpr]   (padding repeats last valid)
      nblocks      i32[B, mb]
      mask_slot    i32[B, mb*max_bpr]   slot into the compacted mask panel;
                                        full blocks repeat the previous slot
      is_partial   i32[B, mb*max_bpr]
      pmask        f32[B, n_partial_max, bm, bk] compacted partial masks
    """
    B = len(views)
    v0 = views[0]
    mb, bm, bk = v0.mb, v0.bm, v0.bk
    max_bpr = max(v.max_bpr for v in views)

    cols = np.zeros((B, mb * max_bpr), np.int32)
    nblk = np.zeros((B, mb), np.int32)
    slot = np.zeros((B, mb * max_bpr), np.int32)
    part = np.zeros((B, mb * max_bpr), np.int32)
    pmasks = []
    n_partial_max = 1
    for b, v in enumerate(views):
        c = np.zeros((mb, max_bpr), np.int32)
        c[:, : v.max_bpr] = v.block_cols
        sl = np.zeros((mb, max_bpr), np.int32)
        pt = np.zeros((mb, max_bpr), np.int32)
        pm = []
        seen: dict = {}   # tile bytes -> compacted slot: banded/causal
        # topologies repeat the same few partial patterns down the
        # diagonal — without dedup a banded s=32k mask stores hundreds
        # of identical multi-MB tiles (268 MB of pmask and an HTTP-413
        # remote-compile payload; ~2 unique tiles after dedup)
        cur = 0
        for i in range(mb):
            nb = int(v.nblocks[i])
            if 0 < nb < max_bpr:
                c[i, nb:] = c[i, nb - 1]
            for s in range(max_bpr):
                if s < nb:
                    tile = v.mask[i, s]
                    if not tile.all():
                        key = tile.tobytes()
                        hit = seen.get(key)
                        if hit is None:
                            pm.append(tile.astype(np.float32))
                            hit = seen[key] = len(pm) - 1
                        cur = hit
                        sl[i, s] = cur
                        pt[i, s] = 1
                    else:
                        sl[i, s] = cur  # repeat previous slot: DMA elided
                else:
                    sl[i, s] = cur
        if not pm:
            pm = [np.ones((bm, bk), np.float32)]
        pmasks.append(np.stack(pm))
        n_partial_max = max(n_partial_max, len(pm))
        cols[b] = c.reshape(-1)
        nblk[b] = v.nblocks
        slot[b] = sl.reshape(-1)
        part[b] = pt.reshape(-1)

    pmask = np.zeros((B, n_partial_max, bm, bk), np.float32)
    for b, pm in enumerate(pmasks):
        pmask[b, : pm.shape[0]] = pm
    return dict(block_cols=cols, nblocks=nblk, mask_slot=slot,
                is_partial=part, pmask=pmask, max_bpr=int(max_bpr),
                mb=mb, bm=bm, bk=bk)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "group", "interpret",
    "packed_stats"))
def flash_sparse_attention_fwd(
    block_cols,    # i32[B, mb*max_bpr]
    nblocks,       # i32[B, mb]
    mask_slot,     # i32[B, mb*max_bpr]
    is_partial,    # i32[B, mb*max_bpr]
    pmask,         # f32[B, n_partial_max, bm, bk]
    q,             # f32[R, mb*bm, hd_pad]   (pre-scaled by 1/sqrt(hd))
    k,             # f32[R // group, kb*bk, hd_pad]
    v,             # f32[R // group, kb*bk, hd_pad]
    *,
    R: int,
    heads: int,
    mb: int,
    max_bpr: int,
    bm: int,
    bk: int,
    group: int = 1,   # GQA: query replicas per shared KV replica
    interpret: bool = False,
    packed_stats: bool = False,
):
    """Returns ``(out [R, mb*bm, hd_pad], row_max [R, mb*bm, 128],
    row_denom [R, mb*bm, 128])`` — stats are broadcast along the 128-lane
    minor dim (TPU-friendly layout) and consumed by the backward pass.

    ``packed_stats=True`` returns ``(out, stats [R, mb*bm, 128])`` with
    the running max in lane 0 and the denominator in lane 1 — exactly the
    operand layout the backward kernels read, so the caller skips the
    per-backward 3-way concatenate AND one HBM-sized forward output."""
    hd_pad = q.shape[-1]

    def body(s, nblk_ref, part_ref, pm_ref, q_ref, k_ref, v_ref, b, i,
             acc, m_scr, l_scr):
        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_scr[:] = jnp.full_like(m_scr, _NEG_LARGE)
            l_scr[:] = jnp.zeros_like(l_scr)

        @pl.when(s < nblk_ref[b, i])
        def _():
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [bm, bk]
            partial = part_ref[b, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)

            m_prev = m_scr[:, :1]                          # [bm, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(sc, axis=1, keepdims=True))
            p = jnp.exp(sc - m_new)
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            corr = jnp.exp(m_prev - m_new)
            l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(
                p, axis=1, keepdims=True)
            m_scr[:, :1] = m_new
            acc[:] = acc[:] * corr + jax.lax.dot(
                p, v_ref[0], preferred_element_type=jnp.float32)

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, pm_ref,
               o_ref, m_ref, l_ref,
               acc, m_scr, l_scr):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads
        body(s, nblk_ref, part_ref, pm_ref, q_ref, k_ref, v_ref, b, i,
             acc, m_scr, l_scr)

        @pl.when(s == max_bpr - 1)
        def _():
            denom = jnp.maximum(l_scr[:, :1], 1e-30)
            o_ref[0] = acc[:] / denom
            m_ref[0] = jnp.broadcast_to(m_scr[:, :1], m_ref[0].shape)
            l_ref[0] = jnp.broadcast_to(l_scr[:, :1], l_ref[0].shape)

    def kernel_packed(cols_ref, nblk_ref, slot_ref, part_ref,
                      q_ref, k_ref, v_ref, pm_ref,
                      o_ref, st_ref,
                      acc, m_scr, l_scr):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads
        body(s, nblk_ref, part_ref, pm_ref, q_ref, k_ref, v_ref, b, i,
             acc, m_scr, l_scr)

        @pl.when(s == max_bpr - 1)
        def _():
            denom = jnp.maximum(l_scr[:, :1], 1e-30)
            o_ref[0] = acc[:] / denom
            lane = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
            m_b = jnp.broadcast_to(m_scr[:, :1], (bm, 128))
            l_b = jnp.broadcast_to(l_scr[:, :1], (bm, 128))
            st_ref[0] = jnp.where(lane == 0, m_b,
                                  jnp.where(lane == 1, l_b, 0.0))

    n_stat_outs = 1 if packed_stats else 2
    grid = (R, mb, max_bpr)
    outs = pl.pallas_call(
        kernel_packed if packed_stats else kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad),
                             lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // group, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // group, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // heads, sl[r // heads, i * max_bpr + s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
            ] + [
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
            ] * n_stat_outs,
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct((R, mb * bm, 128), jnp.float32),
        ] * n_stat_outs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(3 * bm * hd_pad, 2 * bk * hd_pad, bm * bk, 5 * bm * 128),
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, pmask)
    return tuple(outs)


# ---------------------------------------------------------------------------
# Fused backward. Standard flash-attention backward specialised to the
# sparse block topology: p is recomputed per occupied block from the saved
# row stats (m, l).
#
# Two strategies:
#   * ``flash_sparse_bwd_fused`` (default when the per-replica dk/dv
#     accumulators fit VMEM): ONE kernel over the forward's row-major walk
#     recomputes each score tile exactly once and produces dq AND dk/dv —
#     dq accumulates into a per-row-block scratch, dk/dv into a
#     replica-resident ``(kb, bk, hd)`` scratch dynamically indexed by the
#     prefetched column id (Mosaic supports dynamic leading-dim VMEM
#     stores). This removes the second score/exp recompute, the second
#     kernel launch, AND the transposed walk's worst-column padding
#     (``max_bpc`` for a causal mask equals ``mb`` — every column padded
#     to the densest one; the row walk pads only to ``max_bpr``).
#   * two-kernel fallback for huge topologies: dq over the row walk,
#     dk/dv over the column walk via transposed block metadata (like
#     ``bsr_spmm_t`` — no value movement).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "kb", "max_bpr", "bm", "bk", "group", "interpret"))
def flash_sparse_bwd_fused(
    block_cols, nblocks, mask_slot, is_partial, pmask,
    q, k, v, g, stats,  # stats f32[R, mb*bm, 128]: lanes 0/1 = m / l
    dcoef,              # f32[R, mb*bm, 128]: D = rowsum(g*out), broadcast
    *, R, heads, mb, kb, max_bpr, bm, bk, group=1, interpret=False,
):
    """Single-pass backward: ``(dq [R, mb*bm, hd], dk, dv [R, kb, bk, hd])``.

    dk/dv come back PER QUERY REPLICA (as in ``flash_sparse_bwd_dkv``);
    the caller group-sums under GQA and flattens the (kb, bk) dims.
    Requires ``2 * kb * bk * hd_pad * 4`` bytes of VMEM for the dk/dv
    accumulators — the caller falls back to the two-kernel path above
    the budget.
    """
    hd_pad = q.shape[-1]

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref, pm_ref,
               dq_ref, dk_ref, dv_ref, accq, acck, accv):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads

        @pl.when(jnp.logical_and(i == 0, s == 0))
        def _():
            acck[:] = jnp.zeros_like(acck)
            accv[:] = jnp.zeros_like(accv)

        @pl.when(s == 0)
        def _():
            accq[:] = jnp.zeros_like(accq)

        @pl.when(s < nblk_ref[b, i])
        def _():
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [bm, bk]
            partial = part_ref[b, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            dp = jax.lax.dot_general(
                g_ref[0], v_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - d_ref[0][:, :1])
            accq[:] += jax.lax.dot(
                ds, k_ref[0], preferred_element_type=jnp.float32)
            c = cols_ref[b, i * max_bpr + s]
            acck[c] += jax.lax.dot_general(
                ds, q_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [bk, hd]
            accv[c] += jax.lax.dot_general(
                p, g_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(s == max_bpr - 1)
        def _():
            dq_ref[0] = accq[:]

        @pl.when(jnp.logical_and(i == mb - 1, s == max_bpr - 1))
        def _():
            dk_ref[0] = acck[:]
            dv_ref[0] = accv[:]

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(R, mb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // group, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // group, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // heads, sl[r // heads, i * max_bpr + s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((kb, bk, hd_pad), jnp.float32),
                pltpu.VMEM((kb, bk, hd_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb, bk, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb, bk, hd_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vm(4 * bm * hd_pad, 2 * bk * hd_pad,
                                 bm * bk, 2 * bm * 128,
                                 4 * kb * bk * hd_pad),
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, g, stats,
      dcoef, pmask)
    return dq, dk, dv


def build_flash_bwd_meta(views):
    """Transposed metadata + per-(col-block, slot) mask slots for dk/dv."""
    B = len(views)
    v0 = views[0]
    kb, bm, bk = v0.kb, v0.bm, v0.bk
    metas = [v.transpose_meta() for v in views]
    max_bpc = max(ts.shape[1] for _, ts in metas)
    ti = np.zeros((B, kb * max_bpc), np.int32)
    tn = np.zeros((B, kb), np.int32)
    tslot = np.zeros((B, kb * max_bpc), np.int32)   # mask slot of src block
    tpart = np.zeros((B, kb * max_bpc), np.int32)
    fmeta = build_flash_meta(views)
    mb = v0.mb
    max_bpr = fmeta["max_bpr"]
    for b, (tnb, tsrc) in enumerate(metas):
        pad = np.zeros((kb, max_bpc, 2), np.int32)
        pad[:, : tsrc.shape[1]] = tsrc
        for j in range(kb):
            nb = int(tnb[j])
            if 0 < nb < max_bpc:
                pad[j, nb:] = pad[j, nb - 1]
        ti[b] = pad[:, :, 0].reshape(-1)
        tn[b] = tnb
        sl = fmeta["mask_slot"][b].reshape(mb, max_bpr)
        pt = fmeta["is_partial"][b].reshape(mb, max_bpr)
        for j in range(kb):
            for u in range(max_bpc):
                i_src, s_src = pad[j, u]
                tslot[b, j * max_bpc + u] = sl[i_src, s_src]
                tpart[b, j * max_bpc + u] = (
                    pt[i_src, s_src] if u < max(int(tnb[j]), 1) else 0)
    return dict(t_src_i=ti, t_nblocks=tn, t_mask_slot=tslot,
                t_is_partial=tpart, max_bpc=int(max_bpc),
                **{k: fmeta[k] for k in
                   ("block_cols", "nblocks", "mask_slot", "is_partial",
                    "pmask", "max_bpr", "mb", "bm", "bk")})


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "mb", "max_bpr", "bm", "bk", "group", "interpret"))
def flash_sparse_bwd_dq(
    block_cols, nblocks, mask_slot, is_partial, pmask,
    q, k, v, g, stats,  # stats f32[R, mb*bm, 128]: lanes 0/1 = m / l
    dcoef,              # f32[R, mb*bm, 128]: D = rowsum(g*out), broadcast
    *, R, heads, mb, max_bpr, bm, bk, group=1, interpret=False,
):
    """dq (w.r.t. the PRE-SCALED q): f32[R, mb*bm, hd_pad]."""
    hd_pad = q.shape[-1]

    def kernel(cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref, pm_ref,
               dq_ref, acc):
        r, i, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(s < nblk_ref[b, i])
        def _():
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = part_ref[b, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            dp = jax.lax.dot_general(
                g_ref[0], v_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - d_ref[0][:, :1])
            acc[:] += jax.lax.dot(
                ds, k_ref[0], preferred_element_type=jnp.float32)

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
                        r // group, c[r // heads, i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, c, nb_, sl, pt: (
                        r // group, c[r // heads, i * max_bpr + s], 0)),
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
            scratch_shapes=[pltpu.VMEM((bm, hd_pad), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(4 * bm * hd_pad, 2 * bk * hd_pad,
                                 bm * bk, 2 * bm * 128),
        ),
        interpret=interpret,
    )(block_cols, nblocks, mask_slot, is_partial, q, k, v, g, stats,
      dcoef, pmask)


@functools.partial(jax.jit, static_argnames=(
    "R", "heads", "kb", "max_bpc", "bm", "bk", "group", "interpret"))
def flash_sparse_bwd_dkv(
    t_src_i, t_nblocks, t_mask_slot, t_is_partial, pmask,
    q, k, v, g, stats, dcoef,
    *, R, heads, kb, max_bpc, bm, bk, group=1, interpret=False,
):
    """(dk, dv): each f32[R, kb*bk, hd_pad] — PER QUERY REPLICA even under
    GQA (k/v enter as [R // group, ...]); the caller sums each group of
    ``group`` partials into its shared KV replica's gradient (a tiny XLA
    reduction — accumulating across grid dim 0 in-kernel would serialise
    the replica axis)."""
    hd_pad = q.shape[-1]

    def kernel(ti_ref, tn_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref, pm_ref,
               dk_ref, dv_ref, acck, accv):
        r, j, u = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        b = r // heads

        @pl.when(u == 0)
        def _():
            acck[:] = jnp.zeros_like(acck)
            accv[:] = jnp.zeros_like(accv)

        @pl.when(u < tn_ref[b, j])
        def _():
            # block (i_src, s) at column j: rows = row-block i_src
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [bm, bk]
            partial = part_ref[b, j * max_bpc + u] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            dp = jax.lax.dot_general(
                g_ref[0], v_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - d_ref[0][:, :1])
            acck[:] += jax.lax.dot_general(
                ds, q_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [bk, hd]
            accv[:] += jax.lax.dot_general(
                p, g_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [bk, hd]

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
                pl.BlockSpec((1, bk, hd_pad),
                             lambda r, j, u, *p: (r // group, j, 0)),
                pl.BlockSpec((1, bk, hd_pad),
                             lambda r, j, u, *p: (r // group, j, 0)),
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
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, kb * bk, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb * bk, hd_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(2 * bm * hd_pad, 6 * bk * hd_pad,
                                 bm * bk, 2 * bm * 128),
        ),
        interpret=interpret,
    )(t_src_i, t_nblocks, t_mask_slot, t_is_partial, q, k, v, g, stats,
      dcoef, pmask)
    return dk, dv


# ---------------------------------------------------------------------------
# Ring-band forward with carried state. One ring step = ONE pallas_call:
# the online softmax CONTINUES across bands inside the kernel (the carry
# holds the unnormalised accumulator + packed running stats, aliased
# in-place), so the per-step XLA merge (3 elementwise passes over
# activation-sized buffers) and the per-step metadata dynamic_index copies
# disappear — the band is selected by a scalar-prefetched index into the
# STACKED [nbands, ...] metadata via the block index maps.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "R", "mb", "max_bpr", "bm", "bk", "group", "interpret"))
def flash_sparse_ring_band_fwd(
    band,          # i32[1] — which band's metadata to walk this step
    block_cols,    # i32[nbands, mb*max_bpr]
    nblocks,       # i32[nbands, mb]
    mask_slot,     # i32[nbands, mb*max_bpr]
    is_partial,    # i32[nbands, mb*max_bpr]
    pmask,         # f32[nbands, n_partial_max, bm, bk]
    q,             # f32[R, mb*bm, hd_pad]   (pre-scaled)
    k,             # f32[R // group, n_loc, hd_pad]   (current band)
    v,             # f32[R // group, n_loc, hd_pad]
    acc_in,        # f32[R, mb*bm, hd_pad]   UNNORMALISED accumulator
    st_in,         # f32[R, mb*bm, 128]      lanes 0/1 = running max/denom
    *, R, mb, max_bpr, bm, bk, group=1, interpret=False,
):
    """Returns ``(acc_out, st_out)`` — the carry advanced by this band's
    occupied blocks (donated/aliased onto ``acc_in``/``st_in``). Finish
    with ``out = acc_out / max(st_out[..., 1:2], eps)`` after the last
    band. Seed the carry with zeros and ``st = [-inf, 0]`` lanes.

    Unlike ``flash_sparse_attention_fwd`` the metadata is per-BAND (no
    batch dim; every replica shares the shard's mask band — the ring
    path's layout, ``parallel/ring_flash.py``)."""
    hd_pad = q.shape[-1]

    def kernel(band_ref, cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, acc_ref, st_ref, pm_ref,
               acc_out, st_out,
               acc, m_scr, l_scr):
        i, s = pl.program_id(1), pl.program_id(2)
        t = band_ref[0]

        @pl.when(s == 0)
        def _():
            acc[:] = acc_ref[0]
            m_scr[:, :1] = st_ref[0][:, :1]
            l_scr[:, :1] = st_ref[0][:, 1:2]

        @pl.when(s < nblk_ref[t, i])
        def _():
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = part_ref[t, i * max_bpr + s] == 1
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
            acc[:] = acc[:] * corr + jax.lax.dot(
                p, v_ref[0], preferred_element_type=jnp.float32)

        @pl.when(s == max_bpr - 1)
        def _():
            acc_out[0] = acc[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
            m_b = jnp.broadcast_to(m_scr[:, :1], (bm, 128))
            l_b = jnp.broadcast_to(l_scr[:, :1], (bm, 128))
            st_out[0] = jnp.where(lane == 0, m_b,
                                  jnp.where(lane == 1, l_b, 0.0))

    acc_out, st_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(R, mb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        r // group, c[b[0], i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        r // group, c[b[0], i * max_bpr + s], 0)),
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        b[0], sl[b[0], i * max_bpr + s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
                pltpu.VMEM((bm, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, mb * bm, 128), jnp.float32),
        ],
        # alias keys count the scalar-prefetch operands: full operand
        # order is (band, cols, nblk, slot, part, q, k, v, acc_in,
        # st_in, pmask) -> acc_in = 8, st_in = 9
        input_output_aliases={8: 0, 9: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vm(4 * bm * hd_pad, 2 * bk * hd_pad, bm * bk, 4 * bm * 128),
        ),
        interpret=interpret,
    )(band, block_cols, nblocks, mask_slot, is_partial, q, k, v,
      acc_in, st_in, pmask)
    return acc_out, st_out


@functools.partial(jax.jit, static_argnames=(
    "R", "mb", "kb", "max_bpr", "bm", "bk", "interpret"))
def flash_sparse_ring_band_bwd(
    band,          # i32[1]
    block_cols,    # i32[nbands, mb*max_bpr]   (row-major fwd walk)
    nblocks,       # i32[nbands, mb]
    mask_slot,     # i32[nbands, mb*max_bpr]
    is_partial,    # i32[nbands, mb*max_bpr]
    pmask,         # f32[nbands, n_partial_max, bm, bk]
    q, k, v, g,    # q/g [R, mb*bm, hd_pad]; k/v [R, kb*bk, hd_pad] (band)
    stats,         # f32[R, mb*bm, 128]  FINAL lanes 0/1 = m / l
    dcoef,         # f32[R, mb*bm, 128]
    dq_in,         # f32[R, mb*bm, hd_pad]        carried (aliased)
    dk_in,         # f32[R, kb, bk, hd_pad]       carried (aliased)
    dv_in,         # f32[R, kb, bk, hd_pad]
    *, R, mb, kb, max_bpr, bm, bk, interpret=False,
):
    """One ring-backward step = ONE kernel: recompute this band's score
    tiles once from the FINAL stats and advance ALL THREE gradient
    carries in place (dq accumulates across bands; dk/dv accumulate the
    rotating band accumulator before it ppermutes on). group==1 only —
    GQA rings keep the two-kernel step (the group-sum changes the dk/dv
    carry shape)."""
    hd_pad = q.shape[-1]

    def kernel(band_ref, cols_ref, nblk_ref, slot_ref, part_ref,
               q_ref, k_ref, v_ref, g_ref, st_ref, d_ref,
               dqi_ref, dki_ref, dvi_ref, pm_ref,
               dq_out, dk_out, dv_out,
               accq, acck, accv):
        i, s = pl.program_id(1), pl.program_id(2)
        t = band_ref[0]

        @pl.when(jnp.logical_and(i == 0, s == 0))
        def _():
            acck[:] = dki_ref[0]
            accv[:] = dvi_ref[0]

        @pl.when(s == 0)
        def _():
            accq[:] = dqi_ref[0]

        @pl.when(s < nblk_ref[t, i])
        def _():
            sc = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = part_ref[t, i * max_bpr + s] == 1
            sc = jnp.where(
                jnp.logical_and(partial, pm_ref[0, 0] == 0), _NEG_LARGE, sc)
            m_row = st_ref[0][:, :1]
            l_row = jnp.maximum(st_ref[0][:, 1:2], 1e-30)
            p = jnp.exp(sc - m_row) / l_row
            p = jnp.where(sc <= _NEG_LARGE / 2, 0.0, p)
            dp = jax.lax.dot_general(
                g_ref[0], v_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - d_ref[0][:, :1])
            accq[:] += jax.lax.dot(
                ds, k_ref[0], preferred_element_type=jnp.float32)
            c = cols_ref[t, i * max_bpr + s]
            acck[c] += jax.lax.dot_general(
                ds, q_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accv[c] += jax.lax.dot_general(
                p, g_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(s == max_bpr - 1)
        def _():
            dq_out[0] = accq[:]

        @pl.when(jnp.logical_and(i == mb - 1, s == max_bpr - 1))
        def _():
            dk_out[0] = acck[:]
            dv_out[0] = accv[:]

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(R, mb, max_bpr),
            in_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        r, c[b[0], i * max_bpr + s], 0)),
                pl.BlockSpec(
                    (1, bk, hd_pad),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        r, c[b[0], i * max_bpr + s], 0)),
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, 128), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, bm, bk),
                    lambda r, i, s, b, c, nb_, sl, pt: (
                        b[0], sl[b[0], i * max_bpr + s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bm, hd_pad), lambda r, i, s, *p: (r, i, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
                pl.BlockSpec((1, kb, bk, hd_pad),
                             lambda r, i, s, *p: (r, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, hd_pad), jnp.float32),
                pltpu.VMEM((kb, bk, hd_pad), jnp.float32),
                pltpu.VMEM((kb, bk, hd_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, mb * bm, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb, bk, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((R, kb, bk, hd_pad), jnp.float32),
        ],
        # alias keys count the 5 scalar-prefetch operands: full order is
        # (band, cols, nblk, slot, part, q, k, v, g, stats, dcoef,
        # dq_in, dk_in, dv_in, pmask) -> dq_in=11, dk_in=12, dv_in=13
        input_output_aliases={11: 0, 12: 1, 13: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_vm(5 * bm * hd_pad, 2 * bk * hd_pad, bm * bk, 4 * bm * 128,
                4 * kb * bk * hd_pad),
        ),
        interpret=interpret,
    )(band, block_cols, nblocks, mask_slot, is_partial, q, k, v, g,
      stats, dcoef, dq_in, dk_in, dv_in, pmask)
    return dq, dk, dv
