"""Ring sparse flash attention: full-causal sequence parallelism.

``flash_attention_kv_sharded`` (halo exchange) covers banded/windowed
topologies; FULL-CAUSAL masks span every earlier key block, so its halo
degenerates to an all_gather that materialises the whole K/V on every
device. This module closes that case with the ring schedule (the
sparse-flash generalisation of Ring Attention): K/V stay key-sharded, and
on step ``t`` device ``d`` holds key band ``(d - t) mod ndev``, runs the
fused sparse-flash kernel over ONLY that band's occupied blocks of its
query shard's topology, folds the partial result into a running online
softmax (cross-band log-sum-exp merge), and rotates the band one hop.
Peak K/V memory per device is one band (+ the in-flight copy), not the
whole sequence; comm is the same total volume as the all_gather but
pipelined with compute and never materialised.

The backward is the standard two-pass ring: the forward's FINAL softmax
stats (running max / denominator per query row) are saved, then a second
ring pass recomputes each band's probabilities from those stats, runs the
existing sparse-flash backward kernels (dq accumulates locally; dk/dv
accumulate into buffers that ROTATE WITH their band, arriving home after
a full cycle) — no psum anywhere.

Sparsity: the per-(shard, band) block metadata is built once on the host
by column-slicing each query shard's CSR to the band (rebased block
columns), so strictly-empty pairs (future bands under causality) cost one
fully-predicated kernel pass and no DMA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops._common import round_up as _round_up
from ..ops._common import device_arrays as _device_arrays
from ..ops._common import interp as _interp
from ..ops.pallas import flash_sparse as fs
from ..topology import SparseTopology
from .partition import RowPartition

__all__ = ["RingFlashSpec", "ring_flash_attention"]

_NEG_LARGE = -1e30


def _slice_columns(topo: SparseTopology, lo: int, hi: int) -> SparseTopology:
    """Host CSR column slice [lo, hi) with rebased indices."""
    ro, ci = topo.row_offsets, topo.column_indices
    offs = np.zeros(topo.m + 1, np.int32)
    cols = []
    for r in range(topo.m):
        cc = ci[ro[r]: ro[r + 1]]
        cc = cc[(cc >= lo) & (cc < hi)] - lo
        cols.append(cc)
        offs[r + 1] = offs[r] + len(cc)
    cat = (np.concatenate(cols).astype(np.int32) if offs[-1]
           else np.zeros(0, np.int32))
    return SparseTopology(topo.m, hi - lo, offs, cat)


class RingFlashSpec:
    """Static bundle: row partition + per-(shard, band) flash metadata.

    Stacked host arrays are ``[ndev, nbands, ...]`` — sharded over the
    mesh axis on dim 0, indexed by the (device-dependent) band id inside
    the scan. Requires the key padding to split evenly into bands
    (``n_pad % (ndev * bk) == 0``) and a natural-order partition
    (``RowPartition(balance=False)`` — a balanced permutation scatters
    query rows and destroys the band structure causality relies on).
    """

    def __init__(self, part: RowPartition, *, bm: int = 128,
                 bk: int = 128, mesh: Optional[Mesh] = None,
                 axis: str = "sp"):
        if not np.array_equal(part.perm, np.arange(len(part.perm))):
            # a balanced permutation scatters query rows across shards;
            # the band metadata would silently compute the WRONG
            # attention (confirmed: max err ~2 vs the dense oracle)
            raise ValueError(
                "ring attention requires a natural-order partition — "
                "build it with RowPartition(..., balance=False)")
        self.part = part
        self.mesh, self.axis = mesh, axis
        self.bm, self.bk = bm, bk
        ndev = part.ndev
        v0 = part.shards[0].block(bm, bk)
        self.mb, self.m_pad_loc = v0.mb, v0.m_pad
        self.n_pad = v0.n_pad
        if self.n_pad % (ndev * bk):
            raise ValueError(
                f"key padding n_pad={self.n_pad} must divide into "
                f"{ndev} bands of whole {bk}-blocks")
        self.n_loc = self.n_pad // ndev
        self.kb_loc = self.n_loc // bk

        metas = []
        for d in range(ndev):
            shard = part.shards[d]
            for b in range(ndev):
                sliced = _slice_columns(shard, b * self.n_loc,
                                        (b + 1) * self.n_loc)
                view = sliced.block(bm, bk)
                metas.append(fs.build_flash_bwd_meta([view]))

        self.max_bpr = max(max(m["max_bpr"] for m in metas), 1)
        self.max_bpc = max(max(m["max_bpc"] for m in metas), 1)
        npart = max(max(m["pmask"].shape[1] for m in metas), 1)

        def stack(key, rows, maxlen):
            out = np.zeros((ndev * ndev, rows * maxlen), np.int32)
            for i, m in enumerate(metas):
                a = m[key][0]
                len_d = a.shape[0] // rows
                pad = np.zeros((rows, maxlen), np.int32)
                pad[:, :len_d] = a.reshape(rows, len_d)
                if 0 < len_d < maxlen and key in ("block_cols", "t_src_i",
                                                  "mask_slot",
                                                  "t_mask_slot"):
                    pad[:, len_d:] = pad[:, len_d - 1: len_d]
                out[i] = pad.reshape(-1)
            return out.reshape(ndev, ndev, rows * maxlen)

        self.block_cols = stack("block_cols", self.mb, self.max_bpr)
        self.mask_slot = stack("mask_slot", self.mb, self.max_bpr)
        self.is_partial_ = stack("is_partial", self.mb, self.max_bpr)
        self.nblocks = np.stack(
            [m["nblocks"][0] for m in metas]).reshape(ndev, ndev, self.mb)
        self.t_src_i = stack("t_src_i", self.kb_loc, self.max_bpc)
        self.t_mask_slot = stack("t_mask_slot", self.kb_loc, self.max_bpc)
        self.t_is_partial = stack("t_is_partial", self.kb_loc,
                                  self.max_bpc)
        self.t_nblocks = np.stack(
            [m["t_nblocks"][0] for m in metas]).reshape(ndev, ndev,
                                                        self.kb_loc)
        self.pmask = np.zeros((ndev, ndev, npart, bm, bk), np.float32)
        for i, m in enumerate(metas):
            d, b = divmod(i, ndev)
            self.pmask[d, b, : m["pmask"].shape[1]] = m["pmask"][0]

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _meta(spec):
    return _device_arrays(
        spec, "_ring_meta_dev",
        lambda: {k: getattr(spec, k) for k in (
            "block_cols", "nblocks", "mask_slot", "is_partial_",
            "t_src_i", "t_nblocks", "t_mask_slot", "t_is_partial",
            "pmask")})


def _band_take(meta, band):
    """Select one band's metadata (local arrays are [1, nbands, ...])."""
    return {k: jax.lax.dynamic_index_in_dim(v[0], band, axis=0,
                                            keepdims=True)
            for k, v in meta.items()}


def _ring_fwd_local(spec, group, meta_loc, q, k0, v0):
    """Inside shard_map: q [1, R, m_pad_loc, hd_pad] (pre-scaled),
    k0/v0 [1, R_kv, n_loc, hd_pad] (own band). Returns (out, M, L)
    local plus nothing rotated (bands return home)."""
    x = spec.axis
    ndev = spec.part.ndev
    d = jax.lax.axis_index(x)
    q0 = q[0]
    R = q0.shape[0]
    hd_pad = q0.shape[-1]
    fwd = [(j, (j + 1) % ndev) for j in range(ndev)]

    def step(carry, t):
        k_cur, v_cur, acc_un, M, L = carry
        band = jax.lax.rem(d - t + ndev, ndev)
        mt = _band_take(meta_loc, band)
        out_t, m_t, l_t = fs.flash_sparse_attention_fwd(
            mt["block_cols"], mt["nblocks"], mt["mask_slot"],
            mt["is_partial_"], mt["pmask"],
            q0, k_cur, v_cur,
            R=R, heads=R, mb=spec.mb, max_bpr=spec.max_bpr,
            bm=spec.bm, bk=spec.bk, group=group, interpret=_interp())
        # cross-band online-softmax merge (out_t is normalised by l_t):
        # invariant acc_un = sum_bands exp(m_b - M) * l_b * out_b and
        # L = sum_bands exp(m_b - M) * l_b, so out = acc_un / L. The
        # rescale factor on the ACCUMULATOR is exp(M - M_new) alone —
        # the l factors already live inside acc_un.
        m_t = m_t[:, :, :1]
        l_t = l_t[:, :, :1]
        M_new = jnp.maximum(M, m_t)
        corr = jnp.exp(M - M_new)
        new_term = jnp.exp(m_t - M_new) * l_t
        acc_un = acc_un * corr + out_t * new_term
        L = L * corr + new_term
        M = M_new
        k_nxt = jax.lax.ppermute(k_cur, x, fwd)
        v_nxt = jax.lax.ppermute(v_cur, x, fwd)
        return (k_nxt, v_nxt, acc_un, M, L), None

    init = (k0[0], v0[0],
            jnp.zeros((R, spec.m_pad_loc, hd_pad), jnp.float32),
            jnp.full((R, spec.m_pad_loc, 1), _NEG_LARGE, jnp.float32),
            jnp.zeros((R, spec.m_pad_loc, 1), jnp.float32))
    (k_end, v_end, acc_un, M, L), _ = jax.lax.scan(
        step, init, jnp.arange(ndev))
    out = acc_un / jnp.maximum(L, 1e-30)
    return out[None], M[None], L[None]


def _smap(spec, fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=spec.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def _fwd(spec, group, q_p, k_p, v_p):
    x = spec.axis
    meta_keys = list(_meta(spec).keys())
    meta_vals = [
        _meta(spec)[k] for k in meta_keys]

    def local(*args):
        meta_loc = dict(zip(meta_keys, args[: len(meta_keys)]))
        q, kk, vv = args[len(meta_keys):]
        return _ring_fwd_local(spec, group, meta_loc, q, kk, vv)

    fn = _smap(spec, local,
               in_specs=tuple(P(x) for _ in meta_keys) + (P(x), P(x), P(x)),
               out_specs=(P(x), P(x), P(x)))
    return fn(*meta_vals, q_p, k_p, v_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def _ring(spec, q_p, k_p, v_p, group):
    out, _, _ = _fwd(spec, group, q_p, k_p, v_p)
    return out


def _ring_f(spec, q_p, k_p, v_p, group):
    out, M, L = _fwd(spec, group, q_p, k_p, v_p)
    return out, (q_p, k_p, v_p, out, M, L)


def _ring_b(spec, group, res, g):
    q_p, k_p, v_p, out, M, L = res
    x = spec.axis
    ndev = spec.part.ndev
    R = q_p.shape[1]
    hd_pad = q_p.shape[-1]

    # stats layout the kernels expect: lane 0 = max, lane 1 = denom
    stats = jnp.concatenate(
        [M, L, jnp.zeros(M.shape[:3] + (126,), jnp.float32)], axis=3)
    d_rows = jnp.sum(g * out, axis=-1)
    dcoef = jnp.broadcast_to(d_rows[..., None], d_rows.shape + (128,))

    meta_keys = list(_meta(spec).keys())
    meta_vals = [_meta(spec)[k] for k in meta_keys]

    def local(*args):
        meta_loc = dict(zip(meta_keys, args[: len(meta_keys)]))
        q, kk, vv, gg, st, dc = args[len(meta_keys):]
        d = jax.lax.axis_index(x)
        q0, g0, st0, dc0 = q[0], gg[0], st[0], dc[0]
        fwd_perm = [(j, (j + 1) % ndev) for j in range(ndev)]

        def step(carry, t):
            k_cur, v_cur, dk_cur, dv_cur, dq_acc = carry
            band = jax.lax.rem(d - t + ndev, ndev)
            mt = _band_take(meta_loc, band)
            dq_t = fs.flash_sparse_bwd_dq(
                mt["block_cols"], mt["nblocks"], mt["mask_slot"],
                mt["is_partial_"], mt["pmask"],
                q0, k_cur, v_cur, g0, st0, dc0,
                R=R, heads=R, mb=spec.mb, max_bpr=spec.max_bpr,
                bm=spec.bm, bk=spec.bk, group=group,
                interpret=_interp())
            dk_t, dv_t = fs.flash_sparse_bwd_dkv(
                mt["t_src_i"], mt["t_nblocks"], mt["t_mask_slot"],
                mt["t_is_partial"], mt["pmask"],
                q0, k_cur, v_cur, g0, st0, dc0,
                R=R, heads=R, kb=spec.kb_loc, max_bpc=spec.max_bpc,
                bm=spec.bm, bk=spec.bk, group=group,
                interpret=_interp())
            if group > 1:
                dk_t = dk_t.reshape(R // group, group,
                                    *dk_t.shape[1:]).sum(axis=1)
                dv_t = dv_t.reshape(R // group, group,
                                    *dv_t.shape[1:]).sum(axis=1)
            dk_cur = dk_cur + dk_t
            dv_cur = dv_cur + dv_t
            # rotate the band AND its accumulated gradient together —
            # after the full cycle each band (and its dk/dv) is home
            k_nxt = jax.lax.ppermute(k_cur, x, fwd_perm)
            v_nxt = jax.lax.ppermute(v_cur, x, fwd_perm)
            dk_nxt = jax.lax.ppermute(dk_cur, x, fwd_perm)
            dv_nxt = jax.lax.ppermute(dv_cur, x, fwd_perm)
            return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc + dq_t), None

        R_kv = kk.shape[1]
        init = (kk[0], vv[0],
                jnp.zeros((R_kv, spec.n_loc, hd_pad), jnp.float32),
                jnp.zeros((R_kv, spec.n_loc, hd_pad), jnp.float32),
                jnp.zeros((R, spec.m_pad_loc, hd_pad), jnp.float32))
        (k_end, v_end, dk, dv, dq), _ = jax.lax.scan(
            step, init, jnp.arange(ndev))
        return dq[None], dk[None], dv[None]

    sh = tuple(P(x) for _ in meta_keys)
    dq, dk, dv = _smap(
        spec, local,
        in_specs=sh + (P(x), P(x), P(x), P(x), P(x), P(x)),
        out_specs=(P(x), P(x), P(x)),
    )(*meta_vals, q_p, k_p, v_p, g, stats, dcoef)
    # dq is w.r.t. the PRE-SCALED q_p (the public fn scales outside)
    return dq.astype(q_p.dtype), dk.astype(k_p.dtype), dv.astype(v_p.dtype)


_ring.defvjp(_ring_f, _ring_b)


def ring_flash_attention(spec: RingFlashSpec, q_sh, k_sh, v_sh,
                         scale=None, group: int = 1):
    """Ring sparse flash attention over the spec's mesh axis.

    ``q_sh [ndev, R, s_loc_q, hd]`` query-sharded (natural order);
    ``k_sh, v_sh [ndev, R_kv, s_loc_k, hd]`` key-sharded, with ``R_kv =
    R // group`` (GQA). Peak per-device K/V is ONE band; no psum in
    either direction. Returns query-sharded ``[ndev, R, s_loc_q, hd]``.
    Use for full-causal (or otherwise full-span) topologies; banded
    masks are cheaper through ``flash_attention_kv_sharded``."""
    ndev, R = q_sh.shape[0], q_sh.shape[1]
    if ndev != spec.part.ndev:
        raise ValueError(f"q ndev {ndev} != partition {spec.part.ndev}")
    if group < 1 or R % group:
        raise ValueError(f"group {group} must divide replicas {R}")
    R_kv = k_sh.shape[1]
    if R_kv != R // group or v_sh.shape[1] != R_kv:
        raise ValueError(
            f"k/v replicas {R_kv}/{v_sh.shape[1]} != R // group "
            f"{R // group}")
    if k_sh.shape[2] != spec.n_loc or v_sh.shape[2] != spec.n_loc:
        # the band metadata addresses global key row 128*b + c at buffer
        # row c, so each shard must carry EXACTLY its n_loc-row band —
        # a short shard (s not a multiple of ndev*bk) silently misaligns
        # every band (confirmed: 0.18 max err at s=1000). Pad the keys
        # GLOBALLY to n_pad first, then shard.
        raise ValueError(
            f"per-device key rows {k_sh.shape[2]} != band {spec.n_loc}; "
            "pad the sequence to n_pad globally, then shard")
    hd = q_sh.shape[-1]
    hd_pad = _round_up(max(hd, 1), 128)
    scale = float(scale) if scale is not None else float(hd) ** -0.5

    q_p = jnp.zeros((ndev, R, spec.m_pad_loc, hd_pad), q_sh.dtype)
    q_p = q_p.at[:, :, : q_sh.shape[2], :hd].set(q_sh * scale)
    k_p = jnp.zeros((ndev, R_kv, spec.n_loc, hd_pad), k_sh.dtype)
    k_p = k_p.at[:, :, : k_sh.shape[2], :hd].set(k_sh)
    v_p = jnp.zeros((ndev, R_kv, spec.n_loc, hd_pad), v_sh.dtype)
    v_p = v_p.at[:, :, : v_sh.shape[2], :hd].set(v_sh)

    out = _ring(spec, q_p, k_p, v_p, int(group))
    return out[:, :, : q_sh.shape[2], :hd]
