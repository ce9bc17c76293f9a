"""On-hardware kernel smoke suite: every Pallas kernel family, once.

Interpret mode does NOT enforce Mosaic's block-shape rules (the repo has
twice discovered kernels that lower fine interpreted and throw — or read
undefined memory — on chip: the (1, hd) ragged-append block, the
compressed NaN dump slot). This script institutionalizes the check: each
kernel family runs ONCE on the real TPU at small-but-Mosaic-legal shapes
and is compared against the XLA oracle on the SAME chip (exact
comparison — both sides quantize identically through the MXU), printing
one JSON line per family.

Run on the TPU (the environment's default backend):

    python benchmarks/tpu_smoke.py

Exit code 0 = all families pass. Families: flat spmm/sddmm/softmax,
panel chain (spmm/spmm_t/sddmm/softmax), compressed chain, slot-subset
spmm (bsr_spmm_panel_sel), batched flash fwd + bwd (dq/dkv), int8
spmm/spmm_t/sddmm, int8 flash fwd + int8 flash bwd, decode attention
(bf16 + int8 cache, GQA, qlen>1), ragged append, paged decoder
(prefill + append + paged attention + decode_multi + rollback).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

import sputnik_tpu as st                                     # noqa: E402
from sputnik_tpu import patterns                             # noqa: E402
from sputnik_tpu.ops import panel_api as P                   # noqa: E402

RESULTS = []


def record(name, err, tol):
    ok = bool(np.isfinite(err) and err <= tol)
    RESULTS.append(ok)
    print(json.dumps({"kernel": name, "max_rel_err": float(err),
                      "tol": tol, "ok": ok}))
    return ok


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def with_backend(backend, fn, *args):
    st.set_backend(backend)
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        return np.asarray(out[0] if isinstance(out, tuple) else out)
    finally:
        st.set_backend("auto")



def _enable_compile_cache():
    """Persistent XLA compilation cache: remote kernel compiles are 1-5
    minutes EACH; cached after the first run per HLO hash."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

def main():
    _enable_compile_cache()
    if "--allow-cpu" not in sys.argv:
        assert jax.devices()[0].platform == "tpu", \
            "smoke suite must run on the real TPU"
    interp = jax.devices()[0].platform != "tpu"
    rng = np.random.RandomState(0)
    m = n = 512
    q = 256
    mask = patterns.uniform_mask(m, n, sparsity=0.6, seed=1)
    topo = st.SparseTopology.from_dense_mask(mask)
    nz = topo.nnz
    vals = rng.randn(topo.nnz_pad).astype(np.float32)
    vals_j = jnp.asarray(vals)
    dense = jnp.asarray(rng.randn(n, q).astype(np.float32))
    A = np.zeros((m, n), np.float32)
    A[np.asarray(topo.row_ids[:nz]),
      np.asarray(topo.column_indices[:nz])] = vals[:nz]

    # ---- flat API: pallas vs XLA oracle, same chip -----------------------
    # matmul families: the Pallas kernels contract on the MXU (bf16
    # passes at default precision) while the flat XLA oracle's gather
    # formulation sums in true f32 -> ~2.5e-3 rel on chip (measured);
    # softmax is elementwise (no MXU) and stays exact
    for name, fn, args, tol in [
        ("flat_spmm", st.spmm, (topo, vals_j, dense), 1e-2),
        ("flat_spmm_bias_relu", st.spmm_bias_relu,
         (topo, vals_j, dense, jnp.ones((m,), jnp.float32)), 1e-2),
        ("flat_sddmm", st.sddmm,
         (topo, jnp.asarray(rng.randn(m, 128).astype(np.float32)),
          jnp.asarray(rng.randn(n, 128).astype(np.float32))), 1e-2),
        ("flat_softmax", st.sparse_softmax, (topo, vals_j), 1e-5),
    ]:
        got = with_backend("pallas", fn, *args)
        ref = with_backend("xla", fn, *args)
        record(name, rel(got, ref), tol)

    # ---- panel chain (uncompressed + compressed) -------------------------
    for comp in (False, True):
        spec = P.PanelSpec(topo, bm=128, bk=128, compressed=comp)
        tag = "compressed" if comp else "panel"
        panel = jnp.asarray(P.values_to_panel_np(
            topo, vals, 128, 128, compressed=comp))
        g_rows = jnp.asarray(rng.randn(m, q).astype(np.float32))
        lhs = jnp.asarray(rng.randn(m, 128).astype(np.float32))
        rhs = jnp.asarray(rng.randn(n, 128).astype(np.float32))
        record(f"{tag}_spmm",
               rel(np.asarray(P.spmm(spec, panel, dense))[:m],
                   A @ np.asarray(dense)), 1e-2)
        record(f"{tag}_spmm_t",
               rel(np.asarray(P.spmm_t(spec, panel, g_rows))[:n],
                   A.T @ np.asarray(g_rows)), 1e-2)
        sd = P.sddmm(spec, lhs, rhs)
        sd_flat = P.panel_to_values(topo, sd, 128, 128, compressed=comp)
        ref_sd = (np.asarray(lhs) @ np.asarray(rhs).T)[
            np.asarray(topo.row_ids[:nz]),
            np.asarray(topo.column_indices[:nz])]
        record(f"{tag}_sddmm", rel(np.asarray(sd_flat)[:nz], ref_sd),
               1e-2)
        sm = P.sparse_softmax(spec, panel)
        sm_flat = P.panel_to_values(topo, sm, 128, 128, compressed=comp)
        e = np.exp(np.where(mask != 0, A, -1e30))
        refm = (e / e.sum(1, keepdims=True))[
            np.asarray(topo.row_ids[:nz]),
            np.asarray(topo.column_indices[:nz])]
        record(f"{tag}_softmax", rel(np.asarray(sm_flat)[:nz], refm),
               1e-3)

    # ---- slot-subset walk (bsr_spmm_panel_sel) ---------------------------
    from sputnik_tpu.ops.pallas import bsr_spmm as _bs

    bv = topo.block(128, 128)
    flat = np.zeros((bv.dump + 1,), np.float32)
    flat[np.asarray(bv.scatter_idx)] = vals
    panel_u = jnp.asarray(flat[: bv.dump].reshape(bv.values_shape))
    dense_p = jnp.zeros((bv.n_pad, q), jnp.float32).at[:n].set(dense)
    cols = np.asarray(bv.block_cols)
    nblk = np.asarray(bv.nblocks)
    full = _bs.bsr_spmm_panel(
        jnp.asarray(cols.reshape(-1)), jnp.asarray(nblk), panel_u,
        dense_p, jnp.zeros((bv.m_pad, 1), jnp.float32),
        mb=bv.mb, max_bpr=bv.max_bpr, kb=bv.kb, bm=128, bk=128, bn=128,
        interpret=interp)
    tot = 0
    for par in (0, 1):
        c = cols.copy()
        sel = np.zeros_like(c)
        nb = np.zeros_like(nblk)
        for i in range(bv.mb):
            picks = [s for s in range(int(nblk[i])) if s % 2 == par]
            nb[i] = len(picks)
            for j, s_ in enumerate(picks):
                c[i, j] = cols[i, s_]
                sel[i, j] = s_
            if 0 < len(picks) < bv.max_bpr:
                c[i, len(picks):] = c[i, len(picks) - 1]
                sel[i, len(picks):] = sel[i, len(picks) - 1]
        tot = tot + _bs.bsr_spmm_panel_sel(
            jnp.asarray(c.reshape(-1)), jnp.asarray(nb),
            jnp.asarray(sel.reshape(-1)), panel_u, dense_p,
            mb=bv.mb, max_bpr=bv.max_bpr, bm=128, bk=128, bn=128,
            interpret=interp)
    record("spmm_panel_sel", rel(tot, full), 1e-5)

    # ---- batched flash fwd + bwd (dq / dkv) ------------------------------
    from sputnik_tpu import many_mask as mm
    from sputnik_tpu.ops import batched_panel as bp
    from sputnik_tpu.ops.fused_attention import fused_sparse_attention

    b, h, s, hd = 2, 2, 256, 64
    masks = np.stack([np.tril(np.ones((s, s), np.float32)),
                      (rng.rand(s, s) < 0.35).astype(np.float32)])
    masks[0, 9, :] = 0.0
    mt = mm.ManyMaskTopology.from_dense_masks(masks)
    fspec = bp.BatchedPanelSpec.from_many_mask(mt, heads=h, bm=128,
                                               bk=128)
    mk = lambda seed: jnp.asarray(                        # noqa: E731
        np.random.RandomState(seed).randn(b * h, s, hd).astype(
            np.float32))
    qq, kk, vv = mk(1), mk(2), mk(3)

    def attn(backend):
        st.set_backend(backend)
        try:
            out = fused_sparse_attention(fspec, qq, kk, vv)
            gq, gk, gv = jax.grad(
                lambda a, b_, c: jnp.sum(
                    fused_sparse_attention(fspec, a, b_, c) ** 2),
                argnums=(0, 1, 2))(qq, kk, vv)
            jax.block_until_ready((out, gq, gk, gv))
            return [np.asarray(x) for x in (out, gq, gk, gv)]
        finally:
            st.set_backend("auto")

    pal, ora = attn("pallas"), attn("xla")
    for nm, g, r in zip(("flash_fwd", "flash_bwd_dq", "flash_bwd_dk",
                         "flash_bwd_dv"), pal, ora):
        record(nm, rel(g, r), 2e-2)

    # ring band-carry kernel: a 2-chunk carried walk over split key
    # bands must equal the one-shot fused forward (the cross-band merge
    # lives IN the kernel now — parallel/ring_flash.py)
    from sputnik_tpu.ops.pallas import flash_sparse as _fs
    from sputnik_tpu.parallel import RowPartition as _RP
    from sputnik_tpu.parallel.ring_flash import RingFlashSpec as _RFS
    from sputnik_tpu.patterns import causal_topology as _ct

    s_r, hd_r, ndev_r = 1024, 64, 2
    rs = _RFS(_RP(_ct(s_r), ndev_r, bm=128, balance=False),
              bm=128, bk=128)
    d_r = ndev_r - 1                      # fullest shard
    rq = jnp.asarray(rng.randn(2, rs.m_pad_loc, 128).astype(np.float32))
    rk = jnp.asarray(rng.randn(2, rs.n_loc, 128).astype(np.float32))
    rk2 = jnp.asarray(rng.randn(2, rs.n_loc, 128).astype(np.float32))
    rmeta = {k_: jnp.asarray(getattr(rs, k_)[d_r])
             for k_ in ("block_cols", "nblocks", "mask_slot",
                        "is_partial_")}
    rpm = jnp.asarray(rs.pmask[d_r])

    def carry_2band(q_, ka, kb_):
        st0 = jnp.zeros((2, rs.m_pad_loc, 128), jnp.float32)
        st0 = st0.at[:, :, 0].set(-1e30)
        acc = jnp.zeros((2, rs.m_pad_loc, 128), jnp.float32)
        for band, (kk, vv) in enumerate(((ka, ka), (kb_, kb_))):
            acc, st0 = _fs.flash_sparse_ring_band_fwd(
                jnp.asarray([band], jnp.int32),
                rmeta["block_cols"], rmeta["nblocks"],
                rmeta["mask_slot"], rmeta["is_partial_"], rpm,
                q_, kk, vv, acc, st0,
                R=2, mb=rs.mb, max_bpr=rs.max_bpr,
                bm=rs.bm, bk=rs.bk, interpret=interp)
        return acc / jnp.maximum(st0[:, :, 1:2], 1e-30)

    got_carry = jax.jit(carry_2band)(rq, rk, rk2)
    # oracle: the shard's FULL topology through the one-shot kernel
    from sputnik_tpu.parallel.flash_sharded import ShardedFlashSpec as _SFS

    fsp = _SFS(_RP(_ct(s_r), ndev_r, bm=128, balance=False),
               bm=128, bk=128)
    fmd = {k_: jnp.asarray(getattr(fsp, k_)[d_r][None])
           for k_ in ("block_cols", "nblocks", "mask_slot",
                      "is_partial_")}
    kfull = jnp.concatenate([rk, rk2], axis=1)
    ref_carry = jax.jit(lambda q_, k_, v_: _fs.flash_sparse_attention_fwd(
        fmd["block_cols"], fmd["nblocks"], fmd["mask_slot"],
        fmd["is_partial_"], jnp.asarray(fsp.pmask[d_r][None]),
        q_, k_, v_, R=2, heads=2, mb=fsp.mb, max_bpr=fsp.max_bpr,
        bm=fsp.bm, bk=fsp.bk, interpret=interp)[0])(rq, kfull, kfull)
    record("ring_band_carry", rel(got_carry, ref_carry), 2e-2)

    # ring BACKWARD carry: 2-band carried dq/dk/dv vs the single-pass
    # fused backward over the concatenated bands (itself oracle-anchored
    # by the flash_bwd families above)
    st_f = jax.jit(lambda q_, k_, v_: _fs.flash_sparse_attention_fwd(
        fmd["block_cols"], fmd["nblocks"], fmd["mask_slot"],
        fmd["is_partial_"], jnp.asarray(fsp.pmask[d_r][None]),
        q_, k_, v_, R=2, heads=2, mb=fsp.mb, max_bpr=fsp.max_bpr,
        bm=fsp.bm, bk=fsp.bk, interpret=interp,
        packed_stats=True))(rq, kfull, kfull)
    out_f, stats_f = st_f
    gg = jnp.asarray(rng.randn(*out_f.shape).astype(np.float32))
    dco = jnp.broadcast_to(
        jnp.sum(gg * out_f, axis=-1)[..., None], stats_f.shape)

    def bwd_carry(q_, ka, kb2, g_, stt, dc_):
        kb_loc = rs.n_loc // rs.bk
        dq0 = jnp.zeros_like(q_)
        dk0 = jnp.zeros((2, kb_loc, rs.bk, 128), jnp.float32)
        dv0 = jnp.zeros_like(dk0)
        outs = []
        for band, kk in ((0, ka), (1, kb2)):
            dq0, dkb, dvb = _fs.flash_sparse_ring_band_bwd(
                jnp.asarray([band], jnp.int32),
                rmeta["block_cols"], rmeta["nblocks"],
                rmeta["mask_slot"], rmeta["is_partial_"], rpm,
                q_, kk, kk, g_, stt, dc_, dq0, dk0, dv0,
                R=2, mb=rs.mb, kb=kb_loc, max_bpr=rs.max_bpr,
                bm=rs.bm, bk=rs.bk, interpret=interp)
            outs.append((dkb.reshape(2, rs.n_loc, 128),
                         dvb.reshape(2, rs.n_loc, 128)))
        dk_cat = jnp.concatenate([outs[0][0], outs[1][0]], axis=1)
        dv_cat = jnp.concatenate([outs[0][1], outs[1][1]], axis=1)
        return dq0, dk_cat, dv_cat

    got_b = jax.jit(bwd_carry)(rq, rk, rk2, gg, stats_f, dco)
    ref_b = jax.jit(lambda q_, k_, g_, stt, dc_: _fs.flash_sparse_bwd_fused(
        fmd["block_cols"], fmd["nblocks"], fmd["mask_slot"],
        fmd["is_partial_"], jnp.asarray(fsp.pmask[d_r][None]),
        q_, k_, k_, g_, stt, dc_,
        R=2, heads=2, mb=fsp.mb, kb=fsp.n_pad // fsp.bk,
        max_bpr=fsp.max_bpr, bm=fsp.bm, bk=fsp.bk,
        interpret=interp))(rq, kfull, gg, stats_f, dco)
    rdq, rdk, rdv = ref_b
    rdk = rdk.reshape(2, fsp.n_pad, 128)[:, : 2 * rs.n_loc]
    rdv = rdv.reshape(2, fsp.n_pad, 128)[:, : 2 * rs.n_loc]
    record("ring_band_carry_bwd_dq", rel(got_b[0], rdq), 2e-2)
    record("ring_band_carry_bwd_dk", rel(got_b[1], rdk), 2e-2)
    record("ring_band_carry_bwd_dv", rel(got_b[2], rdv), 2e-2)

    # same grads through the two-kernel fallback (force by zeroing the
    # single-pass accumulator budget) — keeps the transposed-walk kernels
    # on-chip-covered now that the fused pass is the default
    from sputnik_tpu.ops import fused_attention as _fa

    _old_budget = _fa._FUSED_BWD_ACC_BYTES
    _fa._FUSED_BWD_ACC_BYTES = 0
    try:
        pal2 = attn("pallas")
    finally:
        _fa._FUSED_BWD_ACC_BYTES = _old_budget
    for nm, g, r in zip(("flash_bwd2k_dq", "flash_bwd2k_dk",
                         "flash_bwd2k_dv"), pal2[1:], ora[1:]):
        record(nm, rel(g, r), 2e-2)

    # ---- batched spmm at wide q (bn=512) + big tiles (the MoE bank) ------
    topo_w = st.SparseTopology.from_dense_mask(
        (rng.rand(1024, 1024) < 0.25).astype(np.float32))
    spec_w = bp.BatchedPanelSpec([topo_w], heads=4, bm=1024, bk=1024)
    # panel convention: masked-out slots must be ZERO (the kernel
    # multiplies whole blocks; only the oracle path extracts nnz)
    bv_w = topo_w.block(1024, 1024)
    mask_p = np.zeros(spec_w.panel_shape, np.float32)
    mask_p[:, : bv_w.max_bpr] = np.asarray(bv_w.mask, np.float32)
    pw = jnp.asarray(rng.randn(4, *spec_w.panel_shape).astype(np.float32)
                     * mask_p[None])
    dw = jnp.asarray(rng.randn(4, 1024, 640).astype(np.float32))
    Aw = np.zeros((1024, 1024), np.float32)
    nzw = topo_w.nnz
    Aw[np.asarray(topo_w.row_ids[:nzw]),
       np.asarray(topo_w.column_indices[:nzw])] = 1.0
    # panel -> dense weights per replica for the oracle
    from sputnik_tpu.ops import panel_api as PAN
    refs = []
    for r_ in range(4):
        fv = PAN.panel_to_values_np(topo_w, np.asarray(pw[r_]), 1024, 1024)
        Ar = np.zeros((1024, 1024), np.float32)
        Ar[np.asarray(topo_w.row_ids[:nzw]),
           np.asarray(topo_w.column_indices[:nzw])] = fv[:nzw]
        refs.append(Ar @ np.asarray(dw[r_]))
    got_w = np.asarray(bp.spmm_bh(spec_w, pw, dw))[:, :1024]
    record("spmm_bh_bigtile_q640", rel(got_w, np.stack(refs)), 1e-2)

    # ---- int8 family -----------------------------------------------------
    from sputnik_tpu.ops import int8_api as I8

    spec8 = P.PanelSpec(topo, bm=128, bk=128)
    panel8 = jnp.asarray(P.values_to_panel_np(topo, vals, 128, 128))
    qp = I8.quantize_panel(spec8, panel8)
    record("int8_spmm",
           rel(np.asarray(I8.spmm_int8(spec8, qp, dense))[:m],
               A @ np.asarray(dense)), 2e-1)
    g_rows = jnp.asarray(rng.randn(m, q).astype(np.float32))
    record("int8_spmm_t",
           rel(np.asarray(I8.spmm_t_int8(spec8, qp, g_rows))[:n],
               A.T @ np.asarray(g_rows)), 2e-1)
    lhs = jnp.asarray(rng.randn(m, 128).astype(np.float32))
    rhs = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    sd8 = I8.sddmm_int8(spec8, lhs, rhs)
    sd8_flat = P.panel_to_values(topo, sd8, 128, 128)
    ref_sd = (np.asarray(lhs) @ np.asarray(rhs).T)[
        np.asarray(topo.row_ids[:nz]), np.asarray(topo.column_indices[:nz])]
    record("int8_sddmm", rel(np.asarray(sd8_flat)[:nz], ref_sd), 2e-1)

    fq = jnp.asarray(rng.randn(b * h, s, hd).astype(np.float32))
    out8 = I8.attention_int8(fspec, fq, kk, vv)
    st.set_backend("xla")
    ref_at = fused_sparse_attention(fspec, fq, kk, vv)
    st.set_backend("auto")
    record("int8_flash_fwd", rel(out8, ref_at), 2e-1)
    g8 = jax.grad(lambda a: jnp.sum(I8.attention_qat(
        fspec, a, kk, vv, backward="int8") ** 2))(fq)
    gref = jax.grad(lambda a: jnp.sum(
        I8.attention_qat(fspec, a, kk, vv, backward="fp32") ** 2))(fq)
    record("int8_flash_bwd", rel(g8, gref), 4e-1)

    # ---- decode attention (bf16 + int8 cache, GQA, qlen>1) ---------------
    from sputnik_tpu.ops import decode as D

    R_kv, s_max, hd_d, bk_d = 2, 512, 128, 256
    group = 2
    R = R_kv * group
    cache = D.init_kv_cache(R_kv, s_max, hd_d, dtype=jnp.bfloat16)
    kv_len = 300
    kseq = rng.randn(R_kv, kv_len, hd_d).astype(np.float32)
    vseq = rng.randn(R_kv, kv_len, hd_d).astype(np.float32)
    cache = D.prefill_kv(cache, jnp.asarray(kseq), jnp.asarray(vseq))
    # full-causal table: every block up to kv_len
    nbk = s_max // bk_d
    tbl = jnp.broadcast_to(jnp.arange(nbk, dtype=jnp.int32)[None],
                           (R_kv, nbk))
    valid = (tbl * bk_d < cache.kv_len[:, None]).astype(jnp.int32)
    qd = jnp.asarray(rng.randn(R, 1, hd_d).astype(np.float32))

    def dense_decode(qd_, group_):
        o = []
        for r in range(R):
            kvr = r // group_
            sc = (np.asarray(qd_)[r] @ kseq[kvr].T) / np.sqrt(hd_d)
            w = np.exp(sc - sc.max(-1, keepdims=True))
            w /= w.sum(-1, keepdims=True)
            o.append(w @ vseq[kvr])
        return np.stack(o)

    out_d = D.decode_attention(qd, cache, tbl, valid, bk=bk_d,
                               group=group)
    record("decode_bf16_gqa", rel(out_d, dense_decode(qd, group)), 2e-2)

    cache8 = D.init_kv_cache(R_kv, s_max, hd_d, dtype=jnp.int8)
    cache8 = D.prefill_kv(cache8, jnp.asarray(kseq), jnp.asarray(vseq))
    out_8 = D.decode_attention(qd, cache8, tbl, valid, bk=bk_d,
                               group=group)
    record("decode_int8", rel(out_8, dense_decode(qd, group)), 1e-1)

    qm = jnp.asarray(rng.randn(R, 4, hd_d).astype(np.float32))
    out_m = D.decode_attention(qm, cache, tbl, valid, bk=bk_d, qlen=4,
                               group=group)
    # oracle: row i attends causally to cache positions < kv_len-3+i;
    # check only the LAST row (= full kv_len) against the dense oracle
    record("decode_qlen4_lastrow",
           rel(out_m[:, -1:], dense_decode(qm[:, -1:], group)), 2e-2)

    # ---- ragged append (the Pallas per-replica-position kernel) ----------
    cache_r = D.init_kv_cache(4, 512, hd_d, dtype=jnp.bfloat16)
    lens = np.array([100, 37, 511, 0], np.int32)
    cache_r = D.prefill_kv(
        cache_r, jnp.asarray(rng.randn(4, 511, hd_d).astype(np.float32)),
        jnp.asarray(rng.randn(4, 511, hd_d).astype(np.float32)),
        lengths=jnp.asarray(lens))
    knew = rng.randn(4, hd_d).astype(np.float32)
    vnew = rng.randn(4, hd_d).astype(np.float32)
    c2 = D.append_kv(cache_r, jnp.asarray(knew), jnp.asarray(vnew))
    okl = np.array_equal(np.asarray(c2.kv_len), lens + 1)
    errs = []
    for r_ in range(4):
        errs.append(rel(np.asarray(c2.k[r_, lens[r_]], np.float32),
                        knew[r_].astype(jnp.bfloat16).astype(np.float32)))
    record("ragged_append", max(errs) if okl else np.inf, 1e-6)

    # ---- paged runtime (append + paged attention + multi + rollback) -----
    from sputnik_tpu.models.serving import SparseDecoder
    from sputnik_tpu.models.serving_paged import PagedDecoder
    from sputnik_tpu.models.transformer import SparseTransformer

    bq, Pp, heads_p, hp = 2, 128, 2, 64
    masks_p = np.broadcast_to(np.tril(np.ones((Pp, Pp), np.float32)),
                              (bq, Pp, Pp)).copy()
    model = SparseTransformer.from_masks(
        masks_p, num_layers=2, hidden_size=hp, num_heads=heads_p,
        ffn_hidden_size=96, use_residual=True, use_layernorm=True,
        activation="gelu")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((bq, Pp, hp)))
    xp = jnp.asarray(rng.randn(bq, Pp, hp).astype(np.float32) * 0.3)
    tk = jnp.asarray(rng.randn(3, bq, 1, hp).astype(np.float32) * 0.3)

    ref_dec = SparseDecoder(model, s_max=Pp + 128, bk=128,
                            cache_dtype=jnp.float32)
    rc = ref_dec.init_caches(bq)
    y_ref, rc = ref_dec.prefill(params, xp, rc)
    pd = PagedDecoder(model, n_pages=2 * bq * heads_p, s_max=Pp + 128,
                      bk=128, cache_dtype=jnp.float32)
    pc = pd.init_caches(bq)
    y_pg, pc = pd.prefill(params, xp, pc)
    e1 = rel(y_pg, y_ref)
    pc = pd.reserve(pc, 3)
    rcs = rc
    y2_ref, rcs = ref_dec.decode_step(params, tk[0], rcs)
    y2_pg, pc = pd.decode_step(params, tk[0], pc)
    e2 = rel(y2_pg, y2_ref)
    ym_pg, pc = pd.decode_multi(params, jnp.concatenate(
        [tk[1], tk[2]], axis=1), pc)
    pc = pd.rollback(pc, 2)
    ym2_pg, pc = pd.decode_step(params, tk[1], pc)
    y3_ref, rcs = ref_dec.decode_step(params, tk[1], rcs)
    e3 = rel(ym2_pg, y3_ref)
    record("paged_runtime", max(e1, e2, e3), 1e-4)

    n_fail = RESULTS.count(False)
    print(json.dumps({"smoke_total": len(RESULTS),
                      "smoke_failed": n_fail}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
