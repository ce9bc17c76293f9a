"""Numbers for the last "functional-only" subsystems (r3 verdict weak
 #2/#5): ring attention, ep-sharded MoE, and the pipeline schedule.

One real TPU chip cannot time collectives, so each row measures what a
single chip CAN price, mirroring the r3 shard_map-overhead methodology:

  * ring: the per-(shard, band) flash kernel vs the equivalent
    all_gather-then-flash kernel (full keys) for the same query shard —
    the compute-side cost ratio of the ring schedule — plus the peak
    live K/V bytes of each scheme (band vs full, structural).
  * MoE: ep-sharded SparseMoE fwd + train step on a 1-device mesh vs the
    same module unsharded — the shard_map/dispatch machinery cost.
  * pipeline: ``pipeline_apply`` (1 stage, n_micro microbatches) vs the
    stage applied directly — the GPipe schedule machinery cost.

Run on the real TPU:  python benchmarks/ring_moe_pipeline.py
CPU-mesh scan-step overhead (8 virtual devices) appends via --cpu-mesh.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



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

def tpu_mode():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    import sputnik_tpu as st
    from sputnik_tpu.ops._common import interp as _interp
    from sputnik_tpu.ops.pallas import flash_sparse as fs
    from sputnik_tpu.parallel import RowPartition
    from sputnik_tpu.parallel.ring_flash import RingFlashSpec
    from sputnik_tpu.patterns import causal_topology
    from sputnik_tpu.utils.profiling import measure

    assert jax.devices()[0].platform == "tpu"
    out = {}
    rng = np.random.RandomState(0)

    # ---- ring per-band kernel vs all_gather-then-flash -------------------
    ndev, s, hd, R = 8, 8192, 64, 4
    topo = causal_topology(s)
    part = RowPartition(topo, ndev, bm=128, balance=False)
    rspec = RingFlashSpec(part, bm=128, bk=128)
    n_loc = rspec.n_loc
    hd_pad = 128
    q0 = jnp.asarray(
        rng.randn(R, rspec.m_pad_loc, hd_pad).astype(np.float32))
    kb = jnp.asarray(rng.randn(R, n_loc, hd_pad).astype(np.float32))
    vb = jnp.asarray(rng.randn(R, n_loc, hd_pad).astype(np.float32))

    # band (d=ndev-1, b=0): the fullest band of the last shard
    d = ndev - 1
    meta = {k: jnp.asarray(getattr(rspec, k)[d, 0][None])
            for k in ("block_cols", "nblocks", "mask_slot",
                      "is_partial_")}
    pm = jnp.asarray(rspec.pmask[d, 0][None])
    f_band = jax.jit(lambda q, k, v: fs.flash_sparse_attention_fwd(
        meta["block_cols"], meta["nblocks"], meta["mask_slot"],
        meta["is_partial_"], pm, q, k, v,
        R=R, heads=R, mb=rspec.mb, max_bpr=rspec.max_bpr,
        bm=rspec.bm, bk=rspec.bk, interpret=_interp())[0])
    out["ring_band_kernel_ms"] = round(measure(f_band, q0, kb, vb), 4)

    # all_gather equivalent: same query shard over the FULL key span
    from sputnik_tpu.parallel.flash_sharded import ShardedFlashSpec

    fspec = ShardedFlashSpec(part, bm=128, bk=128)
    kf = jnp.asarray(
        rng.randn(R, fspec.n_pad, hd_pad).astype(np.float32))
    vf = jnp.asarray(
        rng.randn(R, fspec.n_pad, hd_pad).astype(np.float32))
    md = {k: jnp.asarray(getattr(fspec, k)[d][None])
          for k in ("block_cols", "nblocks", "mask_slot", "is_partial_")}
    pmf = jnp.asarray(fspec.pmask[d][None])
    f_full = jax.jit(lambda q, k, v: fs.flash_sparse_attention_fwd(
        md["block_cols"], md["nblocks"], md["mask_slot"],
        md["is_partial_"], pmf, q, k, v,
        R=R, heads=R, mb=fspec.mb, max_bpr=fspec.max_bpr,
        bm=fspec.bm, bk=fspec.bk, interpret=_interp())[0])
    out["allgather_shard_kernel_ms"] = round(measure(f_full, q0, kf, vf),
                                             4)
    # the REAL ring compute total: ndev carried band steps in ONE jit
    # (the carry kernel folds the cross-band merge in-kernel and aliases
    # the accumulator in place; on hardware the ppermutes overlap) vs the
    # single all_gather kernel — the r4 1.4-1.9x launch-overhead gap
    meta_all = {k: jnp.asarray(getattr(rspec, k)[d])
                for k in ("block_cols", "nblocks", "mask_slot",
                          "is_partial_")}
    pm_all = jnp.asarray(rspec.pmask[d])

    @jax.jit
    def ring_chain(q, k, v):
        st0 = jnp.zeros((R, rspec.m_pad_loc, 128), jnp.float32)
        st0 = st0.at[:, :, 0].set(-1e30)
        acc0 = jnp.zeros((R, rspec.m_pad_loc, hd_pad), jnp.float32)

        def step(carry, t):
            acc, stt = carry
            acc, stt = fs.flash_sparse_ring_band_fwd(
                t[None].astype(jnp.int32),
                meta_all["block_cols"], meta_all["nblocks"],
                meta_all["mask_slot"], meta_all["is_partial_"], pm_all,
                q, k, v, acc, stt,
                R=R, mb=rspec.mb, max_bpr=rspec.max_bpr,
                bm=rspec.bm, bk=rspec.bk, interpret=_interp())
            return (acc, stt), None

        (acc, stt), _ = jax.lax.scan(step, (acc0, st0),
                                     jnp.arange(ndev))
        return acc / jnp.maximum(stt[:, :, 1:2], 1e-30)

    out["ring_total_carry_ms"] = round(measure(ring_chain, q0, kb, vb), 4)

    # backward totals: ndev carried bwd steps (one kernel each) vs the
    # single-pass fused backward over the gathered full key span
    meta_f = {k: jnp.asarray(getattr(fspec, k)[d][None])
              for k in ("block_cols", "nblocks", "mask_slot",
                        "is_partial_")}
    pm_f = jnp.asarray(fspec.pmask[d][None])
    o_st = jax.jit(lambda q, k, v: fs.flash_sparse_attention_fwd(
        meta_f["block_cols"], meta_f["nblocks"], meta_f["mask_slot"],
        meta_f["is_partial_"], pm_f, q, k, v,
        R=R, heads=R, mb=fspec.mb, max_bpr=fspec.max_bpr,
        bm=fspec.bm, bk=fspec.bk, interpret=_interp(),
        packed_stats=True))(q0, kf, vf)
    out_f, stats_f = o_st
    gq = jnp.asarray(rng.randn(*np.asarray(out_f).shape).astype(
        np.float32))
    dco = jnp.broadcast_to(
        jnp.sum(gq * out_f, axis=-1)[..., None], stats_f.shape)

    kb_loc = rspec.n_loc // rspec.bk

    @jax.jit
    def ring_bwd_chain(q, k, v, g, stt, dc):
        dq0 = jnp.zeros_like(q)
        dk0 = jnp.zeros((R, kb_loc, rspec.bk, hd_pad), jnp.float32)
        dv0 = jnp.zeros_like(dk0)

        def step(carry, t):
            dq, dk, dv = carry
            dq, dk, dv = fs.flash_sparse_ring_band_bwd(
                t[None].astype(jnp.int32),
                meta_all["block_cols"], meta_all["nblocks"],
                meta_all["mask_slot"], meta_all["is_partial_"], pm_all,
                q, k, v, g, stt, dc, dq, dk, dv,
                R=R, mb=rspec.mb, kb=kb_loc, max_bpr=rspec.max_bpr,
                bm=rspec.bm, bk=rspec.bk, interpret=_interp())
            return (dq, dk, dv), None

        (dq, dk, dv), _ = jax.lax.scan(step, (dq0, dk0, dv0),
                                       jnp.arange(ndev))
        return dq, dk, dv

    out["ring_bwd_total_carry_ms"] = round(
        measure(ring_bwd_chain, q0, kb, vb, gq, stats_f, dco), 4)

    f_bwd_full = jax.jit(
        lambda q, k, v, g, stt, dc: fs.flash_sparse_bwd_fused(
            meta_f["block_cols"], meta_f["nblocks"], meta_f["mask_slot"],
            meta_f["is_partial_"], pm_f, q, k, v, g, stt, dc,
            R=R, heads=R, mb=fspec.mb, kb=fspec.n_pad // fspec.bk,
            max_bpr=fspec.max_bpr, bm=fspec.bm, bk=fspec.bk,
            interpret=_interp()))
    out["allgather_bwd_fused_ms"] = round(
        measure(f_bwd_full, q0, kf, vf, gq, stats_f, dco), 4)

    out["ring_bands_per_shard"] = ndev
    band_bytes = 2 * R * n_loc * hd_pad * 4
    out["ring_peak_kv_bytes"] = band_bytes          # ONE band live
    out["allgather_peak_kv_bytes"] = 2 * R * fspec.n_pad * hd_pad * 4
    out["ring_kv_memory_ratio"] = round(
        out["allgather_peak_kv_bytes"] / band_bytes, 2)

    # ---- ep MoE: sharded (1-dev mesh) vs unsharded -----------------------
    import optax
    from jax.sharding import Mesh

    from sputnik_tpu.models.moe import SparseMoE

    h, f = 1024, 4096
    topo_in = st.SparseTopology.from_dense_mask(
        (rng.rand(f, h) < 0.25).astype(np.float32))
    topo_out = st.SparseTopology.from_dense_mask(
        (rng.rand(h, f) < 0.25).astype(np.float32))
    x = jnp.asarray(rng.randn(8, 512, h).astype(np.float32))

    for tag, mesh in (("moe_ep1", Mesh(np.array(jax.devices()[:1]),
                                       ("ep",))),
                      ("moe_unsharded", None)):
        moe = SparseMoE(topo_in=topo_in, topo_out=topo_out,
                        num_experts=8, top_k=2, mesh=mesh,
                        axis="ep" if mesh else None)
        params = moe.init(jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda p, xx: moe.apply(p, xx))
        out[f"{tag}_fwd_ms"] = round(measure(fwd, params, x), 4)
        tx = optax.sgd(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, xx):
            l, g = jax.value_and_grad(
                lambda pp: jnp.mean(moe.apply(pp, xx) ** 2))(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        out[f"{tag}_train_ms"] = round(measure(step, params, opt, x), 4)

    # ---- block-structured expert bank: density must buy TIME -------------
    # isolates the BANK (two projections over the dispatched [E, C, h]
    # tokens; router/dispatch is identical either way) — dense einsum
    # anchor vs the batched sparse kernels on element-random (occupancy
    # ~1.0: the r4 floor) and block-random patterns with kernel tiles ==
    # block granularity (empty tiles actually skipped)
    from sputnik_tpu.ops import batched_panel as bp
    from sputnik_tpu.ops import panel_api as PA
    from sputnik_tpu.patterns import block_random_topology

    E, C = 8, 1280
    xe = jnp.asarray(rng.randn(E, h, C).astype(np.float32))
    w1d = jnp.asarray(rng.randn(E, f, h).astype(np.float32) * 0.02)
    w2d = jnp.asarray(rng.randn(E, h, f).astype(np.float32) * 0.02)

    @jax.jit
    def dense_bank(xe, w1, w2):
        y = jnp.einsum("efh,ehc->efc", w1, xe)
        y = jax.nn.gelu(y)
        return jnp.einsum("ehf,efc->ehc", w2, y)

    out["bank_dense_ms"] = round(measure(dense_bank, xe, w1d, w2d), 4)

    def bank_case(tag, t_in, t_out, bm, bk):
        s1 = bp.BatchedPanelSpec([t_in], heads=E, bm=bm, bk=bk)
        s2 = bp.BatchedPanelSpec([t_out], heads=E, bm=bm, bk=bk)
        p1 = jnp.asarray(np.stack([PA.values_to_panel_np(
            t_in, rng.randn(t_in.nnz_pad).astype(np.float32), bm, bk)
            for _ in range(E)]))
        p2 = jnp.asarray(np.stack([PA.values_to_panel_np(
            t_out, rng.randn(t_out.nnz_pad).astype(np.float32), bm, bk)
            for _ in range(E)]))

        @jax.jit
        def sparse_bank(xe, p1, p2):
            y = bp.spmm_bh(s1, p1, xe)
            y = jax.nn.gelu(y)
            return bp.spmm_bh(s2, p2, y[:, : t_out.n])

        out[f"bank_{tag}_ms"] = round(
            measure(sparse_bank, xe, p1, p2), 4)

    bank_case("elem_d25", topo_in, topo_out, 1024, 1024)
    for d, tag in ((0.25, "block_d25"), (0.125, "block_d125")):
        bi = block_random_topology(f, h, 512, 512, density=d, seed=1,
                                   balanced=False)
        bo = block_random_topology(h, f, 512, 512, density=d, seed=2,
                                   balanced=False)
        bank_case(tag, bi, bo, 512, 512)

    # ---- pipeline schedule machinery on chip -----------------------------
    from jax.sharding import Mesh as _M

    from sputnik_tpu.many_mask import ManyMaskTopology
    from sputnik_tpu.models.transformer import TransformerLayer
    from sputnik_tpu.parallel.pipeline import (PipelineSpec,
                                               pipeline_apply,
                                               stack_stage_params)

    mb_, s_, h_, heads_, ffn_ = 4, 512, 512, 8, 2048
    masks = np.broadcast_to(np.tril(np.ones((s_, s_), np.float32)),
                            (mb_, s_, s_)).copy()
    mt = ManyMaskTopology.from_dense_masks(masks)
    layer = TransformerLayer(
        mask_topology=mt, hidden_size=h_, num_heads=heads_,
        ffn_hidden_size=ffn_, use_residual=True, use_layernorm=True,
        activation="gelu", attention_layout="flash")
    x0 = jnp.asarray(rng.randn(mb_, s_, h_).astype(np.float32))
    p0 = layer.init(jax.random.PRNGKey(0), x0)["params"]
    stacked = stack_stage_params([p0])
    spec = PipelineSpec(_M(np.array(jax.devices()[:1]), ("pp",)), "pp",
                        n_micro=2)
    x2 = jnp.asarray(rng.randn(2 * mb_, s_, h_).astype(np.float32))

    def stage_fn(p, xm):
        return layer.apply({"params": p}, xm)

    pipe = jax.jit(lambda p, xx: pipeline_apply(spec, stage_fn, p, xx))
    out["pipeline_1stage_2micro_ms"] = round(measure(pipe, stacked, x2),
                                             4)
    # sequential two-microbatch baseline (the mask topology is built for
    # mb_-sized batches — the schedule splits x2 the same way)
    direct = jax.jit(lambda p, xx: jnp.concatenate(
        [layer.apply({"params": p}, xx[:mb_]),
         layer.apply({"params": p}, xx[mb_:])], axis=0))
    out["sequential_2micro_ms"] = round(measure(direct, p0, x2), 4)

    print(json.dumps(out, indent=1))


def cpu_mesh_mode():
    """Ring scan-step overhead on the 8-virtual-device CPU mesh: jitted
    ring fwd vs the kv-sharded all_gather fallback at identical shapes
    (both with interpret-mode kernels — the DIFFERENCE is schedule +
    collective machinery, the kernels cancel)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    import jax.numpy as jnp
    from jax.sharding import Mesh

    import sputnik_tpu as st
    from sputnik_tpu.parallel import RowPartition
    from sputnik_tpu.parallel.flash_sharded import (
        ShardedFlashSpec, flash_attention_kv_sharded)
    from sputnik_tpu.parallel.ring_flash import (RingFlashSpec,
                                                 ring_flash_attention)

    ndev, s, hd, R = 8, 1024, 32, 2
    mask = np.tril(np.ones((s, s), np.float32))
    topo = st.SparseTopology.from_dense_mask(mask)
    part = RowPartition(topo, ndev, bm=8, balance=False)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("sp",))
    rspec = RingFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    fspec = ShardedFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    rng = np.random.RandomState(0)
    n_loc = s // ndev
    q = jnp.asarray(rng.randn(ndev, R, n_loc, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(ndev, R, n_loc, hd).astype(np.float32))

    ring = jax.jit(lambda a, b, c: ring_flash_attention(rspec, a, b, c))
    gall = jax.jit(lambda a, b, c: flash_attention_kv_sharded(
        fspec, a, b, c))

    def t(fn):
        fn(q, k, k)
        t0 = time.perf_counter()
        for _ in range(5):
            o = fn(q, k, k)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / 5 * 1e3

    print(json.dumps({
        "cpu_mesh_ring_fwd_ms": round(t(ring), 2),
        "cpu_mesh_allgather_fwd_ms": round(t(gall), 2),
        "note": "interpret kernels dominate both; the DIFFERENCE bounds "
                "the ring scan-step machinery",
    }, indent=1))


if __name__ == "__main__":
    if "--cpu-mesh" in sys.argv:
        cpu_mesh_mode()
    else:
        tpu_mode()
