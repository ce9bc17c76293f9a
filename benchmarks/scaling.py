"""Multi-chip scaling harness (BASELINE north star: >= 80% nnz/s on 2+).

Real multi-chip hardware is not reachable from this environment, so the
scaling claim is assembled from three measurable pieces (model in
``sputnik_tpu/parallel/comm_model.py``; results in RESULTS.md "Scaling"):

  1. **Comm-volume accounting** — exact per-device ICI bytes for each
     sharded op, derived from the same block metadata the kernels run
     (ppermute slice sizes, psum payload shapes), at ndev in {1,2,4,8}.
  2. **Functional validation on the 8-virtual-device CPU mesh** — the
     sharded ops run fwd+bwd at every ndev; per-device nnz balance and
     the measured (CPU, interpret-mode — NOT projective) nnz/s sanity
     numbers confirm the harness itself.
  3. **Measured 1-chip shard_map overhead on the real TPU** (``--tpu``):
     the same kernel through the distribution machinery (shard_map +
     stacked device-varying metadata, ndev=1 mesh) vs the unsharded
     panel op — the only distribution cost measurable without a second
     chip.

The projection combines the measured single-chip time, the exact comm
bytes, and public v5e link rates (no compute/comm overlap — conservative).

Usage:
  python benchmarks/scaling.py             # CPU mesh: accounting + dryrun
  python benchmarks/scaling.py --tpu       # real TPU: 1-chip overhead +
                                           #   projection at headline size
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain_ms(fn, args, n_lo=5, n_hi=20, reps=3):
    import jax.numpy as jnp

    def chain(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = out
        while isinstance(leaf, (tuple, list)):
            leaf = leaf[0]
        float(jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)))
        return time.perf_counter() - t0

    chain(1)  # warm
    t_lo = min(chain(n_lo) for _ in range(reps))
    t_hi = min(chain(n_hi) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3


def _mk_problem(size, density, banded, rng):
    import sputnik_tpu as st

    if banded:
        # local-window mask: the sequence-parallel design target
        band = max(size // 8, 64)
        i = np.arange(size)[:, None]
        j = np.arange(size)[None, :]
        mask = ((j <= i) & (j > i - band)).astype(np.float32)
    else:
        mask = (rng.rand(size, size) < density).astype(np.float32)
    return st.SparseTopology.from_dense_mask(mask), mask


def account(ndevs, size, density, q, hd, banded=False, mesh_for=None):
    """Comm-byte table for ndev in ``ndevs``; optionally runs the ops on
    the provided mesh factory (``mesh_for(ndev) -> Mesh``) to validate."""
    import jax
    import jax.numpy as jnp

    from sputnik_tpu.parallel import RowPartition
    from sputnik_tpu.parallel import comm_model as cm
    from sputnik_tpu.parallel.sharded_ops import (
        ShardedPanelSpec, sharded_spmm, sharded_spmm_halo,
        sparse_attention_sharded)

    rng = np.random.RandomState(0)
    topo, _ = _mk_problem(size, density, banded, rng)
    nnz = topo.nnz
    rows = []
    for ndev in ndevs:
        part = RowPartition(topo, ndev, bm=8, balance=not banded)
        spec = ShardedPanelSpec(part, bm=min(128, size // ndev), bk=128,
                                mesh=mesh_for(ndev) if mesh_for else None,
                                axis="x")
        n_loc = size // ndev
        row = {
            "ndev": ndev,
            "nnz_balance": cm.nnz_balance(part)["max_over_mean"],
            "spmm": cm.spmm_comm_bytes(spec, q),
            "spmm_halo": cm.spmm_halo_comm_bytes(spec, n_loc, q),
            "attention": cm.attention_comm_bytes(spec, hd),
        }
        if mesh_for is not None:
            vals = rng.randn(topo.nnz_pad).astype(np.float32)
            panels = jnp.asarray(spec.stack_values(vals))
            dense = jnp.asarray(rng.randn(size, q).astype(np.float32))
            qv = jnp.asarray(
                rng.randn(ndev, size // ndev, hd).astype(np.float32))
            kv = jnp.asarray(rng.randn(size, hd).astype(np.float32))

            t0 = time.perf_counter()
            loss, grads = jax.value_and_grad(
                lambda p, d: jnp.sum(sharded_spmm(spec, p, d) ** 2),
                argnums=(0, 1))(panels, dense)
            jax.block_until_ready(grads)
            row["spmm_fwdbwd_wall_s"] = time.perf_counter() - t0
            row["spmm_nnz_per_s_cpu"] = nnz / row["spmm_fwdbwd_wall_s"]

            d_sh = jnp.asarray(dense.reshape(ndev, n_loc, q))
            out_h = sharded_spmm_halo(spec, panels, d_sh)
            jax.block_until_ready(out_h)
            out_a = jax.grad(lambda qq: jnp.sum(
                sparse_attention_sharded(spec, qq, kv, kv) ** 2))(qv)
            jax.block_until_ready(out_a)
            assert np.isfinite(np.asarray(out_a)).all()
        rows.append(row)
    return dict(size=size, density=density, banded=banded, nnz=int(nnz),
                q=q, hd=hd, rows=rows)


def cpu_mode():
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # 8 virtual devices (must land before backend init; sitecustomize
        # imports jax but does not initialize backends)
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    ndevs = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]

    def mesh_for(ndev):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:ndev]), ("x",))

    out = {
        "random": account(ndevs, 512, 0.15, q=256, hd=64, mesh_for=mesh_for),
        "banded": account(ndevs, 512, 0.15, q=256, hd=64, banded=True,
                          mesh_for=mesh_for),
    }
    print(json.dumps(out, indent=1, default=float))


def tpu_mode():
    """Real TPU: (a) 1-chip shard_map overhead, (b) projection at the
    headline config from measured T1 + exact comm bytes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import sputnik_tpu as st
    from sputnik_tpu.ops import panel_api as P
    from sputnik_tpu.parallel import RowPartition
    from sputnik_tpu.parallel import comm_model as cm
    from sputnik_tpu.parallel.sharded_ops import (
        ShardedPanelSpec, sharded_spmm)

    assert jax.default_backend() == "tpu", "tpu mode needs the TPU"
    size = int(os.environ.get("BENCH_SIZE", 4096))
    density = float(os.environ.get("BENCH_DENSITY", 0.1))
    rng = np.random.RandomState(0)
    topo, _ = _mk_problem(size, density, False, rng)
    vals = rng.randn(topo.nnz_pad).astype(np.float32)
    dense = jnp.asarray(rng.randn(size, size).astype(np.float32))

    # unsharded single-chip reference (same training tiles as the sharded
    # path's (128, 128)-block kernels use bn=512; match bn for a clean
    # machinery-only comparison)
    spec1 = P.PanelSpec(topo, bm=128, bk=128, bn=512)
    panel1 = jnp.asarray(P.values_to_panel_np(topo, vals, 128, 128))
    f_un = jax.jit(lambda p, d: P.spmm(spec1, p, d))
    t_un = _chain_ms(f_un, (panel1, dense))

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("x",))
    part = RowPartition(topo, 1, bm=128, balance=False)
    sspec = ShardedPanelSpec(part, bm=128, bk=128, mesh=mesh1, axis="x")
    panels = jnp.asarray(sspec.stack_values(vals))
    f_sh = jax.jit(lambda p, d: sharded_spmm(sspec, p, d))
    t_sh = _chain_ms(f_sh, (panels, dense))

    # banded (local-window) topology: the halo path's design target —
    # measure its single-chip fwd in this session at the banded tiles.
    # Long-context variant too (analytic builder — no dense mask): the
    # halo is CONSTANT in s, so efficiency rises with context length.
    from sputnik_tpu.patterns import local_window_topology

    btopo = local_window_topology(size, window=256)
    bvals = rng.randn(btopo.nnz_pad).astype(np.float32)
    bspec1 = P.PanelSpec(btopo, bm=512, bk=128, bn=1024)
    bpanel = jnp.asarray(
        P.values_to_panel_np(btopo, bvals, 512, 128)).astype(jnp.bfloat16)
    bdense = dense.astype(jnp.bfloat16)
    f_band = jax.jit(lambda p, d: P.spmm(bspec1, p, d))
    t_band = _chain_ms(f_band, (bpanel, bdense))

    # long-context banded (s=32768, same +-256 window, q=4096): the halo
    # is CONSTANT in s while per-device compute grows with it — the
    # regime the sp layer is built for. Analytic topology (no dense mask).
    s32 = 32768
    btopo32 = local_window_topology(s32, window=256)
    bvals32 = rng.randn(btopo32.nnz_pad).astype(np.float32)
    bspec32 = P.PanelSpec(btopo32, bm=512, bk=128, bn=1024)
    bpanel32 = jnp.asarray(P.values_to_panel_np(
        btopo32, bvals32, 512, 128)).astype(jnp.bfloat16)
    bdense32 = jnp.asarray(
        rng.randn(s32, 4096).astype(np.float32)).astype(jnp.bfloat16)
    f_band32 = jax.jit(lambda p, d: P.spmm(bspec32, p, d))
    t_band32 = _chain_ms(f_band32, (bpanel32, bdense32))

    # projections from the measured kernel times this session + exact
    # comm bytes. The attention T1 is the r2-benched fused sparse
    # attention full grad at s=32768, local window ±256, r=4 heads,
    # hd=64: 9.08 ms (RESULTS.md "Long sequences" table) — re-measuring
    # it here would add ~10 min of compile for a number already recorded.
    T1_ATTN_GRAD_MS = 9.08
    ATTN_S, ATTN_HD, ATTN_R = 32768, 64, 4
    proj = {}
    for ndev in (2, 4, 8):
        partn = RowPartition(topo, ndev, bm=8)
        specn = ShardedPanelSpec(partn, bm=128, bk=128)
        comm = cm.spmm_comm_bytes(specn, size)
        bpart = RowPartition(btopo, ndev, bm=8, balance=False)
        bspecn = ShardedPanelSpec(bpart, bm=128, bk=128)
        # operands stream bf16 on the measured path -> itemsize 2; the
        # halo row count is constant in s, so the same extents price the
        # s=32768 run (q=4096 there)
        bcomm = cm.spmm_halo_comm_bytes(bspecn, size // ndev, size,
                                        itemsize=2)
        bcomm32 = cm.spmm_halo_comm_bytes(bspecn, size // ndev, 4096,
                                          itemsize=2)

        # attention comm needs only n_pad + ndev — computed analytically
        # (building a 32768^2 dense mask here would be pure cost)
        hd_pad = 128
        payload = ATTN_S * hd_pad * 4
        attn_mha = 2.0 * cm.psum_bytes(ATTN_R * payload, ndev)
        attn_gqa = 2.0 * cm.psum_bytes(1 * payload, ndev)
        # K/V-sharded halo variant (flash_attention_kv_sharded): the halo
        # row count is the window span (constant in s) — read it off the
        # s=4096 banded partition (same ±256 window); fwd+bwd volumes per
        # comm_model.attention_halo_comm_bytes
        blo, bhi = bcomm["halo_rows"]
        attn_halo_mha = 2.0 * 2.0 * (blo + bhi) * ATTN_R * hd_pad * 4
        attn_halo_gqa = 2.0 * 2.0 * (blo + bhi) * 1 * hd_pad * 4

        # overlap fractions: comm_model.OVERLAP_FRACTIONS — halo paths
        # prefetch while the interior pass computes (dataflow asserted in
        # tests/test_overlap.py); psum paths consume kernel outputs and
        # cannot prefetch. Every projection also reports the zero-overlap
        # floor as efficiency_serial.
        OF = cm.OVERLAP_FRACTIONS
        halo_f = OF["spmm_halo_fwd"]
        proj[ndev] = {
            "spmm_fwd_random_replicated": cm.project_scaling(
                t_un, comm["fwd"], ndev),
            "spmm_fwdbwd_random_replicated": cm.project_scaling(
                3.0 * t_un, comm["fwd"] + comm["bwd"], ndev,
                overlap_fraction=OF["psum_bwd"]),
            "spmm_fwd_banded_halo": cm.project_scaling(
                t_band, bcomm["fwd"], ndev, overlap_fraction=halo_f),
            "spmm_fwdbwd_banded_halo": cm.project_scaling(
                3.0 * t_band, bcomm["fwd"] + bcomm["bwd"], ndev,
                overlap_fraction=halo_f),
            "spmm_fwd_banded_s32k": cm.project_scaling(
                t_band32, bcomm32["fwd"], ndev, overlap_fraction=halo_f),
            "spmm_fwdbwd_banded_s32k": cm.project_scaling(
                3.0 * t_band32, bcomm32["fwd"] + bcomm32["bwd"], ndev,
                overlap_fraction=halo_f),
            "attention_grad_s32k_mha": cm.project_scaling(
                T1_ATTN_GRAD_MS, attn_mha, ndev,
                overlap_fraction=OF["psum_bwd"]),
            "attention_grad_s32k_gqa4": cm.project_scaling(
                T1_ATTN_GRAD_MS, attn_gqa, ndev,
                overlap_fraction=OF["psum_bwd"]),
            "attention_grad_s32k_mha_kvsharded": cm.project_scaling(
                T1_ATTN_GRAD_MS, attn_halo_mha, ndev,
                overlap_fraction=OF["attention_halo_fwd"]),
            "attention_grad_s32k_gqa4_kvsharded": cm.project_scaling(
                T1_ATTN_GRAD_MS, attn_halo_gqa, ndev,
                overlap_fraction=OF["attention_halo_fwd"]),
            "banded_halo_rows": bcomm["halo_rows"],
        }
    # ---- N >= 2 HOSTS (DCN tier): 2 hosts x 4 chips. Two layouts priced
    # for the banded long-context workloads; the hierarchical model keeps
    # the sp halos on ICI and crosses DCN with either (a) the ONE
    # host-boundary halo (row partition spanning hosts) or (b) the value-
    # gradient all-reduce (dp across hosts). ICI volumes per chip reuse
    # the ndev=4 in-host partition.
    part4 = RowPartition(btopo, 4, bm=8, balance=False)
    spec4 = ShardedPanelSpec(part4, bm=128, bk=128)
    bcomm4 = cm.spmm_halo_comm_bytes(spec4, size // 4, size, itemsize=2)
    bcomm4_32 = cm.spmm_halo_comm_bytes(spec4, size // 4, 4096,
                                        itemsize=2)
    halo4 = bcomm4["halo_rows"]
    OF = cm.OVERLAP_FRACTIONS
    two_host = {}
    for name, t1, ici_fwd_bwd, qcols in (
            ("spmm_fwdbwd_banded_halo",
             3.0 * t_band, bcomm4["fwd"] + bcomm4["bwd"], size),
            ("spmm_fwdbwd_banded_s32k",
             3.0 * t_band32, bcomm4_32["fwd"] + bcomm4_32["bwd"], 4096)):
        dcn_rowpart = 2.0 * cm.hier_halo_dcn_bytes(halo4, qcols, 2,
                                                   itemsize=2)
        dcn_dp = cm.hier_dp_grad_dcn_bytes(int(btopo.nnz), 2)
        two_host[name] = {
            "rowpart_over_dcn": cm.project_scaling_hier(
                t1, ici_fwd_bwd, dcn_rowpart, 2, chips_per_host=4,
                overlap_ici=OF["spmm_halo_fwd"],
                overlap_dcn=OF["spmm_halo_fwd"]),
            "dp_over_dcn": cm.project_scaling_hier(
                t1, ici_fwd_bwd, dcn_dp, 2, chips_per_host=4,
                overlap_ici=OF["spmm_halo_fwd"],
                overlap_dcn=OF["psum_bwd"]),
            "dcn_bytes": {"rowpart": dcn_rowpart, "dp_grad": dcn_dp},
        }
    # attention (kv-sharded halo) at s=32768: rowpart-over-DCN boundary
    attn_halo4 = 2.0 * 2.0 * (halo4[0] + halo4[1]) * 1 * 128 * 4
    two_host["attention_grad_s32k_gqa4_kvsharded"] = {
        "rowpart_over_dcn": cm.project_scaling_hier(
            T1_ATTN_GRAD_MS, attn_halo4,
            2.0 * cm.hier_halo_dcn_bytes(halo4, 128, 2), 2,
            chips_per_host=4,
            overlap_ici=OF["attention_halo_fwd"],
            overlap_dcn=OF["attention_halo_fwd"]),
    }

    print(json.dumps({
        "unsharded_ms": round(t_un, 4),
        "sharded_ndev1_ms": round(t_sh, 4),
        "shard_map_overhead_ms": round(t_sh - t_un, 4),
        "overhead_pct": round((t_sh - t_un) / t_un * 100, 2),
        "banded_w256_fwd_ms": round(t_band, 4),
        "banded_w256_s32k_fwd_ms": round(t_band32, 4),
        "projection": proj,
        "two_host": two_host,
    }, indent=1, default=float))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    (tpu_mode if args.tpu else cpu_mode)()
