"""Ring sparse flash attention (full-causal sequence parallelism)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import sputnik_tpu as st
from sputnik_tpu.parallel import RowPartition
from sputnik_tpu.parallel.ring_flash import (RingFlashSpec,
                                             ring_flash_attention)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} devices")
    return Mesh(np.array(devs[:NDEV]), ("sp",))


def _dense_ref(mask, q, k, v):
    hd = q.shape[-1]
    sc = np.einsum("rqd,rkd->rqk", q, k) / np.sqrt(hd)
    sc = np.where(mask != 0, sc, -1e30)
    e = np.exp(sc - sc.max(-1, keepdims=True)) * (mask != 0)
    w = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
    return np.einsum("rqk,rkd->rqd", w, v)


@pytest.mark.parametrize("group", [1, 2])
def test_ring_causal_matches_dense(mesh, group):
    """Full-causal topology through the ring == dense reference, forward
    AND all three gradients (psum-free backward; dk/dv ride the ring
    home), incl. GQA grouping. Also covers a fully-masked query row and
    strictly-empty future bands."""
    rng = np.random.RandomState(0)
    s, hd, R = 1024, 16, 2 * group
    R_kv = R // group
    mask = np.tril(np.ones((s, s), np.float32))
    mask[17, :] = 0.0                      # fully-masked row
    part = RowPartition(st.SparseTopology.from_dense_mask(mask), NDEV,
                        bm=8, balance=False)
    spec = RingFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    assert spec.n_loc == s // NDEV

    q = rng.randn(R, s, hd).astype(np.float32)
    k = rng.randn(R_kv, s, hd).astype(np.float32)
    v = rng.randn(R_kv, s, hd).astype(np.float32)
    n_loc = s // NDEV
    q_sh = jnp.asarray(q.reshape(R, NDEV, n_loc, hd).transpose(1, 0, 2, 3))
    k_sh = jnp.asarray(
        k.reshape(R_kv, NDEV, n_loc, hd).transpose(1, 0, 2, 3))
    v_sh = jnp.asarray(
        v.reshape(R_kv, NDEV, n_loc, hd).transpose(1, 0, 2, 3))

    out = jax.jit(lambda a, b, c: ring_flash_attention(
        spec, a, b, c, group=group))(q_sh, k_sh, v_sh)
    got = np.asarray(out).transpose(1, 0, 2, 3).reshape(R, s, hd)
    mask_r = np.broadcast_to(mask, (R, s, s))
    ref = _dense_ref(mask_r, q, np.repeat(k, group, 0),
                     np.repeat(v, group, 0))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.all(got[:, 17] == 0)

    gq, gk, gv = jax.jit(jax.grad(
        lambda a, b, c: jnp.sum(ring_flash_attention(
            spec, a, b, c, group=group) ** 2),
        argnums=(0, 1, 2)))(q_sh, k_sh, v_sh)
    assert gk.shape == k_sh.shape and gv.shape == v_sh.shape

    def dense(qq, kk, vv):
        kf = jnp.repeat(kk, group, axis=0)
        vf = jnp.repeat(vv, group, axis=0)
        scd = jnp.einsum("rqd,rkd->rqk", qq, kf) / np.sqrt(hd)
        scd = jnp.where(jnp.asarray(mask) != 0, scd, -1e30)
        wd = jax.nn.softmax(scd, axis=-1) * (jnp.asarray(mask) != 0)
        return jnp.einsum("rqk,rkd->rqd", wd, vf)

    gq_d, gk_d, gv_d = jax.grad(
        lambda a, b, c: jnp.sum(dense(a, b, c) ** 2),
        argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    def unshard(a, n):
        return np.asarray(a).transpose(1, 0, 2, 3).reshape(n, s, hd)

    np.testing.assert_allclose(unshard(gq, R), np.asarray(gq_d), atol=1e-2)
    np.testing.assert_allclose(unshard(gk, R_kv), np.asarray(gk_d),
                               atol=1e-2)
    np.testing.assert_allclose(unshard(gv, R_kv), np.asarray(gv_d),
                               atol=1e-2)


@pytest.mark.parametrize("group", [1, 2])
def test_ring_zigzag_matches_dense(mesh, group):
    """Zigzag-partitioned ring (the causal load balancer: device d owns
    row chunks d and 2*ndev-1-d) == dense reference, forward + all three
    gradients, through the spec's boundary helpers."""
    rng = np.random.RandomState(3)
    s, hd, R = 2048, 16, 2 * group      # zigzag needs n_loc % (2*bk) == 0
    R_kv = R // group
    mask = np.tril(np.ones((s, s), np.float32))
    mask[17, :] = 0.0
    part = RowPartition(st.SparseTopology.from_dense_mask(mask), NDEV,
                        bm=8, zigzag=True)
    spec = RingFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    assert spec.kv_zigzag

    q = rng.randn(R, s, hd).astype(np.float32)
    k = rng.randn(R_kv, s, hd).astype(np.float32)
    v = rng.randn(R_kv, s, hd).astype(np.float32)
    q_sh = spec.shard_queries(jnp.asarray(q))
    k_sh = spec.shard_keys(jnp.asarray(k))
    v_sh = spec.shard_keys(jnp.asarray(v))

    out = jax.jit(lambda a, b, c: ring_flash_attention(
        spec, a, b, c, group=group))(q_sh, k_sh, v_sh)
    got = np.asarray(spec.unshard_output(out))
    mask_r = np.broadcast_to(mask, (R, s, s))
    ref = _dense_ref(mask_r, q, np.repeat(k, group, 0),
                     np.repeat(v, group, 0))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert np.all(got[:, 17] == 0)

    gq, gk, gv = jax.jit(jax.grad(
        lambda a, b, c: jnp.sum(ring_flash_attention(
            spec, a, b, c, group=group) ** 2),
        argnums=(0, 1, 2)))(q_sh, k_sh, v_sh)

    def dense(qq, kk, vv):
        kf = jnp.repeat(kk, group, axis=0)
        vf = jnp.repeat(vv, group, axis=0)
        scd = jnp.einsum("rqd,rkd->rqk", qq, kf) / np.sqrt(hd)
        scd = jnp.where(jnp.asarray(mask) != 0, scd, -1e30)
        wd = jax.nn.softmax(scd, axis=-1) * (jnp.asarray(mask) != 0)
        return jnp.einsum("rqk,rkd->rqd", wd, vf)

    gq_d, gk_d, gv_d = jax.grad(
        lambda a, b, c: jnp.sum(dense(a, b, c) ** 2),
        argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(spec.unshard_output(gq)),
                               np.asarray(gq_d), atol=1e-2)
    np.testing.assert_allclose(np.asarray(spec.unshard_kv(gk)),
                               np.asarray(gk_d), atol=1e-2)
    np.testing.assert_allclose(np.asarray(spec.unshard_kv(gv)),
                               np.asarray(gv_d), atol=1e-2)


def test_zigzag_fixes_ring_compute_balance(mesh):
    """The lockstep ring's wall-clock is set per step by the busiest
    device; contiguous causal shards cap compute efficiency at ~0.5,
    zigzag rebalances to ~1 (measured on the ACTUAL per-(shard, band)
    block counts the kernels run)."""
    s = 2048
    topo = st.SparseTopology.from_dense_mask(
        np.tril(np.ones((s, s), np.float32)))
    contig = RingFlashSpec(RowPartition(topo, NDEV, bm=8, balance=False),
                           bm=8, bk=128, mesh=mesh, axis="sp")
    zig = RingFlashSpec(RowPartition(topo, NDEV, bm=8, zigzag=True),
                        bm=8, bk=128, mesh=mesh, axis="sp")
    bc, bz = contig.ring_compute_balance(), zig.ring_compute_balance()
    assert bc["total_blocks"] == bz["total_blocks"]  # same causal work
    assert bc["efficiency"] < 0.6
    assert bz["efficiency"] > 0.95
    # zigzag per-device totals are uniform (each owns chunk d + mirror)
    per = np.array(bz["per_device_blocks"], np.float64)
    assert per.max() / per.mean() < 1.05
    # too-short sequences cannot block-align the chunk pairs: reject
    with pytest.raises(ValueError, match="half-chunks"):
        RingFlashSpec(RowPartition(st.SparseTopology.from_dense_mask(
            np.tril(np.ones((1024, 1024), np.float32))), NDEV,
            bm=8, zigzag=True), bm=8, bk=128, mesh=mesh)


def test_ring_validation(mesh):
    rng = np.random.RandomState(1)
    s, hd = 1024, 16
    mask = np.tril(np.ones((s, s), np.float32))
    part = RowPartition(st.SparseTopology.from_dense_mask(mask), NDEV,
                        bm=8, balance=False)
    spec = RingFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    n_loc = s // NDEV
    q = jnp.asarray(rng.randn(NDEV, 4, n_loc, hd).astype(np.float32))
    kv = jnp.asarray(rng.randn(NDEV, 4, n_loc, hd).astype(np.float32))
    with pytest.raises(ValueError):
        ring_flash_attention(spec, q, kv, kv, group=3)
    with pytest.raises(ValueError):
        ring_flash_attention(spec, q, kv, kv, group=2)  # kv not R/2
    with pytest.raises(ValueError):
        RingFlashSpec(RowPartition(
            st.SparseTopology.from_dense_mask(
                np.tril(np.ones((320, 320), np.float32))), NDEV,
            bm=8, balance=False), bm=8, bk=128, mesh=mesh)  # 384 % 1024


def test_ring_rejects_misuse(mesh):
    """Balanced partitions and short key shards silently computed wrong
    attention (confirmed 2.1 / 0.18 max error) — both now raise."""
    s = 1024
    topo = st.SparseTopology.from_dense_mask(
        np.tril(np.ones((s, s), np.float32)))
    with pytest.raises(ValueError, match="natural-order"):
        RingFlashSpec(RowPartition(topo, NDEV, bm=8), bm=8, bk=128,
                      mesh=mesh)
    part = RowPartition(topo, NDEV, bm=8, balance=False)
    spec = RingFlashSpec(part, bm=8, bk=128, mesh=mesh, axis="sp")
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(NDEV, 2, s // NDEV, 16).astype(np.float32))
    short = jnp.asarray(
        rng.randn(NDEV, 2, s // NDEV - 3, 16).astype(np.float32))
    with pytest.raises(ValueError, match="pad the sequence"):
        ring_flash_attention(spec, q, short, short)
