"""Distribution layer tests on the virtual 8-device CPU mesh.

The reference has nothing distributed to test (SURVEY.md §2); this suite
covers the new capability: row-partitioned sparse operands, nnz-balanced
partitioning, communication patterns (psum on the transposed product only),
sequence-sharded sparse attention, and gradients through all of it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import sputnik_tpu as st
from sputnik_tpu.parallel import RowPartition
from sputnik_tpu.parallel.sharded_ops import (
    ShardedPanelSpec,
    sharded_softmax,
    sharded_spmm,
    sharded_spmm_t,
    sparse_attention_sharded,
)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} devices, have {len(devs)}")
    return Mesh(np.array(devs[:NDEV]), ("x",))


@pytest.fixture(scope="module")
def problem(mesh):
    rng = np.random.RandomState(0)
    m, n, q = 320, 256, 64
    A = ((rng.rand(m, n) < 0.3) * rng.randn(m, n)).astype(np.float32)
    mat = st.SparseMatrix(A)
    part = RowPartition(mat.topology, NDEV, bm=8)
    spec = ShardedPanelSpec(part, bm=8, bk=128, mesh=mesh, axis="x")
    panels = jnp.asarray(spec.stack_values(mat.values))
    dense = jnp.asarray(rng.randn(n, q).astype(np.float32))
    return dict(A=A, part=part, spec=spec, panels=panels, dense=dense,
                rng=rng, m=m, n=n, q=q)


def _gather_rows(part, out_sh, m, q):
    flat = np.asarray(out_sh).reshape(-1, out_sh.shape[-1])
    return np.asarray(part.unpermute_rows(jnp.asarray(flat)))[:, :q]


def test_partition_balance():
    rng = np.random.RandomState(1)
    # heavily skewed row lengths
    mask = np.zeros((256, 256), np.float32)
    for r in range(256):
        mask[r, : (r % 64) * 4] = 1.0
    t = st.SparseTopology.from_dense_mask(mask)
    part = RowPartition(t, NDEV, bm=8)
    nnzs = [s.nnz for s in part.shards]
    assert max(nnzs) <= 1.25 * max(np.mean(nnzs), 1)
    # permutation is a bijection covering all rows
    assert sorted(part.perm.tolist()) == list(range(len(part.perm)))


def test_sharded_spmm_parity(problem):
    spec, part = problem["spec"], problem["part"]
    out = jax.jit(lambda p, d: sharded_spmm(spec, p, d))(
        problem["panels"], problem["dense"])
    got = _gather_rows(part, out, problem["m"], problem["q"])
    ref = problem["A"] @ np.asarray(problem["dense"])
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_sharded_spmm_t_parity(problem):
    spec, part = problem["spec"], problem["part"]
    m, q = problem["m"], problem["q"]
    rng = np.random.RandomState(2)
    g_np = rng.randn(m, q).astype(np.float32)
    gperm = np.zeros((part.ndev * part.m_loc, 128), np.float32)
    for i, r in enumerate(part.perm):
        if r < m:
            gperm[i, :q] = g_np[r]
    g_sh = jnp.asarray(gperm.reshape(part.ndev, part.m_loc, 128))
    out = jax.jit(lambda p, g: sharded_spmm_t(spec, p, g))(
        problem["panels"], g_sh)
    ref = problem["A"].T @ g_np
    np.testing.assert_allclose(np.asarray(out)[: problem["n"], :q], ref,
                               atol=1e-3)


def test_sharded_spmm_t_unpadded_width(problem):
    # Regression (ADVICE r1): a direct caller passing the natural
    # (non-128-multiple) trailing dim must not get silently-unwritten
    # column tiles — q=200 floor-truncated to one 128-tile before the fix.
    spec, part = problem["spec"], problem["part"]
    m, q = problem["m"], 200
    rng = np.random.RandomState(3)
    g_np = rng.randn(m, q).astype(np.float32)
    gperm = np.zeros((part.ndev * part.m_loc, q), np.float32)
    for i, r in enumerate(part.perm):
        if r < m:
            gperm[i] = g_np[r]
    g_sh = jnp.asarray(gperm.reshape(part.ndev, part.m_loc, q))
    out = jax.jit(lambda p, g: sharded_spmm_t(spec, p, g))(
        problem["panels"], g_sh)
    assert out.shape[-1] == q
    ref = problem["A"].T @ g_np
    np.testing.assert_allclose(np.asarray(out)[: problem["n"]], ref,
                               atol=1e-3)


def test_sharded_grads(problem):
    spec = problem["spec"]
    panels, dense = problem["panels"], problem["dense"]
    gp, gd = jax.jit(jax.grad(
        lambda p, d: jnp.sum(sharded_spmm(spec, p, d) ** 2), argnums=(0, 1)
    ))(panels, dense)
    assert gp.shape == panels.shape and gd.shape == dense.shape
    assert bool(jnp.isfinite(gp).all()) and bool(jnp.isfinite(gd).all())
    # dense grad must match the dense-math reference
    A, part = problem["A"], problem["part"]
    out = sharded_spmm(spec, panels, dense)
    got_rows = _gather_rows(part, out, problem["m"], problem["q"])
    ref_gd = 2 * A.T @ (A @ np.asarray(dense))
    np.testing.assert_allclose(np.asarray(gd), ref_gd, rtol=1e-2, atol=1e-2)


def test_sequence_sharded_attention_vs_dense(mesh):
    rng = np.random.RandomState(3)
    s, hd = 320, 64
    mask = np.tril(np.ones((s, s), np.float32))
    mask[5, :] = 0.0  # fully-masked query row
    t = st.SparseTopology.from_dense_mask(mask)
    part = RowPartition(t, NDEV, bm=8, balance=False)
    spec = ShardedPanelSpec(part, bm=8, bk=128, mesh=mesh, axis="x")
    q = rng.randn(s, hd).astype(np.float32)
    k = rng.randn(s, hd).astype(np.float32)
    v = rng.randn(s, hd).astype(np.float32)
    q_sh = jnp.asarray(q.reshape(NDEV, s // NDEV, hd))

    ctx = jax.jit(lambda qq, kk, vv: sparse_attention_sharded(
        spec, qq, kk, vv))(q_sh, jnp.asarray(k), jnp.asarray(v))
    got = np.asarray(ctx).reshape(s, hd)

    logits = (q @ k.T) / np.sqrt(hd)
    logits = np.where(mask != 0, logits, -1e30)
    e = np.exp(logits - logits.max(-1, keepdims=True)) * (mask != 0)
    w = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
    ref = w @ v
    np.testing.assert_allclose(got, ref, atol=1e-3)
    assert np.all(got[5] == 0.0)  # masked row -> zeros, not NaN

    g = jax.jit(jax.grad(lambda qq: jnp.sum(sparse_attention_sharded(
        spec, qq, jnp.asarray(k), jnp.asarray(v)) ** 2)))(q_sh)
    assert bool(jnp.isfinite(g).all())


def test_sharded_softmax_rows_sum_to_one(problem):
    spec = problem["spec"]
    rng = np.random.RandomState(4)
    scores = jnp.asarray(
        rng.randn(*((spec.part.ndev,) + spec.panel_shape)).astype(np.float32))
    p = jax.jit(lambda s: sharded_softmax(spec, s))(scores)
    sums = np.asarray(jnp.sum(p, axis=(2, 4)))  # [ndev, mb, bm]
    mask_rows = np.asarray(jnp.sum(jnp.asarray(spec.mask), axis=(2, 4))) > 0
    np.testing.assert_allclose(sums[mask_rows], 1.0, atol=1e-5)
    np.testing.assert_allclose(sums[~mask_rows], 0.0)


def test_sharded_spmm_halo_colsharded_rhs(problem):
    """Dense RHS row-sharded across devices; halo rows all-gathered."""
    from sputnik_tpu.parallel.sharded_ops import sharded_spmm_halo

    spec, part = problem["spec"], problem["part"]
    n, q, m = problem["n"], problem["q"], problem["m"]
    dense = np.asarray(problem["dense"])
    dense_sh = jnp.asarray(dense.reshape(NDEV, n // NDEV, q))

    out = jax.jit(lambda p, d: sharded_spmm_halo(spec, p, d))(
        problem["panels"], dense_sh)
    got = _gather_rows(part, out, m, q)
    ref = problem["A"] @ dense
    np.testing.assert_allclose(got, ref, atol=1e-3)

    # grads: panel + sharded-dense cotangents finite and dense-grad correct
    gp, gd = jax.jit(jax.grad(
        lambda p, d: jnp.sum(sharded_spmm_halo(spec, p, d) ** 2),
        argnums=(0, 1)))(problem["panels"], dense_sh)
    assert gd.shape == dense_sh.shape
    ref_gd = (2 * problem["A"].T @ (problem["A"] @ dense)).reshape(
        NDEV, n // NDEV, q)
    np.testing.assert_allclose(np.asarray(gd), ref_gd, rtol=1e-2, atol=1e-2)


def test_sharded_spmm_wide_nonmultiple_output(problem):
    """Regression: q_pad > 512 and not a multiple of 512 must still fill
    every output column (the grid's bn must divide q_pad)."""
    spec, part = problem["spec"], problem["part"]
    n, m = problem["n"], problem["m"]
    rng = np.random.RandomState(11)
    q = 600  # pads to 640: 640 % 512 != 0
    dense = rng.randn(n, q).astype(np.float32)
    out = jax.jit(lambda p, d: sharded_spmm(spec, p, d))(
        problem["panels"], jnp.asarray(dense))
    got = _gather_rows(part, out, m, q)
    ref = problem["A"] @ dense
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_sharded_spmm_halo_ragged_banded(mesh):
    """Round-2 (VERDICT r1 #4): banded mask -> the halo exchange moves only
    the overhang rows (lo+hi per device), not the whole operand; parity and
    gradients match dense math through the ragged path."""
    from sputnik_tpu.parallel.sharded_ops import (sharded_spmm_halo,
                                                  _halo_plan)

    rng = np.random.RandomState(21)
    m = n = 512
    w = 32
    A = np.zeros((m, n), np.float32)
    for i in range(m):
        j0, j1 = max(0, i - w), min(n, i + w + 1)
        A[i, j0:j1] = rng.randn(j1 - j0)
    mat = st.SparseMatrix(A)
    # contiguous rows per device: banded halo stays narrow (the serpentine
    # balancer would scatter rows and blow the halo up to the full operand)
    part = RowPartition(mat.topology, NDEV, balance=False, bm=8)
    spec = ShardedPanelSpec(part, bm=8, bk=128, mesh=mesh, axis="x")
    panels = jnp.asarray(spec.stack_values(mat.values))

    q = 40
    n_loc = n // NDEV
    plan = _halo_plan(spec, n_loc)
    assert plan is not None, "banded mask must take the ragged path"
    lo, hi = plan
    dense_gather_rows = (NDEV - 1) * n_loc
    assert lo + hi < 0.75 * dense_gather_rows, (lo, hi, dense_gather_rows)

    dense = rng.randn(n, q).astype(np.float32)
    dense_sh = jnp.asarray(dense.reshape(NDEV, n_loc, q))
    out = jax.jit(lambda p, d: sharded_spmm_halo(spec, p, d))(
        panels, dense_sh)
    got = _gather_rows(part, out, m, q)
    np.testing.assert_allclose(got, A @ dense, atol=1e-3)

    gp, gd = jax.jit(jax.grad(
        lambda p, d: jnp.sum(sharded_spmm_halo(spec, p, d) ** 2),
        argnums=(0, 1)))(panels, dense_sh)
    assert gd.shape == dense_sh.shape
    ref_gd = (2 * A.T @ (A @ dense)).reshape(NDEV, n_loc, q)
    np.testing.assert_allclose(np.asarray(gd), ref_gd, rtol=1e-2, atol=1e-2)
    assert bool(jnp.isfinite(gp).all())


def test_sequence_sharded_attention_zigzag_vs_dense(mesh):
    """Zigzag (head+mirrored-tail chunks) partition through the sharded
    attention chain: per-device causal nnz is uniform (max/mean == 1.0 at
    full chunks) and the permuted/unpermuted results still match dense."""
    from sputnik_tpu.parallel.comm_model import nnz_balance

    rng = np.random.RandomState(7)
    s, hd = 256, 32                      # 2 * NDEV * bm divides s
    mask = np.tril(np.ones((s, s), np.float32))
    t = st.SparseTopology.from_dense_mask(mask)
    part = RowPartition(t, NDEV, bm=8, zigzag=True)
    assert part.ndev * part.m_loc == s   # no padding rows at this shape
    bal = nnz_balance(part)
    assert bal["max_over_mean"] <= 1.05, bal
    contig = nnz_balance(RowPartition(t, NDEV, bm=8, balance=False))
    assert contig["max_over_mean"] > 1.5  # what zigzag fixes

    spec = ShardedPanelSpec(part, bm=8, bk=128, mesh=mesh, axis="x")
    q = rng.randn(s, hd).astype(np.float32)
    k = rng.randn(s, hd).astype(np.float32)
    v = rng.randn(s, hd).astype(np.float32)
    q_sh = jnp.asarray(q[part.perm].reshape(NDEV, part.m_loc, hd))

    ctx = jax.jit(lambda qq, kk, vv: sparse_attention_sharded(
        spec, qq, kk, vv))(q_sh, jnp.asarray(k), jnp.asarray(v))
    got = _gather_rows(part, ctx, s, hd)[:s]

    logits = (q @ k.T) / np.sqrt(hd)
    logits = np.where(mask != 0, logits, -1e30)
    e = np.exp(logits - logits.max(-1, keepdims=True)) * (mask != 0)
    w = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
    np.testing.assert_allclose(got, w @ v, atol=1e-3)

    g = jax.jit(jax.grad(lambda qq: jnp.sum(sparse_attention_sharded(
        spec, qq, jnp.asarray(k), jnp.asarray(v)) ** 2)))(q_sh)
    assert bool(jnp.isfinite(g).all())
