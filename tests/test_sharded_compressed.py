"""Sharded compressed (true-BSR) ops on the 8-device CPU mesh: parity vs
dense math on a SKEWED topology (the layout's reason to exist — one dense
row among sparse ones), gradients, the attention chain, and the memory
claim (per-device panels track real blocks, not mb * max_bpr)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import sputnik_tpu as st
from sputnik_tpu.parallel import RowPartition
from sputnik_tpu.parallel.sharded_compressed import (
    ShardedCompressedSpec,
    sharded_softmax_c,
    sharded_spmm_c,
    sharded_spmm_t_c,
    sparse_attention_sharded_c,
)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} devices, have {len(devs)}")
    return Mesh(np.array(devs[:NDEV]), ("x",))


def _skewed(rng, m=320, n=1024):
    """Sparse banded mask plus a few DENSE rows — the shape that blows up
    the ELL layout's max_bpr padding (a dense row touches every column
    block; banded rows touch one or two)."""
    A = np.zeros((m, n), np.float32)
    for r in range(m):
        lo = max(0, (r * n // m) - 16)
        A[r, lo: lo + 32] = 1.0
    A[7] = 1.0
    A[140] = 1.0
    A[m - 3] = 1.0
    return (A * rng.randn(m, n)).astype(np.float32)


@pytest.fixture(scope="module")
def problem(mesh):
    rng = np.random.RandomState(0)
    m, n, q = 320, 1024, 64
    A = _skewed(rng, m, n)
    mat = st.SparseMatrix(A)
    part = RowPartition(mat.topology, NDEV, bm=8)
    spec = ShardedCompressedSpec(part, bm=8, bk=128, mesh=mesh, axis="x")
    panels = jnp.asarray(spec.stack_values(mat.values))
    dense = jnp.asarray(rng.randn(n, q).astype(np.float32))
    return dict(A=A, part=part, spec=spec, panels=panels, dense=dense,
                rng=rng, m=m, n=n, q=q)


def _gather_rows(part, out_sh, m, q):
    flat = np.asarray(out_sh).reshape(-1, out_sh.shape[-1])
    return np.asarray(part.unpermute_rows(jnp.asarray(flat)))[:, :q]


def test_compressed_memory_win(problem):
    """The compressed stacked panel must be materially smaller than the
    ELL stacked panel on the skewed topology."""
    from sputnik_tpu.parallel.sharded_ops import ShardedPanelSpec

    part = problem["part"]
    ell = ShardedPanelSpec(part, bm=8, bk=128)
    spec = problem["spec"]
    ell_tiles = ell.mb * ell.max_bpr
    c_tiles = spec.num_blocks + 1
    assert c_tiles < ell_tiles / 1.5, (c_tiles, ell_tiles)


def test_sharded_spmm_c_parity(problem):
    p = problem
    out = jax.jit(lambda v, d: sharded_spmm_c(p["spec"], v, d))(
        p["panels"], p["dense"])
    got = _gather_rows(p["part"], out, p["m"], p["q"])
    np.testing.assert_allclose(got, p["A"] @ np.asarray(p["dense"]),
                               atol=1e-3)


def test_sharded_spmm_t_c_parity(problem):
    p = problem
    rng = p["rng"]
    g = np.zeros((NDEV, p["spec"].m_pad_loc, p["q"]), np.float32)
    g_rows = rng.randn(p["part"].m_loc * NDEV, p["q"]).astype(np.float32)
    for d in range(NDEV):
        g[d] = g_rows[d * p["part"].m_loc: (d + 1) * p["part"].m_loc]
    # reference: A^T @ g in ORIGINAL row order (undo the permutation)
    g_unperm = g_rows[np.argsort(p["part"].perm[: len(p["part"].perm)])]
    ref = p["A"].T @ g_unperm[: p["m"]]
    out = jax.jit(lambda v, g: sharded_spmm_t_c(p["spec"], v, g))(
        p["panels"], jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out)[: p["n"], : p["q"]], ref,
                               atol=1e-3)


def test_sharded_attention_c_grads(problem):
    """Full SDDMM -> ragged softmax -> SpMM chain + grads vs dense math."""
    p = problem
    part, spec = p["part"], p["spec"]
    rng = np.random.RandomState(3)
    hd = 32
    s_loc = part.m_loc
    q = jnp.asarray(rng.randn(NDEV, s_loc, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(p["n"], hd).astype(np.float32))
    v = jnp.asarray(rng.randn(p["n"], hd).astype(np.float32))

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(sparse_attention_sharded_c(spec, q, k, v) ** 2)

    l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(l))

    # dense reference on the permuted mask
    mask = (p["A"] != 0).astype(np.float32)
    m_pad = part.m_loc * NDEV
    mask_p = np.zeros((m_pad, p["n"]), np.float32)
    valid = p["part"].perm < p["m"]
    mask_p[valid] = mask[p["part"].perm[valid]]

    def dense_loss(qf, k, v):
        sc = (qf @ k.T) / np.sqrt(hd)
        sc = jnp.where(mask_p > 0, sc, -1e30)
        w = jax.nn.softmax(sc, axis=-1)
        w = jnp.where(mask_p > 0, w, 0.0)
        return jnp.sum((w @ v) ** 2)

    qf = q.reshape(m_pad, hd)
    l_ref, g_ref = jax.value_and_grad(dense_loss, argnums=(0, 1, 2))(
        qf, k, v)
    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[0]).reshape(m_pad, hd),
                               np.asarray(g_ref[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(grads[1]), np.asarray(g_ref[1]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(grads[2]), np.asarray(g_ref[2]),
                               atol=2e-3)


def test_sharded_softmax_c_empty_rows(problem):
    """Padding rows (beyond m) are fully masked: softmax must emit zeros,
    not NaN, and grads must stay finite."""
    p = problem
    spec = p["spec"]

    @jax.jit
    def f(panels):
        return sharded_softmax_c(spec, panels)

    w = f(p["panels"])
    assert np.isfinite(np.asarray(w)).all()

    def loss(panels):
        return jnp.sum(f(panels) ** 2)

    g = jax.grad(loss)(p["panels"])
    assert np.isfinite(np.asarray(g)).all()
