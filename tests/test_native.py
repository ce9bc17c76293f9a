"""Native C topology builder: bit-identical to the numpy fallback + faster.

The native layer (``_native/topology.c``) is the host-side runtime
counterpart of the reference's C++ binding layer (``src/sputnik.cpp``); it
must produce exactly the structures the numpy reference paths produce.
"""

import numpy as np
import pytest

import sputnik_tpu as st
from sputnik_tpu import _native
from sputnik_tpu.topology import SparseTopology


pytestmark = pytest.mark.skipif(
    _native.lib() is None, reason="native builder unavailable (no cc)"
)


def _rand_topo(rng, m, n, d):
    mask = (rng.rand(m, n) < d).astype(np.float32)
    mask[min(2, m - 1), :] = 0.0
    return mask * rng.randn(m, n)


@pytest.mark.parametrize("m,n,d", [(64, 48, 0.3), (200, 130, 0.05),
                                   (17, 300, 0.9)])
def test_csr_from_dense_matches_numpy(m, n, d):
    rng = np.random.RandomState(0)
    A = _rand_topo(rng, m, n, d).astype(np.float32)
    vals, ro, ci = _native.csr_from_dense(A)
    mask = A != 0
    np.testing.assert_array_equal(vals, A[mask])
    np.testing.assert_array_equal(
        ro[1:], np.cumsum(mask.sum(1)).astype(np.int32))
    np.testing.assert_array_equal(ci, np.nonzero(mask)[1].astype(np.int32))


def test_transpose_perm_matches_numpy():
    rng = np.random.RandomState(1)
    A = _rand_topo(rng, 120, 80, 0.2).astype(np.float32)
    t = SparseTopology.from_dense_mask(A != 0)
    rows = t.row_ids[: t.nnz]
    cols = t.column_indices[: t.nnz]
    ro_t, ci_t, perm = _native.transpose_perm(rows, cols, t.n)
    # numpy reference
    order = np.lexsort((rows.astype(np.int64), cols.astype(np.int64)))
    np.testing.assert_array_equal(perm, order.astype(np.int32))
    np.testing.assert_array_equal(ci_t, rows[order])
    counts = np.bincount(cols, minlength=t.n)
    np.testing.assert_array_equal(ro_t[1:], np.cumsum(counts))


def test_block_build_matches_numpy():
    rng = np.random.RandomState(2)
    A = _rand_topo(rng, 100, 90, 0.15).astype(np.float32)
    t = SparseTopology.from_dense_mask(A != 0)
    # force both paths and compare the derived BlockView
    import os

    from sputnik_tpu.blocking import build_blocks

    native_bv = build_blocks(t, bm=16, bk=32)
    os.environ["SPUTNIK_TPU_NO_NATIVE"] = "1"
    try:
        # reset loader state so the env var is respected
        _native._tried = False
        _native._lib = None
        np_bv = build_blocks(t, bm=16, bk=32)
    finally:
        del os.environ["SPUTNIK_TPU_NO_NATIVE"]
        _native._tried = False
        _native._lib = None
    assert native_bv.max_bpr == np_bv.max_bpr
    np.testing.assert_array_equal(native_bv.nblocks, np_bv.nblocks)
    np.testing.assert_array_equal(native_bv.block_cols, np_bv.block_cols)
    np.testing.assert_array_equal(native_bv.block_valid, np_bv.block_valid)
    np.testing.assert_array_equal(native_bv.scatter_idx, np_bv.scatter_idx)
    np.testing.assert_array_equal(native_bv.mask, np_bv.mask)


def test_topology_end_to_end_same_results():
    """SparseMatrix built with native on must equal native off."""
    import os

    rng = np.random.RandomState(3)
    A = _rand_topo(rng, 96, 64, 0.25).astype(np.float32)
    m1 = st.SparseMatrix(A)
    os.environ["SPUTNIK_TPU_NO_NATIVE"] = "1"
    try:
        _native._tried = False
        _native._lib = None
        m2 = st.SparseMatrix(A)
    finally:
        del os.environ["SPUTNIK_TPU_NO_NATIVE"]
        _native._tried = False
        _native._lib = None
    np.testing.assert_array_equal(m1.values, m2.values)
    np.testing.assert_array_equal(m1.topology.row_offsets,
                                  m2.topology.row_offsets)
    np.testing.assert_array_equal(m1.topology.column_indices,
                                  m2.topology.column_indices)
    t1, p1 = m1.topology.transpose()
    t2, p2 = m2.topology.transpose()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(t1.row_offsets, t2.row_offsets)
