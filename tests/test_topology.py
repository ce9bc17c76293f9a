"""Topology core: CSR construction, swizzle, transpose, ELL/block views."""

import numpy as np
import pytest

from sputnik_tpu import SparseMatrix, SparseTopology, diffsort
from sputnik_tpu.patterns import init_range, init_uniform, sparsify_uniform, uniform_mask


def _random_sparse(m, n, sparsity, seed=0, round_to=4):
    dense = sparsify_uniform(
        init_uniform((m, n), seed=seed), sparsity, round_to=round_to, seed=seed + 1
    )
    return dense


class TestCSRConstruction:
    def test_roundtrip(self):
        dense = _random_sparse(72, 64, 0.9)
        sm = SparseMatrix(dense)
        np.testing.assert_allclose(sm.dense, dense, rtol=0, atol=0)

    def test_row_offsets(self):
        dense = np.array([[1, 0, 2], [0, 0, 0], [3, 4, 5]], np.float32)
        sm = SparseMatrix(dense)
        t = sm.topology
        np.testing.assert_array_equal(t.row_offsets, [0, 2, 2, 5])
        np.testing.assert_array_equal(t.column_indices[: t.nnz], [0, 2, 0, 1, 2])
        np.testing.assert_array_equal(t.row_ids[: t.nnz], [0, 0, 2, 2, 2])

    def test_padding(self):
        dense = np.array([[1, 0, 2], [0, 0, 0], [3, 4, 5]], np.float32)
        t = SparseMatrix(dense, pad_to=8).topology
        assert t.nnz == 5 and t.nnz_pad == 8
        # padding slots park in the dump row m
        np.testing.assert_array_equal(t.row_ids[5:], [3, 3, 3])
        np.testing.assert_array_equal(t.column_indices[5:], [0, 0, 0])
        assert t.valid.sum() == 5

    def test_empty_rows_and_mask(self):
        mask = uniform_mask(64, 64, sparsity=0.95, seed=3)
        mask[7, :] = 0  # fully-masked row (reference tests this case)
        t = SparseTopology.from_dense_mask(mask)
        assert t.row_lengths[7] == 0
        np.testing.assert_array_equal(t.to_dense_mask(), mask)


class TestDiffsort:
    def test_longest_first(self):
        offsets = np.array([0, 3, 4, 6], np.int32)  # lengths 3, 1, 2
        np.testing.assert_array_equal(diffsort(offsets), [0, 2, 1])

    def test_stable_on_ties(self):
        offsets = np.array([0, 2, 4, 6], np.int32)
        np.testing.assert_array_equal(diffsort(offsets), [0, 1, 2])


class TestTranspose:
    @pytest.mark.parametrize("m,n,sparsity", [(8, 8, 0.5), (72, 64, 0.9), (33, 47, 0.8)])
    def test_transpose_matches_dense(self, m, n, sparsity):
        dense = _random_sparse(m, n, sparsity, seed=m + n)
        sm = SparseMatrix(dense)
        topo_t, perm = sm.topology.transpose()
        values_t = sm.values[perm]
        dense_t = np.zeros((n, m), np.float32)
        dense_t[topo_t.row_ids[: topo_t.nnz], topo_t.column_indices[: topo_t.nnz]] = (
            values_t[: topo_t.nnz]
        )
        np.testing.assert_allclose(dense_t, dense.T)

    def test_empty_row_column(self):
        # reference: tests/test_transpose.py zeroes row 0
        dense = init_range((4, 4))
        dense[0, :] = 0
        dense[:, 2] = 0
        sm = SparseMatrix(dense)
        topo_t, perm = sm.topology.transpose()
        assert topo_t.row_lengths[2] == 0
        values_t = sm.values[perm]
        dense_t = np.zeros((4, 4), np.float32)
        dense_t[topo_t.row_ids[: topo_t.nnz], topo_t.column_indices[: topo_t.nnz]] = (
            values_t[: topo_t.nnz]
        )
        np.testing.assert_allclose(dense_t, dense.T)

    def test_double_transpose_identity(self):
        dense = _random_sparse(16, 24, 0.7, seed=5)
        sm = SparseMatrix(dense)
        topo_t, perm = sm.topology.transpose()
        topo_tt, perm_t = topo_t.transpose()
        assert topo_tt is sm.topology  # object identity: cached reverse
        np.testing.assert_allclose(sm.values[perm][perm_t][: sm.topology.nnz],
                                   sm.values[: sm.topology.nnz])


class TestViews:
    def test_ell_roundtrip(self):
        dense = _random_sparse(24, 40, 0.8, seed=9)
        sm = SparseMatrix(dense)
        ell = sm.topology.ell(lane=8)
        flat = np.zeros(ell.dump + 1, np.float32)
        flat[ell.scatter_idx] = sm.values
        panel = flat[: ell.dump].reshape(ell.values_shape)
        assert panel.shape[1] % 8 == 0
        # mask agrees, gather returns originals
        assert (panel != 0).sum() == (sm.values != 0).sum()
        back = np.concatenate([panel.reshape(-1), [0.0]])[ell.gather_idx]
        np.testing.assert_allclose(back[: sm.topology.nnz], sm.values[: sm.topology.nnz])

    @pytest.mark.parametrize("bm,bk", [(8, 8), (8, 16), (16, 8)])
    def test_block_roundtrip(self, bm, bk):
        dense = _random_sparse(24, 40, 0.8, seed=11)
        sm = SparseMatrix(dense)
        blk = sm.topology.block(bm, bk)
        flat = np.zeros(blk.dump + 1, np.float32)
        flat[blk.scatter_idx] = sm.values
        panel = flat[: blk.dump].reshape(blk.values_shape)
        # reconstruct dense from blocks
        recon = np.zeros((blk.m_pad, blk.n_pad), np.float32)
        for i in range(blk.mb):
            for s in range(blk.max_bpr):
                if not blk.block_valid[i, s]:
                    continue
                c = blk.block_cols[i, s]
                recon[i * bm : (i + 1) * bm, c * bk : (c + 1) * bk] += panel[i, s]
        np.testing.assert_allclose(recon[:24, :40], dense)
        # mask marks exactly the real nonzero slots
        assert blk.mask.sum() == sm.topology.nnz
        back = np.concatenate([panel.reshape(-1), [0.0]])[blk.gather_idx]
        np.testing.assert_allclose(back[: sm.topology.nnz], sm.values[: sm.topology.nnz])

    def test_block_density_causal(self):
        from sputnik_tpu.patterns import causal_mask

        t = SparseTopology.from_dense_mask(causal_mask(64))
        blk = t.block(16, 16)
        # causal: lower-triangular block structure -> 10 of 16 blocks
        assert blk.num_blocks == 10
        assert blk.block_density == pytest.approx(10 / 16)


def test_analytic_topology_rejects_int32_overflow():
    """cumsum into an int32 out-array wraps silently past 2^31 nnz; the
    analytic builders must raise instead of returning corrupt offsets."""
    import pytest

    from sputnik_tpu.patterns import causal_topology, local_window_topology

    with pytest.raises(ValueError, match="int32"):
        causal_topology(70000)                # nnz ~ 2.45e9
    # banded/windowed patterns of the same length stay fine
    t = causal_topology(70000, band=64)
    assert t.nnz == sum(min(i + 1, 64) for i in range(70000))
    t2 = local_window_topology(70000, 32)
    assert t2.m == 70000
