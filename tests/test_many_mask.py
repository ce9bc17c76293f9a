"""Many-mask (ragged batched) ops: parity + grads.

Mirrors ``tests/test_attention_many_masks.py`` (per-batch masks, alternating
sparsities .2/.5, heads sharing their batch's mask) and the transformer
demo's functional layer (``tests/transformer/functions.py``) — which in the
reference call phantom bindings that don't exist; here they're real ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import sputnik_tpu as st
from sputnik_tpu.patterns import init_uniform, random_mask_batch

TOL = dict(rtol=1e-4, atol=1e-4)


@pytest.fixture
def setup():
    b, h, m, n, d = 4, 2, 32, 32, 16
    masks = random_mask_batch(b, m, n, sparsities=(0.2, 0.5), seed=0)
    mt = st.ManyMaskTopology.from_dense_masks(masks)
    return b, h, m, n, d, masks, mt


def scatter_to_dense(mt, values_r, r):
    """[nnz_pad] replica values -> dense [m, n] using replica r's mask."""
    t = mt.topologies[r]
    out = np.zeros((mt.m, mt.n), np.float32)
    out[t.row_ids[: t.nnz], t.column_indices[: t.nnz]] = np.asarray(values_r)[: t.nnz]
    return out


class TestManyMaskTopology:
    def test_ragged_nnz(self, setup):
        b, h, m, n, d, masks, mt = setup
        assert mt.b == b
        assert len(set(mt.nnzs.tolist())) > 1  # genuinely ragged
        np.testing.assert_array_equal(
            mt.nnzs, [int((mk != 0).sum()) for mk in masks]
        )

    def test_transpose_roundtrip(self, setup):
        b, h, m, n, d, masks, mt = setup
        mt_t, perm = mt.transpose()
        assert mt_t.transpose()[0] is mt
        for i in range(b):
            assert mt_t.topologies[i].nnz == mt.topologies[i].nnz


class TestManyMaskOps:
    def test_sddmm(self, setup):
        b, h, m, n, d, masks, mt = setup
        R = b * h
        lhs = init_uniform((R, m, d), seed=1)
        rhs = init_uniform((R, n, d), seed=2)
        vals = st.sddmm_many_mask(mt, jnp.asarray(lhs), jnp.asarray(rhs))
        assert vals.shape == (R, mt.nnz_pad)
        for r in range(R):
            mask = masks[r // h]
            ref = (lhs[r] @ rhs[r].T) * (mask != 0)
            got = scatter_to_dense(mt, vals[r], r // h)
            np.testing.assert_allclose(got, ref, **TOL)

    def test_softmax(self, setup):
        b, h, m, n, d, masks, mt = setup
        R = b * h
        vals = init_uniform((R, mt.nnz_pad), seed=3) * mt.valid.repeat(h, 0)
        out = np.asarray(st.sparse_softmax_many_mask(mt, jnp.asarray(vals)))
        for r in range(R):
            t = mt.topologies[r // h]
            sums = np.zeros(m + 1)
            np.add.at(sums, t.row_ids[: t.nnz], out[r, : t.nnz])
            nonempty = t.row_lengths > 0
            np.testing.assert_allclose(sums[:m][nonempty], 1.0, rtol=1e-5)
        assert not np.isnan(out).any()

    def test_spmm(self, setup):
        b, h, m, n, d, masks, mt = setup
        R = b * h
        vals = init_uniform((R, mt.nnz_pad), seed=4) * mt.valid.repeat(h, 0)
        dense = init_uniform((R, n, d), seed=5)
        out = st.spmm_many_mask(mt, jnp.asarray(vals), jnp.asarray(dense))
        assert out.shape == (R, m, d)
        for r in range(R):
            a = scatter_to_dense(mt, vals[r], r // h)
            np.testing.assert_allclose(out[r], a @ dense[r], **TOL)

    def test_transpose_values(self, setup):
        b, h, m, n, d, masks, mt = setup
        R = b * h
        vals = init_uniform((R, mt.nnz_pad), seed=6) * mt.valid.repeat(h, 0)
        mt_t, vals_t = st.csr_transpose_many_mask(mt, jnp.asarray(vals))
        for r in range(R):
            a = scatter_to_dense(mt, vals[r], r // h)
            t_t = mt_t.topologies[r // h]
            got = np.zeros((n, m), np.float32)
            got[t_t.row_ids[: t_t.nnz], t_t.column_indices[: t_t.nnz]] = np.asarray(
                vals_t
            )[r, : t_t.nnz]
            np.testing.assert_allclose(got, a.T, **TOL)

    def test_attention_chain_parity(self, setup):
        """SDDMM -> softmax -> SpMM with per-batch masks vs dense oracle
        (the test_attention_many_masks.py scenario)."""
        b, h, m, n, d, masks, mt = setup
        R = b * h
        q = init_uniform((R, m, d), seed=7)
        k = init_uniform((R, n, d), seed=8)
        v = init_uniform((R, n, d), seed=9)

        def chain(q, k, v):
            s = st.sddmm_many_mask(mt, q, k) / jnp.sqrt(float(d))
            w = st.sparse_softmax_many_mask(mt, s)
            return st.spmm_many_mask(mt, w, v)

        out = jax.jit(chain)(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        for r in range(R):
            mask = masks[r // h]
            logits = np.where(mask != 0, (q[r] @ k[r].T) / np.sqrt(d), -1e9)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True) * (mask != 0)
            np.testing.assert_allclose(out[r], p @ v[r], rtol=1e-4, atol=1e-5)

    def test_chain_grads(self, setup):
        b, h, m, n, d, masks, mt = setup
        R = b * h
        q = jnp.asarray(init_uniform((R, m, d), seed=10), jnp.float64)
        k = jnp.asarray(init_uniform((R, n, d), seed=11), jnp.float64)
        v = jnp.asarray(init_uniform((R, n, d), seed=12), jnp.float64)

        def chain(q, k, v):
            s = st.sddmm_many_mask(mt, q, k) / jnp.sqrt(float(d))
            w = st.sparse_softmax_many_mask(mt, s)
            return st.spmm_many_mask(mt, w, v)

        check_grads(chain, (q, k, v), order=1, modes=["rev"])

    def test_bad_replica_count(self, setup):
        b, h, m, n, d, masks, mt = setup
        with pytest.raises(ValueError):
            st.sparse_softmax_many_mask(mt, jnp.zeros((b * h + 1, mt.nnz_pad)))
