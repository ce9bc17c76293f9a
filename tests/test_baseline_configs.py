"""BASELINE.json config-coverage tests (the judged configurations).

Config 1 (64^3 d=0.5 interpret-mode SpMM) is covered by test_pallas.py;
config 5 (pod-scale) by test_parallel.py + the multichip dryrun (no 2+
real hosts exist in this environment). This file pins the remaining ones
at their stated scales, against dense-jnp oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sputnik_tpu as st
from sputnik_tpu.models import SparseLinear


def _mat(rng, m, k, d):
    A = ((rng.rand(m, k) < d) * rng.randn(m, k)).astype(np.float32)
    return st.SparseMatrix(A), A


@pytest.mark.parametrize("density", [0.25, 0.1])
def test_spmm_sddmm_grads_512(density):
    """Config 2: SpMM + SDDMM fwd/bwd at M=N=K=512 — the gradcheck the
    reference imported but never ran (test_spmm_grad.py:4)."""
    rng = np.random.RandomState(0)
    m = 512
    mat, A = _mat(rng, m, m, density)
    t = mat.topology
    vals = jnp.asarray(mat.values)
    dense = jnp.asarray(rng.randn(m, m).astype(np.float32))

    # forward parity vs dense
    out = st.spmm(t, vals, dense)
    np.testing.assert_allclose(np.asarray(out), A @ np.asarray(dense),
                               atol=1e-2)

    # analytic VJP vs dense-autodiff reference (same cotangent)
    ct = jnp.asarray(rng.randn(m, m).astype(np.float32))
    gv, gd = jax.vjp(lambda v, d: st.spmm(t, v, d), vals, dense)[1](ct)
    mask = jnp.asarray((A != 0).astype(np.float32))
    gv_ref_dense, gd_ref = jax.vjp(
        lambda Ad, d: (Ad * mask) @ d, jnp.asarray(A), dense)[1](ct)
    # scatter dense values-grad to CSR slots
    gv_ref = np.asarray(gv_ref_dense)[
        t.row_ids[: t.nnz], t.column_indices[: t.nnz]]
    np.testing.assert_allclose(np.asarray(gv)[: t.nnz], gv_ref, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=1e-3, atol=1e-3)

    # SDDMM grads vs dense reference
    lhs = jnp.asarray(rng.randn(m, 64).astype(np.float32))
    rhs = jnp.asarray(rng.randn(m, 64).astype(np.float32))
    ctv = jnp.asarray(rng.randn(t.nnz_pad).astype(np.float32))
    gl, gr = jax.vjp(lambda l, r: st.sddmm(t, l, r), lhs, rhs)[1](ctv)
    ct_dense = np.zeros((m, m), np.float32)
    ct_dense[t.row_ids[: t.nnz], t.column_indices[: t.nnz]] = (
        np.asarray(ctv)[: t.nnz])
    gl_ref, gr_ref = jax.vjp(
        lambda l, r: (l @ r.T) * mask, lhs, rhs)[1](jnp.asarray(ct_dense))
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=1e-3, atol=1e-3)


def test_sparse_linear_fused_bias_relu_1024_batched():
    """Config 3: SparseLinear fused bias+ReLU, batched B=8, 1024x1024
    d=0.1."""
    rng = np.random.RandomState(1)
    n = 1024
    w = ((rng.rand(n, n) < 0.1) * rng.randn(n, n)).astype(np.float32)
    bias = rng.randn(n).astype(np.float32) * 0.1
    layer = SparseLinear.from_mask(w != 0, fuse_relu=True)
    x = rng.randn(8, 16, n).astype(np.float32)
    params = {"params": {"values": jnp.asarray(layer.pack_dense(w)),
                         "bias": jnp.asarray(bias)}}
    y = layer.apply(params, jnp.asarray(x))
    ref = np.maximum(np.einsum("brk,ok->bro", x, w) + bias, 0.0)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)

    g = jax.grad(lambda p: jnp.sum(layer.apply(p, jnp.asarray(x)) ** 2))(
        params)
    gw = layer.unpack_dense(g["params"]["values"])
    assert np.isfinite(gw).all() and np.abs(gw).sum() > 0


def test_attention_many_masks_seq512_8heads():
    """Config 4 (scaled to CI): per-batch masks with differing sparsities,
    8 heads sharing each batch element's mask, through the kernel-backed
    batched-panel chain (the reference's test_attention_many_masks
    scenario)."""
    from sputnik_tpu import many_mask as mm
    from sputnik_tpu.ops import batched_panel as bp
    from sputnik_tpu.ops.fused_attention import fused_sparse_attention
    from sputnik_tpu.patterns import random_mask_batch

    rng = np.random.RandomState(2)
    b, heads, s, hd = 2, 8, 512, 32
    masks = random_mask_batch(b, s, s, sparsities=(0.2, 0.5), seed=3)
    mt = mm.ManyMaskTopology.from_dense_masks(masks)
    spec = bp.BatchedPanelSpec.from_many_mask(mt, heads=heads,
                                              bm=128, bk=128)
    R = b * heads
    q = jnp.asarray(rng.randn(R, s, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(R, s, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(R, s, hd).astype(np.float32))

    out = fused_sparse_attention(spec, q, k, v)
    # dense oracle per replica
    got = np.asarray(out)
    for r in (0, R - 1):
        mask = masks[r // heads]
        sc = (np.asarray(q[r]) @ np.asarray(k[r]).T) / np.sqrt(hd)
        sc = np.where(mask != 0, sc, -1e30)
        e = np.exp(sc - sc.max(-1, keepdims=True)) * (mask != 0)
        w = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
        ref = w @ np.asarray(v[r])
        np.testing.assert_allclose(got[r], ref, atol=1e-3)
