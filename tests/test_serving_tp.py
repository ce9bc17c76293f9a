"""Tensor-parallel serving: TPDecoder vs the single-device SparseDecoder.

8 virtual CPU devices (conftest). The TP runtime must reproduce the
single-chip runtime exactly — same prefill output, same decoded tokens —
because the sharding is a pure reparameterization (head/column slices +
psum of row-sharded partials).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sputnik_tpu.models.serving import SparseDecoder
from sputnik_tpu.models.transformer import SparseTransformer
from sputnik_tpu.parallel import TPDecoder


def _causal(b, s):
    return np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                           (b, s, s)).copy()


def _build(b, s, h, heads, kv=None, layers=2, ffn=64):
    return SparseTransformer.from_masks(
        _causal(b, s), num_layers=layers, hidden_size=h, num_heads=heads,
        num_kv_heads=kv, ffn_hidden_size=ffn, use_residual=True,
        use_layernorm=True, activation="gelu")


def _mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]), ("tp",))


@pytest.mark.parametrize("tp,kv", [(2, None), (4, None), (2, 2)])
def test_tp_decode_matches_single_device(tp, kv):
    b, P, h, heads = 2, 16, 32, 4
    model = _build(b, P, h, heads, kv=kv)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, P, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x)

    # single-device reference
    dec = SparseDecoder(model, s_max=24, bk=8, cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    y_ref, caches = dec.prefill(params, x, caches)
    tok = x[:, -1:]
    ys_ref, _ = dec.decode_loop(params, tok, caches, 4)

    # tensor-parallel
    tpd = TPDecoder(model, _mesh(tp), s_max=24, bk=8,
                    cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tcaches = tpd.init_caches(b)
    y_tp, tcaches = jax.jit(tpd.prefill)(sparams, x, tcaches)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    ys_tp, _ = jax.jit(
        lambda p, t, c: tpd.decode_loop(p, t, c, 4))(sparams, tok, tcaches)
    np.testing.assert_allclose(np.asarray(ys_tp), np.asarray(ys_ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_decode_step_and_cache_layout():
    """decode_step works standalone and the cache is genuinely sharded:
    tp * b * KV_l replicas, each shard's slice holding its own heads."""
    b, P, h, heads, tp = 2, 16, 32, 4, 2
    model = _build(b, P, h, heads)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, P, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(1), x)

    tpd = TPDecoder(model, _mesh(tp), s_max=24, bk=8,
                    cache_dtype=jnp.float32)
    assert tpd.H_l == heads // tp
    sparams = tpd.shard_params(params)
    caches = tpd.init_caches(b)
    assert caches[0].k.shape[0] == tp * b * (heads // tp)

    _, caches = jax.jit(tpd.prefill)(sparams, x, caches)
    assert caches[0].kv_len.tolist() == [P] * (tp * b * (heads // tp))

    y, caches = jax.jit(tpd.decode_step)(sparams, x[:, -1:], caches)
    assert y.shape == (b, 1, h)
    assert np.isfinite(np.asarray(y)).all()
    assert caches[0].kv_len.tolist() == [P + 1] * caches[0].kv_len.shape[0]


def test_tp_decode_multi_matches_single_device():
    """Speculative verification under TP equals the single-device path."""
    b, P, q, h, heads, tp = 2, 16, 3, 32, 4, 2
    model = _build(b, P, h, heads)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, P + q, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(2), x[:, :P])

    dec = SparseDecoder(model, s_max=24, bk=8, cache_dtype=jnp.float32)
    _, c_ref = dec.prefill(params, x[:, :P], dec.init_caches(b))
    y_ref, _ = dec.decode_multi(params, x[:, P:], c_ref)

    tpd = TPDecoder(model, _mesh(tp), s_max=24, bk=8,
                    cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    _, c_tp = jax.jit(tpd.prefill)(sparams, x[:, :P], tpd.init_caches(b))
    y_tp, _ = jax.jit(tpd.decode_multi)(sparams, x[:, P:], c_tp)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_dp_tp_grid_matches_single_device():
    """2x2 dp x tp serving grid: batch and caches shard over dp, heads
    over tp; outputs must equal the single-device runtime."""
    b, P, h, heads = 4, 16, 32, 4
    model = _build(b, P, h, heads)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, P, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(5), x)

    dec = SparseDecoder(model, s_max=24, bk=8, cache_dtype=jnp.float32)
    _, c_ref = dec.prefill(params, x, dec.init_caches(b))
    tok = x[:, -1:]
    ys_ref, _ = dec.decode_loop(params, tok, c_ref, 3)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    tpd = TPDecoder(model, mesh, batch_axis="dp", s_max=24, bk=8,
                    cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    caches = tpd.init_caches(b)
    y_tp, caches = jax.jit(tpd.prefill)(sparams, x, caches)
    y_ref_pre = dec.prefill(params, x, dec.init_caches(b))[0]
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref_pre),
                               atol=1e-5, rtol=1e-5)
    ys_tp, _ = jax.jit(
        lambda p, t, c: tpd.decode_loop(p, t, c, 3))(sparams, tok, caches)
    np.testing.assert_allclose(np.asarray(ys_tp), np.asarray(ys_ref),
                               atol=1e-5, rtol=1e-5)


def test_dp_requires_uniform_masks():
    b, s = 2, 16
    masks = np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                            (b, s, s)).copy()
    masks[1, 0, 3] = 1.0  # batch element 1 differs
    model = SparseTransformer.from_masks(
        masks, num_layers=1, hidden_size=32, num_heads=2,
        ffn_hidden_size=32)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    with pytest.raises(ValueError, match="same mask"):
        TPDecoder(model, mesh, batch_axis="dp", s_max=24, bk=8)


def test_tp_rejects_bad_divisibility():
    model = _build(2, 16, 32, 4)
    with pytest.raises(ValueError, match="num_heads"):
        TPDecoder(model, _mesh(3), s_max=24, bk=8)
    model_gqa = _build(2, 16, 32, 4, kv=2)
    with pytest.raises(ValueError, match="num_kv_heads"):
        TPDecoder(model_gqa, _mesh(4), s_max=24, bk=8)


def test_tp_ragged_decode_matches_single_device():
    """decode_step_ragged under tp sharding: ragged lengths + an active
    freeze mask must reproduce the single-device ragged runtime."""
    b, P, h, heads, tp = 2, 16, 32, 4, 2
    model = _build(b, P, h, heads)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, P, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(3), x)
    toks = jnp.asarray(rng.randn(2, b, 1, h).astype(np.float32) * 0.3)
    act = jnp.asarray(np.array([True, False]))

    dec = SparseDecoder(model, s_max=24, bk=8, cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, x, caches)
    y1, caches = dec.decode_step_ragged(params, toks[0], caches, act)
    y2, caches = dec.decode_step_ragged(params, toks[1], caches)

    tpd = TPDecoder(model, _mesh(tp), s_max=24, bk=8,
                    cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tc = tpd.init_caches(b)
    _, tc = jax.jit(tpd.prefill)(sparams, x, tc)
    t1, tc = jax.jit(tpd.decode_step_ragged)(sparams, toks[0], tc, act)
    t2, tc = jax.jit(tpd.decode_step_ragged)(sparams, toks[1], tc)

    np.testing.assert_allclose(np.asarray(t1), np.asarray(y1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(y2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(
        np.sort(np.asarray(tc[0].kv_len)),
        np.sort(np.asarray(caches[0].kv_len)))
