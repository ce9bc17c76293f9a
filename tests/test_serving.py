"""Serving runtime: prefill + block-KV decode vs the full forward pass.

The decode path must reproduce the training-time forward exactly: with a
causal mask, the model's output at position t depends only on tokens
<= t, so running prefill on a prompt and then decode_step token by token
must match running the full model on each extended prefix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sputnik_tpu as st
from sputnik_tpu.models.serving import SparseDecoder
from sputnik_tpu.models.transformer import SparseTransformer


def _causal(b, s):
    return np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                           (b, s, s)).copy()


def _build(b, s, h=32, heads=2, layers=2, ffn=48):
    model = SparseTransformer.from_masks(
        _causal(b, s), num_layers=layers, hidden_size=h, num_heads=heads,
        ffn_hidden_size=ffn, use_residual=True, use_layernorm=True,
        activation="gelu")
    return model


@pytest.mark.parametrize("cache_dtype,tol", [
    (jnp.float32, 2e-4),
    (jnp.int8, 5e-2),
])
def test_decode_matches_full_forward(cache_dtype, tol):
    b, P, T, h = 2, 8, 14, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, T, h).astype(np.float32) * 0.3)

    ref_model = _build(b, T, h=h)
    params = ref_model.init(jax.random.PRNGKey(0), x)
    pre_model = _build(b, P, h=h)

    dec = SparseDecoder(pre_model, s_max=16, bk=8, cache_dtype=cache_dtype)
    caches = dec.init_caches(b)

    # prefill parity vs the flax forward on the prompt
    y_pre, caches = dec.prefill(params, x[:, :P], caches)
    y_flax = pre_model.apply(params, x[:, :P])
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_flax),
                               atol=1e-4, rtol=1e-4)

    # token-by-token decode parity vs the full forward on each prefix
    step = jax.jit(dec.decode_step)
    for t in range(P, T):
        y_tok, caches = step(params, x[:, t:t + 1], caches)
        full_model = _build(b, t + 1, h=h)
        y_full = full_model.apply(params, x[:, : t + 1])
        ref = np.asarray(y_full[:, t])
        err = np.abs(np.asarray(y_tok[:, 0]) - ref).max()
        scale_ = np.abs(ref).max()
        assert err / scale_ < tol, (t, err / scale_)


def test_decode_loop_matches_steps():
    """The in-jit scan loop must produce exactly the same tokens as a
    Python loop of decode_step calls."""
    b, P, h = 2, 8, 32
    model = _build(b, P, h=h)
    x = jnp.asarray(np.random.RandomState(2).randn(b, P, h).astype(
        np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x)
    dec = SparseDecoder(model, s_max=16, bk=8, cache_dtype=jnp.float32)

    _, caches = dec.prefill(params, x, dec.init_caches(b))
    tok = x[:, -1:]
    ys, _ = jax.jit(lambda p, t, c: dec.decode_loop(p, t, c, 4))(
        params, tok, caches)

    ref, c = [], caches
    cur = tok
    for _ in range(4):
        cur, c = dec.decode_step(params, cur, c)
        ref.append(np.asarray(cur))
    np.testing.assert_allclose(np.asarray(ys), np.stack(ref),
                               atol=1e-5, rtol=1e-5)


def test_gqa_decode_matches_full_forward():
    """GQA serving: caches sized by KV heads; grouped decode must still
    reproduce the full forward on every extended prefix."""
    b, P, T, h, heads, kv = 2, 8, 12, 32, 4, 2
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(b, T, h).astype(np.float32) * 0.3)

    def build(s):
        return SparseTransformer.from_masks(
            _causal(b, s), num_layers=2, hidden_size=h, num_heads=heads,
            num_kv_heads=kv, ffn_hidden_size=48, use_residual=True,
            use_layernorm=True, activation="gelu")

    ref_model = build(T)
    params = ref_model.init(jax.random.PRNGKey(0), x)
    dec = SparseDecoder(build(P), s_max=16, bk=8, cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    assert caches[0].k.shape[0] == b * kv  # GQA cache is 2x smaller

    y_pre, caches = dec.prefill(params, x[:, :P], caches)
    y_flax = build(P).apply(params, x[:, :P])
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_flax),
                               atol=1e-4, rtol=1e-4)

    step = jax.jit(dec.decode_step)
    for t in range(P, T):
        y_tok, caches = step(params, x[:, t:t + 1], caches)
        y_full = build(t + 1).apply(params, x[:, : t + 1])
        ref = np.asarray(y_full[:, t])
        err = np.abs(np.asarray(y_tok[:, 0]) - ref).max()
        assert err / np.abs(ref).max() < 2e-4, (t, err)


def test_decode_multi_matches_sequential_steps():
    """Speculative verification: decode_multi(q tokens) must equal q
    teacher-forced decode_step calls, and rollback must undo rejected
    tokens exactly."""
    b, P, q, h = 2, 8, 4, 32
    model = _build(b, P, h=h)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b, P + q + 1, h).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x[:, :P])
    dec = SparseDecoder(model, s_max=24, bk=8, cache_dtype=jnp.float32)

    _, caches = dec.prefill(params, x[:, :P], dec.init_caches(b))

    # sequential reference
    seq_out, c_seq = [], caches
    for t in range(P, P + q):
        y, c_seq = dec.decode_step(params, x[:, t:t + 1], c_seq)
        seq_out.append(np.asarray(y[:, 0]))

    y_multi, c_multi = jax.jit(dec.decode_multi)(
        params, x[:, P:P + q], caches)
    np.testing.assert_allclose(np.asarray(y_multi),
                               np.stack(seq_out, axis=1),
                               atol=1e-5, rtol=1e-5)
    assert c_multi[0].kv_len.tolist() == c_seq[0].kv_len.tolist()

    # reject the last 2 draft tokens, then decode the true next token:
    # must equal decoding it from the sequential cache at the same length
    c_back = SparseDecoder.rollback(c_multi, 2)
    y_a, _ = dec.decode_step(params, x[:, P + q:P + q + 1], c_back)
    c_ref = caches
    for t in range(P, P + q - 2):
        _, c_ref = dec.decode_step(params, x[:, t:t + 1], c_ref)
    y_b, _ = dec.decode_step(params, x[:, P + q:P + q + 1], c_ref)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                               atol=1e-5, rtol=1e-5)


def test_decode_sliding_window():
    """Sinks + sliding-window decode: the block table must cover exactly
    the sink blocks plus the trailing window, and the step must stay
    finite and jit-able as the window slides off old blocks."""
    b, P, h = 1, 8, 32
    model = _build(b, P, h=h)
    x = jnp.asarray(np.random.RandomState(1).randn(b, 24, h).astype(
        np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x[:, :P])

    dec = SparseDecoder(model, s_max=24, bk=4, window=8, sinks=1)
    assert dec.window_blocks == 3 and dec.sink_blocks == 1
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, x[:, :P], caches)
    step = jax.jit(dec.decode_step)
    for t in range(P, 24):
        y, caches = step(params, x[:, t:t + 1], caches)
        assert np.isfinite(np.asarray(y)).all(), t
    assert int(caches[0].kv_len[0]) == 24
