"""Continuous-batching building blocks: ragged decode + slot admission.

Oracle: slots are independent — the attention of sequence s only reads
its own cache replicas — so a slot inside a ragged batch must reproduce,
exactly, a batch=1 decoder run of the same token stream. That holds
through freezes (``active`` mask) and through ``insert_kv_slot``
admission of a fresh sequence into a retired slot.
"""


import jax
import jax.numpy as jnp
import numpy as np

from sputnik_tpu.models.serving import SparseDecoder
from sputnik_tpu.models.transformer import SparseTransformer
from sputnik_tpu.ops.decode import insert_kv_slot

H, HEADS, LAYERS, FFN = 32, 2, 2, 48


def _causal(b, s):
    return np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                           (b, s, s)).copy()


def _model(b, s, **kw):
    return SparseTransformer.from_masks(
        _causal(b, s), num_layers=LAYERS, hidden_size=H, num_heads=HEADS,
        ffn_hidden_size=FFN, use_residual=True, use_layernorm=True,
        activation="gelu", **kw)


def _params(P):
    model = _model(1, P)
    x = jnp.zeros((1, P, H), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


def _single_run(params, prompt, toks, s_max, bk=8, **kw):
    """Independent batch=1 reference: prefill + uniform decode of the
    given token stream. Returns (per-step outputs, caches)."""
    dec = SparseDecoder(_model(1, prompt.shape[1]), s_max=s_max, bk=bk,
                        cache_dtype=jnp.float32, **kw)
    caches = dec.init_caches(1)
    _, caches = dec.prefill(params, prompt, caches)
    ys = []
    for t in range(toks.shape[0]):
        y, caches = dec.decode_step(params, toks[t][None, None, :], caches)
        ys.append(np.asarray(y[0, 0]))
    return ys, caches


def test_ragged_decode_matches_independent():
    b, P = 3, 8
    rng = np.random.RandomState(0)
    params = _params(P)
    prompts = jnp.asarray(rng.randn(b, P, H).astype(np.float32) * 0.3)
    # token streams of different lengths per slot
    streams = [jnp.asarray(rng.randn(n, H).astype(np.float32) * 0.3)
               for n in (3, 1, 2)]

    dec = SparseDecoder(_model(b, P), s_max=16, bk=8,
                        cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, prompts, caches)

    # step t: slot s is active while its stream still has tokens
    actives = [np.array([t < len(streams[s]) for s in range(b)])
               for t in range(3)]
    step = jax.jit(dec.decode_step_ragged)
    got = {s: [] for s in range(b)}
    for t, act in enumerate(actives):
        x = jnp.stack([streams[s][t] if act[s] else jnp.zeros((H,))
                       for s in range(b)])[:, None, :]
        y, caches = step(params, x, caches, jnp.asarray(act))
        for s in range(b):
            if act[s]:
                got[s].append(np.asarray(y[s, 0]))

    for s in range(b):
        want, ref_caches = _single_run(params, prompts[s:s + 1], streams[s],
                                       s_max=16)
        assert len(got[s]) == len(want)
        for a, e in zip(got[s], want):
            np.testing.assert_allclose(a, e, atol=1e-5, rtol=1e-5)
        # per-slot lengths advanced exactly by the stream length
        r0 = s * dec.kv_heads
        np.testing.assert_array_equal(
            np.asarray(caches[0].kv_len[r0:r0 + dec.kv_heads]),
            np.asarray(ref_caches[0].kv_len))


def test_frozen_slot_cache_untouched():
    b, P = 2, 8
    rng = np.random.RandomState(1)
    params = _params(P)
    prompts = jnp.asarray(rng.randn(b, P, H).astype(np.float32) * 0.3)
    dec = SparseDecoder(_model(b, P), s_max=16, bk=8,
                        cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, prompts, caches)
    before = [np.asarray(c.k).copy() for c in caches]

    act = jnp.asarray(np.array([True, False]))
    x = jnp.asarray(rng.randn(b, 1, H).astype(np.float32))
    _, caches = dec.decode_step_ragged(params, x, caches, act)

    kvh = dec.kv_heads
    for i, c in enumerate(caches):
        k = np.asarray(c.k)
        # frozen slot: everything below its kv_len (= P) is untouched,
        # and kv_len did not advance
        np.testing.assert_array_equal(k[kvh:, :P], before[i][kvh:, :P])
    np.testing.assert_array_equal(
        np.asarray(caches[0].kv_len),
        np.array([P + 1] * kvh + [P] * kvh, np.int32))


def test_insert_kv_slot_admission():
    b, P = 2, 8
    rng = np.random.RandomState(2)
    params = _params(P)
    prompts = jnp.asarray(rng.randn(b, P, H).astype(np.float32) * 0.3)

    dec = SparseDecoder(_model(b, P), s_max=16, bk=8,
                        cache_dtype=jnp.float32)
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, prompts, caches)

    # advance slot 0 by two tokens while slot 1 is already retired
    lead = jnp.asarray(rng.randn(2, H).astype(np.float32) * 0.3)
    for t in range(2):
        x = jnp.stack([lead[t], jnp.zeros((H,))])[:, None, :]
        _, caches = dec.decode_step_ragged(
            params, x, caches, jnp.asarray(np.array([True, False])))

    # admit a FRESH sequence into slot 1 from a batch=1 prefill
    fresh = jnp.asarray(rng.randn(1, P, H).astype(np.float32) * 0.3)
    dec1 = SparseDecoder(_model(1, P), s_max=16, bk=8,
                         cache_dtype=jnp.float32)
    caches1 = dec1.init_caches(1)
    _, caches1 = dec1.prefill(params, fresh, caches1)
    caches = tuple(
        insert_kv_slot(c, c1, 1, kv_heads=dec.kv_heads)
        for c, c1 in zip(caches, caches1))

    # decode both slots together (ragged: lengths P+2 and P)
    tail = jnp.asarray(rng.randn(2, 2, H).astype(np.float32) * 0.3)
    outs = {0: [], 1: []}
    for t in range(2):
        y, caches = dec.decode_step_ragged(
            params, tail[:, t][:, None, :], caches)
        outs[0].append(np.asarray(y[0, 0]))
        outs[1].append(np.asarray(y[1, 0]))

    # slot 0 oracle: prompt0 + lead + its tail stream, uniform decode
    want0, _ = _single_run(params, prompts[0:1],
                           jnp.concatenate([lead, tail[0]]), s_max=16)
    for a, e in zip(outs[0], want0[2:]):
        np.testing.assert_allclose(a, e, atol=1e-5, rtol=1e-5)
    # slot 1 oracle: the fresh prompt + its tail stream
    want1, _ = _single_run(params, fresh, tail[1], s_max=16)
    for a, e in zip(outs[1], want1):
        np.testing.assert_allclose(a, e, atol=1e-5, rtol=1e-5)


def test_ragged_gqa_int8_smoke():
    b, P = 2, 8
    rng = np.random.RandomState(3)
    model = _model(b, P, num_kv_heads=1)
    x = jnp.asarray(rng.randn(b, P, H).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), x)
    dec = SparseDecoder(model, s_max=16, bk=8, cache_dtype=jnp.int8)
    caches = dec.init_caches(b)
    _, caches = dec.prefill(params, x, caches)
    y, caches = dec.decode_step_ragged(
        params, x[:, :1], caches, jnp.asarray(np.array([True, False])))
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(caches[0].kv_len),
                                  np.array([P + 1, P], np.int32))


def test_insert_kv_slot_validation():
    import pytest

    from sputnik_tpu.ops.decode import init_kv_cache

    big = init_kv_cache(4, 16, 32, dtype=jnp.float32)
    with pytest.raises(ValueError, match="dtype"):
        insert_kv_slot(big, init_kv_cache(2, 16, 32, dtype=jnp.bfloat16),
                       0, kv_heads=2)
    with pytest.raises(ValueError, match="replicas"):
        insert_kv_slot(big, init_kv_cache(1, 16, 32, dtype=jnp.float32),
                       0, kv_heads=2)
    with pytest.raises(ValueError, match="s_max"):
        insert_kv_slot(big, init_kv_cache(2, 32, 32, dtype=jnp.float32),
                       0, kv_heads=2)
    with pytest.raises(ValueError, match="out of range"):
        insert_kv_slot(big, init_kv_cache(2, 16, 32, dtype=jnp.float32),
                       2, kv_heads=2)
    with pytest.raises(ValueError, match="out of range"):
        insert_kv_slot(big, init_kv_cache(2, 16, 32, dtype=jnp.float32),
                       -1, kv_heads=2)
