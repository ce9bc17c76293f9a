"""Token-level LM: SparseLM forward, sampling, LMServer generation.

The generation oracle is the same prefix trick the serving tests use:
SparseTransformer/SparseLM params are mask-size independent, so a model
built over a longer causal mask can replay the full forward on each
token prefix and its argmax must reproduce the served greedy decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sputnik_tpu.models import LMServer, SparseLM, sample_logits

V = 97  # deliberately non-round vocab


def _causal(b, s):
    return np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                           (b, s, s)).copy()


def _build(b, s, h=32, heads=2, layers=2, ffn=48, **kw):
    return SparseLM.from_masks(
        _causal(b, s), vocab_size=V, num_layers=layers, hidden_size=h,
        num_heads=heads, ffn_hidden_size=ffn, use_residual=True,
        use_layernorm=True, activation="gelu", **kw)


def test_lm_forward_tied_head():
    b, s = 2, 8
    lm = _build(b, s)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, V, (b, s)))
    params = lm.init(jax.random.PRNGKey(0), toks)
    logits = lm.apply(params, toks)
    assert logits.shape == (b, s, V)
    # tied head: last-layer activations times E^T, after ln_f
    emb = params["params"]["embed"]["embedding"]
    core_out = lm.core.apply({"params": params["params"]["core"]},
                             jnp.take(emb, toks, axis=0))
    mu = jnp.mean(core_out, -1, keepdims=True)
    var = jnp.var(core_out, -1, keepdims=True)
    ln = (core_out - mu) / jnp.sqrt(var + 1e-6) \
        * params["params"]["ln_f"]["scale"] + params["params"]["ln_f"]["bias"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ln @ emb.T),
                               atol=1e-5, rtol=1e-5)


def test_lm_untied_head_shape():
    b, s = 2, 8
    lm = _build(b, s, tie_embeddings=False)
    toks = jnp.zeros((b, s), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    assert "lm_head" in params["params"]
    assert lm.apply(params, toks).shape == (b, s, V)


def test_sample_logits_modes():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(4, V).astype(np.float32) * 3)
    best = jnp.argmax(logits, -1)
    key = jax.random.PRNGKey(0)
    # greedy
    np.testing.assert_array_equal(
        np.asarray(sample_logits(key, logits, temperature=0.0)),
        np.asarray(best))
    # top_k=1 and tiny top_p both collapse to argmax for any key
    for k2 in jax.random.split(key, 4):
        np.testing.assert_array_equal(
            np.asarray(sample_logits(k2, logits, temperature=1.0, top_k=1)),
            np.asarray(best))
        np.testing.assert_array_equal(
            np.asarray(sample_logits(k2, logits, temperature=1.0,
                                     top_p=1e-9)),
            np.asarray(best))
    # top_k=5: every sample lands in the top-5 set
    top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
    draws = jax.vmap(lambda k: sample_logits(k, logits, temperature=1.0,
                                             top_k=5))(
        jax.random.split(key, 64))
    for row in range(4):
        assert set(np.asarray(draws)[:, row]) <= set(top5[row])
    # top_p: samples restricted to the nucleus (here p=0.5)
    probs = np.asarray(jax.nn.softmax(logits, -1))
    draws_p = jax.vmap(lambda k: sample_logits(k, logits, temperature=1.0,
                                               top_p=0.5))(
        jax.random.split(key, 64))
    for row in range(4):
        order = np.argsort(-probs[row])
        cum = np.cumsum(probs[row][order])
        nucleus = set(order[: int(np.searchsorted(cum, 0.5) + 1)])
        assert set(np.asarray(draws_p)[:, row]) <= nucleus
    # HF/vLLM order: temperature scales BEFORE the nucleus test, so at
    # high temperature the p=0.5 nucleus is computed on the flattened
    # distribution (wider than the temperature-1 nucleus)
    probs_t = np.asarray(jax.nn.softmax(logits / 4.0, -1))
    draws_t = jax.vmap(lambda k: sample_logits(k, logits, temperature=4.0,
                                               top_p=0.5))(
        jax.random.split(jax.random.PRNGKey(5), 256))
    for row in range(4):
        order = np.argsort(-probs_t[row])
        cum = np.cumsum(probs_t[row][order])
        nucleus_t = set(order[: int(np.searchsorted(cum, 0.5) + 1)])
        seen = set(np.asarray(draws_t)[:, row])
        assert seen <= nucleus_t
        # the flattened nucleus is strictly wider here; check we actually
        # draw outside the temperature-1 nucleus at least once
        nucleus_1 = set(np.argsort(-probs[row])[: int(np.searchsorted(
            np.cumsum(probs[row][np.argsort(-probs[row])]), 0.5) + 1)])
        assert len(nucleus_t) > len(nucleus_1)
        assert seen - nucleus_1, "temperature should widen the nucleus"


def test_generate_greedy_matches_full_forward():
    b, P, n_new = 2, 8, 4
    rng = np.random.RandomState(2)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), prompt)

    server = LMServer(lm, s_max=P + n_new, bk=8, cache_dtype=jnp.float32)
    toks, _ = server.generate(params, prompt, n_new, temperature=0.0)
    assert toks.shape == (b, n_new)

    # oracle: full forward over each growing prefix, greedy next token
    seq = np.asarray(prompt)
    for t in range(n_new):
        lm_t = _build(b, P + t)
        logits = lm_t.apply(params, jnp.asarray(seq))
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        np.testing.assert_array_equal(np.asarray(toks[:, t]), nxt)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)


def test_generate_sampled_jit_deterministic_per_key():
    b, P, n_new = 2, 8, 3
    rng = np.random.RandomState(3)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), prompt)
    server = LMServer(lm, s_max=P + n_new, bk=8, cache_dtype=jnp.float32)

    gen = jax.jit(lambda p, t, k: server.generate(
        p, t, n_new, k, temperature=0.8, top_k=5)[0])
    a = np.asarray(gen(params, prompt, jax.random.PRNGKey(7)))
    b_ = np.asarray(gen(params, prompt, jax.random.PRNGKey(7)))
    c = np.asarray(gen(params, prompt, jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b_)
    assert a.shape == (b, n_new)
    assert ((a >= 0) & (a < V)).all()
    assert (a != c).any()  # different key, different draw (overwhelmingly)


def test_lm_ragged_step_matches_uniform_when_all_active():
    b, P = 2, 8
    rng = np.random.RandomState(6)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), prompt)
    server = LMServer(lm, s_max=P + 4, bk=8, cache_dtype=jnp.float32)
    _, caches = server.prefill(params, prompt, server.init_caches(b))
    tok = jnp.asarray(rng.randint(0, V, (b,)))
    lu, cu = server.decode_step(params, tok, caches)
    lr, cr = server.decode_step_ragged(params, tok, caches,
                                       jnp.ones((b,), bool))
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lu),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cr[0].kv_len),
                                  np.asarray(cu[0].kv_len))
    # freeze slot 1: its logits row is computed but its length is pinned
    lf, cf = server.decode_step_ragged(
        params, tok, caches, jnp.asarray(np.array([True, False])))
    np.testing.assert_allclose(np.asarray(lf[0]), np.asarray(lu[0]),
                               atol=1e-5, rtol=1e-5)
    kvh = server.decoder.kv_heads
    np.testing.assert_array_equal(
        np.asarray(cf[0].kv_len),
        np.array([P + 1] * kvh + [P] * kvh, np.int32))


def test_generate_repetition_penalty():
    b, P, n_new = 2, 8, 5
    rng = np.random.RandomState(9)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), prompt)
    server = LMServer(lm, s_max=P + n_new, bk=8, cache_dtype=jnp.float32)
    base, _ = server.generate(params, prompt, n_new, temperature=0.0)
    same, _ = server.generate(params, prompt, n_new, temperature=0.0,
                              repetition_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # a strong penalty forbids any repeat of prompt or generated tokens
    toks, _ = server.generate(params, prompt, n_new, temperature=0.0,
                              repetition_penalty=1e9)
    t = np.asarray(toks)
    for s in range(b):
        seen = set(np.asarray(prompt[s]))
        for x in t[s]:
            assert int(x) not in seen
            seen.add(int(x))


def test_generate_variable_length_prompts():
    """Right-padded variable-length prompt batch: each sequence must
    generate exactly what it would alone at its true length."""
    b, P, n_new = 2, 8, 3
    lens = [6, 8]
    rng = np.random.RandomState(8)
    prompt = rng.randint(0, V, (b, P))
    prompt[0, lens[0]:] = 0  # right padding (value irrelevant)
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), jnp.asarray(prompt))
    server = LMServer(lm, s_max=P + n_new, bk=8, cache_dtype=jnp.float32)
    toks, caches = server.generate(
        params, jnp.asarray(prompt), n_new, temperature=0.0,
        prompt_lengths=jnp.asarray(lens))
    # per-slot cache positions advanced from each TRUE length
    kvh = server.decoder.kv_heads
    np.testing.assert_array_equal(
        np.asarray(caches[0].kv_len),
        np.repeat(np.asarray(lens) + n_new - 1, kvh))
    for s in range(b):
        lm_s = _build(1, lens[s])
        srv_s = LMServer(lm_s, s_max=lens[s] + n_new, bk=8,
                         cache_dtype=jnp.float32)
        want, _ = srv_s.generate(params,
                                 jnp.asarray(prompt[s:s + 1, :lens[s]]),
                                 n_new, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(toks[s]),
                                      np.asarray(want[0]))


def test_generate_eos_pads_finished_sequences():
    b, P, n_new = 2, 8, 5
    rng = np.random.RandomState(5)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P)
    params = lm.init(jax.random.PRNGKey(0), prompt)
    server = LMServer(lm, s_max=P + n_new, bk=8, cache_dtype=jnp.float32)

    free, _ = server.generate(params, prompt, n_new, temperature=0.0)
    # declare row 0's first greedy token the EOS: row 0 must emit it and
    # then pad forever; row 1 is unaffected until (if ever) it emits it
    eos = int(free[0, 0])
    pad = (eos + 1) % V
    toks, _ = server.generate(params, prompt, n_new, temperature=0.0,
                              eos_id=eos, pad_id=pad)
    t = np.asarray(toks)
    assert t[0, 0] == eos
    assert (t[0, 1:] == pad).all()
    f1 = np.asarray(free[1])
    stop = np.nonzero(f1 == eos)[0]
    upto = (stop[0] + 1) if stop.size else n_new
    np.testing.assert_array_equal(t[1, :upto], f1[:upto])
    if stop.size:
        assert (t[1, stop[0] + 1:] == pad).all()


@pytest.mark.parametrize("kw", [
    dict(cache_dtype=jnp.int8),
    dict(window=6, sinks=1),
])
def test_generate_serving_options_smoke(kw):
    b, P, n_new = 2, 8, 3
    rng = np.random.RandomState(4)
    prompt = jnp.asarray(rng.randint(0, V, (b, P)))
    lm = _build(b, P, num_kv_heads=1)  # GQA: 2 heads share 1 KV head
    params = lm.init(jax.random.PRNGKey(0), prompt)
    server = LMServer(lm, s_max=P + n_new, bk=8, **kw)
    toks, caches = server.generate(params, prompt, n_new, temperature=0.0)
    assert toks.shape == (b, n_new)
    assert ((np.asarray(toks) >= 0) & (np.asarray(toks) < V)).all()
    # the final sampled token is returned but never decoded, so the
    # cache holds the prompt plus n_new - 1 generated tokens
    assert int(caches[0].kv_len[0]) == P + n_new - 1


def test_paged_generate_user_caches_reserved():
    """Eager paged generate with USER-passed caches must reserve their
    pages in the host phase (inside the memoized jit the prefill cannot
    allocate — unreserved tables would scatter the prompt to the dump
    page and decode silently wrong tokens; code-review r4 finding)."""
    import jax

    b, P, V, n_new = 2, 128, 64, 4
    masks = np.broadcast_to(np.tril(np.ones((P, P), np.float32)),
                            (b, P, P)).copy()
    lm = SparseLM.from_masks(
        masks, vocab_size=V, num_layers=2, hidden_size=32, num_heads=2,
        ffn_hidden_size=48, use_residual=True, use_layernorm=True,
        activation="gelu")
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, V, (b, P)))
    params = lm.init(jax.random.PRNGKey(0), toks)
    srv = LMServer(lm, n_pages=64, s_max=P + 128, bk=128,
                   cache_dtype=jnp.float32)

    ref, _ = srv.generate(params, toks, n_new)          # caches=None path
    user_caches = srv.init_caches(b)                    # UNRESERVED
    got, _ = srv.generate(params, toks, n_new, caches=user_caches)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # in-trace paged generate without prepared caches fails loudly
    with pytest.raises(ValueError, match="pre-reserved"):
        jax.jit(lambda p, t: srv.generate(p, t, n_new))(params, toks)
