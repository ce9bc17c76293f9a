"""TP x paged serving: PagedTPDecoder vs the single-chip PagedDecoder.

The paged tensor-parallel runtime composes the two serving additions
(``parallel/serving_tp.TPDecoder`` head sharding, ``ops/paged.py`` pooled
KV); its oracle is the single-chip ``PagedDecoder`` (itself parity-tested
against the contiguous ``SparseDecoder`` in test_paged.py). Every leaf of
the stacked caches shards over the mesh on dim 0, page ids stay
shard-local, and host scheduler steps (reserve/release/share_prefix) run
per shard against per-shard ``PagePool`` allocators.

8 virtual CPU devices (conftest); kernels take the oracle path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sputnik_tpu.models.serving_paged import PagedDecoder
from sputnik_tpu.models.transformer import SparseTransformer
from sputnik_tpu.parallel import PagedTPDecoder

H, FFN, LAYERS = 32, 48, 2


def _model(b, s, heads, kv=None):
    masks = np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                            (b, s, s)).copy()
    return SparseTransformer.from_masks(
        masks, num_layers=LAYERS, hidden_size=H, num_heads=heads,
        num_kv_heads=kv, ffn_hidden_size=FFN, use_residual=True,
        use_layernorm=True, activation="gelu")


def _mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]), ("tp",))


def _setup(b, P, heads, kv, seed=0):
    model = _model(b, P, heads, kv=kv)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((b, P, H)))
    rng = np.random.RandomState(seed + 1)
    prompts = jnp.asarray(rng.randn(b, P, H).astype(np.float32) * 0.3)
    return model, params, prompts, rng


@pytest.mark.parametrize("tp,kv", [(2, None), (2, 2)])
def test_paged_tp_matches_single_device(tp, kv):
    """prefill + uniform/frozen decode must equal the single-chip paged
    runtime exactly (f32 cache: the sharding is a reparameterization)."""
    b, P = 2, 128
    heads = 4 if kv else 2          # GQA case needs kv=2 | tp=2
    model, params, prompts, rng = _setup(b, P, heads, kv)
    toks = jnp.asarray(rng.randn(3, b, 1, H).astype(np.float32) * 0.3)
    kvh = kv or heads

    ref = PagedDecoder(model, n_pages=2 * b * kvh, s_max=P + 128, bk=128,
                       cache_dtype=jnp.float32)
    rc = ref.init_caches(b)
    y_ref, rc = ref.prefill(params, prompts, rc)

    tpd = PagedTPDecoder(model, _mesh(tp), n_pages=2 * b * (kvh // tp),
                         s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tc = tpd.init_caches(b)
    y_tp, tc = tpd.prefill(sparams, prompts, tc)  # eager: host reserve
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    actives = [None, np.array([True, False]), None]
    for t, act in enumerate(actives):
        rc = ref.reserve(rc, 1)
        tc = tpd.reserve(tc, 1)
        a = None if act is None else jnp.asarray(act)
        y_ref, rc = ref.decode_step(params, toks[t], rc, active=a)
        if a is None:
            y_tp, tc = jax.jit(tpd.decode_step)(sparams, toks[t], tc)
        else:
            y_tp, tc = jax.jit(tpd.decode_step_ragged)(
                sparams, toks[t], tc, a)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5, err_msg=f"t={t}")
    # frozen slot's length never advanced, active one did (per shard)
    lens = np.asarray(tc[0].kv_len).reshape(tpd.n_shards, -1)
    kv_l = tpd.KV_l
    assert (lens[:, :kv_l] == P + 3).all()       # slot 0 on every shard
    assert (lens[:, kv_l:] == P + 2).all()       # slot 1 froze one step


def test_paged_tp_dp_grid_matches_single_device():
    """2x2 dp x tp grid: batch/pools shard over dp, heads over tp."""
    b, P, heads = 4, 128, 2
    model, params, prompts, rng = _setup(b, P, heads, None, seed=3)
    toks = jnp.asarray(rng.randn(2, b, 1, H).astype(np.float32) * 0.3)

    ref = PagedDecoder(model, n_pages=2 * b * heads, s_max=P + 128,
                       bk=128, cache_dtype=jnp.float32)
    rc = ref.init_caches(b)
    y_ref, rc = ref.prefill(params, prompts, rc)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    tpd = PagedTPDecoder(model, mesh, batch_axis="dp",
                         n_pages=2 * (b // 2) * (heads // 2),
                         s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tc = tpd.init_caches(b)
    y_tp, tc = tpd.prefill(sparams, prompts, tc)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    for t in range(2):
        rc = ref.reserve(rc, 1)
        tc = tpd.reserve(tc, 1)
        y_ref, rc = ref.decode_step(params, toks[t], rc)
        y_tp, tc = jax.jit(tpd.decode_step)(sparams, toks[t], tc)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5, err_msg=f"t={t}")


def test_paged_tp_release_and_prefix_share():
    """Host scheduling across the mesh: releasing a slot frees pages on
    exactly its dp slice's tp shards; share_prefix re-admits it from a
    sibling slot and decode parity holds; cross-dp sharing is rejected."""
    b, P, heads, tp = 2, 128, 2, 2
    model, params, prompts0, rng = _setup(b, P, heads, None, seed=5)
    # both slots get the SAME prompt so the fork oracle is slot 0
    prompt = np.asarray(prompts0)[:1]
    prompts = jnp.asarray(np.concatenate([prompt, prompt], axis=0))

    tpd = PagedTPDecoder(model, _mesh(tp), n_pages=3 * b * (heads // tp),
                         s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tc = tpd.init_caches(b)
    _, tc = tpd.prefill(sparams, prompts, tc)

    free_before = [list(layer) for layer in tpd.free_pages]
    tc = tpd.release(tc, 1)
    for li, layer in enumerate(tpd.free_pages):
        for s, free in enumerate(layer):
            assert free == free_before[li][s] + tpd.KV_l  # 1 prompt page
    tbl = np.asarray(tc[0].page_table).reshape(tpd.n_shards,
                                               tpd._R_local, -1)
    assert (tbl[:, tpd.KV_l:] == -1).all()       # slot 1 rows blanked

    # full-page prefix share allocates nothing and restores the lengths
    tc = tpd.share_prefix(tc, src=0, dst=1, n_tokens=P)
    for li, layer in enumerate(tpd.free_pages):
        for s, free in enumerate(layer):
            assert free == free_before[li][s] + tpd.KV_l
    np.testing.assert_array_equal(np.asarray(tc[0].kv_len),
                                  [P] * tc[0].kv_len.shape[0])

    # the fork decodes identically to its source slot
    tok1 = jnp.asarray(rng.randn(1, 1, H).astype(np.float32) * 0.3)
    tok = jnp.concatenate([tok1, tok1], axis=0)
    tc = tpd.reserve(tc, 1)
    y, tc = jax.jit(tpd.decode_step)(sparams, tok, tc)
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y[0]),
                               atol=1e-5, rtol=1e-5)

    # cross-dp-slice sharing must be rejected (pages cannot cross pools)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    tpd2 = PagedTPDecoder(model, mesh, batch_axis="dp",
                          n_pages=2 * (heads // 2),
                          s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    tc2 = tpd2.init_caches(b)
    with pytest.raises(ValueError, match="different dp"):
        tpd2.share_prefix(tc2, src=0, dst=1, n_tokens=P)


def test_paged_tp_decode_multi_and_rollback():
    """Speculative verification + PER-SLOT rollback under tp sharding
    equals the single-chip paged runtime."""
    b, P, q, heads, tp = 2, 128, 3, 2, 2
    model, params, prompts, rng = _setup(b, P, heads, None, seed=7)
    drafts = jnp.asarray(rng.randn(b, q, H).astype(np.float32) * 0.3)
    tok = jnp.asarray(rng.randn(b, 1, H).astype(np.float32) * 0.3)

    ref = PagedDecoder(model, n_pages=2 * b * heads, s_max=P + 128,
                       bk=128, cache_dtype=jnp.float32)
    rc = ref.init_caches(b)
    _, rc = ref.prefill(params, prompts, rc)
    rc = ref.reserve(rc, q)
    y_ref, rc = ref.decode_multi(params, drafts, rc)
    rc = ref.rollback(rc, jnp.asarray([1, 2]))   # per-slot rejection
    y2_ref, rc = ref.decode_step(params, tok, rc,
                                 active=jnp.asarray([True, True]))

    tpd = PagedTPDecoder(model, _mesh(tp), n_pages=2 * b * (heads // tp),
                         s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    sparams = tpd.shard_params(params)
    tc = tpd.init_caches(b)
    _, tc = tpd.prefill(sparams, prompts, tc)
    tc = tpd.reserve(tc, q)
    y_tp, tc = jax.jit(tpd.decode_multi)(sparams, drafts, tc)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    tc = tpd.rollback(tc, jnp.asarray([1, 2]))
    # slot 0 keeps q-1=2 accepted tokens, slot 1 keeps 1 — on EVERY shard
    lens = np.asarray(tc[0].kv_len).reshape(tpd.n_shards, -1)
    assert (lens[:, : tpd.KV_l] == P + 2).all()
    assert (lens[:, tpd.KV_l:] == P + 1).all()
    y2_tp, tc = jax.jit(tpd.decode_step_ragged)(
        sparams, tok, tc, jnp.asarray([True, True]))
    np.testing.assert_allclose(np.asarray(y2_tp), np.asarray(y2_ref),
                               atol=1e-5, rtol=1e-5)


def test_paged_tp_validation():
    model = _model(2, 128, 4)
    tpd = PagedTPDecoder(model, _mesh(2), n_pages=8, s_max=256, bk=128,
                         cache_dtype=jnp.float32)
    with pytest.raises(ValueError, match="init_caches"):
        tpd.reserve((), 1)
    with pytest.raises(ValueError, match="init_caches"):
        tpd.release((), 0)
    tc = tpd.init_caches(2)
    with pytest.raises(ValueError, match="out of range"):
        tpd.release(tc, 5)
    with pytest.raises(ValueError, match="pad to bk"):
        tpd.prefill(tpd.shard_params(
            model.init(jax.random.PRNGKey(0), jnp.zeros((2, 128, H)))),
            jnp.zeros((2, 64, H)), tc)
