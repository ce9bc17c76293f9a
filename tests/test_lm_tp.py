"""Token-level tensor-parallel serving: TPLMServer vs single-chip LMServer.

The whole token loop (embed -> sharded core -> head -> sample) runs in
one shard_map; since tensor parallelism is a pure reparameterization of
the core, greedy generation must be TOKEN-IDENTICAL to the single-chip
server (contiguous and paged KV alike). 8 virtual CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sputnik_tpu.models import LMServer, SparseLM
from sputnik_tpu.parallel import TPLMServer

V = 97


def _causal(b, s):
    return np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                           (b, s, s)).copy()


def _build(b, s, heads=2):
    return SparseLM.from_masks(
        _causal(b, s), vocab_size=V, num_layers=2, hidden_size=32,
        num_heads=heads, ffn_hidden_size=48, use_residual=True,
        use_layernorm=True, activation="gelu")


def _mesh(tp):
    return Mesh(np.array(jax.devices()[:tp]), ("tp",))


def test_tplm_greedy_matches_single_device():
    b, P, n_new = 2, 16, 4
    lm = _build(b, P)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(rng.randint(0, V, (b, P)))
    params = lm.init(jax.random.PRNGKey(0), prompts)

    ref = LMServer(lm, s_max=P + 8, bk=8, cache_dtype=jnp.float32)
    toks_ref, _ = jax.jit(lambda p, t: ref.generate(p, t, n_new))(
        params, prompts)

    srv = TPLMServer(lm, _mesh(2), s_max=P + 8, bk=8,
                     cache_dtype=jnp.float32)
    sparams = srv.shard_params(params)
    toks_tp, caches = jax.jit(
        lambda sp, t: srv.generate(sp, t, n_new))(sparams, prompts)
    np.testing.assert_array_equal(np.asarray(toks_tp), np.asarray(toks_ref))
    # caches really advanced and stayed mesh-stacked (tp * b * KV_l rows);
    # the final sampled token is never fed back -> n_new - 1 appends
    assert caches[0].kv_len.shape[0] == 2 * b * 1
    assert np.asarray(caches[0].kv_len).tolist() == \
        [P + n_new - 1] * (2 * b)


def test_tplm_paged_greedy_matches_single_device():
    b, P, n_new = 2, 128, 4
    lm = _build(b, P)
    rng = np.random.RandomState(1)
    prompts = jnp.asarray(rng.randint(0, V, (b, P)))
    params = lm.init(jax.random.PRNGKey(1), prompts)

    ref = LMServer(lm, s_max=P + 128, bk=128, cache_dtype=jnp.float32)
    toks_ref, _ = ref.generate(params, prompts, n_new)

    srv = TPLMServer(lm, _mesh(2), n_pages=6, s_max=P + 128, bk=128,
                     cache_dtype=jnp.float32)
    sparams = srv.shard_params(params)
    toks_tp, _ = srv.generate(sparams, prompts, n_new)  # eager: paged
    np.testing.assert_array_equal(np.asarray(toks_tp), np.asarray(toks_ref))
    # pages were actually consumed from every shard's pool
    assert all(f < 6 for layer in srv.tpd.free_pages for f in layer)


def test_tplm_dp_sampling_decorrelated_and_deterministic():
    """dp x tp grid with temperature sampling: same key -> same tokens
    (deterministic), and dp slices given IDENTICAL prompts sample
    different tokens (per-slice key folding)."""
    b, P, n_new = 4, 16, 6
    lm = _build(b, P, heads=2)
    rng = np.random.RandomState(2)
    one = rng.randint(0, V, (1, P))
    prompts = jnp.asarray(np.tile(one, (b, 1)))   # all slots identical
    params = lm.init(jax.random.PRNGKey(2), prompts)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    srv = TPLMServer(lm, mesh, batch_axis="dp", s_max=P + 8, bk=8,
                     cache_dtype=jnp.float32)
    sparams = srv.shard_params(params)
    key = jax.random.PRNGKey(7)
    t1, _ = srv.generate(sparams, prompts, n_new, key, temperature=1.0)
    t2, _ = srv.generate(sparams, prompts, n_new, key, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert t1.shape == (b, n_new)
    assert ((np.asarray(t1) >= 0) & (np.asarray(t1) < V)).all()
    # slots 0/1 (dp slice 0) share a key stream, slots 2/3 (slice 1)
    # folded differently: the two slices' token streams must differ
    assert not np.array_equal(np.asarray(t1)[:2], np.asarray(t1)[2:])
