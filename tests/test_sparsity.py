"""Dynamic sparse training (``sputnik_tpu.training``): magnitude pruning,
RigL connectivity updates, value/optimizer-state remapping, and the
end-to-end SparseLinear update loop.

No reference counterpart (SURVEY.md §2 lists none) — oracle is the
definition: top-k membership checks plus dense-masked matmul parity
through the updated topologies.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sputnik_tpu as st
from sputnik_tpu.training import (
    cubic_sparsity_schedule,
    dense_linear_grad,
    magnitude_prune,
    remap_values,
    rigl_update,
    rigl_update_linear,
    topology_from_dense,
)


def _dense_of(topo, values):
    out = np.zeros((topo.m, topo.n), np.float32)
    out[topo.row_ids[: topo.nnz], topo.column_indices[: topo.nnz]] = \
        np.asarray(values)[: topo.nnz]
    return out


def _key_set(topo):
    return set(zip(topo.row_ids[: topo.nnz].tolist(),
                   topo.column_indices[: topo.nnz].tolist()))


def test_topology_from_dense_keeps_topk():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 96).astype(np.float32)
    topo, vals = topology_from_dense(w, density=0.25)
    assert topo.nnz == round(0.25 * 64 * 96)
    # every kept |w| >= every dropped |w|
    kept = _dense_of(topo, vals)
    thresh = np.abs(kept[kept != 0]).min()
    dropped = np.abs(w[kept == 0])
    assert dropped.max() <= thresh + 1e-7
    # values carried exactly
    np.testing.assert_array_equal(kept[kept != 0], w[kept != 0])


def test_magnitude_prune_drops_smallest_and_keeps_shape():
    rng = np.random.RandomState(1)
    w = rng.randn(32, 48).astype(np.float32)
    topo, vals = topology_from_dense(w, density=0.5)
    new, nvals = magnitude_prune(topo, vals, n_drop=100,
                                 keep_nnz_pad=True)
    assert new.nnz == topo.nnz - 100
    assert new.nnz_pad == topo.nnz_pad          # buffers keep shape
    old_abs = np.abs(vals[: topo.nnz])
    surviving = np.abs(nvals[: new.nnz])
    assert surviving.min() >= np.sort(old_abs)[99]  # smallest 100 gone
    # survivors keep their exact values
    d_old, d_new = _dense_of(topo, vals), _dense_of(new, nvals)
    mask = d_new != 0
    np.testing.assert_array_equal(d_new[mask], d_old[mask])


def test_rigl_update_semantics():
    rng = np.random.RandomState(2)
    w = rng.randn(40, 56).astype(np.float32)
    topo, vals = topology_from_dense(w, density=0.3)
    g = rng.randn(40, 56).astype(np.float32)
    k = round(0.1 * topo.nnz)

    new, nvals = rigl_update(topo, vals, g, fraction=0.1)
    assert (new.nnz, new.nnz_pad) == (topo.nnz, topo.nnz_pad)

    old_keys, new_keys = _key_set(topo), _key_set(new)
    dropped = old_keys - new_keys
    grown = new_keys - old_keys
    assert len(dropped) == len(grown) == k

    # dropped are the k smallest |value| actives
    d_old = _dense_of(topo, vals)
    drop_mags = sorted(abs(d_old[r, c]) for r, c in dropped)
    kept_min = min(abs(d_old[r, c]) for r, c in old_keys - dropped)
    assert drop_mags[-1] <= kept_min + 1e-7

    # grown are the k largest |grad| among previously-inactive slots
    ag = np.abs(g)
    grow_mags = sorted(ag[r, c] for r, c in grown)
    inactive_rest = [ag[r, c] for r in range(40) for c in range(56)
                     if (r, c) not in old_keys and (r, c) not in grown]
    assert grow_mags[0] >= max(inactive_rest) - 1e-7

    # grown start at zero, survivors carry over
    d_new = _dense_of(new, nvals)
    for r, c in grown:
        assert d_new[r, c] == 0.0
    for r, c in old_keys & new_keys:
        assert d_new[r, c] == d_old[r, c]


def test_remap_values_optimizer_state():
    rng = np.random.RandomState(3)
    w = rng.randn(24, 24).astype(np.float32)
    topo, vals = topology_from_dense(w, density=0.4)
    mu = rng.rand(topo.nnz_pad).astype(np.float32)
    new, _ = rigl_update(topo, vals, rng.randn(24, 24), fraction=0.2)
    nmu = remap_values(topo, new, mu)
    d_old, d_new = _dense_of(topo, mu), _dense_of(new, nmu)
    both = (d_old != 0) & (_dense_of(topo, vals) != 0)
    shared = _key_set(topo) & _key_set(new)
    for r, c in shared:
        assert d_new[r, c] == d_old[r, c]
    for r, c in _key_set(new) - shared:
        assert d_new[r, c] == 0.0
    del both


def test_rigl_spmm_parity_after_update():
    """The updated topology computes the dense-masked product exactly."""
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    w = rng.randn(128, 128).astype(np.float32)
    topo, vals = topology_from_dense(w, density=0.2)
    new, nvals = rigl_update(topo, vals, rng.randn(128, 128),
                             fraction=0.15)
    x = rng.randn(128, 16).astype(np.float32)
    y = st.spmm(new, jnp.asarray(nvals), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), _dense_of(new, nvals) @ x,
                               rtol=1e-4, atol=1e-4)


def test_cubic_schedule():
    s0, s1 = 0.0, 0.9
    kw = dict(s_init=s0, s_final=s1, t_start=100, t_end=500)
    assert cubic_sparsity_schedule(0, **kw) == s0
    assert cubic_sparsity_schedule(100, **kw) == s0
    assert cubic_sparsity_schedule(500, **kw) == s1
    assert cubic_sparsity_schedule(10_000, **kw) == s1
    mid = [cubic_sparsity_schedule(t, **kw) for t in range(100, 501, 50)]
    assert all(b >= a for a, b in zip(mid, mid[1:]))  # monotone
    with pytest.raises(ValueError):
        cubic_sparsity_schedule(0, s_init=0, s_final=1, t_start=5, t_end=5)


@pytest.mark.parametrize("layout", ["csr", "panel"])
def test_rigl_update_linear_end_to_end(layout):
    """Two optimizer segments around a RigL update: shapes stable,
    moments carried, loss keeps decreasing after the topology swap."""
    import jax
    import jax.numpy as jnp
    import optax

    from sputnik_tpu.models.linear import SparseLinear

    rng = np.random.RandomState(5)
    m, n, b = 64, 96, 32
    w0 = rng.randn(m, n).astype(np.float32)
    topo, _ = topology_from_dense(w0, density=0.25)
    layer = SparseLinear(topology=topo, use_bias=True, layout=layout)

    x = rng.randn(b, n).astype(np.float32)
    w_true = rng.randn(m, n).astype(np.float32) * 0.3
    y_true = x @ w_true.T

    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx = optax.adam(3e-2)
    opt_state = tx.init(variables["params"])

    def make_step(lyr):
        @jax.jit
        def step(v, opt_state, x, y):
            def loss_fn(p):
                pred = lyr.apply({"params": p}, x)
                return jnp.mean((pred - y) ** 2), pred

            (l, pred), g = jax.value_and_grad(loss_fn, has_aux=True)(
                v["params"])
            upd, opt_state = tx.update(g, opt_state, v["params"])
            return {"params": optax.apply_updates(v["params"], upd)}, \
                opt_state, l, pred
        return step

    step = make_step(layer)
    for _ in range(60):
        variables, opt_state, loss0, pred = step(
            variables, opt_state, jnp.asarray(x), jnp.asarray(y_true))

    # dense grad at the update point (one host outer product)
    gy = 2.0 / (b * m) * (np.asarray(pred) - y_true)
    dg = dense_linear_grad(x, gy)

    mu, nu = opt_state[0].mu, opt_state[0].nu
    new_layer, variables, (mu_v, nu_v) = rigl_update_linear(
        layer, variables, dg, fraction=0.2,
        opt_values=[mu["values"], nu["values"]])
    assert new_layer.topology.nnz == topo.nnz
    assert np.asarray(variables["params"]["values"]).shape == \
        np.asarray(mu["values"]).shape  # buffer shapes survived

    # splice remapped moments back into the optimizer state
    adam = opt_state[0]._replace(mu=dict(mu, values=jnp.asarray(mu_v)),
                                 nu=dict(nu, values=jnp.asarray(nu_v)))
    opt_state = (adam,) + tuple(opt_state[1:])

    step2 = make_step(new_layer)
    losses = []
    for _ in range(60):
        variables, opt_state, l, _ = step2(
            variables, opt_state, jnp.asarray(x), jnp.asarray(y_true))
        losses.append(float(l))
    assert losses[-1] < float(loss0)          # training keeps improving
    assert np.isfinite(losses).all()


def test_rigl_update_moe_shared_topology():
    """MoE connectivity update: shared expert topologies evolve on
    aggregated criteria; per-expert panel params + moments keep shapes;
    surviving positions carry their values; the new module applies."""
    import jax
    from sputnik_tpu.models.moe import SparseMoE
    from sputnik_tpu.training.sparsity import rigl_update_moe

    rng = np.random.RandomState(0)
    h, f, E = 32, 48, 4
    ti = st.SparseTopology.from_dense_mask(
        (rng.rand(f, h) < 0.4).astype(np.float32))
    to = st.SparseTopology.from_dense_mask(
        (rng.rand(h, f) < 0.4).astype(np.float32))
    moe = SparseMoE(topo_in=ti, topo_out=to, num_experts=E, top_k=1)
    x = jnp.asarray(rng.randn(2, 8, h).astype(np.float32))
    variables = moe.init(jax.random.PRNGKey(0), x)

    gd_in = rng.randn(E, f, h).astype(np.float32)
    gd_out = rng.randn(h, f).astype(np.float32)      # pre-aggregated form
    mu = {k: np.asarray(v) * 0 + 1.0
          for k, v in variables["params"].items()
          if k.startswith("w_")}
    new_moe, new_vars, (mu2,) = rigl_update_moe(
        moe, variables, gd_in, gd_out, fraction=0.25, opt_values=[mu])

    assert new_moe.topo_in.nnz == ti.nnz
    assert new_moe.topo_in.nnz_pad == ti.nnz_pad
    assert new_moe.topo_out.nnz == to.nnz
    p0, p1 = variables["params"], new_vars["params"]
    assert p1["w_in_values"].shape == p0["w_in_values"].shape
    assert p1["w_out_values"].shape == p0["w_out_values"].shape

    # surviving positions carry their per-expert values
    old_flat = moe.flat_values(p0["w_in_values"], "in")
    new_flat = new_moe.flat_values(p1["w_in_values"], "in")
    okeys = (ti.row_ids[: ti.nnz].astype(np.int64) * ti.n
             + ti.column_indices[: ti.nnz])
    nt = new_moe.topo_in
    nkeys = (nt.row_ids[: nt.nnz].astype(np.int64) * nt.n
             + nt.column_indices[: nt.nnz])
    common, oi, nix = np.intersect1d(okeys, nkeys, return_indices=True)
    assert len(common) > 0.5 * ti.nnz
    np.testing.assert_allclose(new_flat[:, nix], old_flat[:, oi],
                               rtol=1e-6)
    # moments remapped: carried slots keep 1.0, grown slots are 0
    mu_flat = new_moe.flat_values(mu2["w_in_values"], "in")
    np.testing.assert_allclose(mu_flat[:, nix], 1.0, rtol=1e-6)
    grown = np.setdiff1d(np.arange(nt.nnz), nix)
    if len(grown):
        np.testing.assert_allclose(mu_flat[:, grown], 0.0, atol=1e-9)

    y = new_moe.apply(new_vars, x)
    assert np.isfinite(np.asarray(y)).all()


def test_block_random_mask_and_topology():
    from sputnik_tpu.patterns import block_random_mask, block_random_topology
    from sputnik_tpu.training.sparsity import block_occupancy

    m = block_random_mask(256, 512, 64, 128, density=0.25, seed=0)
    assert m.shape == (256, 512)
    # balanced: every block-row has round(0.25 * 4) = 1 occupied block
    occ = m.reshape(4, 64, 4, 128).max(axis=(1, 3))
    assert (occ.sum(axis=1) == 1).all()
    # whole tiles on or off
    per_tile = m.reshape(4, 64, 4, 128).sum(axis=(1, 3))
    assert set(np.unique(per_tile)) <= {0.0, 64.0 * 128}

    topo = block_random_topology(256, 512, 64, 128, density=0.25, seed=0)
    bo = block_occupancy(topo, 64, 128)
    assert set(np.unique(bo)) <= {0, 64 * 128}
    assert topo.nnz == int(m.sum())

    # unbalanced draws the global count
    mu_ = block_random_mask(256, 256, 64, 64, density=0.5, seed=1,
                            balanced=False)
    occ_u = mu_.reshape(4, 64, 4, 64).max(axis=(1, 3))
    assert occ_u.sum() == round(0.5 * 16)

    # crop: non-divisible dims still work
    mc = block_random_mask(100, 130, 64, 128, density=0.5, seed=2)
    assert mc.shape == (100, 130)


def test_block_rigl_update_preserves_block_structure():
    from sputnik_tpu.patterns import block_random_topology
    from sputnik_tpu.training.sparsity import (block_occupancy,
                                               block_rigl_update,
                                               remap_values)

    rng = np.random.RandomState(0)
    bm, bk = 16, 128
    topo = block_random_topology(128, 512, bm, bk, density=0.5, seed=3)
    vals = rng.randn(topo.nnz_pad).astype(np.float32)
    vals[topo.nnz:] = 0.0
    g = rng.randn(128, 512).astype(np.float32)

    new, new_vals = block_rigl_update(topo, vals, g, bm=bm, bk=bk,
                                      fraction=0.25)
    assert new.nnz == topo.nnz and new.nnz_pad == topo.nnz_pad
    occ = block_occupancy(new, bm, bk)
    assert set(np.unique(occ)) <= {0, bm * bk}
    # grown tiles: zero values; survivors carry values over
    ok = (topo.row_ids[:topo.nnz].astype(np.int64) * topo.n
          + topo.column_indices[:topo.nnz])
    nk = (new.row_ids[:new.nnz].astype(np.int64) * new.n
          + new.column_indices[:new.nnz])
    common, oi, ni = np.intersect1d(ok, nk, return_indices=True)
    np.testing.assert_allclose(new_vals[:new.nnz][ni], vals[:topo.nnz][oi])
    grown = np.setdiff1d(np.arange(new.nnz), ni)
    assert len(grown) > 0
    np.testing.assert_allclose(new_vals[:new.nnz][grown], 0.0)

    # dropped tiles were the smallest-|value| ones: surviving-original
    # tile scores all >= max dropped score
    occ0 = block_occupancy(topo, bm, bk)
    mbb, kbb = occ0.shape
    bi = topo.row_ids[:topo.nnz].astype(np.int64) // bm
    bj = topo.column_indices[:topo.nnz].astype(np.int64) // bk
    score = np.zeros((mbb, kbb))
    np.add.at(score, (bi, bj), np.abs(vals[:topo.nnz]))
    kept_orig = (occ0 > 0) & (occ > 0)
    dropped = (occ0 > 0) & (occ == 0)
    assert score[kept_orig].min() >= score[dropped].max()

    # element-random topology rejected
    import sputnik_tpu as st
    el = st.SparseTopology.from_dense_mask(
        (rng.rand(128, 512) < 0.3).astype(np.float32))
    with pytest.raises(ValueError):
        block_rigl_update(el, rng.randn(el.nnz_pad).astype(np.float32), g,
                          bm=bm, bk=bk)
    with pytest.raises(ValueError):
        block_rigl_update(topo, vals, g[:100], bm=bm, bk=bk)


def test_rigl_update_moe_block_mode():
    from sputnik_tpu.models.moe import SparseMoE
    from sputnik_tpu.patterns import block_random_topology
    from sputnik_tpu.training.sparsity import (block_occupancy,
                                               rigl_update_moe)

    rng = np.random.RandomState(1)
    h, f, E = 64, 128, 2
    bm, bk = 16, 64
    ti = block_random_topology(f, h, bm, bk, density=0.5, seed=0)
    to = block_random_topology(h, f, bm, bk, density=0.5, seed=1)
    moe = SparseMoE(topo_in=ti, topo_out=to, num_experts=E)
    x = jnp.asarray(rng.randn(2, 8, h).astype(np.float32))
    variables = moe.init(jax.random.PRNGKey(0), x)
    gd_in = rng.randn(E, f, h).astype(np.float32)
    gd_out = rng.randn(E, h, f).astype(np.float32)

    new_moe, new_vars, _ = rigl_update_moe(
        moe, variables, gd_in, gd_out, fraction=0.25, block=(bm, bk))
    assert new_moe.topo_in.nnz == ti.nnz
    occ = block_occupancy(new_moe.topo_in, bm, bk)
    assert set(np.unique(occ)) <= {0, bm * bk}
    y = new_moe.apply(new_vars, x)
    assert np.isfinite(np.asarray(y)).all()
