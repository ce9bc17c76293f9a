"""utils: profiling roofline model + checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sputnik_tpu as st
from sputnik_tpu.models import SparseLinear
from sputnik_tpu.ops import panel_api as P


def test_roofline_sane():
    from sputnik_tpu.utils.profiling import roofline

    rng = np.random.RandomState(0)
    A = ((rng.rand(256, 256) < 0.2) * rng.randn(256, 256)).astype(np.float32)
    spec = P.PanelSpec(st.SparseMatrix(A).topology)
    r = roofline(spec, 256)
    assert r["speed_of_light_ms"] > 0
    assert 0 < r["block_occupancy"] <= 1
    assert 0 < r["useful_flop_fraction"] <= 1
    assert r["flops"] >= 2 * st.SparseMatrix(A).topology.nnz * 256


def test_measure_runs_on_cpu():
    from sputnik_tpu.utils.profiling import measure

    f = jax.jit(lambda x: x * 2.0)
    ms = measure(f, jnp.ones((128, 128)), iters_lo=2, iters_hi=6, repeats=1)
    assert ms >= 0


def test_csr_export_import_roundtrip():
    from sputnik_tpu.utils.checkpoint import export_csr, import_csr

    rng = np.random.RandomState(1)
    w = ((rng.rand(48, 64) < 0.3) * rng.randn(48, 64)).astype(np.float32)
    layer = SparseLinear.from_mask(w != 0)
    vp = layer.pack_dense(w)
    blob = export_csr(layer, vp)
    back = import_csr(layer, blob)
    np.testing.assert_allclose(back, vp)
    # portable across layouts: reload into a csr-layout layer
    layer_csr = SparseLinear(topology=layer.topology, layout="csr")
    flat = import_csr(layer_csr, blob)
    np.testing.assert_allclose(layer_csr.unpack_dense(flat), w)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sputnik_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    rng = np.random.RandomState(2)
    w = ((rng.rand(32, 32) < 0.4) * rng.randn(32, 32)).astype(np.float32)
    layer = SparseLinear.from_mask(w != 0)
    x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    restored = restore_checkpoint(path, params)
    got = layer.apply(restored, x)
    want = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_orbax_restore_sharded(tmp_path):
    """Restore a host-saved checkpoint directly into a mesh-sharded
    layout (the multi-chip resume path): pass `like` leaves carrying
    NamedShardings and orbax places each shard on its device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sputnik_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    rng = np.random.RandomState(3)
    tree = {"w": rng.randn(16, 32).astype(np.float32),
            "b": rng.randn(32).astype(np.float32)}
    path = str(tmp_path / "ckpt_sharded")
    save_checkpoint(path, tree)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    like = {
        "w": jax.ShapeDtypeStruct(
            (16, 32), np.float32,
            sharding=NamedSharding(mesh, P("dp", None))),
        "b": jax.ShapeDtypeStruct(
            (32,), np.float32, sharding=NamedSharding(mesh, P())),
    }
    restored = restore_checkpoint(path, like)
    assert restored["w"].sharding == like["w"].sharding
    np.testing.assert_allclose(np.asarray(restored["w"]), tree["w"])
    np.testing.assert_allclose(np.asarray(restored["b"]), tree["b"])


def test_csr_export_import_preserves_dtype():
    """bf16 serving params must round-trip bf16 (forcing f32 doubled
    decode weight traffic and changed the jit signature on restore)."""
    import jax.numpy as jnp

    from sputnik_tpu.models.linear import SparseLinear
    from sputnik_tpu.utils.checkpoint import export_csr, import_csr

    rng = np.random.RandomState(11)
    W = ((rng.rand(32, 48) < 0.4) * rng.randn(32, 48)).astype(np.float32)
    layer = SparseLinear.from_mask(W != 0)
    vals16 = jnp.asarray(layer.pack_dense(W), jnp.bfloat16)
    blob = export_csr(layer, vals16)
    assert np.asarray(blob["values"]).dtype == np.asarray(vals16).dtype
    back = import_csr(layer, blob)
    assert back.dtype == np.asarray(vals16).dtype
    np.testing.assert_array_equal(np.asarray(back),
                                  np.asarray(vals16))


def test_stacked_panel_preserves_dtype():
    import jax.numpy as jnp
    import sputnik_tpu as st
    from sputnik_tpu.parallel import RowPartition

    rng = np.random.RandomState(12)
    A = ((rng.rand(64, 64) < 0.3) * rng.randn(64, 64)).astype(np.float32)
    mat = st.SparseMatrix(A)
    part = RowPartition(mat.topology, 2, bm=16)
    vals16 = np.asarray(jnp.asarray(mat.values, jnp.bfloat16))
    panels = part.stacked_panel(vals16, 16, 16)
    assert panels.dtype == vals16.dtype


def test_autotune_sweep_cache(tmp_path, monkeypatch):
    """Generic sweep: caches the winner keyed by candidate list, skips
    failing candidates, re-runs when candidates change."""
    from sputnik_tpu.utils import autotune

    monkeypatch.setenv("SPUTNIK_AUTOTUNE_CACHE",
                       str(tmp_path / "at.json"))
    calls = []

    def timer(c):
        calls.append(c)
        if c == "bad":
            raise RuntimeError("illegal tiling")
        return {"a": 3.0, "b": 1.0, "c": 2.0}[c]

    best, table = autotune.sweep("op", "k1", ["a", "b", "bad", "c"], timer)
    assert best == "b" and len(calls) == 4
    assert "'bad':error" in table
    # cached: no new timing calls
    best2, _ = autotune.sweep("op", "k1", ["a", "b", "bad", "c"], timer)
    assert best2 == "b" and len(calls) == 4
    # changed candidate list -> re-sweep
    best3, _ = autotune.sweep("op", "k1", ["a", "b"], timer)
    assert best3 == "b" and len(calls) == 6


def test_autotune_spmm_fallback_off_tpu():
    """Off-TPU there is nothing meaningful to time: fall back to the
    hand-measured default_block."""
    import sputnik_tpu as st
    from sputnik_tpu.ops import panel_api as P
    from sputnik_tpu.utils import autotune

    topo = st.SparseTopology.from_dense_mask(
        (np.random.RandomState(0).rand(256, 256) < 0.3).astype(
            np.float32))
    assert autotune.best_spmm_tiles(topo) == P.default_block(topo)


def test_autotune_shape_class_buckets():
    from sputnik_tpu.utils import autotune

    a = autotune.shape_class(4096, 4096, 0.1, jnp.float32)
    b = autotune.shape_class(4100, 4000, 0.11, jnp.float32)
    c = autotune.shape_class(8192, 4096, 0.1, jnp.float32)
    assert a == b and a != c


def test_moe_checkpoint_csr_roundtrip():
    """MoE expert-bank values export to tiling-independent flat CSR and
    import back bit-identically, dtype preserved (bf16 serving weights)."""
    import jax

    from sputnik_tpu.models.moe import SparseMoE
    from sputnik_tpu.patterns import block_random_topology
    from sputnik_tpu.utils.checkpoint import export_moe_csr, import_moe_csr

    rng = np.random.RandomState(0)
    h, f, E = 64, 128, 3
    ti = block_random_topology(f, h, 16, 64, density=0.5, seed=0)
    to = block_random_topology(h, f, 16, 64, density=0.5, seed=1)
    moe = SparseMoE(topo_in=ti, topo_out=to, num_experts=E)
    x = jnp.asarray(rng.randn(2, 8, h).astype(np.float32))
    params = moe.init(jax.random.PRNGKey(0), x)["params"]

    # bf16 serving weights must stay bf16 through the round trip
    p16 = dict(params,
               w_in_values=jnp.asarray(params["w_in_values"],
                                       jnp.bfloat16),
               w_out_values=jnp.asarray(params["w_out_values"],
                                        jnp.bfloat16))
    blob = export_moe_csr(moe, p16)
    assert blob["w_in"]["values"].shape == (E, ti.nnz)
    assert blob["w_in"]["values"].dtype == jnp.bfloat16
    back = import_moe_csr(moe, blob)
    np.testing.assert_array_equal(np.asarray(back["w_in_values"]),
                                  np.asarray(p16["w_in_values"]))
    np.testing.assert_array_equal(np.asarray(back["w_out_values"]),
                                  np.asarray(p16["w_out_values"]))

    # wrong expert count / topology rejected
    moe2 = SparseMoE(topo_in=ti, topo_out=to, num_experts=E + 1)
    with pytest.raises(ValueError):
        import_moe_csr(moe2, blob)


def test_autotune_cached_best_readonly(tmp_path, monkeypatch):
    """cached_best applies a stored sweep winner without ever sweeping,
    tolerates missing/stale entries, and shares keys with the sweeps."""
    import json

    from sputnik_tpu.utils import autotune

    path = tmp_path / "autotune.json"
    monkeypatch.setenv("SPUTNIK_AUTOTUNE_CACHE", str(path))
    autotune._memo["data"] = None   # drop any previously memoized file

    cands = autotune.FLASH_TILE_CANDIDATES
    key = autotune.flash_key(2048, 8, 64, 0.5, True)
    assert autotune.cached_best("flash", key, cands) is None  # no file

    dev = autotune._device_kind()
    path.write_text(json.dumps({
        f"{dev}|flash|{key}": {"best": repr((512, 1024)), "table": {}},
        f"{dev}|bank|stale": {"best": "(7, 7)", "table": {}},
    }))
    autotune._memo["data"] = None
    assert autotune.cached_best("flash", key, cands) == (512, 1024)
    # a winner no longer in the candidate list is ignored, not crashed on
    assert autotune.cached_best("bank", "stale", cands) is None

    # bank key derivation is stable and shape-classed
    import sputnik_tpu as st
    topo = st.SparseTopology.from_dense_mask(
        (np.random.RandomState(0).rand(256, 128) < 0.25).astype(
            np.float32))
    k1 = autotune.bank_key(topo, 8, jnp.float32)
    assert "m256" in k1 and "_E8" in k1

    # off-TPU the bank tile table falls back to the hand formula
    from sputnik_tpu.models.moe import _bank_tiles
    assert _bank_tiles(topo, 8) == (128, 128)
    autotune._memo["data"] = None


def test_elastic_recovers_from_mid_run_failure(tmp_path):
    """run_elastic: a step that blows up mid-run rolls back to the last
    checkpoint and the loop completes with the same result as a clean
    run; restart budget and failure accounting enforced."""
    from sputnik_tpu.utils.elastic import (device_healthy, run_elastic)

    assert device_healthy(timeout_s=60.0)  # CPU backend: trivially alive

    calls = {"n": 0}

    def step(state, t):
        calls["n"] += 1
        if t == 7 and calls["n"] == 8:      # fail ONCE at step 7
            raise RuntimeError("injected device loss")
        return {"w": state["w"] + jnp.ones_like(state["w"]) * (t + 1)}

    s0 = {"w": jnp.zeros((4,), jnp.float32)}
    res = run_elastic(step, s0, 10, checkpoint_every=5,
                      checkpoint_dir=str(tmp_path / "a"), max_restarts=2)
    assert res.step == 10 and res.restarts == 1
    assert len(res.failures) == 1 and "injected" in res.failures[0][1]
    # clean-run equivalence: sum of 1..10
    np.testing.assert_allclose(np.asarray(res.state["w"]),
                               np.full(4, 55.0))

    # exhausted budget re-raises
    def always_fail(state, t):
        if t == 2:
            raise RuntimeError("hard down")
        return state

    with pytest.raises(RuntimeError):
        run_elastic(always_fail, s0, 5, checkpoint_every=2,
                    checkpoint_dir=str(tmp_path / "b"), max_restarts=1)
