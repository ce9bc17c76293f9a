"""On-chip tile autotuner with a persistent host-side cache.

The tile tables in the codebase (``panel_api.default_block``, the banded
(512, 128) special case, ``transformer.flash_tiles``) are hand-measured
defaults — right for the shapes they were swept at, and silently wrong
as kernels evolve or new shape regimes appear (the (512,1024) vs
(1024,1024) flash-tile reversal took three sessions to settle). This
module replaces trust with measurement: a small on-chip sweep per
(device, op, shape-class, density-class, dtype), cached in a JSON file
so each configuration is paid for ONCE per machine.

Usage::

    from sputnik_tpu.utils import autotune
    bm, bk = autotune.best_spmm_tiles(topo, dtype=jnp.bfloat16)
    spec = PanelSpec(topo, bm=bm, bk=bk)

or generically::

    best, table = autotune.sweep("myop", key, candidates, build_and_time)

``bench.py`` exposes the sweep via ``BENCH_AUTOTUNE=1`` and records
tuned-vs-default in benchmarks/RESULTS.md.

Cache location: ``$SPUTNIK_AUTOTUNE_CACHE`` or
``~/.cache/sputnik_tpu/autotune.json``. Timing uses the chain-length
slope method (``utils.profiling.measure``) — the only method that
survives the remote-TPU tunnel. Entries record the measured ms per
candidate, so a stale cache is inspectable and deletable per key.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from . import profiling

__all__ = ["sweep", "cached_best", "best_spmm_tiles", "best_flash_tiles",
           "best_bank_tiles", "flash_key", "bank_key", "cache_path",
           "shape_class", "SPMM_TILE_CANDIDATES",
           "FLASH_TILE_CANDIDATES", "BANK_TILE_CANDIDATES"]

# candidate (bm, bk) panel tiles — the measured winners across the
# RESULTS.md sweeps plus their neighbours; bn is derived per call width
SPMM_TILE_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (128, 128), (256, 128), (512, 128), (512, 512),
    (1024, 128), (1024, 512), (2048, 1024),
)


def cache_path() -> str:
    p = os.environ.get("SPUTNIK_AUTOTUNE_CACHE")
    if p:
        return p
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "sputnik_tpu", "autotune.json")


_memo: dict = {"path": None, "data": None}


def _load() -> dict:
    if _memo["data"] is not None and _memo["path"] == cache_path():
        return _memo["data"]
    try:
        with open(cache_path()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    _memo["path"], _memo["data"] = cache_path(), data
    return data


def _store(data: dict) -> None:
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _memo["path"], _memo["data"] = path, data


def cached_best(op: str, key: str, candidates: Sequence):
    """READ-ONLY cache lookup: the stored winner for ``(device, op,
    key)`` if it is still one of ``candidates``, else None. Never runs a
    sweep — this is the hook the default tile tables consult on TPU so a
    paid-for sweep applies automatically while un-swept configurations
    keep the hand-measured fallback."""
    ent = _load().get(f"{_device_kind()}|{op}|{key}")
    if not ent:
        return None
    reprs = [repr(c) for c in candidates]
    if ent.get("best") in reprs:
        return candidates[reprs.index(ent["best"])]
    return None


def _device_kind() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


def _bucket(x: float, base: float = 2.0) -> float:
    """Round to the nearest power of ``base`` (shape/density classing)."""
    if x <= 0:
        return 0.0
    return float(base ** round(np.log(x) / np.log(base)))


def shape_class(m: int, n: int, density: float, dtype) -> str:
    """Coarse key: shapes within ~sqrt(2)x and densities within ~2x of
    each other share a tuning entry (tile optima move slowly)."""
    import jax.numpy as jnp

    return (f"m{int(_bucket(m))}_n{int(_bucket(n))}"
            f"_d{_bucket(max(density, 1e-4))}"
            f"_{jnp.dtype(dtype).name}")


def sweep(op: str, key: str,
          candidates: Sequence,
          time_candidate: Callable[[object], Optional[float]],
          *, force: bool = False) -> Tuple[object, Dict[str, float]]:
    """Generic cached sweep.

    ``time_candidate(cand)`` returns ms for one candidate (built + run
    on the current device), or None to skip it (illegal config). The
    winner and the full table are cached under
    ``(device, op, key)`` and returned as ``(best_candidate, table)``.
    Candidates are identified in the cache by ``repr(cand)``; the cached
    winner is re-matched against the CURRENT candidate list, so adding
    new candidates re-runs the sweep.
    """
    cache = _load()
    ck = f"{_device_kind()}|{op}|{key}"
    ent = cache.get(ck)
    reprs = [repr(c) for c in candidates]
    if ent and not force and ent.get("candidates") == reprs:
        best = candidates[reprs.index(ent["best"])]
        return best, ent["table"]

    table: Dict[str, float] = {}
    for cand in candidates:
        try:
            ms = time_candidate(cand)
        except Exception as e:            # illegal tiling, OOM, ...
            table[repr(cand)] = float("nan")
            table[repr(cand) + ":error"] = str(e)[:120]
            continue
        if ms is not None:
            table[repr(cand)] = float(ms)
    valid = {k: v for k, v in table.items()
             if isinstance(v, float) and np.isfinite(v)}
    if not valid:
        raise RuntimeError(f"autotune sweep {op}/{key}: no candidate ran")
    best_repr = min(valid, key=valid.get)
    cache[ck] = {"best": best_repr, "table": table,
                 "candidates": reprs}
    _store(cache)
    return candidates[reprs.index(best_repr)], table


def best_spmm_tiles(topo, *, dtype=None, q: int = 1024,
                    candidates: Iterable = SPMM_TILE_CANDIDATES,
                    force: bool = False) -> Tuple[int, int]:
    """Measured-best ``(bm, bk)`` for ``panel_api.spmm`` on this
    topology's shape class (cached per device). Falls back to
    ``panel_api.default_block`` off-TPU (interpret-mode times are
    meaningless)."""
    import jax
    import jax.numpy as jnp

    from ..ops import panel_api as P

    dtype = dtype or jnp.float32
    if jax.devices()[0].platform != "tpu":
        return P.default_block(topo)

    density = topo.nnz / max(topo.m * topo.n, 1)
    key = shape_class(topo.m, topo.n, density, dtype)
    rng = np.random.RandomState(0)
    vals = rng.randn(topo.nnz_pad).astype(np.float32)
    dense = jnp.asarray(rng.randn(topo.n, q).astype(np.float32)).astype(
        dtype)

    def time_candidate(cand):
        bm, bk = cand
        if bm > topo.m * 2 or bk > topo.n * 2:
            return None
        spec = P.PanelSpec(topo, bm=bm, bk=bk)
        panel = jnp.asarray(
            P.values_to_panel_np(topo, vals, bm, bk)).astype(dtype)
        fn = jax.jit(lambda p, d: P.spmm(spec, p, d))
        return profiling.measure(fn, panel, dense,
                                 iters_lo=5, iters_hi=15, repeats=2)

    best, _ = sweep("spmm", key, list(candidates), time_candidate,
                    force=force)
    return best


FLASH_TILE_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (512, 512), (512, 1024), (1024, 1024), (1024, 512), (2048, 1024),
    (256, 512),
)


def flash_key(s: int, heads: int, hd: int, density: float,
              backward: bool) -> str:
    """Cache key for the flash-tile sweep — shared by the sweep and the
    read-only auto-apply path (``models.transformer``), so they can never
    drift apart."""
    return (f"s{int(_bucket(s))}_h{heads}_hd{hd}"
            f"_d{_bucket(max(density, 1e-4))}"
            f"_{'train' if backward else 'fwd'}")


def best_flash_tiles(mask_topology, heads: int, *, backward: bool = True,
                     hd: int = 64,
                     candidates: Iterable = FLASH_TILE_CANDIDATES,
                     force: bool = False) -> Tuple[int, int]:
    """Measured-best ``(bm, bk)`` for the fused sparse-flash attention on
    this mask family (cached per device + shape class). ``backward=True``
    optimizes the full fwd+grad (training); False, forward only
    (prefill/serving). Off-TPU falls back to the hand-measured
    ``transformer.flash_tiles`` default. Pass the result as
    ``SparseTransformer(flash_block=bm, flash_block_k=bk)`` (or the
    corresponding ``SparseCoreAttention`` fields)."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer import flash_tiles
    from ..ops import batched_panel as bp
    from ..ops.fused_attention import fused_sparse_attention

    mt = mask_topology
    s = mt.m
    if jax.devices()[0].platform != "tpu":
        return flash_tiles(s)

    t0 = mt.topologies[0]
    density = t0.nnz / max(t0.m * t0.n, 1)
    key = flash_key(s, heads, hd, density, backward)
    rng = np.random.RandomState(0)
    R = mt.b * heads
    mk = lambda: jnp.asarray(                              # noqa: E731
        rng.randn(R, s, hd).astype(np.float32))
    q, k, v = mk(), mk(), mk()

    def time_candidate(cand):
        bm, bk = cand
        if bm > 2 * s or bk > 2 * s:
            return None
        spec = bp.BatchedPanelSpec.from_many_mask(mt, heads=heads,
                                                  bm=bm, bk=bk)
        if backward:
            fn = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
                fused_sparse_attention(spec, a, b, c) ** 2),
                argnums=(0, 1, 2)))
        else:
            fn = jax.jit(
                lambda a, b, c: fused_sparse_attention(spec, a, b, c))
        return profiling.measure(fn, q, k, v, iters_lo=5, iters_hi=15,
                                 repeats=2)

    best, _ = sweep("flash", key, list(candidates), time_candidate,
                    force=force)
    return best


BANK_TILE_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (128, 128), (512, 512), (1024, 512), (512, 1024), (1024, 1024),
)


def bank_key(topo, n_rep: int, dtype) -> str:
    density = topo.nnz / max(topo.m * topo.n, 1)
    return (f"{shape_class(topo.m, topo.n, density, dtype)}"
            f"_E{int(_bucket(n_rep))}")


def best_bank_tiles(topo, n_rep: int, *, dtype=None, q: int = 0,
                    candidates: Iterable = BANK_TILE_CANDIDATES,
                    force: bool = False) -> Tuple[int, int]:
    """Measured-best ``(bm, bk)`` for the MoE expert-bank batched spmm
    (``batched_panel.spmm_bh`` with ``n_rep`` replicated topologies —
    ``models/moe._bank_spec``). Off-TPU falls back to the hand table
    (``models.moe._bank_tiles``). ``q``: dense width (defaults to the
    bank's own row count, the MoE shape). The winner is auto-applied by
    ``_bank_tiles`` on TPU via :func:`cached_best`."""
    import jax
    import jax.numpy as jnp

    from ..models.moe import _bank_tiles
    from ..ops import batched_panel as bp

    dtype = dtype or jnp.float32
    if jax.devices()[0].platform != "tpu":
        return _bank_tiles(topo)

    key = bank_key(topo, n_rep, dtype)
    q = q or max(128, min(1024, topo.m))
    rng = np.random.RandomState(0)
    dense = jnp.asarray(
        rng.randn(n_rep, topo.n, q).astype(np.float32)).astype(dtype)

    def time_candidate(cand):
        bm, bk = cand
        if bm > topo.m * 2 or bk > topo.n * 2:
            return None
        spec = bp.BatchedPanelSpec([topo], heads=n_rep, bm=bm, bk=bk)
        bv = topo.block(bm, bk)
        mask_p = np.zeros(spec.panel_shape, np.float32)
        mask_p[:, : bv.max_bpr] = np.asarray(bv.mask, np.float32)
        panels = jnp.asarray(
            (rng.randn(n_rep, *spec.panel_shape).astype(np.float32)
             * mask_p[None])).astype(dtype)
        fn = jax.jit(lambda p, d: bp.spmm_bh(spec, p, d))
        return profiling.measure(fn, panels, dense,
                                 iters_lo=5, iters_hi=15, repeats=2)

    best, _ = sweep("bank", key, list(candidates), time_candidate,
                    force=force)
    return best
