"""Backend dispatch for the flat-CSR (reference-parity) op surface.

Policy: the Pallas path is the production path on real TPUs; the XLA oracle
(`ops/xla_ops.py`) remains the default elsewhere (CPU tests run the kernels
explicitly in interpret mode instead — full-suite interpret execution would
be needlessly slow). ``sputnik_tpu.set_backend("pallas")`` forces the kernels
anywhere (using interpret mode off-TPU); ``set_backend("xla")`` forces the
oracle.

Large topologies are routed to Pallas even under "auto" on TPU because the
oracle's gather formulation materialises ``[nnz_pad, n]`` intermediates —
fine at test sizes, impossible at the benchmark's 4096^3 (27 GB).

Flat-call economics (r2 verdict #2): the reference's calling convention
passes CSR-ordered ``values[nnz]`` per call, but the kernels consume the MXU
block panel — and a 16.7M-element values->panel scatter costs ~12 ms on TPU
(benchmarks/RESULTS.md). Two fixes live here:

  * ONE tile-heuristic source: the flat path builds a ``PanelSpec`` (so
    ``panel_api.default_block`` + the bn heuristic govern both APIs; the
    stale local (512,512,512) table is gone), cached on the topology's
    block view.
  * a cross-call panel cache: eager flat calls (the reference-parity usage —
    torch ops are eager) with the SAME values array re-pay nothing; the
    scatter runs once per distinct values buffer. Keyed by object identity
    with a strong reference held in a small FIFO (an id can't be recycled
    while its object is alive), so repeated ``st.spmm(topo, w, x)`` over a
    fixed weight vector runs at panel speed. Traced values (inside a user
    ``jit``) can't be cached — the scatter stays in the trace, where XLA
    CSE's it across calls within one program instead.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp

from .. import _common

__all__ = ["supported", "spmm", "sddmm", "sparse_softmax", "spmm_bias_relu"]

_PANEL_CACHE_SLOTS = 8


def _interpret() -> bool:
    return not _common.on_tpu()


def supported(topo) -> bool:
    """Whether the Pallas path should serve this topology under "auto"."""
    if not _common.on_tpu():
        return False
    # Everything is supported via padding; tiny topologies stay on the
    # oracle (padding to 128x128 tiles would dominate).
    return topo.m * topo.n >= 128 * 128


def _flat_spec(topo):
    """The flat API's PanelSpec — default tiles from ``panel_api``
    (single heuristic source), cached on the topology's block view
    (the topology itself is __slots__-only)."""
    from .. import panel_api as P

    bm, bk = P.default_block(topo)
    bv = topo.block(bm, bk)
    spec = getattr(bv, "_flat_spec", None)
    if spec is None:
        spec = P.PanelSpec(topo, bm=bm, bk=bk)
        object.__setattr__(bv, "_flat_spec", spec)
    return spec


# id(values) -> (values, panel). Holding the values array strongly keeps its
# id from being recycled; FIFO eviction bounds the held memory to
# _PANEL_CACHE_SLOTS value/panel pairs.
_panel_cache: "OrderedDict[tuple, tuple]" = OrderedDict()


def _stream_target(spec, values):
    """bf16 operand streaming on real TPU at scale: halves HBM traffic and
    is numerically identical to the default-precision f32 matmul (the MXU
    truncates f32 operands to bf16 passes anyway). Off-TPU (interpret-mode
    tests) operands keep their dtype so kernel-vs-oracle comparisons stay
    exact. Returns the stream dtype or None."""
    t = spec.topo
    if (_common.on_tpu() and t.m >= 2048 and t.n >= 2048
            and values.dtype == jnp.float32):
        return jnp.bfloat16
    return None


def _values_panel(spec, values, stream_dt=None):
    """values[nnz] -> panel (optionally cast to ``stream_dt``), cached
    across eager calls per ORIGINAL values buffer.

    The cache key must be the buffer the CALLER passes: casting values
    first would mint a new array every call, miss every time, and re-pay
    the conversion (measured 127 ms/call at the headline size — the
    scatter indices alone are 67 MB of per-call host->device traffic)."""
    from .. import panel_api as P

    def build():
        p = P.values_to_panel(spec.topo, values, spec.bm, spec.bk)
        return p.astype(stream_dt) if stream_dt is not None else p

    # cache only immutable device arrays outside any trace (a traced value
    # has no stable identity; a numpy array can be mutated in place)
    if not _common.trace_clean() or not isinstance(values, jax.Array):
        return build()
    key = (id(spec), id(values), jnp.dtype(stream_dt).name
           if stream_dt is not None else None)
    hit = _panel_cache.get(key)
    # the entry must hold BOTH objects strongly and identity-check both:
    # an id() alone can be recycled after GC — a new PanelSpec landing at
    # a dead spec's address with the same values buffer would silently
    # return the dead topology's panel
    if hit is not None and hit[0] is spec and hit[1] is values:
        _panel_cache.move_to_end(key)
        return hit[2]
    panel = build()
    _panel_cache[key] = (spec, values, panel)
    while len(_panel_cache) > _PANEL_CACHE_SLOTS:
        _panel_cache.popitem(last=False)
    return panel


# id(dense) -> (dense, cast). Same identity-keyed discipline as the
# panel cache, but dense operands are usually TRANSIENT activations —
# a big slot count would pin pairs of large buffers in HBM long after
# the caller dropped them (the panel cache holds long-lived weights,
# where pinning is the point). Two slots cover the steady-state
# reuse pattern (same operand across back-to-back calls).
_CAST_CACHE_SLOTS = 2
# don't pin casts of huge one-shot activations: above this, a single
# eager call would keep ~4 large HBM buffers alive until FIFO eviction
_CAST_CACHE_MAX_BYTES = 64 * 1024 * 1024
_cast_cache: "OrderedDict[tuple, tuple]" = OrderedDict()


def flush_caches() -> None:
    """Drop the cross-call panel and cast caches (releases the pinned
    HBM buffers). Called by ``sputnik_tpu.set_backend``; safe any time —
    the caches repopulate on the next eager call."""
    _panel_cache.clear()
    _cast_cache.clear()
    _fn_cache.clear()


def _cast_cached(dense, stream_dt):
    if stream_dt is None or dense.dtype == stream_dt:
        return dense
    if not _common.trace_clean() or not isinstance(dense, jax.Array):
        return dense.astype(stream_dt)
    if dense.nbytes > _CAST_CACHE_MAX_BYTES:
        return dense.astype(stream_dt)
    key = (id(dense), jnp.dtype(stream_dt).name)
    hit = _cast_cache.get(key)
    if hit is not None and hit[0] is dense:
        _cast_cache.move_to_end(key)
        return hit[1]
    cast = dense.astype(stream_dt)
    _cast_cache[key] = (dense, cast)
    while len(_cast_cache) > _CAST_CACHE_SLOTS:
        _cast_cache.popitem(last=False)
    return cast


# (id(spec), stream, out_dt, epilogue) -> prebuilt jitted closure. The
# steady-state eager call must cost ONE jit dispatch on two array args —
# without this, every call re-enters _spmm_impl's static-argname
# machinery (~1-3 ms of host Python through the tunnel, and the noisy
# part of the r3 flat steady state; the jitted dense anchor dispatches
# the same way and measures a stable 0.7 ms).
_fn_cache: "OrderedDict[tuple, tuple]" = OrderedDict()


def _flat_fn(spec, stream, out_dt, epilogue):
    from .. import panel_api as P

    key = (id(spec), jnp.dtype(stream).name if stream else None,
           jnp.dtype(out_dt).name, epilogue)
    hit = _fn_cache.get(key)
    if hit is not None and hit[0] is spec:
        _fn_cache.move_to_end(key)
        return hit[1]
    if epilogue == "none":
        fn = jax.jit(lambda p, d: P._spmm_impl(spec, p, d).astype(out_dt))
    else:
        fn = jax.jit(lambda p, d, b: P._spmm_impl(
            spec, p, d, b, epilogue=epilogue).astype(out_dt))
    _fn_cache[key] = (spec, fn)
    while len(_fn_cache) > 4 * _PANEL_CACHE_SLOTS:
        _fn_cache.popitem(last=False)
    return fn


def spmm(topo, values, dense):
    spec = _flat_spec(topo)
    out_dt = jnp.promote_types(values.dtype, dense.dtype)
    stream = _stream_target(spec, values)
    panel = _values_panel(spec, values, stream)
    dense = _cast_cached(dense, stream)
    return _flat_fn(spec, stream, out_dt, "none")(panel, dense)


def spmm_bias_relu(topo, values, dense, bias, *, relu: bool = True):
    spec = _flat_spec(topo)
    out_dt = jnp.promote_types(values.dtype, dense.dtype)
    stream = _stream_target(spec, values)
    panel = _values_panel(spec, values, stream)
    dense = _cast_cached(dense, stream)
    ep = "bias_relu" if relu else "bias"
    return _flat_fn(spec, stream, out_dt, ep)(panel, dense, bias)


def sddmm(topo, lhs, rhs):
    # stays on 128-tiles: the flat contract returns CSR-ordered values, so
    # the panel->flat gather at the boundary (not the tile choice) bounds
    # this path at scale; panel-native callers use panel_api.sddmm.
    from . import bsr_sddmm

    return bsr_sddmm.bsr_sddmm(topo, lhs, rhs, interpret=_interpret())


def sparse_softmax(topo, values):
    from . import ell_softmax

    return ell_softmax.ell_softmax(topo, values, interpret=_interpret())
