"""Shared backend predicates and padding helpers for the op layers.

Single source of truth for backend selection (``set_backend`` /
on-TPU detection) and tile-padding arithmetic — previously re-implemented
per module, which let the sharded layer's padding logic diverge (the
bn-divisor bug fixed in b47db48).
"""

from __future__ import annotations

import jax

__all__ = ["round_up", "on_tpu", "use_kernels", "interp", "tile_n",
           "trace_clean", "device_arrays"]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def trace_clean() -> bool:
    """True when not inside any JAX trace (safe to create + cache
    device arrays)."""
    try:
        from jax._src import core as _core

        return bool(_core.trace_state_clean())
    except Exception:
        return False


def device_arrays(obj, attr: str, build) -> dict:
    """Numpy metadata -> DEVICE arrays, cached as ``obj.<attr>``.

    ``build()`` returns the numpy dict (called only on a cache miss;
    non-ndarray entries are dropped). Device-resident metadata enters a
    surrounding ``jit`` as hoisted runtime buffers, not HLO literals —
    keeping compile payloads O(1) in topology size (the HTTP-413 /
    slow-compile gotcha; see ``fused_attention._flash_meta``). The
    cache is only populated outside a trace; tracing first still
    works, just without caching.
    """
    import numpy as _np

    import jax.numpy as jnp

    cached = getattr(obj, attr, None)
    if cached is not None:
        return cached
    dev = {k: jnp.asarray(v) for k, v in build().items()
           if isinstance(v, _np.ndarray)}
    if trace_clean():
        setattr(obj, attr, dev)
    return dev


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def use_kernels() -> bool:
    """Whether the Pallas kernels should serve this call (honours
    ``sputnik_tpu.set_backend``; 'auto' means kernels on real TPU only)."""
    from . import api as _api

    backend = _api.get_backend()
    if backend == "xla":
        return False
    if backend == "pallas":
        return True
    return on_tpu()


def interp() -> bool:
    """Run kernels in interpret mode (anywhere that isn't a real TPU)."""
    return not on_tpu()


def tile_n(q_pad: int, cap: int = 512) -> int:
    """Largest output-tile width <= cap that exactly divides ``q_pad``
    (a multiple of 128). A non-divisor would leave trailing column tiles
    unvisited — the Pallas grid is ``q_pad // bn``."""
    for bn in (cap, 256, 128):
        if bn <= cap and q_pad % bn == 0:
            return bn
    return 128


def vmem_request(*block_elems: int, itemsize: int = 4) -> int:
    """Scoped-VMEM request sized to the kernel's working set
    (double-buffered blocks + headroom), clamped to [32, 100] MB.

    Measured r5 (driver-shape panel chain, interleaved A/B): a blanket
    100 MB request is 1.8x SLOWER than a sized one on small-tile grids —
    Mosaic trades pipelining for the reservation. The 16 MB default is
    not an option either: it rejects the big-tile kernels on hardware
    only (the r4 MoE OOM class). Pass the per-block ELEMENT counts of
    the kernel's inputs, outputs, and scratches.
    """
    # 2.5x covers double buffering plus Mosaic's own stack/spill slop —
    # 2.0x measured 3 MB short on the fused backward's (1024,1024)
    # tiles on hardware (scoped-vmem OOM at 35.05 vs a 32 MB request)
    mb_ = int(2.5 * itemsize * sum(block_elems)) // (1024 * 1024) + 12
    return max(32, min(100, mb_)) * 1024 * 1024
