"""Profiling and roofline helpers.

Replaces the reference's ad-hoc ``torch.cuda.Event`` timing pairs
(``tests/test_attention.py:16-28``) with (a) a robust wall-clock measurement
that stays correct through asynchronous dispatch (including remote-TPU
tunnels where ``block_until_ready`` returns early — per-iteration time is
the slope between two enqueue-chain lengths ended by a host scalar fetch),
(b) ``jax.profiler`` trace capture, and (c) a per-topology roofline model
fed by the block panel's occupancy (``BlockView.block_density``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

__all__ = ["measure", "trace", "roofline", "CHIP_SPECS"]

# peak (HBM GB/s, bf16-matmul TFLOP/s) per chip kind substring
CHIP_SPECS = {
    "v5 lite": (819.0, 197.0),
    "v5e": (819.0, 197.0),
    "v5p": (2765.0, 459.0),
    "v4": (1228.0, 275.0),
    "v6": (1640.0, 918.0),
}


def measure(fn: Callable, *args, iters_lo: int = 10, iters_hi: int = 40,
            repeats: int = 3) -> float:
    """Milliseconds per call of an already-jitted ``fn(*args)``."""
    import jax
    import jax.numpy as jnp

    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]  # any pytree output
        float(jnp.sum(leaf.reshape(-1)[:8]))  # host fetch barrier
        return time.perf_counter() - t0

    chain(1)  # compile + warmup
    t_lo = min(chain(iters_lo) for _ in range(repeats))
    t_hi = min(chain(iters_hi) for _ in range(repeats))
    return max(t_hi - t_lo, 1e-9) / (iters_hi - iters_lo) * 1e3


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context; view with TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _chip_peaks() -> tuple:
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peaks in CHIP_SPECS.items():
        if key in kind:
            return peaks
    return (819.0, 197.0)  # conservative default


def roofline(spec, n_out: int, dtype_bytes: int = 4) -> Dict[str, float]:
    """Speed-of-light estimate for ``spmm(spec, panel, dense[n, n_out])``.

    Returns bytes/flops of the *block-touched* computation and the
    bandwidth/compute-bound time bounds on the current chip — the target
    the BASELINE asks kernels to sit within 10% of.
    """
    bv = spec.view
    hbm_gbs, tflops = _chip_peaks()
    touched = bv.num_blocks * bv.bm * bv.bk
    bytes_min = (touched + spec.topo.n * n_out + spec.topo.m * n_out
                 ) * dtype_bytes
    flops = 2.0 * touched * n_out
    bw_ms = bytes_min / (hbm_gbs * 1e9) * 1e3
    fl_ms = flops / (tflops * 1e12) * 1e3
    return {
        "bytes_min": float(bytes_min),
        "flops": float(flops),
        "bandwidth_ms": bw_ms,
        "compute_ms": fl_ms,
        "speed_of_light_ms": max(bw_ms, fl_ms),
        "block_occupancy": bv.block_density,
        "useful_flop_fraction": (
            2.0 * spec.topo.nnz * n_out / max(flops, 1.0)),
    }
