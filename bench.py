"""Headline benchmark: CSR SpMM at M=N=K=4096, d=0.1 (fp32 values).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published Sputnik SpMM time for the same config on
A100 — 4.023627 ms (`/root/reference/README.md:54`, recorded in BASELINE.md).
``vs_baseline`` is the speedup ratio (baseline_ms / ours; > 1 means faster
than the reference on its own headline benchmark).

Timing method: the device queue is fed N back-to-back iterations and the run
ends with a host fetch of a dependent scalar (``block_until_ready`` does not
actually block through the remote-TPU tunnel). Per-iteration time is the
slope between two chain lengths, which cancels dispatch/tunnel overhead.

Env knobs:
  BENCH_SIZE     (default 4096)   matrix dimension
  BENCH_DENSITY  (default 0.1)
  BENCH_BACKEND  (default auto)   auto | xla | pallas
"""

import json
import os
import time

import numpy as np

BASELINE_MS = 4.023627  # Sputnik, A100, 4096^3 d=0.1 (README.md:54)


def _timed_chain(fn, args, iters: int) -> float:
    """Enqueue ``iters`` calls then fetch a scalar; returns seconds."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))  # host fetch -> true completion barrier
    return time.perf_counter() - t0


def main():
    size = int(os.environ.get("BENCH_SIZE", 4096))
    density = float(os.environ.get("BENCH_DENSITY", 0.1))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    import jax
    import jax.numpy as jnp

    import sputnik_tpu as st

    st.set_backend(backend)

    rng = np.random.RandomState(0)
    mask = rng.rand(size, size) < density
    mat = st.SparseMatrix(mask.astype(np.float32) * rng.randn(size, size))
    topo = mat.topology

    values = jnp.asarray(mat.values)
    dense = jnp.asarray(rng.randn(size, size).astype(np.float32))

    fn = jax.jit(lambda v, d: st.spmm(topo, v, d))
    float(jnp.sum(fn(values, dense)[0]))  # compile + warmup

    n_lo, n_hi = 10, 40
    t_lo = min(_timed_chain(fn, (values, dense), n_lo) for _ in range(3))
    t_hi = min(_timed_chain(fn, (values, dense), n_hi) for _ in range(3))
    ms = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3

    print(json.dumps({
        "metric": f"spmm_{size}x{size}x{size}_d{density}_time",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
