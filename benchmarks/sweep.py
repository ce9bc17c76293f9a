"""SpMM sweep reproducing the reference's README benchmark table.

The reference publishes Sputnik-vs-cuSPARSE SpMM times on A100 for
M=N=K in {64, 4096} over densities {0.05..0.5}
(`/root/reference/README.md:33-55`, recorded in BASELINE.md). This harness
reruns the same grid on TPU through the framework's canonical panel path
and reports per-config: time, effective GFLOP/s (2*nnz*N useful flops),
speedup vs the reference's published Sputnik number, and the HBM roofline
fraction (useful-bytes / measured-time / peak-BW).

Usage:  python benchmarks/sweep.py [--sizes 64,4096] [--densities ...]
Writes a markdown table to stdout and JSON lines to benchmarks/results.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reference numbers: ms, A100, fp32 (README.md:39-55).
REFERENCE_MS = {
    (64, 0.5): 0.007468, (64, 0.25): 0.005868, (64, 0.2): 0.005615,
    (64, 0.15): 0.005206, (64, 0.1): 0.004922, (64, 0.05): 0.004506,
    (4096, 0.5): 13.047884, (4096, 0.25): 7.870807, (4096, 0.2): 6.065586,
    (4096, 0.15): 5.078734, (4096, 0.1): 4.023627, (4096, 0.05): 2.521871,
}

V5E_HBM_GBS = 819.0  # v5e peak HBM bandwidth
V5E_BF16_TFLOPS = 197.0


def timed_chain(fn, args, iters):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.reshape(-1)[:8]))
    return time.perf_counter() - t0


def bench_one(size, density):
    import jax
    import jax.numpy as jnp

    import sputnik_tpu as st
    from sputnik_tpu.ops import panel_api as P

    rng = np.random.RandomState(0)
    mask = rng.rand(size, size) < density
    mat = st.SparseMatrix(mask.astype(np.float32) * rng.randn(size, size))
    topo = mat.topology
    dense = jnp.asarray(rng.randn(size, size).astype(np.float32))

    # r2 tiles: (2048, 512, 1024) + bf16-streamed operands (f32 accumulate;
    # identical numerics to TPU default-precision f32) — see RESULTS.md
    bm, bk = (2048, 512) if size >= 2048 else (128, 128)
    spec = P.PanelSpec(topo, bm=bm, bk=bk, bn=1024 if size >= 2048 else None)
    values = jnp.asarray(P.values_to_panel_np(topo, mat.values, bm, bk))
    if size >= 2048:
        values = values.astype(jnp.bfloat16)
        dense = dense.astype(jnp.bfloat16)
    fn = jax.jit(lambda v, d: P.spmm(spec, v, d))
    float(jnp.sum(fn(values, dense).reshape(-1)[:8]))

    if size <= 1024:
        # Tiny problems are host-dispatch-bound when launched one by one
        # (hundreds of us through a remote tunnel vs us of device time);
        # chain iterations inside one jit with a data dependency so the
        # slope isolates per-op *device* time, matching how the reference
        # times a tight CUDA-event loop (tests/test_attention.py:55-76).
        @jax.jit
        def chain(v, d, n):
            def body(_, dd):
                out = P.spmm(spec, v, dd)
                return dd + 1e-6 * out[: dd.shape[0]]
            return jax.lax.fori_loop(0, n, body, d)

        n_lo, n_hi = 1000, 9000
        args_lo = (values, dense, jnp.int32(n_lo))
        args_hi = (values, dense, jnp.int32(n_hi))
        timed_chain(chain, args_hi, 1)  # compile once
        t_lo = min(timed_chain(chain, args_lo, 1) for _ in range(7))
        t_hi = min(timed_chain(chain, args_hi, 1) for _ in range(7))
        ms = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3
    else:
        n_lo, n_hi = 10, 40
        t_lo = min(timed_chain(fn, (values, dense), n_lo) for _ in range(5))
        t_hi = min(timed_chain(fn, (values, dense), n_hi) for _ in range(5))
        ms = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo) * 1e3

    nnz = topo.nnz
    useful_gflop = 2.0 * nnz * size / 1e9
    # minimal HBM traffic: values panel (occupied blocks) + dense + out
    bv = spec.view
    elt = 2 if size >= 2048 else 4   # bf16 streams at big sizes
    bytes_min = (bv.num_blocks * bm * bk + size * size) * elt + size * size * 4
    roofline_ms = bytes_min / (V5E_HBM_GBS * 1e9) * 1e3
    compute_ms = (2.0 * bv.num_blocks * bm * bk * size) / (
        V5E_BF16_TFLOPS * 1e12) * 1e3
    sol_ms = max(roofline_ms, compute_ms)
    return {
        "size": size,
        "density": density,
        "ms": round(ms, 5),
        "gflops_effective": round(useful_gflop / (ms / 1e3), 1),
        "ref_sputnik_ms": REFERENCE_MS.get((size, density)),
        "speedup_vs_ref": round(REFERENCE_MS[(size, density)] / ms, 2)
        if (size, density) in REFERENCE_MS else None,
        "speed_of_light_ms": round(sol_ms, 5),
        "sol_fraction": round(sol_ms / ms, 3),
        "block_occupancy": round(bv.block_density, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,4096")
    ap.add_argument("--densities", default="0.05,0.1,0.15,0.2,0.25,0.5")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    densities = [float(d) for d in args.densities.split(",")]

    rows = []
    for size in sizes:
        for d in densities:
            r = bench_one(size, d)
            rows.append(r)
            print(json.dumps(r), flush=True)

    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    print("\n| M=N=K | density | TPU ms | ref A100 ms | speedup | "
          "eff GFLOP/s | SoL frac |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['size']} | {r['density']} | {r['ms']:.4f} | "
              f"{r['ref_sputnik_ms']} | {r['speedup_vs_ref']}x | "
              f"{r['gflops_effective']} | {r['sol_fraction']} |")


if __name__ == "__main__":
    main()
