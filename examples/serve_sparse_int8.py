"""Serving example: int8 W8A8 sparse inference.

Quantizes a sparse layer stack once at load time (blockwise int8 weights),
then serves forward passes through the int8 op family — sparse linear
(SpMM) + sparse flash attention — and reports latency vs the fp32 path
and the quantization error. The reference framework is fp32-only; this is
the deployment mode the BASELINE asks for.

Run:  python examples/serve_sparse_int8.py [--small]
(CPU runs use interpret-mode kernels and are slow; on TPU this is the
real serving path.)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sputnik_tpu as st
    from sputnik_tpu import int8 as q8
    from sputnik_tpu.many_mask import ManyMaskTopology
    from sputnik_tpu.ops import batched_panel as bp
    from sputnik_tpu.ops import panel_api as P
    from sputnik_tpu.ops.fused_attention import (fused_sparse_attention,
                                                 warm_flash_meta)

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        st.set_backend("pallas")  # interpret mode: exercise the kernels

    h, s, heads = (256, 128, 4) if args.small or not on_tpu else (1024, 2048, 8)
    hd = h // heads
    rng = np.random.RandomState(0)

    # sparse weight (90% sparse) for the output projection
    W = ((rng.rand(h, h) < 0.1) * rng.randn(h, h)).astype(np.float32) * 0.05
    mat = st.SparseMatrix(W)
    spec = P.PanelSpec(mat.topology, bm=128, bk=128)
    panel = P.values_to_panel_np(mat.topology, mat.values, spec.bm, spec.bk)
    panel_f32 = jnp.asarray(panel)
    qp = q8.quantize_panel(spec, panel)        # one-time quantization

    # causal attention topology, cached once
    masks = np.tril(np.ones((1, s, s), np.float32))
    mt = ManyMaskTopology.from_dense_masks(masks)
    blk = 512 if s >= 512 else 32
    bspec = bp.BatchedPanelSpec.from_many_mask(
        mt, heads=heads, bm=blk, bk=min(2 * blk, s))
    warm_flash_meta(bspec)

    x = jnp.asarray(rng.randn(heads, s, hd).astype(np.float32))

    def forward_f32(x):
        ctx = fused_sparse_attention(bspec, x, x, x)
        flat = jnp.transpose(ctx, (1, 0, 2)).reshape(s, h)
        return P.spmm(spec, panel_f32, flat.T).T

    def forward_int8(x):
        ctx = q8.attention_int8(bspec, x, x, x)
        flat = jnp.transpose(ctx, (1, 0, 2)).reshape(s, h)
        return q8.spmm_int8(spec, qp, flat.T).T

    f32_jit = jax.jit(forward_f32)
    i8_jit = jax.jit(forward_int8)
    y32, y8 = f32_jit(x), i8_jit(x)
    rel = float(jnp.max(jnp.abs(y8 - y32)) / jnp.max(jnp.abs(y32)))

    def clock(fn, iters=20):
        fn(x)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(x)
        float(jnp.sum(out.reshape(-1)[:8]))
        return (time.perf_counter() - t0) / iters * 1e3

    ms32 = clock(f32_jit) if on_tpu else float("nan")
    ms8 = clock(i8_jit) if on_tpu else float("nan")
    print(f"serving fwd (h={h}, s={s}, heads={heads}): "
          f"fp32 {ms32:.3f} ms  int8 {ms8:.3f} ms  "
          f"int8 rel err {rel:.4f}")
    assert rel < 0.1, rel


if __name__ == "__main__":
    main()
