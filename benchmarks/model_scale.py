"""Production-scale transformer train steps: sparse flash vs dense.

The reference's driver config (6L, s=512) is a toy — at that scale a
monolithic dense XLA graph wins on fixed costs and `layout="auto"`
dispatches to it. This harness measures where production models live:
longer sequences and banded long-context topologies, full train steps
(fwd + bwd + SGD) on real shapes.

Rows (real TPU; one session per run):
  * causal s=2048, 12L, h=1024  — mid-scale LM pretraining shape
  * banded w=512 s=4096, 6L    — long-context fine-tuning shape
  * banded w=256 s=8192, 4L    — the memory-bound long-context regime
    (the dense equivalent materialises s^2 scores: 256 MB/head-layer)

Run:  python benchmarks/model_scale.py [--small]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


def sparse_step(masks, layers, h, heads, ffn, stream=None):
    import jax
    import jax.numpy as jnp
    import optax

    from sputnik_tpu.models.transformer import SparseTransformer

    model = SparseTransformer.from_masks(
        masks, num_layers=layers, hidden_size=h, num_heads=heads,
        ffn_hidden_size=ffn, use_residual=True, use_layernorm=True,
        activation="gelu", attention_layout="flash", flash_stream=stream)
    b, s = masks.shape[0], masks.shape[1]
    x = jnp.asarray(np.random.RandomState(0).randn(b, s, h).astype(
        np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.sgd(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, xx):
        l, g = jax.value_and_grad(
            lambda pp: jnp.mean(model.apply(pp, xx) ** 2))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    return step, params, opt, x


def dense_step(masks, layers, h, heads, ffn):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    b, s = masks.shape[0], masks.shape[1]
    mask = jnp.asarray(masks)
    hd = h // heads

    class L(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm()(x)
            qkv = nn.Dense(3 * h)(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads_(t):
                return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

            q, k, v = heads_(q), heads_(k), heads_(v)
            sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
            sc = jnp.where(mask[:, None] != 0, sc, -1e30)
            w = jax.nn.softmax(sc, axis=-1) * (mask[:, None] != 0)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, h)
            x = x + nn.Dense(h)(o)
            y = nn.LayerNorm()(x)
            return x + nn.Dense(h)(nn.gelu(nn.Dense(ffn)(y)))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(layers):
                x = L()(x)
            return x

    model = M()
    x = jnp.asarray(np.random.RandomState(0).randn(b, s, h).astype(
        np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.sgd(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, xx):
        l, g = jax.value_and_grad(
            lambda pp: jnp.mean(model.apply(pp, xx) ** 2))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    return step, params, opt, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    from sputnik_tpu.patterns import causal_mask, local_window_mask
    from sputnik_tpu.utils.profiling import measure

    assert jax.devices()[0].platform == "tpu" or args.small
    out = {}

    if args.small:
        configs = [("causal_s256", np.broadcast_to(
            causal_mask(256), (2, 256, 256)).copy(), 2, 128, 4, 256,
            True)]
    else:
        configs = [
            ("causal_s2048_12L_h1024",
             np.broadcast_to(causal_mask(2048), (4, 2048, 2048)).copy(),
             12, 1024, 16, 4096, True),
            ("band512_s4096_6L_h1024",
             np.broadcast_to(local_window_mask(4096, 512),
                             (2, 4096, 4096)).copy(),
             6, 1024, 16, 4096, True),
            ("band256_s8192_4L_h1024",
             np.broadcast_to(local_window_mask(8192, 256),
                             (1, 8192, 8192)).copy(),
             4, 1024, 16, 4096, True),
        ]

    for tag, masks, layers, h, heads, ffn, run_dense in configs:
        for variant, stream in (("", None), ("_bf16", "bf16")):
            step, params, opt, x = sparse_step(masks, layers, h, heads,
                                               ffn, stream)
            out[f"{tag}_sparse{variant}_ms"] = round(
                measure(step, params, opt, x), 3)
        if run_dense:
            try:
                step, params, opt, x = dense_step(masks, layers, h,
                                                  heads, ffn)
                out[f"{tag}_dense_ms"] = round(
                    measure(step, params, opt, x), 3)
            except Exception as e:     # dense OOMs at long s — the point
                out[f"{tag}_dense_ms"] = f"OOM/ERR {str(e)[:60]}"
        print(json.dumps({k: v for k, v in out.items()
                          if k.startswith(tag)}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
