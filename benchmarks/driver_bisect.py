"""Per-op bisect of the reference-driver train step (r3 verdict weak #1).

The reference's flagship scenario (6L, b=4, s=512, h=512, 8 heads,
causal — ``tests/transformer/driver.py:4-29``) measured 4.09 ms sparse
vs 2.06 ms dense in r3 with no breakdown. This script times, in one TPU
session: the full sparse train step, the dense train step, forward-only
both ways, and the isolated attention fwd/grad at the driver's own
shapes — attributing the 2x to specific ops.

Run on the real TPU:  python benchmarks/driver_bisect.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import optax                                                 # noqa: E402

from sputnik_tpu.models.transformer import SparseTransformer  # noqa: E402
from sputnik_tpu.utils.profiling import measure               # noqa: E402

B, S, H, HEADS, LAYERS, FFN = 4, 512, 512, 8, 6, 2048


def causal_masks():
    m = np.tril(np.ones((S, S), np.float32))
    m[S // 2, :] = 0.0
    return np.broadcast_to(m, (B, S, S)).copy()


def build(layout, stream=None):
    model = SparseTransformer.from_masks(
        causal_masks(), num_layers=LAYERS, hidden_size=H,
        num_heads=HEADS, ffn_hidden_size=FFN, use_residual=True,
        use_layernorm=True, activation="gelu",
        attention_layout=layout, flash_stream=stream)
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, S, H).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def dense_model_step():
    """The r3 dense-equivalent: same layer math, dense masked softmax."""
    import flax.linen as nn

    mask = jnp.asarray(causal_masks())

    class DenseLayer(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm()(x)
            qkv = nn.Dense(3 * H)(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = H // HEADS

            def heads_(t):
                return t.reshape(B, S, HEADS, hd).transpose(0, 2, 1, 3)

            q, k, v = heads_(q), heads_(k), heads_(v)
            sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
            sc = jnp.where(mask[:, None] != 0, sc, -1e30)
            w = jax.nn.softmax(sc, axis=-1) * (mask[:, None] != 0)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, H)
            x = x + nn.Dense(H)(o)
            y = nn.LayerNorm()(x)
            x = x + nn.Dense(H)(nn.gelu(nn.Dense(FFN)(y)))
            return x

    class DenseModel(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(LAYERS):
                x = DenseLayer()(x)
            return x

    model = DenseModel()
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, S, H).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def train_fns(model, params, x):
    tx = optax.sgd(1e-3)
    opt = tx.init(params)

    def loss(p, x):
        y = model.apply(p, x)
        return jnp.mean(y * y)

    @jax.jit
    def step(p, o, x):
        l, g = jax.value_and_grad(loss)(p, x)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    return step, fwd, opt



def _enable_compile_cache():
    """Persistent XLA compilation cache: remote kernel compiles are 1-5
    minutes EACH; cached after the first run per HLO hash."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

def main():
    _enable_compile_cache()
    assert jax.devices()[0].platform == "tpu"
    out = {}

    for tag, builder in (("sparse_auto", lambda: build("auto")),
                         ("sparse_flash", lambda: build("flash")),
                         ("sparse_flash_bf16",
                          lambda: build("flash", stream="bf16")),
                         ("sparse_panel", lambda: build("panel")),
                         ("dense", dense_model_step)):
        model, params, x = builder()
        step, fwd, opt = train_fns(model, params, x)
        out[f"{tag}_fwd_ms"] = round(measure(fwd, params, x), 4)
        out[f"{tag}_train_ms"] = round(
            measure(step, params, opt, x), 4)

    # isolated attention at driver shapes: R = B * HEADS replicas of the
    # causal mask, hd = 64
    from sputnik_tpu import many_mask as mm
    from sputnik_tpu.models.transformer import flash_tiles
    from sputnik_tpu.ops import batched_panel as bp
    from sputnik_tpu.ops.fused_attention import fused_sparse_attention

    hd = H // HEADS
    mt = mm.ManyMaskTopology.from_dense_masks(causal_masks())
    blk, blk_k = flash_tiles(S)
    spec = bp.BatchedPanelSpec.from_many_mask(mt, heads=HEADS, bm=blk,
                                              bk=blk_k)
    rng = np.random.RandomState(1)
    mk = lambda s_: jnp.asarray(                          # noqa: E731
        rng.randn(B * HEADS, S, hd).astype(np.float32))
    q, k, v = mk(1), mk(2), mk(3)
    f_at = jax.jit(lambda a, b, c: fused_sparse_attention(spec, a, b, c))
    out["attention_fwd_ms"] = round(measure(f_at, q, k, v), 4)
    g_at = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
        fused_sparse_attention(spec, a, b, c) ** 2), argnums=(0, 1, 2)))
    out["attention_fwdbwd_ms"] = round(measure(g_at, q, k, v), 4)
    out["flash_tiles"] = [blk, blk_k]

    # dense attention at the same shapes (the attention-only anchor)
    mask_r = jnp.asarray(np.repeat(causal_masks(), HEADS, 0))

    def dense_at(a, b, c):
        sc = jnp.einsum("rqd,rkd->rqk", a, b) / np.sqrt(hd)
        sc = jnp.where(mask_r != 0, sc, -1e30)
        w = jax.nn.softmax(sc, axis=-1) * (mask_r != 0)
        return jnp.einsum("rqk,rkd->rqd", w, c)

    f_dat = jax.jit(dense_at)
    out["dense_attention_fwd_ms"] = round(measure(f_dat, q, k, v), 4)
    g_dat = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
        dense_at(a, b, c) ** 2), argnums=(0, 1, 2)))
    out["dense_attention_fwdbwd_ms"] = round(measure(g_dat, q, k, v), 4)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
