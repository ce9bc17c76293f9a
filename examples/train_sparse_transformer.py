"""End-to-end example: train a sparse-attention transformer.

The reference's most complete scenario (tests/transformer/driver.py: 6
layers, seq 512, hidden 512, 8 heads, causal mask with a fully-masked row)
as a real training loop: fused sparse-flash attention, panel-layout sparse
ops, adam, loss curve printed.

Run:  python examples/train_sparse_transformer.py [--steps 20] [--small]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny config for CPU smoke runs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sputnik_tpu.models import SparseTransformer

    if args.small:
        b, s, h, heads, layers, ffn = 2, 64, 64, 4, 2, 128
    else:
        b, s, h, heads, layers, ffn = 4, 512, 512, 8, 6, 2048

    mask = np.tril(np.ones((s, s), np.float32))
    mask[s // 2, :] = 0.0  # deliberately fully-masked row (driver.py:11-14)
    masks = np.broadcast_to(mask, (b, s, s)).copy()

    model = SparseTransformer.from_masks(
        masks, num_layers=layers, hidden_size=h, num_heads=heads,
        ffn_hidden_size=ffn, use_residual=True, use_layernorm=True,
        activation="gelu")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    y = jnp.asarray(rng.randn(b, s, h).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: jnp.mean((model.apply(p, x) - y) ** 2))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}")
    print(f"{args.steps} steps in {time.perf_counter() - t0:.2f}s "
          f"(first step includes compile)")


if __name__ == "__main__":
    main()
