"""Dynamic sparse training: RigL on a SparseLinear regression.

Seeds a sparse layer by magnitude-pruning a dense init
(``training.topology_from_dense``), trains with Adam, and every
``--update-every`` steps runs a RigL connectivity update
(``training.rigl_update_linear``): drop the smallest-|w| connections,
grow the largest-|dense grad| inactive ones, carry parameters AND Adam
moments across the topology swap (shapes are stable — ``nnz``/
``nnz_pad`` are held constant, so only a retrace is paid, not a
re-init). Self-checks that the evolved pattern trains to a LOWER loss
than the same run with its initial pattern frozen — the point of DST.

The reference framework ships the sparse kernels this loop needs but no
loop; users hand-roll it. Run:

    python examples/dynamic_sparse_training.py [--small]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--update-every", type=int, default=40)
    ap.add_argument("--density", type=float, default=0.1)
    ap.add_argument("--layout", default="panel", choices=["panel", "csr"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from sputnik_tpu.models.linear import SparseLinear
    from sputnik_tpu.training import (
        dense_linear_grad,
        rigl_update_linear,
        topology_from_dense,
    )

    if args.small:
        m, n, b = 64, 96, 32
        steps = args.steps or 120
    else:
        m, n, b = 512, 768, 256
        steps = args.steps or 400

    rng = np.random.RandomState(0)
    # teacher with planted structure: a sparse layer must REWIRE to find
    # the heavy rows — magnitude-at-init picks the wrong connections
    w_true = (rng.randn(m, n) * (rng.rand(m, n) < 0.15)).astype(np.float32)
    x = rng.randn(b, n).astype(np.float32)
    y = x @ w_true.T

    w0 = rng.randn(m, n).astype(np.float32) * 0.1
    topo, _ = topology_from_dense(w0, density=args.density)

    def run(dynamic: bool):
        layer = SparseLinear(topology=topo, use_bias=False,
                             layout=args.layout)
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # start both runs from the SAME pruned dense init
        variables = {"params": dict(variables["params"],
                                    values=jnp.asarray(
                                        layer.pack_dense(w0)))}
        tx = optax.adam(2e-2)
        opt_state = tx.init(variables["params"])

        def make_step(lyr):
            @jax.jit
            def step(v, s, x, y):
                def loss_fn(p):
                    pred = lyr.apply({"params": p}, x)
                    return jnp.mean((pred - y) ** 2), pred

                (l, pred), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(v["params"])
                upd, s = tx.update(g, s, v["params"])
                return {"params": optax.apply_updates(v["params"], upd)}, \
                    s, l, pred
            return step

        step, loss = make_step(layer), None
        for t in range(steps):
            variables, opt_state, loss, pred = step(
                variables, opt_state, jnp.asarray(x), jnp.asarray(y))
            if dynamic and (t + 1) % args.update_every == 0 \
                    and t != steps - 1:
                # pred came from the PRE-update params, so this dense
                # grad is one optimizer step stale relative to the drop
                # criterion (which sees post-update values). RigL is
                # robust to that; recompute pred post-update if exact
                # same-step gradients matter.
                gy = 2.0 / (b * m) * (np.asarray(pred) - y)
                dg = dense_linear_grad(x, gy)
                adam = opt_state[0]
                layer, variables, (mu_v, nu_v) = rigl_update_linear(
                    layer, variables, dg, fraction=0.3,
                    opt_values=[adam.mu["values"], adam.nu["values"]])
                opt_state = (adam._replace(
                    mu=dict(adam.mu, values=jnp.asarray(mu_v)),
                    nu=dict(adam.nu, values=jnp.asarray(nu_v))),
                ) + tuple(opt_state[1:])
                step = make_step(layer)   # retrace against the new pattern
        return float(loss)

    static_loss = run(dynamic=False)
    rigl_loss = run(dynamic=True)
    print(f"density={args.density} layout={args.layout} steps={steps}")
    print(f"static-topology final loss : {static_loss:.5f}")
    print(f"RigL-evolved final loss    : {rigl_loss:.5f} "
          f"({static_loss / max(rigl_loss, 1e-12):.2f}x lower)")
    assert np.isfinite(rigl_loss) and np.isfinite(static_loss)
    assert rigl_loss < static_loss, (
        f"RigL {rigl_loss} did not beat static {static_loss}")
    print("OK: evolved sparsity beats the frozen pattern")


if __name__ == "__main__":
    main()
