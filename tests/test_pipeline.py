"""Pipeline parallelism (GPipe schedule over a pp mesh axis) on the
virtual 8-device CPU mesh: forward parity vs sequentially applying the
stages on one device, and gradients through the whole pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sputnik_tpu.models.transformer import TransformerLayer
from sputnik_tpu.many_mask import ManyMaskTopology
from sputnik_tpu.parallel.pipeline import (
    PipelineSpec,
    pipeline_apply,
    stack_stage_params,
)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip(f"need {NDEV} devices, have {len(devs)}")
    return Mesh(np.array(devs[:NDEV]), ("pp",))


@pytest.fixture(scope="module")
def stages(mesh):
    """8 sparse-attention transformer layers = 8 pipeline stages."""
    mb, s, h, heads, ffn = 2, 16, 32, 2, 48
    masks = np.broadcast_to(np.tril(np.ones((s, s), np.float32)),
                            (mb, s, s)).copy()
    mt = ManyMaskTopology.from_dense_masks(masks)
    layer = TransformerLayer(
        mask_topology=mt, hidden_size=h, num_heads=heads,
        ffn_hidden_size=ffn, use_residual=True, use_layernorm=True,
        activation="gelu", attention_layout="panel")
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(mb, s, h).astype(np.float32) * 0.3)
    per_stage = [
        layer.init(jax.random.PRNGKey(i), x0)["params"]
        for i in range(NDEV)]
    stacked = stack_stage_params(per_stage)

    def stage_fn(p, x):
        return layer.apply({"params": p}, x)

    return dict(layer=layer, per_stage=per_stage, stacked=stacked,
                stage_fn=stage_fn, mb=mb, s=s, h=h, rng=rng)


def _sequential(st_, x):
    for p in st_["per_stage"]:
        x = st_["stage_fn"](p, x)
    return x


def test_pipeline_forward_parity(mesh, stages):
    n_micro = 4
    b = n_micro * stages["mb"]
    x = jnp.asarray(stages["rng"].randn(b, stages["s"], stages["h"]).astype(
        np.float32) * 0.3)
    spec = PipelineSpec(mesh, "pp", n_micro=n_micro)
    got = jax.jit(
        lambda p, x: pipeline_apply(spec, stages["stage_fn"], p, x)
    )(stages["stacked"], x)

    # sequential reference: each microbatch through all 8 stages
    ref = np.concatenate([
        np.asarray(_sequential(stages, x[i * stages["mb"]:(i + 1) * stages["mb"]]))
        for i in range(n_micro)])
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_pipeline_grads(mesh, stages):
    n_micro = 2
    b = n_micro * stages["mb"]
    x = jnp.asarray(stages["rng"].randn(b, stages["s"], stages["h"]).astype(
        np.float32) * 0.3)
    spec = PipelineSpec(mesh, "pp", n_micro=n_micro)

    def loss_pipe(p, x):
        return jnp.mean(pipeline_apply(spec, stages["stage_fn"], p, x) ** 2)

    def loss_seq(stacked, x):
        per = [jax.tree.map(lambda a: a[i], stacked) for i in range(NDEV)]
        mb = stages["mb"]
        outs = []
        for i in range(n_micro):
            y = x[i * mb:(i + 1) * mb]
            for p in per:
                y = stages["stage_fn"](p, y)
            outs.append(y)
        return jnp.mean(jnp.concatenate(outs) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stages["stacked"], x)
    g_seq = jax.grad(loss_seq)(stages["stacked"], x)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    flat_s, _ = jax.tree_util.tree_flatten(g_seq)
    for a, b_ in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-3)
