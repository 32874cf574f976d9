"""Pipeline parallelism: GPipe over a stage mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline,
    stack_stage_params,
    stage_param_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def make_stages(rng, n_stages, d, h):
    stages = []
    for _ in range(n_stages):
        stages.append({
            "w1": jnp.asarray(rng.standard_normal((d, h)) * 0.3, jnp.float32),
            "b1": jnp.asarray(rng.standard_normal((h,)) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((h, d)) * 0.3, jnp.float32),
            "b2": jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32),
        })
    return stages


def sequential(stages, x):
    for p in stages:
        x = mlp_stage(p, x)
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(4, 8), (2, 3), (8, 8)])
def test_pipeline_matches_sequential(rng, n_stages, n_micro):
    d, h, mb = 16, 32, 4
    stages = make_stages(rng, n_stages, d, h)
    x = jnp.asarray(rng.standard_normal((n_micro, mb, d)), jnp.float32)

    mesh = make_pipeline_mesh(n_stages)
    stacked = stack_stage_params(stages)
    stacked = jax.device_put(stacked, stage_param_sharding(stacked, mesh))

    out = jax.jit(lambda p, x: pipeline(
        mlp_stage, p, x, mesh=mesh))(stacked, x)
    ref = jax.vmap(lambda xi: sequential(stages, xi))(x)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_pipeline_is_differentiable(rng):
    """Backward through the pipeline (reverse ppermutes) matches the
    sequential gradient."""
    n_stages, n_micro, d, h, mb = 4, 4, 8, 16, 2
    stages = make_stages(rng, n_stages, d, h)
    x = jnp.asarray(rng.standard_normal((n_micro, mb, d)), jnp.float32)

    mesh = make_pipeline_mesh(n_stages)
    stacked = stack_stage_params(stages)

    def loss_pp(p, x):
        return jnp.sum(pipeline(mlp_stage, p, x, mesh=mesh) ** 2)

    def loss_seq(p, x):
        per = [jax.tree.map(lambda q: q[i], p) for i in range(n_stages)]
        return jnp.sum(jax.vmap(lambda xi: sequential(per, xi))(x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)
    g_seq = jax.grad(loss_seq)(stacked, x)
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_pp, g_seq)
    assert max(jax.tree.leaves(err)) < 1e-4, err


def test_pipeline_transformer_stages(rng):
    """Pipeline a Llama layer stack: stages = layer groups."""
    from metal_flash_attention_tpu.models import llama

    cfg = llama.LlamaConfig.tiny(n_layers=4, dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    b, s = 2, 64
    x = jnp.asarray(
        rng.standard_normal((1, b, s, cfg.dim)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    cos, sin = llama.rope_frequencies(cfg, pos)

    def stage_fn(stage_params, h):
        # Two layers per stage; closure carries rope tables.
        for i in range(2):
            layer = jax.tree.map(lambda p: p[i], stage_params)
            h, _ = llama.attention_block(layer, h, cfg, cos, sin)
            h = llama.mlp_block(layer, h, cfg)
        return h

    # Stack layer params: [n_stages=2][2 layers per stage].
    per_stage = []
    for g in range(2):
        pair = [params["layers"][2 * g], params["layers"][2 * g + 1]]
        per_stage.append(jax.tree.map(lambda *xs: jnp.stack(xs), *pair))
    stacked = stack_stage_params(per_stage)

    mesh = make_pipeline_mesh(2)
    out = jax.jit(lambda p, x: pipeline(
        stage_fn, p, x, mesh=mesh))(stacked, x)

    ref = x[0]
    for layer in params["layers"]:
        ref, _ = llama.attention_block(layer, ref, cfg, cos, sin)
        ref = llama.mlp_block(layer, ref, cfg)
    assert float(jnp.max(jnp.abs(
        out[0].astype(jnp.float32) - ref.astype(jnp.float32)))) < 1e-4
