"""Mixtral-style MoE serving through the paged stack: the paged steps
are family-polymorphic (routed expert FFN when the layer carries one),
so paged_generate and the full ServingEngine serve MoE checkpoints
with no MoE-specific serving code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import moe, serving
from metal_flash_attention_tpu.models.engine import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = moe.MoEConfig.tiny(n_layers=2)
    params = moe.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(61)
    prompt = rng.integers(0, cfg.vocab_size, (13,)).astype(np.int32)
    return cfg, params, prompt


def test_moe_paged_chunk_matches_dense_forward(setup):
    """Paged chunk logits track the training-path moe.forward logits
    (flash vs paged kernels; same math)."""
    cfg, params, prompt = setup
    logits_ref, _, _ = moe.forward(params, jnp.asarray(prompt[None]),
                                   cfg)
    cache = serving.init_paged_model_cache(cfg, 1, 64, page_size=16)
    chunk = jax.jit(serving.paged_chunk_step, static_argnames=("cfg",))
    logits = None
    for i in range(0, len(prompt), 16):
        logits, cache = chunk(
            params, jnp.asarray(prompt[None, i:i + 16]), cfg, cache)
    err = float(jnp.max(jnp.abs(logits[0] - logits_ref[0])))
    assert err < 5e-2, err


def test_moe_engine_matches_paged_generate(setup):
    cfg, params, prompt = setup
    ref = serving.paged_generate(params, jnp.asarray(prompt[None]),
                                 cfg, max_new_tokens=6, page_size=16)
    eng = ServingEngine(params, cfg, max_batch=2, num_pages=16,
                        page_size=16, max_seq=64)
    rid = eng.submit(prompt, 6)
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 40
    assert eng.result(rid).tolist() == np.asarray(ref)[0].tolist()


def test_moe_tp_engine_matches_unsharded(setup):
    """Mixtral TP+EP serving: attention TP over heads, experts sharded
    over the same axis (all-to-alls from the dispatch/combine einsums)
    — engine streams match the single-device MoE engine."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from metal_flash_attention_tpu.parallel.mesh import (
        HEAD_AXIS,
        make_mesh,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg, params, prompt = setup
    mesh = make_mesh(heads=2, devices=jax.devices()[:2])
    sharded = jax.device_put(params, moe.param_shardings(cfg, mesh))
    kv_shard = NamedSharding(mesh, P(None, HEAD_AXIS, None, None))

    def run(prm, mesh_arg=None, kv=None):
        kwargs = {}
        if mesh_arg is not None:
            kwargs = dict(
                chunk_step=functools.partial(
                    serving.paged_chunk_step, mesh=mesh_arg),
                decode_step=functools.partial(
                    serving.paged_decode_step, mesh=mesh_arg),
                kv_sharding=kv)
        eng = ServingEngine(prm, cfg, max_batch=1, num_pages=16,
                            page_size=16, max_seq=64, **kwargs)
        rid = eng.submit(prompt, 6)
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 40
        return eng.result(rid).tolist()

    assert run(params) == run(sharded, mesh, kv_shard)
