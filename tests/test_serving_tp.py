"""Tensor-parallel paged serving over the virtual device mesh: the
paged Pallas kernels run as shard_map islands on the heads axis while
GSPMD partitions every GEMM from `llama.param_shardings` (row-parallel
wo/w_down psums inserted by XLA) — the serving mirror of the training
path's attention island.  TP logits must match the single-device path
and the ServingEngine must drive the sharded steps end-to-end."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from metal_flash_attention_tpu.models import llama, serving
from metal_flash_attention_tpu.models.engine import ServingEngine
from metal_flash_attention_tpu.parallel.mesh import HEAD_AXIS, make_mesh


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = llama.LlamaConfig.tiny(n_layers=2)   # 4 q heads / 2 kv heads
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(heads=2, devices=jax.devices()[:2])
    sharded = jax.device_put(params, llama.param_shardings(cfg, mesh))
    kv_shard = NamedSharding(mesh, P(None, HEAD_AXIS, None, None))
    return cfg, params, mesh, sharded, kv_shard


def test_tp_paged_steps_match_single_device(setup):
    """Chunk prefill + decode logits agree between the unsharded path
    and TP=2 (each device holds 2 q heads / 1 kv head)."""
    cfg, params, mesh, sharded, kv_shard = setup
    rng = np.random.default_rng(0)
    b, page = 2, 16
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (b, 32)), jnp.int32)

    def run(mesh_arg, prm, shard=None):
        cache = serving.init_paged_model_cache(cfg, b, 64,
                                               page_size=page)
        if shard is not None:
            cache = cache._replace(
                k=tuple(jax.device_put(x, shard) for x in cache.k),
                v=tuple(jax.device_put(x, shard) for x in cache.v))
        chunk = jax.jit(
            functools.partial(serving.paged_chunk_step, mesh=mesh_arg),
            static_argnames=("cfg",))
        step = jax.jit(
            functools.partial(serving.paged_decode_step,
                              mesh=mesh_arg),
            static_argnames=("cfg",))
        logits, cache = chunk(prm, prompt, cfg, cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        logits2, cache = step(prm, tok, cfg, cache)
        return np.asarray(logits[:, -1]), np.asarray(logits2)

    l1a, l1b = run(None, params)
    l2a, l2b = run(mesh, sharded, kv_shard)
    # bf16 compute: the row-parallel psum reassociates the wo/w_down
    # contractions, so logits agree to bf16 resolution (~0.03 on O(5)
    # logits; measured max 0.034) and argmax agrees exactly.
    np.testing.assert_allclose(l1a, l2a, atol=6e-2, rtol=0)
    np.testing.assert_allclose(l1b, l2b, atol=6e-2, rtol=0)
    assert (l1a.argmax(-1) == l2a.argmax(-1)).all()
    assert (l1b.argmax(-1) == l2b.argmax(-1)).all()


def test_tp_engine_matches_unsharded(setup):
    """ServingEngine wired with mesh-partial steps + kv_sharding
    reproduces the unsharded engine's token streams."""
    cfg, params, mesh, sharded, kv_shard = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (12, 19)]

    def run(prm, mesh_arg=None, kv=None):
        kwargs = {}
        if mesh_arg is not None:
            kwargs = dict(
                chunk_step=functools.partial(
                    serving.paged_chunk_step, mesh=mesh_arg),
                decode_step=functools.partial(
                    serving.paged_decode_step, mesh=mesh_arg),
                kv_sharding=kv)
        eng = ServingEngine(prm, cfg, max_batch=2, num_pages=16,
                            page_size=16, max_seq=96, **kwargs)
        rids = [eng.submit(p, 6) for p in prompts]
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 80
        return [eng.result(r).tolist() for r in rids]

    assert run(params) == run(sharded, mesh, kv_shard)


def test_tp_gemma_engine_matches_unsharded(setup):
    """Gemma family (sliding-window local layers + softcap) through
    the TP engine: token streams match the single-device engine."""
    from metal_flash_attention_tpu.models import gemma

    _, _, mesh, _, kv_shard = setup
    cfg = gemma.GemmaConfig.tiny(sliding_window=32)
    params = gemma.init_params(jax.random.PRNGKey(3), cfg)
    sharded = jax.device_put(params, gemma.param_shardings(cfg, mesh))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (11, 18)]

    def run(prm, mesh_arg=None, kv=None):
        eng = ServingEngine(
            prm, cfg, max_batch=2, num_pages=16, page_size=16,
            max_seq=96,
            chunk_step=functools.partial(
                serving.gemma_paged_chunk_step, mesh=mesh_arg),
            decode_step=functools.partial(
                serving.gemma_paged_decode_step, mesh=mesh_arg),
            kv_sharding=kv)
        rids = [eng.submit(p, 5) for p in prompts]
        steps = 0
        while not eng.idle:
            eng.step()
            steps += 1
            assert steps < 80
        return [eng.result(r).tolist() for r in rids]

    assert run(params) == run(sharded, mesh, kv_shard)
