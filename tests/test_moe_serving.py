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
