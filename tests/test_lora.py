"""Multi-adapter LoRA serving: per-row adapter selection inside one
fixed-shape jit.  Adapter 0 is the base model; different tenants share
a batch; streams match single-tenant runs bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama, lora, serving
from metal_flash_attention_tpu.models.engine import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    adapters = lora.init_lora_adapters(
        jax.random.PRNGKey(1), cfg, n_adapters=3, rank=8, b_scale=0.3)
    rng = np.random.default_rng(51)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (14, 9)]
    return cfg, params, adapters, prompts


def _run(eng, subs):
    rids = [eng.submit(p, m, lora_id=lid) for p, m, lid in subs]
    steps = 0
    while not eng.idle:
        eng.step()
        steps += 1
        assert steps < 80
    return [eng.result(r).tolist() for r in rids]


def test_adapter_zero_is_base_model(setup):
    """lora enabled + lora_id=0 reproduces the no-lora engine
    (adapter 0 has B = 0 by construction).  Stream equality is
    bitwise on CPU; on the real chip the lora step is a DIFFERENT
    program whose bf16 near-tie argmaxes may break differently (the
    trace-shape note in CLAUDE.md), so there the identity is asserted
    at the logit level instead."""
    import os

    cfg, params, adapters, prompts = setup
    if os.environ.get("MFA_TPU_TEST_REAL"):
        tokens = jnp.asarray(np.stack([
            np.pad(prompts[0], (0, 16 - len(prompts[0]))),
            np.pad(prompts[1], (0, 16 - len(prompts[1])))]), jnp.int32)
        cache0 = serving.init_paged_model_cache(cfg, 2, 32)
        l0, _ = serving.paged_chunk_step(params, tokens, cfg, cache0)
        cache1 = serving.init_paged_model_cache(cfg, 2, 32)
        l1, _ = serving.paged_chunk_step(
            params, tokens, cfg, cache1, lora=adapters,
            lora_ids=jnp.zeros((2,), jnp.int32))
        err = float(jnp.max(jnp.abs(l0 - l1)))
        assert err < 2e-2, err
        return
    plain = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                          max_seq=128)
    ref = _run(plain, [(prompts[0], 6, 0), (prompts[1], 6, 0)])
    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=128, lora=adapters)
    assert _run(eng, [(prompts[0], 6, 0), (prompts[1], 6, 0)]) == ref


def test_adapters_change_output_and_are_row_selected(setup):
    """Non-zero adapters perturb the stream, and a mixed batch
    (ids 1 and 2 side by side) reproduces each tenant's single-run
    stream bitwise."""
    cfg, params, adapters, prompts = setup

    def single(p, lid):
        eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                            max_seq=128, lora=adapters)
        return _run(eng, [(p, 6, lid)])[0]

    base0 = single(prompts[0], 0)
    a1 = single(prompts[0], 1)
    a2 = single(prompts[0], 2)
    assert a1 != base0 or a2 != base0   # adapters actually act
    assert a1 != a2                     # and differ from each other

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=32,
                        max_seq=128, lora=adapters,
                        admissions_per_step=2)
    mixed = _run(eng, [(prompts[0], 6, 1), (prompts[1], 6, 2)])
    assert mixed[0] == a1
    assert mixed[1] == single(prompts[1], 2)


def test_lora_validation(setup):
    cfg, params, adapters, prompts = setup
    eng = ServingEngine(params, cfg, max_batch=1, num_pages=16,
                        max_seq=64)
    with pytest.raises(ValueError):
        eng.submit(prompts[0], 4, lora_id=1)   # engine has no adapters

    def draft_fn(last, history):
        return jnp.zeros((last.shape[0], 2), jnp.int32)

    with pytest.raises(ValueError):
        ServingEngine(params, cfg, max_batch=1, num_pages=16,
                      max_seq=64, lora=adapters, draft_fn=draft_fn,
                      draft_len=2)


def test_lora_training_reduces_loss_and_serves(setup):
    """Fine-tuning: zero-B adapters are an exact identity; a few adam
    steps on the adapters reduce the loss with the base frozen by
    construction; the trained adapters then produce consistent logits
    through the SERVING path (paged chunk) — train what you deploy."""
    import optax

    cfg, params, _, _ = setup
    rng = np.random.default_rng(53)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)),
                         jnp.int32)
    adapters = lora.init_lora_adapters(jax.random.PRNGKey(3), cfg,
                                       n_adapters=1, rank=8)
    base_loss = float(llama.loss_fn(params, tokens, cfg))
    id_loss = float(llama.loss_fn(params, tokens, cfg, lora=adapters))
    assert abs(base_loss - id_loss) < 1e-6      # B = 0 -> identity

    tx = optax.adam(2e-2)
    step = jax.jit(lora.make_lora_train_step(tx, cfg))
    opt_state = tx.init(adapters["layers"])
    losses = []
    for _ in range(8):
        adapters, opt_state, l = step(adapters, opt_state, params,
                                      tokens)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.01, losses

    # Serving-path consistency with the trained adapters.
    logits_train, _ = llama.forward(params, tokens[:, :16], cfg,
                                    lora=adapters)
    cache = serving.init_paged_model_cache(cfg, 2, 64, page_size=16)
    chunk = jax.jit(serving.paged_chunk_step, static_argnames=("cfg",))
    logits_serve, _ = chunk(params, tokens[:, :16], cfg, cache,
                            lora=adapters,
                            lora_ids=jnp.zeros((2,), jnp.int32))
    err = float(jnp.max(jnp.abs(logits_serve - logits_train)))
    # Two different attention programs (dense training fwd vs paged
    # chunk) over 2 bf16 layers: measured 6.5e-2 max logit delta on
    # the real chip (CPU interpret agrees to ~1e-3).
    assert err < 1e-1, err
