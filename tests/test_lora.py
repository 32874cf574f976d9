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
    bitwise (adapter 0 has B = 0 by construction)."""
    cfg, params, adapters, prompts = setup
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
