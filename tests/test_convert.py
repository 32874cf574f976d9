"""HF checkpoint conversion: our fused-kernel forward must reproduce
HuggingFace's reference Llama implementation logit-for-logit on the
converted weights — a cross-implementation correctness anchor (HF's
eager torch path vs our JAX/Pallas path share nothing but math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import convert, llama, serving

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_setup():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=256, max_position_embeddings=512,
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = convert.config_from_hf_llama(hf_cfg, dtype=jnp.float32)
    params = convert.params_from_hf_llama(model, cfg)
    rng = np.random.default_rng(81)
    tokens = rng.integers(0, 256, (2, 24)).astype(np.int64)
    return model, cfg, params, tokens


def test_forward_matches_hf(hf_setup):
    model, cfg, params, tokens = hf_setup
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama.forward(params, jnp.asarray(tokens, jnp.int32),
                            cfg)
    err = float(np.max(np.abs(np.asarray(ours) - hf_logits)))
    assert err < 2e-3, err                 # fp32 both sides
    # And through the SERVING path (paged chunk prefill).
    cache = serving.init_paged_model_cache(cfg, 2, 64, page_size=16)
    chunk = jax.jit(serving.paged_chunk_step, static_argnames=("cfg",))
    logits = None
    for i in range(0, 24, 16):
        logits, cache = chunk(params,
                              jnp.asarray(tokens[:, i:i + 16],
                                          jnp.int32), cfg, cache)
    err = float(np.max(np.abs(np.asarray(logits)
                              - hf_logits[:, 16:24])))
    assert err < 2e-3, err


def test_greedy_generation_matches_hf(hf_setup):
    model, cfg, params, tokens = hf_setup
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(tokens[:1]), max_new_tokens=8,
            do_sample=False, num_beams=1,
            pad_token_id=0).numpy()[0]
    ours = serving.generate(params, jnp.asarray(tokens[:1], jnp.int32),
                            cfg, max_new_tokens=8)
    assert np.asarray(ours)[0].tolist() == hf_out.tolist()


def test_gemma2_forward_matches_hf():
    """Gemma-2 conversion: window alternation, (1+w) norms, embed
    scaling, soft-caps, and query_pre_attn_scalar all line up with
    HF's reference implementation."""
    from transformers import Gemma2Config as HFGemma2Config
    from transformers import Gemma2ForCausalLM

    from metal_flash_attention_tpu.models import gemma

    hf_cfg = HFGemma2Config(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        intermediate_size=256, max_position_embeddings=512,
        sliding_window=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=32,
        attention_dropout=0.0)
    torch.manual_seed(1)
    model = Gemma2ForCausalLM(hf_cfg).eval()
    cfg = convert.config_from_hf_gemma2(hf_cfg, dtype=jnp.float32)
    params = convert.params_from_hf_gemma2(model, cfg)
    rng = np.random.default_rng(83)
    # longer than the sliding window so local layers actually mask
    tokens = rng.integers(0, 256, (2, 24)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gemma.forward(params, jnp.asarray(tokens, jnp.int32),
                            cfg)
    err = float(np.max(np.abs(np.asarray(ours) - hf_logits)))
    assert err < 2e-3, err


def test_llama31_rope_scaling_matches_hf():
    """rope_type="llama3" frequency scaling: converted forward matches
    HF with a scaled-RoPE config (positions past the smoothing band
    exercise all three branches of the rule)."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=256, max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(2)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = convert.config_from_hf_llama(hf_cfg, dtype=jnp.float32)
    assert cfg.rope_scaling_factor == 8.0
    params = convert.params_from_hf_llama(model, cfg)
    rng = np.random.default_rng(85)
    tokens = rng.integers(0, 256, (2, 48)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama.forward(params, jnp.asarray(tokens, jnp.int32),
                            cfg)
    err = float(np.max(np.abs(np.asarray(ours) - hf_logits)))
    assert err < 2e-3, err


def test_qwen2_bias_matches_hf():
    """Qwen2 (llama geometry + q/k/v biases): converted forward
    matches HF's Qwen2 reference."""
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    hf_cfg = HFQwen2Config(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=256, max_position_embeddings=512,
        rope_theta=10000.0, attention_dropout=0.0,
        tie_word_embeddings=False, use_sliding_window=False)
    torch.manual_seed(3)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = convert.config_from_hf_llama(hf_cfg, dtype=jnp.float32)
    params = convert.params_from_hf_llama(model, cfg)
    assert "bq" in params["layers"][0]      # biases converted
    rng = np.random.default_rng(87)
    tokens = rng.integers(0, 256, (2, 24)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama.forward(params, jnp.asarray(tokens, jnp.int32),
                            cfg)
    err = float(np.max(np.abs(np.asarray(ours) - hf_logits)))
    assert err < 2e-3, err
    # serving path with biases
    ref = serving.generate(params, jnp.asarray(tokens[:1], jnp.int32),
                           cfg, max_new_tokens=4)
    with torch.no_grad():
        hf_out = model.generate(torch.from_numpy(tokens[:1]),
                                max_new_tokens=4, do_sample=False,
                                num_beams=1, pad_token_id=0).numpy()[0]
    assert np.asarray(ref)[0].tolist() == hf_out.tolist()


def test_mistral_sliding_window_matches_hf():
    """Mistral (llama geometry + every-layer sliding window):
    converted forward matches HF with a window shorter than the
    prompt, through both the training path and the paged serving
    path."""
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM

    hf_cfg = HFMistralConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=256, max_position_embeddings=512,
        rope_theta=10000.0, sliding_window=8,
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(4)
    model = MistralForCausalLM(hf_cfg).eval()
    cfg = convert.config_from_hf_llama(hf_cfg, dtype=jnp.float32)
    assert cfg.sliding_window == 8
    params = convert.params_from_hf_llama(model, cfg)
    rng = np.random.default_rng(89)
    tokens = rng.integers(0, 256, (2, 24)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = llama.forward(params, jnp.asarray(tokens, jnp.int32),
                            cfg)
    err = float(np.max(np.abs(np.asarray(ours) - hf_logits)))
    assert err < 2e-3, err
    # paged serving path (chunked prefill + windowed paged decode)
    ref = serving.paged_generate(params,
                                 jnp.asarray(tokens[:1], jnp.int32),
                                 cfg, max_new_tokens=4, page_size=16)
    with torch.no_grad():
        hf_out = model.generate(torch.from_numpy(tokens[:1]),
                                max_new_tokens=4, do_sample=False,
                                num_beams=1, pad_token_id=0).numpy()[0]
    assert np.asarray(ref)[0].tolist() == hf_out.tolist()
