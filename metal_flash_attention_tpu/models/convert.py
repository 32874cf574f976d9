"""HuggingFace checkpoint conversion.

Bridges real-world checkpoints into the framework's parameter pytrees
so `models/serving.py`, the `ServingEngine`, and the training stack
run production weights unchanged.  torch stays on the loading path
only — weights convert to numpy once and everything downstream is
JAX.

Also the framework's strongest correctness anchor: the test suite
builds a random-weight HF `LlamaForCausalLM`, converts it, and checks
our fused-kernel forward against HF's reference implementation
logit-for-logit (tests/test_convert.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from metal_flash_attention_tpu.models import llama


def config_from_hf_llama(hf_config, dtype=jnp.bfloat16
                         ) -> llama.LlamaConfig:
    """Map a `transformers.LlamaConfig` (or Qwen2Config — same
    geometry fields) onto :class:`LlamaConfig`, including Llama-3.1
    `rope_type="llama3"` frequency scaling when present."""
    kw = {}
    rs = getattr(hf_config, "rope_scaling", None)
    if rs:
        rtype = rs.get("rope_type", rs.get("type"))
        if rtype != "llama3":
            raise ValueError(f"unsupported rope_scaling: {rtype}")
        kw = dict(
            rope_scaling_factor=float(rs["factor"]),
            rope_low_freq_factor=float(rs["low_freq_factor"]),
            rope_high_freq_factor=float(rs["high_freq_factor"]),
            rope_original_max_position=int(
                rs["original_max_position_embeddings"]),
        )
    window = getattr(hf_config, "sliding_window", None)
    if window is not None and not getattr(hf_config,
                                          "use_sliding_window", True):
        window = None                     # Qwen2 gates it by a flag
    return llama.LlamaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=(hf_config.num_key_value_heads
                    or hf_config.num_attention_heads),
        hidden_dim=hf_config.intermediate_size,
        rope_theta=float(hf_config.rope_theta),
        norm_eps=float(hf_config.rms_norm_eps),
        sliding_window=(None if window is None else int(window)),
        dtype=dtype,
        **kw,
    )


def params_from_hf_llama(model_or_state_dict, cfg: llama.LlamaConfig
                         ) -> dict:
    """Convert HF Llama weights to this framework's pytree.

    Accepts a `LlamaForCausalLM` (or anything with ``state_dict()``)
    or a raw state dict of torch/numpy tensors.  torch stores linear
    weights as ``[out, in]`` acting by ``y = x @ W.T``; ours act by
    ``y = x @ W``, so every projection transposes once here.  HF's
    GPT-NeoX-style split-half RoPE matches `llama.apply_rope`
    exactly, so no permutation of head columns is needed.  Models
    with ``tie_word_embeddings`` reuse the embedding as the lm head.
    """
    sd = (model_or_state_dict.state_dict()
          if hasattr(model_or_state_dict, "state_dict")
          else model_or_state_dict)

    def get(name):
        t = sd[name]
        arr = t.detach().cpu().float().numpy() if hasattr(t, "detach") \
            else np.asarray(t, np.float32)
        return arr

    def lin(name):
        return jnp.asarray(get(name).T, cfg.dtype)

    def norm(name):
        return jnp.asarray(get(name), jnp.float32)

    pfx = "model." if any(k.startswith("model.") for k in sd) else ""
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{pfx}layers.{i}."
        layer = {
            "wq": lin(lp + "self_attn.q_proj.weight"),
            "wk": lin(lp + "self_attn.k_proj.weight"),
            "wv": lin(lp + "self_attn.v_proj.weight"),
            "wo": lin(lp + "self_attn.o_proj.weight"),
            "w_gate": lin(lp + "mlp.gate_proj.weight"),
            "w_up": lin(lp + "mlp.up_proj.weight"),
            "w_down": lin(lp + "mlp.down_proj.weight"),
            "attn_norm": norm(lp + "input_layernorm.weight"),
            "mlp_norm": norm(lp + "post_attention_layernorm.weight"),
        }
        # Qwen2-style q/k/v biases, when the checkpoint carries them.
        for bn, hn in (("bq", "q_proj"), ("bk", "k_proj"),
                       ("bv", "v_proj")):
            key = lp + f"self_attn.{hn}.bias"
            if key in sd:
                layer[bn] = jnp.asarray(get(key), cfg.dtype)
        layers.append(layer)
    embed = jnp.asarray(get(pfx + "embed_tokens.weight"), cfg.dtype)
    if "lm_head.weight" in sd:
        lm_head = lin("lm_head.weight")
    else:                                  # tied embeddings
        lm_head = embed.T
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": norm(pfx + "norm.weight"),
        "lm_head": lm_head,
    }


def config_from_hf_gemma2(hf_config, dtype=jnp.bfloat16):
    """Map a `transformers.Gemma2Config` onto GemmaConfig (same
    even-layer sliding-window alternation, (1+w) norms, soft-caps,
    query_pre_attn_scalar)."""
    from metal_flash_attention_tpu.models import gemma

    return gemma.GemmaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=hf_config.num_key_value_heads,
        head_dim=hf_config.head_dim,
        hidden_dim=hf_config.intermediate_size,
        rope_theta=float(hf_config.rope_theta),
        norm_eps=float(hf_config.rms_norm_eps),
        sliding_window=int(hf_config.sliding_window),
        attn_logit_softcap=hf_config.attn_logit_softcapping,
        final_logit_softcap=hf_config.final_logit_softcapping,
        query_pre_attn_scalar=float(hf_config.query_pre_attn_scalar),
        dtype=dtype,
    )


def params_from_hf_gemma2(model_or_state_dict, cfg) -> dict:
    """Convert HF Gemma-2 weights (tied embeddings; four per-layer
    norms; norm gains stored as w, applied as 1 + w on both sides)."""
    sd = (model_or_state_dict.state_dict()
          if hasattr(model_or_state_dict, "state_dict")
          else model_or_state_dict)

    def get(name):
        t = sd[name]
        return (t.detach().cpu().float().numpy()
                if hasattr(t, "detach") else np.asarray(t, np.float32))

    def lin(name):
        return jnp.asarray(get(name).T, cfg.dtype)

    def norm(name):
        return jnp.asarray(get(name), jnp.float32)

    pfx = "model." if any(k.startswith("model.") for k in sd) else ""
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{pfx}layers.{i}."
        layers.append({
            "wq": lin(lp + "self_attn.q_proj.weight"),
            "wk": lin(lp + "self_attn.k_proj.weight"),
            "wv": lin(lp + "self_attn.v_proj.weight"),
            "wo": lin(lp + "self_attn.o_proj.weight"),
            "w_gate": lin(lp + "mlp.gate_proj.weight"),
            "w_up": lin(lp + "mlp.up_proj.weight"),
            "w_down": lin(lp + "mlp.down_proj.weight"),
            "pre_attn_norm": norm(lp + "input_layernorm.weight"),
            "post_attn_norm": norm(
                lp + "post_attention_layernorm.weight"),
            "pre_mlp_norm": norm(
                lp + "pre_feedforward_layernorm.weight"),
            "post_mlp_norm": norm(
                lp + "post_feedforward_layernorm.weight"),
        })
    return {
        "embed": jnp.asarray(get(pfx + "embed_tokens.weight"),
                             cfg.dtype),
        "layers": layers,
        "final_norm": norm(pfx + "norm.weight"),
    }
