"""Llama-3-style transformer on the fused attention kernels.

Functional JAX (pure pytree params, no framework dependency): RMSNorm,
rotary embeddings, GQA attention via
`metal_flash_attention_tpu.ops.flash_attention`, SwiGLU MLP.

Sharding model (BASELINE config 5: "Llama-3-8B-style attention layer"):
- data axis: batch (DP)
- heads axis: attention heads + MLP hidden (TP); GQA KV heads
  co-located with their query-head group, so attention itself is
  communication-free; the O/down projections psum over TP
- context axis: sequence (SP/ring) for long context

All matmuls are jnp einsums under `jit` — XLA lays collectives from
sharding constraints; only the attention core is an explicit Pallas
kernel (wrapped in shard_map when a mesh is given).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metal_flash_attention_tpu.ops.flash_attention import flash_attention
from jax import shard_map

from metal_flash_attention_tpu.parallel.mesh import (
    CONTEXT_AXIS,
    DATA_AXIS,
    HEAD_AXIS,
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    hidden_dim: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    # Llama-3.1-style RoPE frequency scaling ("rope_type: llama3"):
    # low-frequency components stretch by `factor`, high-frequency
    # ones stay, mid-band interpolates smoothly — long-context
    # checkpoints (3.1+) need this or positions past the original
    # window degrade.  None = no scaling (Llama-3.0 and earlier).
    rope_scaling_factor: Optional[float] = None
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    # Mistral-style sliding-window attention on EVERY layer (Gemma's
    # alternating local/global lives in models/gemma.py instead).
    sliding_window: Optional[int] = None
    dtype: object = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Test-scale config."""
        defaults = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=256)
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def llama3_8b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)


def init_params(rng: jax.Array, cfg: LlamaConfig) -> dict:
    """Initialize a parameter pytree (truncated-normal fan-in)."""
    keys = jax.random.split(rng, cfg.n_layers + 2)

    def dense(key, shape):
        fan_in = shape[0]
        return (jax.random.normal(key, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append({
            "wq": dense(ks[0], (cfg.dim, cfg.n_heads * cfg.head_dim)),
            "wk": dense(ks[1], (cfg.dim, cfg.n_kv_heads * cfg.head_dim)),
            "wv": dense(ks[2], (cfg.dim, cfg.n_kv_heads * cfg.head_dim)),
            "wo": dense(ks[3], (cfg.n_heads * cfg.head_dim, cfg.dim)),
            "w_gate": dense(ks[4], (cfg.dim, cfg.hidden_dim)),
            "w_up": dense(ks[5], (cfg.dim, cfg.hidden_dim)),
            "w_down": dense(ks[6], (cfg.hidden_dim, cfg.dim)),
            "attn_norm": jnp.ones((cfg.dim,), jnp.float32),
            "mlp_norm": jnp.ones((cfg.dim,), jnp.float32),
        })
    return {
        "embed": dense(keys[-2], (cfg.vocab_size, cfg.dim)),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "lm_head": dense(keys[-1], (cfg.dim, cfg.vocab_size)),
    }


def param_shardings(cfg: LlamaConfig, mesh: Mesh) -> dict:
    """Tensor-parallel parameter shardings over the heads axis."""
    col = NamedSharding(mesh, P(None, HEAD_AXIS))   # column-parallel
    row = NamedSharding(mesh, P(HEAD_AXIS, None))   # row-parallel
    rep = NamedSharding(mesh, P())
    layer = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "w_gate": col, "w_up": col, "w_down": row,
        "attn_norm": rep, "mlp_norm": rep,
    }
    return {
        "embed": rep,
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": rep,
        "lm_head": col,
    }


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def rope_frequencies(cfg: LlamaConfig, positions: jax.Array):
    """positions [..., seq] -> (cos, sin) [..., seq, head_dim/2].

    With ``rope_scaling_factor`` set, applies the Llama-3.1 rule:
    wavelengths longer than orig_max/low_freq_factor divide by the
    factor, shorter than orig_max/high_freq_factor keep, and the band
    between interpolates by the smoothing coefficient — matching HF's
    `rope_type="llama3"` implementation."""
    half = cfg.head_dim // 2
    freqs = cfg.rope_theta ** (
        -jnp.arange(0, half, dtype=jnp.float32) / half)
    scaling = getattr(cfg, "rope_scaling_factor", None)
    if scaling is not None:
        factor = float(scaling)
        lo_f = float(cfg.rope_low_freq_factor)
        hi_f = float(cfg.rope_high_freq_factor)
        orig = float(cfg.rope_original_max_position)
        wavelen = 2.0 * jnp.pi / freqs
        smooth = jnp.clip(
            (orig / wavelen - lo_f) / (hi_f - lo_f), 0.0, 1.0)
        freqs = jnp.where(
            wavelen > orig / lo_f, freqs / factor,
            jnp.where(wavelen < orig / hi_f, freqs,
                      (1.0 - smooth) * freqs / factor
                      + smooth * freqs))
    angles = positions[..., None].astype(jnp.float32) * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [batch, heads, seq, head_dim]; rotate pairs (split-half)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    return jnp.concatenate(
        [x1 * c - x2 * s, x1 * s + x2 * c], axis=-1).astype(x.dtype)


def attention_block(
    layer: dict, x: jax.Array, cfg: LlamaConfig, cos, sin,
    kv_cache: Optional[tuple] = None,
    block_q: Optional[int] = None, block_kv: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    lora_layer: Optional[dict] = None,
    lora_ids: Optional[jax.Array] = None,
):
    """x: [batch, seq, dim] -> ([batch, seq, dim], new_kv).

    With ``kv_cache = (k_prefix, v_prefix)`` runs decode: new K/V are
    appended and attention spans the whole prefix (causal).
    ``lora_layer``/``lora_ids``: per-row multi-adapter LoRA deltas on
    the attention projections (models/lora.py) — differentiable, so
    the same path serves fine-tuning.
    """
    b, s, _ = x.shape
    h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)

    def proj(name):
        y = h @ layer[name]
        bias = layer.get("b" + name[1:])   # Qwen2-style q/k/v bias
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if lora_layer is not None and name in lora_layer:
            from metal_flash_attention_tpu.models.lora import apply_lora
            ids = (lora_ids if lora_ids is not None
                   else jnp.zeros((b,), jnp.int32))
            y = y + apply_lora(h, lora_layer[name], ids)
        return y
    q = proj("wq").reshape(b, s, cfg.n_heads, cfg.head_dim)
    k = proj("wk").reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    v = proj("wv").reshape(b, s, cfg.n_kv_heads, cfg.head_dim)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if kv_cache is not None:
        k = jnp.concatenate([kv_cache[0], k], axis=2)
        v = jnp.concatenate([kv_cache[1], v], axis=2)
    window = getattr(cfg, "sliding_window", None)
    if mesh is None:
        if block_q is None and block_kv is None:
            # Production path resolves through the descriptor facade
            # (one resolution point + level-1 cache; VERDICT r2 weak
            # #8); explicit block overrides bypass it.
            from metal_flash_attention_tpu import dispatch
            o = dispatch.attention(q, k, v, causal=True,
                                   window_size=window)
        else:
            o = flash_attention(
                q, k, v, causal=True, window_size=window,
                block_q=block_q, block_kv=block_kv)
    elif CONTEXT_AXIS in mesh.shape and mesh.shape[CONTEXT_AXIS] > 1:
        # Long-context tier (BASELINE config 5): the sequence is
        # sharded over the context axis; ring attention rotates KV
        # shards over ICI with the differentiable ring backward.
        # GQA KV heads are repeated into their query group so the
        # ring's head axis matches q (ring rotates full KV shards).
        from metal_flash_attention_tpu.parallel.ring_attention import (
            _ring_attn,
        )
        group = cfg.n_heads // cfg.n_kv_heads
        if group > 1:
            k = jnp.repeat(k, group, axis=1)
            v = jnp.repeat(v, group, axis=1)
        spec = P(DATA_AXIS, HEAD_AXIS, CONTEXT_AXIS, None)
        attn = shard_map(
            lambda q_, k_, v_: _ring_attn(
                q_, k_, v_, CONTEXT_AXIS, mesh.shape[CONTEXT_AXIS],
                True, None, block_q, block_kv)[0],
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)
        o = attn(q, k, v)
    else:
        # Pallas kernels do not SPMD-partition under pjit; run the
        # attention core under shard_map over (data, heads).  GQA KV
        # heads are co-located with their query-head group, so this is
        # communication-free (SNIPPETS.md §1 pattern).
        spec = P(DATA_AXIS, HEAD_AXIS, None, None)
        attn = shard_map(
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, causal=True, window_size=window,
                block_q=block_q, block_kv=block_kv),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False)
        o = attn(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, -1)
    y = o @ layer["wo"]
    if lora_layer is not None and "wo" in lora_layer:
        from metal_flash_attention_tpu.models.lora import apply_lora
        ids = (lora_ids if lora_ids is not None
               else jnp.zeros((b,), jnp.int32))
        y = y + apply_lora(o, lora_layer["wo"], ids)
    return x + y.astype(x.dtype), (k, v)


def mlp_block(layer: dict, x: jax.Array, cfg: LlamaConfig) -> jax.Array:
    h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
    gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
    up = (h @ layer["w_up"]).astype(jnp.float32)
    return x + ((gate * up).astype(x.dtype) @ layer["w_down"]).astype(x.dtype)


def forward_hidden(
    params: dict, tokens: jax.Array, cfg: LlamaConfig,
    *, positions: Optional[jax.Array] = None,
    kv_caches: Optional[list] = None,
    block_q: Optional[int] = None, block_kv: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    lora: Optional[dict] = None, lora_ids: Optional[jax.Array] = None,
    remat: bool = False,
):
    """tokens [batch, seq] -> (final-norm hidden states [batch, seq,
    dim], kv_caches) — everything up to (not including) the lm head,
    so the training loss can fuse the head GEMM into a chunked
    cross-entropy (models/losses.py) instead of materializing
    [batch, seq, vocab] logits.

    ``remat=True`` wraps each transformer layer in `jax.checkpoint`:
    the backward pass recomputes layer activations instead of storing
    them — activation memory drops from O(layers) to O(1) layers at
    ~1/3 extra forward FLOPs, the standard trade that lets long
    sequences / big batches fit HBM."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    cos, sin = rope_frequencies(cfg, positions)
    x = params["embed"][tokens].astype(cfg.dtype)
    new_caches = []

    def one_layer(layer, x, cache, lora_layer):
        x, kv = attention_block(
            layer, x, cfg, cos, sin, kv_cache=cache,
            block_q=block_q, block_kv=block_kv, mesh=mesh,
            lora_layer=lora_layer, lora_ids=lora_ids)
        return mlp_block(layer, x, cfg), kv

    step = jax.checkpoint(one_layer) if remat else one_layer
    for i, layer in enumerate(params["layers"]):
        cache = kv_caches[i] if kv_caches is not None else None
        x, kv = step(layer, x, cache,
                     None if lora is None else lora["layers"][i])
        new_caches.append(kv)
    return rms_norm(x, params["final_norm"], cfg.norm_eps), new_caches


def forward(
    params: dict, tokens: jax.Array, cfg: LlamaConfig, **kw,
):
    """tokens [batch, seq] -> (logits [batch, seq, vocab], kv_caches)."""
    x, new_caches = forward_hidden(params, tokens, cfg, **kw)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_caches


def loss_fn(params: dict, tokens: jax.Array, cfg: LlamaConfig,
            *, fused_ce: bool = True, **kw) -> jax.Array:
    """Next-token cross-entropy (the training objective for the
    full-train-step dryrun).

    ``fused_ce`` (default) runs the lm-head GEMM inside the chunked
    online-logsumexp loss (models/losses.py): the [batch*seq, vocab]
    logits are never materialized, which is the memory that dominates
    a training step at production vocab sizes.  ``fused_ce=False``
    keeps the naive materialized path (the two agree to fp32
    tolerance; tests/test_losses.py, tests/test_model.py)."""
    targets = tokens[:, 1:]
    if fused_ce:
        from metal_flash_attention_tpu.models.losses import (
            fused_cross_entropy,
        )
        x, _ = forward_hidden(params, tokens[:, :-1], cfg, **kw)
        nll = fused_cross_entropy(
            x.reshape(-1, x.shape[-1]), params["lm_head"],
            targets.reshape(-1).astype(jnp.int32))
        return jnp.mean(nll)
    logits, _ = forward(params, tokens[:, :-1], cfg, **kw)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def train_step(params: dict, tokens: jax.Array, cfg: LlamaConfig,
               lr: float = 1e-4, **kw):
    """One SGD step; returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, tokens, cfg, **kw))(params)
    new_params = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32)
                      - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new_params, loss
