"""Mixture-of-Experts layer + Mixtral-style model (expert parallelism).

The reference is single-device and has no parallelism beyond its
threadgroup grid (`SURVEY.md §2.5`); this module supplies the EP leg
of the DP x TP x SP x EP sharding stack, TPU-native:

- **GShard-style capacity routing**: top-k gates become a one-hot
  dispatch tensor [tokens, experts, capacity]; dispatch and combine
  are einsums, so under `jit` the all-to-alls materialize from
  sharding constraints alone — no hand-written collectives (the
  "let XLA insert collectives" recipe).
- Experts shard over the mesh's `heads` axis (EP and TP share the
  model-parallel axis, the common production layout); tokens stay
  sharded over `data`.
- Load-balancing auxiliary loss (Switch/GShard form): E * sum_e
  (fraction_of_tokens_e * mean_gate_e).

Capacity semantics: each expert processes at most
`capacity_factor * tokens * top_k / n_experts` tokens; overflow
tokens lose that expert's contribution (their combine weight is
dropped), exactly like GShard — the router learns to balance.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metal_flash_attention_tpu.models import llama
from metal_flash_attention_tpu.parallel.mesh import DATA_AXIS, HEAD_AXIS


@dataclass(frozen=True)
class MoEConfig:
    """Mixtral-style: Llama backbone, MoE FFN every layer."""
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    hidden_dim: int = 14336
    n_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    aux_loss_weight: float = 0.01
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: object = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def tiny(**kw) -> "MoEConfig":
        defaults = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=256, n_experts=4,
                        top_k=2)
        defaults.update(kw)
        return MoEConfig(**defaults)


def _capacity(cfg: MoEConfig, n_tokens: int) -> int:
    cap = int(math.ceil(
        cfg.capacity_factor * n_tokens * cfg.top_k / cfg.n_experts))
    return max(cap, cfg.top_k)


def init_moe_ffn(rng: jax.Array, cfg: MoEConfig) -> dict:
    ks = jax.random.split(rng, 4)

    def dense(key, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                / math.sqrt(shape[-2])).astype(cfg.dtype)

    e, d, h = cfg.n_experts, cfg.dim, cfg.hidden_dim
    return {
        "w_router": (jax.random.normal(ks[0], (d, e), jnp.float32)
                     / math.sqrt(d)),
        "w_gate": dense(ks[1], (e, d, h)),
        "w_up": dense(ks[2], (e, d, h)),
        "w_down": dense(ks[3], (e, h, d)),
    }


def route(gates: jax.Array, top_k: int, capacity: int):
    """gates [T, E] softmax probs -> (dispatch [T, E, C] one-hot,
    combine [T, E, C] gate-weighted, aux_loss scalar).

    GShard top-k routing with per-expert capacity buckets: position of
    a token inside its expert's bucket = its rank among that expert's
    assigned tokens (cumsum order); ranks >= capacity overflow and are
    dropped from the combine.
    """
    t, e = gates.shape
    topw, topi = jax.lax.top_k(gates, top_k)            # [T, k]
    # Renormalize the selected gates (Mixtral convention).
    topw = topw / jnp.maximum(
        jnp.sum(topw, axis=-1, keepdims=True), 1e-9)

    dispatch = jnp.zeros((t, e, capacity), gates.dtype)
    combine = jnp.zeros((t, e, capacity), gates.dtype)
    # Track how many tokens each expert has admitted so far across the
    # k routing rounds (priority: round 0 first, then token order).
    used = jnp.zeros((e,), jnp.int32)
    for j in range(top_k):
        sel = topi[:, j]                                 # [T]
        onehot = jax.nn.one_hot(sel, e, dtype=jnp.int32)  # [T, E]
        rank = (jnp.cumsum(onehot, axis=0) - onehot
                + used[None, :])                         # rank per expert
        pos = jnp.sum(rank * onehot, axis=1)             # [T]
        ok = pos < capacity
        disp_j = (jax.nn.one_hot(sel, e, dtype=gates.dtype)
                  [:, :, None]
                  * jax.nn.one_hot(pos, capacity, dtype=gates.dtype)
                  [:, None, :])
        disp_j = disp_j * ok[:, None, None].astype(gates.dtype)
        dispatch = dispatch + disp_j
        combine = combine + disp_j * topw[:, j][:, None, None]
        used = used + jnp.sum(onehot, axis=0)

    # Switch/GShard load-balance loss on the full gate distribution.
    frac_tokens = jnp.mean(
        jax.nn.one_hot(topi[:, 0], e, dtype=gates.dtype), axis=0)
    mean_gates = jnp.mean(gates, axis=0)
    aux = e * jnp.sum(frac_tokens * mean_gates)
    return dispatch, combine, aux


def moe_ffn(params: dict, x: jax.Array, cfg: MoEConfig,
            mesh: Optional[Mesh] = None):
    """x [batch, seq, dim] -> (y [batch, seq, dim], aux_loss).

    The dispatch/combine einsums carry the EP sharding: with experts
    sharded over the heads axis and tokens over data, XLA lowers them
    to all-to-alls over ICI.
    """
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    gates = jax.nn.softmax(
        (xt.astype(jnp.float32) @ params["w_router"]), axis=-1)
    cap = _capacity(cfg, b * s)
    dispatch, combine, aux = route(gates, cfg.top_k, cap)

    # [E, C, d] expert inputs; constrain to the expert axis so the
    # dispatch einsum becomes the all-to-all boundary.
    xe = jnp.einsum("tec,td->ecd", dispatch.astype(jnp.float32),
                    xt.astype(jnp.float32)).astype(cfg.dtype)
    if mesh is not None:
        xe = jax.lax.with_sharding_constraint(
            xe, NamedSharding(mesh, P(HEAD_AXIS, None, None)))
    gate = jax.nn.silu(jnp.einsum(
        "ecd,edh->ech", xe, params["w_gate"]).astype(jnp.float32))
    up = jnp.einsum("ecd,edh->ech", xe, params["w_up"]).astype(jnp.float32)
    ye = jnp.einsum("ech,ehd->ecd", (gate * up).astype(cfg.dtype),
                    params["w_down"])
    if mesh is not None:
        ye = jax.lax.with_sharding_constraint(
            ye, NamedSharding(mesh, P(HEAD_AXIS, None, None)))
    y = jnp.einsum("tec,ecd->td", combine.astype(jnp.float32),
                   ye.astype(jnp.float32))
    return y.reshape(b, s, d).astype(x.dtype), aux


def _base_cfg(cfg: MoEConfig) -> llama.LlamaConfig:
    """The Llama backbone config this MoE model wraps (single source of
    truth for init_params and forward)."""
    return llama.LlamaConfig(
        vocab_size=cfg.vocab_size, dim=cfg.dim, n_layers=cfg.n_layers,
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_kv_heads,
        hidden_dim=cfg.hidden_dim, rope_theta=cfg.rope_theta,
        norm_eps=cfg.norm_eps, dtype=cfg.dtype)


def init_params(rng: jax.Array, cfg: MoEConfig) -> dict:
    """Llama backbone params with MoE FFNs."""
    params = llama.init_params(rng, _base_cfg(cfg))
    moe_keys = jax.random.split(jax.random.fold_in(rng, 1), cfg.n_layers)
    for i, layer in enumerate(params["layers"]):
        for k in ("w_gate", "w_up", "w_down"):
            del layer[k]
        layer["moe"] = init_moe_ffn(moe_keys[i], cfg)
    return params


def param_shardings(cfg: MoEConfig, mesh: Mesh) -> dict:
    """DP x TP x EP: attention TP over heads; experts sharded over the
    same model axis (dim 0 of every expert weight)."""
    col = NamedSharding(mesh, P(None, HEAD_AXIS))
    row = NamedSharding(mesh, P(HEAD_AXIS, None))
    rep = NamedSharding(mesh, P())
    ep = NamedSharding(mesh, P(HEAD_AXIS, None, None))
    layer = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "attn_norm": rep, "mlp_norm": rep,
        "moe": {"w_router": rep, "w_gate": ep, "w_up": ep, "w_down": ep},
    }
    return {
        "embed": rep,
        "layers": [jax.tree.map(lambda x: x, layer)
                   for _ in range(cfg.n_layers)],
        "final_norm": rep,
        "lm_head": col,
    }


def forward_hidden(params: dict, tokens: jax.Array, cfg: MoEConfig,
                   *, positions: Optional[jax.Array] = None,
                   kv_caches: Optional[list] = None,
                   mesh: Optional[Mesh] = None, remat: bool = False):
    """tokens [batch, seq] -> (final-norm hidden states, kv_caches,
    aux_loss) — everything up to (not including) the lm head."""
    base_cfg = _base_cfg(cfg)
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    cos, sin = llama.rope_frequencies(base_cfg, positions)
    x = params["embed"][tokens].astype(cfg.dtype)
    new_caches = []
    aux_total = 0.0

    def one_layer(layer, x, cache):
        x, kv = llama.attention_block(
            layer, x, base_cfg, cos, sin, kv_cache=cache, mesh=mesh)
        h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        y, aux = moe_ffn(layer["moe"], h, cfg, mesh=mesh)
        return x + y, kv, aux

    step = jax.checkpoint(one_layer) if remat else one_layer
    for i, layer in enumerate(params["layers"]):
        cache = kv_caches[i] if kv_caches is not None else None
        x, kv, aux = step(layer, x, cache)
        new_caches.append(kv)
        aux_total = aux_total + aux
    x = llama.rms_norm(x, params["final_norm"], cfg.norm_eps)
    return x, new_caches, aux_total / cfg.n_layers


def forward(params: dict, tokens: jax.Array, cfg: MoEConfig, **kw):
    """tokens [batch, seq] -> (logits, kv_caches, aux_loss)."""
    x, new_caches, aux = forward_hidden(params, tokens, cfg, **kw)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_caches, aux


def loss_fn(params: dict, tokens: jax.Array, cfg: MoEConfig,
            *, fused_ce: bool = True, **kw) -> jax.Array:
    """Next-token cross-entropy + load-balancing aux loss.  The
    default fuses the lm-head GEMM into the chunked online-logsumexp
    loss (models/losses.py; fused_ce=False keeps the materialized
    path — equal to fp32 tolerance, tests/test_moe.py)."""
    targets = tokens[:, 1:]
    if fused_ce:
        from metal_flash_attention_tpu.models.losses import (
            fused_cross_entropy,
        )
        x, _, aux = forward_hidden(params, tokens[:, :-1], cfg, **kw)
        nll = fused_cross_entropy(
            x.reshape(-1, x.shape[-1]), params["lm_head"],
            targets.reshape(-1).astype(jnp.int32))
        return jnp.mean(nll) + cfg.aux_loss_weight * aux
    logits, _, aux = forward(params, tokens[:, :-1], cfg, **kw)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll) + cfg.aux_loss_weight * aux


def train_step(params: dict, tokens: jax.Array, cfg: MoEConfig,
               lr: float = 1e-4, **kw):
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, tokens, cfg, **kw))(params)
    new_params = jax.tree.map(
        lambda p, g: (p.astype(jnp.float32)
                      - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new_params, loss
