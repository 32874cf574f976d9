"""Multi-adapter LoRA for serving: many tenants' low-rank adapters
resident at once, selected PER BATCH ROW inside one fixed-shape jit.

The S-LoRA / multi-LoRA-vLLM capability: adapters are stacked along a
leading axis (``A [n_adapters, in, r]``, ``B [n_adapters, r, out]``)
and a per-row id vector gathers each sequence's adapter before two
thin einsums add the low-rank delta:

    y = x @ W + (x @ A[ids]) @ B[ids]

On TPU the gather is a cheap HBM read ([b, in, r] with r = 8..64) and
both einsums run on the MXU batched over rows — no per-request
dispatch, no weight swapping, and batch rows with different adapters
share every step (the engine passes each slot's id).  Adapter 0 is
initialized with B = 0, i.e. it IS the base model — unadapted
requests ride the same jit at the cost of the (zero) delta.

Scaling (alpha / rank) is folded into B at init so the hot path never
multiplies by it.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

ATTN_PROJS = ("wq", "wk", "wv", "wo")


def init_lora_adapters(rng: jax.Array, cfg, n_adapters: int,
                       rank: int, *, projs=ATTN_PROJS,
                       alpha: float | None = None,
                       b_scale: float = 0.0) -> dict:
    """Stacked LoRA adapters for the llama family.

    Standard init: A ~ N(0, 1/in), B = 0 (every adapter starts as the
    identity; training or loading fills B).  ``b_scale > 0`` gives
    adapters 1.. random non-zero B (test/benchmark use).  Adapter 0
    always keeps B = 0 — the base-model row.  ``alpha`` defaults to
    ``rank`` (scaling 1.0) and is folded into B."""
    assert set(projs) <= set(ATTN_PROJS), projs
    alpha = float(alpha if alpha is not None else rank)
    scaling = alpha / rank
    dims = {
        "wq": (cfg.dim, cfg.n_heads * cfg.head_dim),
        "wk": (cfg.dim, cfg.n_kv_heads * cfg.head_dim),
        "wv": (cfg.dim, cfg.n_kv_heads * cfg.head_dim),
        "wo": (cfg.n_heads * cfg.head_dim, cfg.dim),
    }
    layers = []
    for li in range(cfg.n_layers):
        layer = {}
        for pj in projs:
            d_in, d_out = dims[pj]
            rng, ka, kb = jax.random.split(rng, 3)
            a = (jax.random.normal(ka, (n_adapters, d_in, rank),
                                   jnp.float32)
                 / math.sqrt(d_in)).astype(cfg.dtype)
            if b_scale > 0.0:
                b = (jax.random.normal(
                    kb, (n_adapters, rank, d_out), jnp.float32)
                    * b_scale)
                b = b.at[0].set(0.0)      # adapter 0 == base model
            else:
                b = jnp.zeros((n_adapters, rank, d_out), jnp.float32)
            layer[pj] = (a, (b * scaling).astype(cfg.dtype))
        layers.append(layer)
    return {"rank": rank, "layers": layers}


def apply_lora(h: jax.Array, pair, ids: jax.Array) -> jax.Array:
    """Per-row low-rank delta: h [b, s, in] -> [b, s, out] using
    row-gathered adapters (ids int32 [b])."""
    a, b = pair
    down = jnp.einsum("bsd,bdr->bsr", h, a[ids])
    return jnp.einsum("bsr,bro->bso", down, b[ids])


def make_lora_train_step(tx, cfg):
    """Fine-tuning step: base params FROZEN (they enter as
    non-differentiated arguments — no gradient masking machinery),
    only the adapter (A, B) stacks train.  ``tx`` is any optax
    transform over the adapters' ``layers`` pytree.

    >>> adapters = init_lora_adapters(key, cfg, n_adapters=1, rank=16)
    >>> tx = optax.adamw(1e-3)
    >>> opt_state = tx.init(adapters["layers"])
    >>> step = jax.jit(make_lora_train_step(tx, cfg),
    ...                static_argnames=())
    >>> adapters, opt_state, loss = step(adapters, opt_state,
    ...                                  params, tokens)

    The same adapters then serve through the engine
    (``ServingEngine(..., lora=adapters)``) — training and serving
    share `apply_lora`, so what you train is what you deploy.
    """
    import optax

    from metal_flash_attention_tpu.models import llama

    def step(adapters, opt_state, params, tokens, lora_ids=None):
        rank = adapters["rank"]

        def loss(layers):
            return llama.loss_fn(
                params, tokens, cfg,
                lora={"rank": rank, "layers": layers},
                lora_ids=lora_ids)

        l, grads = jax.value_and_grad(loss)(adapters["layers"])
        updates, opt_state = tx.update(grads, opt_state,
                                       adapters["layers"])
        layers = optax.apply_updates(adapters["layers"], updates)
        return {"rank": rank, "layers": layers}, opt_state, l

    return step
