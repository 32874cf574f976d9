"""Production training-step construction over the model families.

The per-family ``train_step`` helpers (llama/gemma/moe) are plain SGD
demos wired for the multichip dryrun.  This module is the production
layer a deployment actually trains with:

- any optax optimizer (AdamW by default) with bf16-safe *master
  weights*: parameters stored bf16 get an fp32 shadow inside the
  optimizer state, updates apply in fp32, and the bf16 params are
  re-rounded from the shadow each step — without this, AdamW updates
  (lr * 1e-4 scale) vanish under bf16's ~3-decimal-digit mantissa;
- gradient accumulation by `lax.scan` over microbatches (the
  jit-friendly loop: one traced body, no Python unrolling), averaging
  grads in fp32;
- one jit covers the whole step; pair with `utils/checkpoint.save` /
  `restore` for fault tolerance (opt_state is a pytree like any
  other).

No reference analog: the Metal reference stops at kernels.  This is
deliberately thin glue over optax — the TPU-idiomatic optimizer stack
— not a re-implementation of it.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def _to_fp32(tree):
    return jax.tree.map(lambda x: x.astype(jnp.float32), tree)


def make_train_step(
    loss_fn: Callable[..., jax.Array],
    optimizer: Optional[optax.GradientTransformation] = None,
    *,
    accum_steps: int = 1,
    master_weights: bool = True,
):
    """Build ``(init_fn, step_fn)`` around a scalar ``loss_fn(params,
    batch)``.

    init_fn(params) -> state          (optimizer state [+ fp32 shadow])
    step_fn(params, state, batch) -> (params, state, loss)

    ``batch`` is any pytree; with ``accum_steps > 1`` every leaf must
    carry a leading microbatch axis of that length and gradients are
    averaged in fp32 across it.  ``master_weights`` keeps an fp32
    shadow of any non-fp32 parameter in the state and re-rounds the
    working copy from it each step.
    """
    optimizer = optimizer or optax.adamw(1e-4)

    def init_fn(params):
        shadow = _to_fp32(params) if master_weights else None
        # Optimizer moments track the fp32 shadow, not the bf16 copy.
        return {"opt": optimizer.init(shadow if master_weights
                                      else params),
                "shadow": shadow}

    def _grads(params, batch):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, batch)

        def micro(carry, mb):
            loss_sum, g_sum = carry
            loss, g = jax.value_and_grad(loss_fn)(params, mb)
            g_sum = jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), g_sum, g)
            return (loss_sum + loss, g_sum), None

        zeros = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)
        (loss_sum, g_sum), _ = jax.lax.scan(
            micro, (jnp.zeros((), jnp.float32), zeros), batch,
            length=accum_steps)
        inv = 1.0 / accum_steps
        return loss_sum * inv, jax.tree.map(lambda g: g * inv, g_sum)

    def step_fn(params, state, batch):
        loss, grads = _grads(params, batch)
        grads = _to_fp32(grads)
        anchor = state["shadow"] if master_weights else params
        updates, opt = optimizer.update(grads, state["opt"], anchor)
        new_anchor = optax.apply_updates(anchor, updates)
        if master_weights:
            new_params = jax.tree.map(
                lambda p, s: s.astype(p.dtype), params, new_anchor)
            return new_params, {"opt": opt, "shadow": new_anchor}, loss
        return new_anchor, {"opt": opt, "shadow": None}, loss

    return init_fn, step_fn


def make_train_loop(
    loss_fn: Callable[..., jax.Array],
    optimizer: Optional[optax.GradientTransformation] = None,
    *,
    steps_per_call: int,
    accum_steps: int = 1,
    master_weights: bool = True,
):
    """Like :func:`make_train_step` but each call runs
    ``steps_per_call`` FULL optimizer updates inside one jit
    (`lax.scan` over the step) — the training analog of the serving
    engine's burst decode: the host round-trip (~25 ms over a TPU
    tunnel) and per-dispatch launch overheads amortize K-fold, which
    is what dominates small-model training throughput on a tunnel.

    loop_fn(params, state, batches) -> (params, state, losses [K])

    ``batches``: the per-step batch pytree with an extra LEADING axis
    of length ``steps_per_call`` (before any microbatch axis).  Loss
    curves are bitwise the K-fold single-step trajectory whenever the
    per-step computation is (same trace row-wise).
    """
    init_fn, step_fn = make_train_step(
        loss_fn, optimizer, accum_steps=accum_steps,
        master_weights=master_weights)

    def loop_fn(params, state, batches):
        def body(carry, batch):
            p, s = carry
            p, s, loss = step_fn(p, s, batch)
            return (p, s), loss

        (params, state), losses = jax.lax.scan(
            body, (params, state), batches, length=steps_per_call)
        return params, state, losses

    return init_fn, loop_fn
