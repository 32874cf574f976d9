"""Production train-step builder: AdamW with bf16 master weights and
gradient accumulation over the Llama family."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metal_flash_attention_tpu.models import llama
from metal_flash_attention_tpu.models.optim import make_train_step


def _setup():
    cfg = llama.LlamaConfig.tiny(n_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)),
                         jnp.int32)
    return cfg, params, tokens


def test_adamw_decreases_loss_with_master_weights():
    cfg, params, tokens = _setup()

    def loss_fn(p, batch):
        return llama.loss_fn(p, batch, cfg)

    init, step = make_train_step(loss_fn, optax.adamw(3e-3))
    state = init(params)
    step = jax.jit(step)
    _, _, l0 = step(params, state, tokens)
    p, s = params, state
    for _ in range(8):
        p, s, loss = step(p, s, tokens)
    assert bool(jnp.isfinite(loss)) and float(loss) < float(l0)
    # bf16 params re-round from the fp32 shadow, dtypes preserved.
    assert all(a.dtype == b.dtype for a, b in zip(
        jax.tree.leaves(p), jax.tree.leaves(params)))
    shadow_dt = {x.dtype for x in jax.tree.leaves(s["shadow"])}
    assert shadow_dt == {jnp.dtype(jnp.float32)}


def test_master_weights_accumulate_small_updates():
    """Updates far below one bf16 ulp must still accumulate through
    the fp32 shadow (the reason master weights exist)."""
    p = {"w": jnp.full((128,), 256.0, jnp.bfloat16)}  # ulp = 2.0

    def loss_fn(p, _):
        return jnp.sum(p["w"].astype(jnp.float32)) * 1e-2

    # SGD lr=1.0 -> update 1e-2 per step: invisible in bf16 at 256.
    init, step = make_train_step(loss_fn, optax.sgd(1.0))
    state = init(p)
    for _ in range(150):
        p, state, _ = step(p, state, None)
    # 150 * 0.01 = 1.5 moved in fp32; bf16 copy must have crossed at
    # least one representable boundary (i.e. the shadow carried it).
    assert float(p["w"][0]) < 256.0
    init_nm, step_nm = make_train_step(loss_fn, optax.sgd(1.0),
                                       master_weights=False)
    p2 = {"w": jnp.full((128,), 256.0, jnp.bfloat16)}
    s2 = init_nm(p2)
    for _ in range(150):
        p2, s2, _ = step_nm(p2, s2, None)
    assert float(p2["w"][0]) == 256.0   # lost to rounding without it


def test_gradient_accumulation_matches_large_batch():
    cfg, params, _ = _setup()
    rng = np.random.default_rng(1)
    big = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)),
                      jnp.int32)

    def loss_fn(p, batch):
        return llama.loss_fn(p, batch, cfg)

    init, step1 = make_train_step(loss_fn, optax.sgd(1e-2))
    _, step4 = make_train_step(loss_fn, optax.sgd(1e-2),
                               accum_steps=4)
    state = init(params)
    p1, _, l1 = step1(params, state, big)
    micro = big.reshape(4, 1, 32)
    p4, _, l4 = step4(params, init(params), micro)
    # Means of per-microbatch losses/grads == the full-batch mean
    # (token counts are uniform across microbatches).
    assert abs(float(l1) - float(l4)) < 1e-3
    err = max(float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)))
    assert err < 2e-2, err   # bf16 re-round noise only


def test_train_loop_matches_single_steps():
    """make_train_loop (K optimizer updates per dispatch) reproduces
    the K-fold single-step trajectory: same losses, same params."""
    import optax

    from metal_flash_attention_tpu.models import llama
    from metal_flash_attention_tpu.models.optim import (
        make_train_loop,
        make_train_step,
    )

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(63)
    K = 4
    batches = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (K, 2, 24)), jnp.int32)

    def loss(p, batch):
        return llama.loss_fn(p, batch, cfg)

    tx = optax.adamw(1e-3)
    init_s, step = make_train_step(loss, tx)
    step = jax.jit(step)
    p1, s1 = params, init_s(params)
    losses1 = []
    for i in range(K):
        p1, s1, l = step(p1, s1, batches[i])
        losses1.append(float(l))

    init_l, loop = make_train_loop(loss, tx, steps_per_call=K)
    loop = jax.jit(loop)
    p2, s2, losses2 = loop(params, init_l(params), batches)
    np.testing.assert_allclose(np.asarray(losses2), losses1,
                               rtol=2e-5, atol=2e-5)
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), p1, p2)
    assert max(jax.tree.leaves(d)) < 3e-3, d
