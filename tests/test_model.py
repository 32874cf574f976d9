"""Flagship model tests: forward, decode-with-cache consistency,
training step, and the multichip dryrun on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(setup):
    cfg, params = setup
    tokens = jnp.zeros((2, 64), jnp.int32)
    logits, caches = llama.forward(params, tokens, cfg)
    assert logits.shape == (2, 64, cfg.vocab_size)
    assert len(caches) == cfg.n_layers
    assert caches[0][0].shape == (2, cfg.n_kv_heads, 64, cfg.head_dim)
    assert bool(jnp.isfinite(logits).all())


def test_decode_matches_prefill(setup):
    """Token-by-token decode with KV cache must match full prefill."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)

    full_logits, _ = llama.forward(params, tokens, cfg)

    # Prefill the first 8, then decode 8 tokens one at a time.
    prefix, caches = llama.forward(params, tokens[:, :8], cfg)
    outs = [prefix]
    for t in range(8, 16):
        pos = jnp.full((1, 1), t, jnp.int32)
        step_logits, caches = llama.forward(
            params, tokens[:, t:t + 1], cfg, positions=pos,
            kv_caches=caches)
        outs.append(step_logits)
    decoded = jnp.concatenate(outs, axis=1)
    err = float(jnp.max(jnp.abs(decoded - full_logits)))
    assert err < 2e-2, err  # bf16 accumulation differences


def test_loss_fused_ce_matches_naive(setup):
    """The default fused chunked-CE loss equals the materialized
    log-softmax loss (same bf16 forward, fp32 loss math)."""
    cfg, params = setup
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (2, 48)),
        jnp.int32)
    fused = llama.loss_fn(params, tokens, cfg)
    naive = llama.loss_fn(params, tokens, cfg, fused_ce=False)
    # bf16 hidden states: on the real chip the fused and naive lm-head
    # GEMMs fuse/reassociate differently at bf16 scale (measured up to
    # ~3e-4 on a ~6.0 loss); hermetic CPU (true-fp32 DEFAULT) agrees
    # to ~1e-6.
    assert abs(float(fused) - float(naive)) < 1e-3, (fused, naive)

    g_f = jax.grad(lambda p: llama.loss_fn(p, tokens, cfg))(params)
    g_n = jax.grad(lambda p: llama.loss_fn(p, tokens, cfg,
                                           fused_ce=False))(params)
    err = max(float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_n)))
    assert err < 2e-2, err  # bf16 param-grad storage rounding


def test_train_step(setup):
    cfg, params = setup
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 64)),
        jnp.int32)
    new_params, loss = llama.train_step(params, tokens, cfg)
    assert bool(jnp.isfinite(loss))
    # Parameters actually moved.
    delta = float(jnp.max(jnp.abs(
        new_params["lm_head"].astype(jnp.float32)
        - params["lm_head"].astype(jnp.float32))))
    assert delta > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    logits = jax.jit(fn)(*args)
    assert bool(jnp.isfinite(logits).all())


def test_forward_context_parallel_ring(rng):
    """Model forward with the sequence sharded over the context axis:
    the attention core runs the differentiable ring."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from metal_flash_attention_tpu.parallel.mesh import (
        DATA_AXIS,
        make_mesh,
    )

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(data=1, heads=2, context=2)
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=4, n_kv_heads=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 128)),
                         jnp.int32)
    logits_ring, _ = jax.jit(
        lambda p, t: llama.forward(p, t, cfg, mesh=mesh))(params, tokens)
    logits_ref, _ = llama.forward(params, tokens, cfg)
    assert float(jnp.max(jnp.abs(logits_ring - logits_ref))) < 0.1


def test_remat_matches_plain_gradients():
    """remat=True (per-layer jax.checkpoint) computes the same loss
    and gradients as the plain forward for all three families."""
    from metal_flash_attention_tpu.models import gemma, llama, moe

    rng = np.random.default_rng(67)

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)),
                       jnp.int32)
    l0, g0 = jax.value_and_grad(
        lambda p: llama.loss_fn(p, toks, cfg))(params)
    l1, g1 = jax.value_and_grad(
        lambda p: llama.loss_fn(p, toks, cfg, remat=True))(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32)))), g0, g1)
    assert max(jax.tree.leaves(d)) < 1e-5, d

    gcfg = gemma.GemmaConfig.tiny(sliding_window=16)
    gparams = gemma.init_params(jax.random.PRNGKey(1), gcfg)
    gtoks = jnp.asarray(rng.integers(0, gcfg.vocab_size, (2, 24)),
                        jnp.int32)
    gl0 = float(gemma.loss_fn(gparams, gtoks, gcfg))
    gl1 = float(gemma.loss_fn(gparams, gtoks, gcfg, remat=True))
    assert abs(gl0 - gl1) < 1e-6

    mcfg = moe.MoEConfig.tiny(n_layers=2)
    mparams = moe.init_params(jax.random.PRNGKey(2), mcfg)
    mtoks = jnp.asarray(rng.integers(0, mcfg.vocab_size, (2, 24)),
                        jnp.int32)
    ml0 = float(moe.loss_fn(mparams, mtoks, mcfg))
    ml1 = float(moe.loss_fn(mparams, mtoks, mcfg, remat=True))
    assert abs(ml0 - ml1) < 1e-6
