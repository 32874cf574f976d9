"""The code snippets in README.md / docs/ execute as written.

Docs rot when examples drift from the API; every public snippet shape
used in the docs runs here (tiny sizes, hermetic CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import metal_flash_attention_tpu as mfa
from metal_flash_attention_tpu.descriptors.precision import OperandPrecision


def test_readme_quickstart_shapes():
    q = jnp.zeros((2, 8, 256, 64), jnp.bfloat16)
    k = jnp.zeros((2, 2, 256, 64), jnp.bfloat16)
    v = jnp.zeros((2, 2, 256, 64), jnp.bfloat16)
    o = mfa.flash_attention(q, k, v, causal=True)
    assert o.shape == q.shape

    m = jnp.ones((2, 8, 256, 256), bool)
    b = jnp.zeros((2, 8, 256, 256), jnp.float32)
    o = mfa.flash_attention(q, k, v, mask=m, bias=b, window_size=128)
    ids = jnp.zeros((2, 256), jnp.int32)
    o = mfa.flash_attention(q, k, v, q_segment_ids=ids,
                            kv_segment_ids=ids, causal=True)
    assert o.shape == q.shape
    # precision-mode lines
    o = mfa.flash_attention(q, k, v, low_precision_intermediates=True)
    o32 = mfa.flash_attention(q, k, v, out_dtype=jnp.float32)
    assert o.dtype == jnp.bfloat16 and o32.dtype == jnp.float32


def test_migration_guide_dispatch_facade():
    from metal_flash_attention_tpu.dispatch import build_attention

    fn = build_attention(mfa.AttentionDescriptor(
        batch=2, q_heads=8, kv_heads=2, q_len=256, kv_len=256,
        head_dim=64, causal=True))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 8, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 2, 256, 64)), jnp.bfloat16)
    o = fn(q, k, v)
    assert o.shape == q.shape and not bool(jnp.any(jnp.isnan(o)))


def test_migration_guide_quantized_kv():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 4, 128, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    kq = mfa.quantize(k, OperandPrecision.FP8_E4M3)
    vq = mfa.quantize(v, OperandPrecision.FP8_E4M3)
    o = mfa.flash_attention(q, kq, vq)
    assert o.shape == q.shape and not bool(jnp.any(jnp.isnan(o)))


def test_migration_guide_gemm_per_operand():
    """The GEMM per-operand-precision snippet: quantized B operand and
    fp32-memory/bf16-register demotion through the top-level API."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((96, 160)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((160, 64)), jnp.float32)
    qb = mfa.quantize_matrix(w, mfa.OperandPrecision.INT8,
                             contract_axis=0, per_channel=True)
    y = mfa.gemm(x, qb)
    ref = x.astype(jnp.float32) @ w
    assert float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))) < (
        0.02 * float(jnp.max(jnp.abs(ref))))

    a = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    y16 = mfa.gemm(a, b, register_precision="bf16")
    assert y16.dtype == jnp.float32  # memory dtype preserved
    assert float(jnp.max(jnp.abs(y16 - a @ b))) < 0.1 * float(
        jnp.max(jnp.abs(a @ b)))


def test_serving_guide_dense_decode():
    rng = np.random.default_rng(0)
    batch, qh, kvh, d, s = 2, 8, 2, 64, 256
    qt = jnp.asarray(rng.standard_normal((batch, qh, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, kvh, s, d)), jnp.bfloat16)
    lens = jnp.asarray([s, 100], jnp.int32)
    o = mfa.flash_decode(qt, k, v, kv_lens=lens)
    assert o.shape == qt.shape
    kq = mfa.quantize(k, OperandPrecision.INT8)
    vq = mfa.quantize(v, OperandPrecision.INT8)
    o = mfa.flash_decode(qt, kq, vq, kv_lens=lens)
    assert not bool(jnp.any(jnp.isnan(o)))


def test_serving_guide_paged_pool():
    from metal_flash_attention_tpu.ops.paged_attention import (
        init_paged_cache,
        paged_append,
        paged_decode,
        quantize_paged,
    )

    rng = np.random.default_rng(0)
    cache = init_paged_cache(num_pages=16, kv_heads=2, page_size=128,
                             head_dim=64, batch=2, max_pages=4)
    # assign pages + fill two pages per sequence
    table = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    kp = jnp.asarray(rng.standard_normal(cache.k_pages.shape),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal(cache.v_pages.shape),
                     jnp.bfloat16)
    cache = cache._replace(k_pages=kp, v_pages=vp, page_table=table,
                           lengths=jnp.asarray([256, 129], jnp.int32))
    q = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.bfloat16)
    o = paged_decode(q, cache)
    assert o.shape == q.shape and not bool(jnp.any(jnp.isnan(o)))
    o = paged_decode(q, quantize_paged(cache, OperandPrecision.INT8))
    assert not bool(jnp.any(jnp.isnan(o)))
    grown = paged_append(cache, q[:, :2, :], q[:, :2, :])
    assert int(grown.lengths[0]) == 257


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_parallelism_guide_mesh_and_ring():
    from metal_flash_attention_tpu.parallel import (
        make_mesh,
        ring_attention,
        sharded_flash_attention,
    )

    mesh = make_mesh(data=1, heads=2, context=4)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 512, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 512, 64)), jnp.bfloat16)
    o = ring_attention(mesh, causal=True)(q, k, v)
    assert o.shape == q.shape
    mesh2 = make_mesh(data=2, heads=4)
    q2 = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    v2 = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    o2 = sharded_flash_attention(mesh2, causal=True)(q2, k2, v2)
    assert o2.shape == q2.shape


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_parallelism_guide_pipeline():
    from metal_flash_attention_tpu.parallel.pipeline import (
        make_pipeline_mesh,
        pipeline,
        stack_stage_params,
    )

    mesh = make_pipeline_mesh(n_stages=4)
    rng = jax.random.PRNGKey(0)
    stages = [{"w": jax.random.normal(jax.random.fold_in(rng, i),
                                      (16, 16)) * 0.1}
              for i in range(4)]
    params = stack_stage_params(stages)
    xs = jax.random.normal(rng, (8, 2, 16))          # [n_micro, mb, d]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"])

    out = pipeline(stage_fn, params, xs, mesh=mesh)
    assert out.shape == xs.shape


def test_training_guide_stack(tmp_path):
    """docs/training.md: loss flag, optimizer step, data loader, and
    checkpoint round-trip compose."""
    import optax

    from metal_flash_attention_tpu.models import llama
    from metal_flash_attention_tpu.models.optim import make_train_step
    from metal_flash_attention_tpu.utils import checkpoint, data

    cfg = llama.LlamaConfig.tiny(n_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    data.write_shard(str(tmp_path / "s.bin"),
                     rng.integers(0, cfg.vocab_size, 4000)
                     .astype(np.uint16))
    loader = data.TokenLoader([str(tmp_path / "s.bin")], batch=2,
                              seq_len=16, seed=0)
    init, step = make_train_step(
        lambda p, b: llama.loss_fn(p, b, cfg), optax.adamw(3e-4))
    state = init(params)
    for batch in loader.take(2):
        params, state, loss = step(params, state, batch)
    assert bool(jnp.isfinite(loss))

    tree = {"params": params, "opt": state, "data": loader.state()}
    checkpoint.save(str(tmp_path / "ck"), tree, step=2)
    restored = checkpoint.restore(
        checkpoint.latest(str(tmp_path / "ck")), like=tree)
    assert restored["data"] == loader.state()
    a = jax.tree.leaves(restored["params"])[0]
    b = jax.tree.leaves(params)[0]
    assert a.dtype == b.dtype and bool(jnp.all(a == b))


def test_performance_guide_profiling_api():
    from metal_flash_attention_tpu.utils.profiling import (
        RooflineReport,
        attention_roofline,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)

    def one(q, k, v):
        return (mfa.flash_attention(q, k, v)[0, 0, :1, :1]
                .astype(jnp.float32).sum())

    rep = attention_roofline(one, (q, k, v), n=128, d=64, heads=2,
                             iters=2)
    assert isinstance(rep, RooflineReport)
    assert rep.ginstrs_per_s > 0 and "GINSTRS" in str(rep)


def test_serving_guide_decode_loop():
    from metal_flash_attention_tpu.models import llama, serving

    cfg = llama.LlamaConfig.tiny(n_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)), jnp.int32)
    cache = serving.init_cache(cfg, 2, 12)
    # jit prefill and step exactly as generate() does — eager vs
    # jitted can break bf16 argmax ties differently on TPU (the tiny
    # random model has near-tied logits).
    logits, cache = jax.jit(serving.prefill, static_argnames=("cfg",))(
        params, prompt, cfg, cache)
    tok = logits.argmax(-1).astype(jnp.int32)
    toks = [tok]
    step = jax.jit(serving.decode_step, static_argnames=("cfg",))
    for _ in range(3):
        logits, cache = step(params, tok, cfg, cache)
        tok = logits.argmax(-1).astype(jnp.int32)
        toks.append(tok)
    ref = serving.generate(params, prompt, cfg, max_new_tokens=4)
    got = jnp.stack(toks, axis=1)
    assert got.tolist() == ref[:, prompt.shape[1]:].tolist()
