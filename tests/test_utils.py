"""Dispatch facade, profiling accounting, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_flash_attention_tpu import dispatch
from metal_flash_attention_tpu.descriptors.attention_descriptor import (
    AttentionDescriptor,
)
from metal_flash_attention_tpu.ops.reference import attention_reference
from metal_flash_attention_tpu.utils import checkpoint
from metal_flash_attention_tpu.utils.profiling import (
    RooflineReport,
    attention_roofline,
)
from metal_flash_attention_tpu.utils.tolerances import max_abs_err


class TestDispatch:
    def test_descriptor_dispatch_matches_golden(self, rng):
        desc = AttentionDescriptor(
            batch=1, q_heads=2, kv_heads=2, q_len=200, kv_len=200,
            head_dim=64, causal=True)
        fn = dispatch.build_attention(desc)
        q = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 2, 200, 64)), jnp.float32)
        o = fn(q, k, v)
        o_ref = jax.vmap(jax.vmap(
            lambda a, b, c: attention_reference(a, b, c, causal=True)))(
            q, k, v)
        assert max_abs_err(o, o_ref) < 3e-5

    def test_dispatch_cache_hit(self):
        dispatch.clear_dispatch_cache()
        desc = AttentionDescriptor(q_len=128, kv_len=128, head_dim=64)
        f1 = dispatch.build_attention(desc)
        f2 = dispatch.build_attention(desc)
        assert f1 is f2
        assert dispatch.cache_info()["dispatch_entries"] == 1

    def test_dispatch_rejects_wrong_shape(self, rng):
        desc = AttentionDescriptor(q_len=128, kv_len=128, head_dim=64)
        fn = dispatch.build_attention(desc)
        q = jnp.zeros((1, 1, 64, 64), jnp.float32)
        with pytest.raises(AssertionError):
            fn(q, q, q)


class TestProfiling:
    def test_roofline_report(self, rng):
        from metal_flash_attention_tpu.ops.flash_attention import (
            flash_attention,
        )
        n, d = 128, 64
        q = jnp.asarray(rng.standard_normal((1, 1, n, d)), jnp.float32)
        rep = attention_roofline(
            lambda q, k, v: flash_attention(q, k, v),
            (q, q, q), n=n, d=d, iters=2, dispatch_floor=0.0)
        assert isinstance(rep, RooflineReport)
        assert rep.ginstrs_per_s > 0
        assert "GINSTRS/s" in str(rep)


class TestCheckpoint:
    def _tree(self):
        return {
            "layers": [
                {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                 "b": jnp.ones((3,), jnp.bfloat16)},
            ],
            "step_scale": jnp.asarray(0.5, jnp.float32),
        }

    def test_roundtrip(self, tmp_path):
        tree = self._tree()
        f = checkpoint.save(str(tmp_path), tree)
        like = jax.tree.map(jnp.zeros_like, tree)
        got = checkpoint.restore(f, like)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(tree)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32))

    def test_step_history_pruned(self, tmp_path):
        tree = self._tree()
        for s in range(5):
            checkpoint.save(str(tmp_path), tree, step=s, keep=2)
        import os
        ckpts = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("ckpt_"))
        assert ckpts == ["ckpt_00000003.npz", "ckpt_00000004.npz"]
        assert checkpoint.latest(str(tmp_path)).endswith(
            "ckpt_00000004.npz")

    def test_shape_mismatch_rejected(self, tmp_path):
        tree = self._tree()
        f = checkpoint.save(str(tmp_path), tree)
        bad = dict(tree)
        bad["step_scale"] = jnp.zeros((2,), jnp.float32)
        with pytest.raises(ValueError):
            checkpoint.restore(f, bad)

    def test_resume_training(self, tmp_path):
        """End-to-end: save mid-training, restore, losses match."""
        from metal_flash_attention_tpu.models import llama
        cfg = llama.LlamaConfig.tiny(n_layers=1)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)),
            jnp.int32)
        p1, loss1 = llama.train_step(params, tokens, cfg)
        f = checkpoint.save(str(tmp_path), p1, step=1)
        restored = checkpoint.restore(f, jax.tree.map(jnp.zeros_like, p1))
        _, loss_a = llama.train_step(p1, tokens, cfg)
        _, loss_b = llama.train_step(restored, tokens, cfg)
        assert float(jnp.abs(loss_a - loss_b)) == 0.0
