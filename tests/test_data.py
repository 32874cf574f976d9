"""Token-shard data pipeline: shard IO roundtrip, deterministic and
resumable sampling, device placement, end-to-end with the train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from metal_flash_attention_tpu.utils.data import (
    TokenLoader,
    open_shard,
    write_shard,
)


@pytest.fixture
def shards(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate((5000, 2000)):
        p = str(tmp_path / f"shard{i}.bin")
        write_shard(p, rng.integers(0, 250, size).astype(np.uint16))
        paths.append(p)
    return paths


def test_shard_roundtrip(tmp_path):
    tokens = np.arange(1000, dtype=np.int32)
    p = str(tmp_path / "s.bin")
    write_shard(p, tokens)
    got = open_shard(p)
    assert got.dtype == np.int32 and np.array_equal(got, tokens)


def test_batches_deterministic_and_resumable(shards):
    a = TokenLoader(shards, batch=4, seq_len=16, seed=7)
    got = [np.asarray(b) for b in a.take(5)]
    assert all(b.shape == (4, 17) and b.dtype == np.int32 for b in got)
    # Same seed -> identical stream.
    b = TokenLoader(shards, batch=4, seq_len=16, seed=7)
    again = [np.asarray(x) for x in b.take(5)]
    assert all(np.array_equal(x, y) for x, y in zip(got, again))
    # Resume from the captured state mid-stream.
    c = TokenLoader(shards, batch=4, seq_len=16, seed=7)
    _ = list(c.take(3))
    state = c.state()
    d = TokenLoader.from_state(shards, 4, 16, state)
    rest = [np.asarray(x) for x in d.take(2)]
    assert all(np.array_equal(x, y) for x, y in zip(got[3:], rest))
    # Different seed -> different stream.
    e = TokenLoader(shards, batch=4, seq_len=16, seed=8)
    other = np.asarray(next(iter(e)))
    assert not np.array_equal(other, got[0])


def test_windows_are_contiguous_shard_slices(shards):
    loader = TokenLoader(shards, batch=8, seq_len=32, seed=1)
    batch = np.asarray(next(iter(loader)))
    data = [np.asarray(open_shard(p)).astype(np.int32) for p in shards]
    for row in batch:
        found = any(
            np.array_equal(row, d[s:s + 33])
            for d in data
            for s in range(d.size - 32))
        assert found, "batch row is not a contiguous shard window"


def test_loader_feeds_train_step(shards):
    from metal_flash_attention_tpu.models import llama
    from metal_flash_attention_tpu.models.optim import make_train_step

    cfg = llama.LlamaConfig.tiny(n_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    init, step = make_train_step(
        lambda p, t: llama.loss_fn(p, t, cfg), optax.sgd(1e-2))
    state = init(params)
    loader = TokenLoader(shards, batch=2, seq_len=24, seed=3)
    for batch in loader.take(2):
        assert isinstance(batch, jax.Array)
        params, state, loss = step(params, state, batch)
    assert bool(jnp.isfinite(loss))
