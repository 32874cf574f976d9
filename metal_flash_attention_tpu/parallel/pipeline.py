"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh
axis (the PP leg of the DP x TP x PP x SP x EP stack; the reference is
single-device, `SURVEY.md §2.5`).

TPU-native shape: the layer stack is split into `n_stages` groups whose
parameters are *stacked on a leading stage dimension* and sharded over
the stage axis; activations flow stage-to-stage by `ppermute` over ICI.
Each device runs the same program (SPMD): at step t it processes
microbatch t - stage_index, so the pipeline fills for n_stages - 1
steps (the GPipe bubble), streams, then drains.  Everything is plain
differentiable JAX — `jax.grad` through the pipeline gives the
backward pipeline (reverse ppermutes) for free.

Efficiency: bubble fraction = (S - 1) / (M + S - 1) for S stages and
M microbatches — pick M >> S.  Each device materializes only its own
stage's parameters and one microbatch of activations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


STAGE_AXIS = "stage"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np
    if devices is None:
        devices = jax.devices()
    assert n_stages <= len(devices)
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def stack_stage_params(per_stage_params: list):
    """[stage0_pytree, stage1_pytree, ...] -> one pytree with a leading
    stage dim (shard this dim over the stage axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def stage_param_sharding(params_stacked, mesh: Mesh):
    """NamedShardings putting the leading (stage) dim on the stage
    axis."""
    def shard_one(x):
        spec = [STAGE_AXIS] + [None] * (x.ndim - 1)
        return NamedSharding(mesh, P(*spec))
    return jax.tree.map(shard_one, params_stacked)


def pipeline(
    stage_fn: Callable,
    params_stacked,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = STAGE_AXIS,
):
    """Run x through the pipelined stage stack.

    Args:
        stage_fn: (stage_params, activation [mb, ...]) -> activation;
            one stage's computation (e.g. a group of transformer
            layers).  Must preserve the activation shape.
        params_stacked: pytree with leading dim n_stages, sharded over
            ``axis`` (see stack_stage_params / stage_param_sharding).
        x: [n_microbatches, mb, ...] microbatched input.
        mesh: mesh containing ``axis``.

    Returns [n_microbatches, mb, ...] outputs (replicated over the
    stage axis).
    """
    n_stages = mesh.shape[axis]
    n_micro = x.shape[0]
    n_steps = n_micro + n_stages - 1

    def per_device(params_local, xs):
        # params_local: leading dim 1 (this stage's slice).
        params = jax.tree.map(lambda p: p[0], params_local)
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        carry0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)

        def step(t, state):
            carry, outs = state
            # Stage 0 ingests microbatch t (clamped; invalid steps
            # compute garbage that drains out of the pipe unused —
            # the GPipe bubble).
            inject = xs[jnp.clip(t, 0, n_micro - 1)]
            a = jnp.where(is_first, inject, carry)
            y = stage_fn(params, a)
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(is_last, out_idx >= 0)
            written = jax.lax.dynamic_update_index_in_dim(
                outs, y.astype(outs.dtype),
                jnp.clip(out_idx, 0, n_micro - 1), 0)
            outs = jnp.where(valid, written, outs)
            carry = jax.lax.ppermute(y, axis, fwd_perm)
            return carry, outs

        _, outs = jax.lax.fori_loop(0, n_steps, step, (carry0, outs0))
        # Only the last stage holds real outputs; psum replicates them
        # (other stages contribute zeros).
        outs = jnp.where(is_last, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    spec_p = jax.tree.map(
        lambda p: P(*([axis] + [None] * (p.ndim - 1))), params_stacked)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_p, P()), out_specs=P(),
        check_vma=False,
    )(params_stacked, x)
