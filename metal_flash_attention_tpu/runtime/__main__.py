"""Autotune CLI: populate the persistent kernel-config cache on the
current hardware.

    python -m metal_flash_attention_tpu.runtime [--kernel forward]
        [--head-dims 64,128,256] [--seq 4096] [--gemm]

The measured winners land in the config cache (and the native store),
exactly as the reference's registration-time autotune seeds its
pipeline cache (`GEMMDescriptor+PipelineCache.swift:75-119`) — run once
per new chip type, then every kernel resolution is a lookup.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser(
        description="metal_flash_attention_tpu autotuner")
    parser.add_argument("--kernel", default="forward",
                        choices=["forward", "backward_query"])
    parser.add_argument("--head-dims", default="64,128,256")
    parser.add_argument("--seq", type=int, default=4096)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--causal", action="store_true")
    parser.add_argument("--gemm", action="store_true",
                        help="also tune GEMM at 1024^3 / 4096^3")
    args = parser.parse_args()

    from metal_flash_attention_tpu.runtime.autotune import (
        autotune_attention,
        autotune_gemm,
    )
    from metal_flash_attention_tpu.runtime.context import DeviceContext

    ctx = DeviceContext.get()
    print(f"device: {ctx.device_kind} ({ctx.generation}), "
          f"roofline {ctx.roofline_ginstrs_per_s:,.0f} GINSTRS/s")

    dtype = jnp.dtype(args.dtype).type
    for d in (int(x) for x in args.head_dims.split(",")):
        winner, results = autotune_attention(
            kernel_type=args.kernel, n=args.seq, head_dim=d,
            heads=args.heads, dtype=dtype, causal=args.causal,
            verbose=True)
        print(f"{args.kernel} D={d}: winner {winner} "
              f"({min(results.values()) * 1e3:.3f} ms)")

    if args.gemm:
        for size in (1024, 4096):
            winner, results = autotune_gemm(
                m=size, n=size, k=size, dtype=dtype, verbose=True)
            print(f"gemm {size}^3: winner {winner}")


if __name__ == "__main__":
    main()
