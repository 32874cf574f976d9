"""Model layer: Llama-3-style, Gemma-2-style, and Mixtral-style MoE
transformers built on the fused attention kernels, plus the serving
and fine-tuning stack around them.  The reference ships no model layer
(`SURVEY.md §0`); these are the serving/benchmark vehicles for
BASELINE configs 4-5.

- `llama` / `gemma` / `moe` — model families (Gemma exercises the
  window + soft-capping kernel paths; MoE the routed-expert FFN).
- `serving` — prefill/decode loops, paged pools, quantized KV
  (static-prefix and streaming page-flush), speculative decoding,
  sampling, beam search, burst decode, tensor-parallel steps.
- `engine` — continuous-batching `ServingEngine` (chunked prefill,
  per-request sampling/stop/logprobs/logit-bias/priority, automatic
  prefix caching, speculative + quantized + burst modes, multi-LoRA).
- `prefix_cache` — chained-digest page reuse over refcounted pages.
- `lora` — stacked multi-adapter LoRA: serving selection per row and
  the frozen-base fine-tuning step.
- `losses` / `optim` — fused chunked cross-entropy and the
  production train-step builder.
"""
