"""Distribution layer: mesh construction, head/data-parallel sharded
attention (shard_map), context parallelism, and ring attention.

The reference is a single-device library (`SURVEY.md §2.5`); this layer
is the TPU-native extension that lifts its associative online-softmax
merge ((m,l,O) combine, `AttentionKernel+Softmax.swift:524-581`) from
the in-kernel traversal loop to inter-chip KV rotation.
"""
