"""Native (C++) runtime components.

The TPU build's equivalent of the reference's C++ layer
(`Documentation/CppReference/` — descriptors, shader cache, hash
combinators, error macros).  The compute path is XLA/Pallas; what
stays native here is the host-side runtime around it: the lock-free
kernel-config store (`src/config_store.cpp`), hash pipeline
(`src/mfa_tpu_hash.hpp`), and error discipline
(`src/mfa_tpu_error.hpp`).

Built on demand with g++ into a shared library next to the sources;
bound via ctypes (no pybind11 in this image).  Import failures degrade
gracefully — the Python-level cache in `runtime.cache` works without
the native store.
"""

from metal_flash_attention_tpu.native.build import build_native, native_lib_path

__all__ = ["build_native", "native_lib_path"]
