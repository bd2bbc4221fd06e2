"""Machine-keyed persistent-compile-cache directory.

XLA:CPU persistent-cache entries contain AOT machine code; loading an
entry compiled on a host with different vector extensions crashes
(observed: a full-suite segfault in ``compilation_cache.
get_executable_and_time`` deserializing entries a different machine —
avx512 feature set — had written into ``tests/.jax_cache`` on the
shared filesystem).  Keying the cache directory by the host's CPU
fingerprint keeps each machine's entries separate while still sharing
the path convention."""

from __future__ import annotations

import hashlib
import os
import platform


def machine_cache_dir(base: str) -> str:
    key = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            flags = [l for l in f if l.startswith(("flags", "Features"))]
        if flags:
            key += "-" + hashlib.sha1(flags[0].encode()).hexdigest()[:10]
    except OSError:
        pass
    path = os.path.join(base, key)
    os.makedirs(path, exist_ok=True)
    return path


def configure(jax, base: str) -> None:
    """Point jax's persistent compile cache at the machine-keyed subdir
    of ``base``."""
    jax.config.update("jax_compilation_cache_dir", machine_cache_dir(base))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
