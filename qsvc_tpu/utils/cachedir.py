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
        # hash ISA flags AND the model identity: XLA:CPU bakes
        # model-derived tuning pseudo-features (e.g. +prefer-no-gather)
        # into AOT entries, so two hosts with identical flag sets but
        # different model/stepping still produce incompatible entries
        # (observed: foreign-entry load warning under a flags-only key)
        ident = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "vendor_id",
                                    "cpu family", "model", "stepping")):
                    ident.append(line.strip())
                if line.strip() == "" and ident:
                    break               # first processor block only
        if ident:
            key += "-" + hashlib.sha1(
                "\n".join(ident).encode()).hexdigest()[:12]
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
