"""Small shared helpers (reference: src/utils.jl)."""

from __future__ import annotations

import bz2
import gzip
import io


def open_maybe_compressed(fname: str) -> io.TextIOBase:
    """Open a text file, transparently decompressing .gz / .bz2
    (reference: src/utils.jl:9-20)."""
    if fname.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(fname, "rb"))
    if fname.endswith(".bz2"):
        return io.TextIOWrapper(bz2.open(fname, "rb"))
    return open(fname, "r")


def pos_part(x: float) -> float:
    return x if x >= 0 else 0.0


def neg_part(x: float) -> float:
    return -x if x < 0 else 0.0


def machine_fingerprint() -> str:
    """Short id of the host CPU's instruction-set profile.

    XLA:CPU AOT cache artifacts bake in the compile host's features;
    loading one on a host with a different profile can SIGILL/segfault.
    Persistent cache directories should be keyed by this."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith(("flags", "Features"))]
        return hashlib.sha1(
            (platform.machine() + (flags[0] if flags else "")).encode()
        ).hexdigest()[:12]
    except OSError:
        return platform.machine() or "unknown"


def xla_cache_dir(base: str) -> str:
    """Machine-profile-keyed subdirectory of ``base`` for the persistent
    XLA compilation cache."""
    import os

    return os.path.join(base, machine_fingerprint())


_exec_budget_used = 0


def bound_live_executables(estimate: int = 1) -> bool:
    """Library-side guard for the XLA:CPU resident-executable crash
    (docs/xla_cpu_executable_crash.md): callers that compile unbounded
    numbers of distinct programs (heterogeneous ``batch_linprog`` shape
    buckets) report each compilation here; once the process-wide budget
    (env ``TULIP_MAX_LIVE_EXECUTABLES``, default 192) is exceeded, jax's
    compiled-program caches are cleared. Re-solving a cleared shape
    recompiles in seconds instead of risking a hard SIGSEGV/SIGABRT in a
    later large compile. Returns True when a clear happened."""
    global _exec_budget_used
    import os

    budget = int(os.environ.get("TULIP_MAX_LIVE_EXECUTABLES", "192"))
    _exec_budget_used += estimate
    if _exec_budget_used < budget:
        return False
    import jax

    jax.clear_caches()
    _exec_budget_used = 0
    return True


def enable_persistent_cache(base: str) -> bool:
    """Turn on jax's persistent compilation cache under a machine-keyed
    subdir of ``base`` — unless the accelerator is reached through a
    tunneled backend (axon), where it is actively harmful: XLA compiles in
    seconds server-side, but SERIALIZING each compiled executable back
    through the tunnel into the cache blocks for minutes per program
    (measured: >300 s with the cache on vs 86 s end-to-end without, on the
    2048-LP batched program; round 3's bench artifact was lost to this).

    Returns True if the cache was enabled.
    """
    import jax

    try:
        from jax._src import xla_bridge
        if "axon" in xla_bridge.backends():
            return False
    except Exception:
        pass  # private-API drift: fall through and enable
    try:
        jax.config.update("jax_compilation_cache_dir", xla_cache_dir(base))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return False  # older jax without the knobs
    return True
