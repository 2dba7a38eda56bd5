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
