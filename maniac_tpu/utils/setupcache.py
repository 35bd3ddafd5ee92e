"""Disk cache for built (SystemSpec, SimState) pairs.

System construction (synthetic topology generation, parsing, Ewald table
builds, and the initial full-energy jit through the axon relay) costs
60-140 s per bench/profiling run -- by far the largest share of a tuning
iteration (VERDICT round 1, "bench setup cost"). Both pytrees are plain
frozen dataclasses of array leaves + static python metadata, so they
pickle cleanly once leaves are materialized as numpy.

The cache key hashes the caller-supplied config string TOGETHER with the
content of every maniac_tpu source file, so any change to spec layout or
physics invalidates the cache automatically (no stale-spec debugging).

Used by bench.py and tools/; tests never touch it. Disable with
MANIAC_SETUP_CACHE=0, or point MANIAC_SETUP_CACHE at a directory
(default: <tmp>/maniac-setup-cache).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

_SRC_HASH = None


def _source_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, _, names in sorted(os.walk(root)):
            # kernels/mc/parallel/cli never run during system construction;
            # a kernel- or driver-tuning edit must not invalidate the built
            # (spec, state) pairs
            if os.path.basename(dirpath) in ("kernels", "mc", "parallel"):
                continue
            for n in sorted(names):
                if n == "cli.py":
                    continue
                if n.endswith(".py"):
                    with open(os.path.join(dirpath, n), "rb") as f:
                        h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _to_numpy(tree):
    import jax
    import numpy as np
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def cached_spec_state(config_key: str, build):
    """Return build()'s (spec, state), memoized on disk.

    config_key must uniquely describe the system configuration (builder
    name + every parameter, dtype, capacity). build() -> (spec, state).
    """
    cdir = os.environ.get("MANIAC_SETUP_CACHE", "")
    if cdir == "0":
        return build()
    if not cdir:
        cdir = os.path.join(tempfile.gettempdir(), "maniac-setup-cache")
    os.makedirs(cdir, exist_ok=True)
    digest = hashlib.sha256(
        (config_key + "|" + _source_hash()).encode()).hexdigest()[:24]
    path = os.path.join(cdir, digest + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    out = build()
    out = _to_numpy(out)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return out
