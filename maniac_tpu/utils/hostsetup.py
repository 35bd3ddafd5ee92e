"""Host-side (XLA:CPU) placement for one-time setup computations.

Through a remote-accelerator relay every XLA compile pays the tunnel's
round-trip floor (measured ~2 min for a trivial program on a cold axon
session), and `load_system` traces ~100 small setup-only programs (spec
construction, the initial full-system energy/amplitudes). On the default
backend that is ~19 min of cold-start before a sub-second measurement
(BENCH_r02.json setup=1164 s); the same work on XLA:CPU is ~9 s.

So setup computations run under `jax.default_device(cpu)`: the resulting
arrays are UNCOMMITTED CPU arrays, and the first real device computation
that consumes them (the block program) transfers them to the accelerator
automatically - placement semantics, not copies of the code path. The
numerical results are CPU-rounded rather than TPU-rounded (if anything a
precision improvement - CPU is the repo's precision oracle); all parity
and drift invariants are established on CPU anyway (tests/conftest.py).

MANIAC_HOST_SETUP=0 disables both hooks (setup then runs wherever the
default backend is - the pre-round-3 behavior).

The environment pins JAX_PLATFORMS to the accelerator plugin only, which
would make `jax.local_devices(backend="cpu")` raise; `ensure_cpu_backend`
(called at package import, before any backend exists) appends ",cpu" to
the platform list so both backends initialize. Priority order keeps the
accelerator first, so the default backend - and therefore every real
computation - is unchanged.
"""

from __future__ import annotations

import contextlib
import os


def ensure_cpu_backend() -> None:
    """Make sure a CPU backend will be available next to a pinned
    accelerator platform. No-op unless JAX_PLATFORMS/--jax_platforms pins
    an explicit cpu-less list AND backends are not initialized yet."""
    if os.environ.get("MANIAC_HOST_SETUP", "1") == "0":
        return
    try:
        import jax
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return
        plats = jax.config.jax_platforms or os.environ.get(
            "JAX_PLATFORMS", "")
        if plats and "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        # never let a placement optimization break loading
        pass


def setup_device():
    """The device one-time setup computations should run on: XLA:CPU when
    the default backend is a (possibly remote) accelerator, else None
    (= leave placement alone)."""
    if os.environ.get("MANIAC_HOST_SETUP", "1") == "0":
        return None
    try:
        import jax

        if jax.default_backend() == "cpu":
            return None
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def setup_placement():
    """Context manager placing computations on the setup device."""
    dev = setup_device()
    if dev is None:
        return contextlib.nullcontext()
    import jax

    return jax.default_device(dev)
