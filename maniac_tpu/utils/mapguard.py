"""Raise vm.max_map_count for long-lived XLA:CPU processes.

Every compiled (or cache-deserialized) XLA:CPU executable is JIT-loaded
into the process as a handful of small mappings, and they are not
reclaimed while the executable is cached. A long-lived process that
compiles many programs (the test suite, the examples runner, repeated
CLI invocations in one interpreter) accumulates tens of thousands of
mappings and then SEGFAULTS at the kernel default
vm.max_map_count=65530: mmap fails mid-load and the JIT linker does not
check. Measured on this container: 62.5k maps one sample before a
reproducible crash at the ~100th executable load.

`ensure_map_headroom()` raises the ceiling when the process has the
privilege (root container) and is silent otherwise — the same posture as
an HPC code bumping its own ulimits. Idempotent and cheap; call it from
any entry point that may compile many programs.
"""

from __future__ import annotations

_TARGET = 262144
_done = False


def ensure_map_headroom(target: int = _TARGET) -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            current = int(f.read())
        if current < target:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(target))
    except (OSError, ValueError):
        pass
