"""maniac-tpu: a TPU-native grand-canonical Monte Carlo framework (JAX).

A from-scratch rebuild of the capabilities of maniac-mc/maniac-mc (serial
Fortran-90 GCMC): LAMMPS-style topology input, lj/cut/coul/long interactions
with full Ewald summation, and Metropolis translation / rotation / insertion
/ deletion / swap moves over rigid molecules - redesigned as pure functional
state transitions over fixed-capacity padded arrays, scanned and vmapped on
device.
"""

# single-source version: the VERSION file at the repo root (analog of the
# reference's version.txt + docs templating, /root/reference/version.txt,
# docs/source/conf.py release=). Falls back if the package is used
# detached from its checkout.
import os as _os

try:
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "VERSION")) as _f:
        __version__ = _f.read().strip()
except OSError:  # pragma: no cover - detached install
    __version__ = "0.5.0"

from .utils.hostsetup import ensure_cpu_backend

# must run before the first backend initialization (no-op otherwise):
# keeps an XLA:CPU backend available next to a pinned accelerator
# platform so setup computations can avoid the relay compile floor
ensure_cpu_backend()

import jax as _jax

# TPU matmuls round f32 inputs to bfloat16 at the DEFAULT precision - in
# XLA and in Mosaic alike (measured: a one-hot position read through a
# Pallas jnp.dot errs by 4.4e-2 at |x|~20). This engine moves POSITIONS
# through matmuls (footprint one-hot reads, per-replica expansions,
# phase/energy contractions; CLAUDE.md invariant #3), so bf16 rounding
# quantizes the geometry itself: every accepted rotation re-reads sites
# through a dot and rewrites them, deforming rigid molecules by ~1e-2 A
# per accept (found as an SPC/E NVT energy collapse; GCMC turnover masked
# it by replacing geometry with fresh templates). "highest" decomposes an
# f32 matmul into bf16 passes that recover full f32 precision (hardware-
# verified exact for one-hot reads, tools/precision_probe.py stage 1).
# Mosaic lowers only DEFAULT and HIGHEST, so there is no cheaper 3-pass
# middle ground at the config level; the hot kernels instead avoid the
# MXU for selection/broadcast patterns and use kernels/common.py dot3
# (manual 3-pass, ~1.5e-5 relative - inside the f32 dE spec) for the
# big energy contractions. CPU is unaffected (f32 matmuls are native).
_jax.config.update("jax_default_matmul_precision", "highest")

from .api import LoadedSystem, load_system                     # noqa: F401
from .system import SimState, SystemSpec                       # noqa: F401
from .mc.driver import drift_report, initialize_state, run_block  # noqa: F401
