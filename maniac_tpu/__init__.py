"""maniac-tpu: a TPU-native grand-canonical Monte Carlo framework (JAX).

A from-scratch rebuild of the capabilities of maniac-mc/maniac-mc (serial
Fortran-90 GCMC): LAMMPS-style topology input, lj/cut/coul/long interactions
with full Ewald summation, and Metropolis translation / rotation / insertion
/ deletion / swap moves over rigid molecules - redesigned as pure functional
state transitions over fixed-capacity padded arrays, scanned and vmapped on
device.
"""

__version__ = "0.1.0"

from .utils.hostsetup import ensure_cpu_backend

# must run before the first backend initialization (no-op otherwise):
# keeps an XLA:CPU backend available next to a pinned accelerator
# platform so setup computations can avoid the relay compile floor
ensure_cpu_backend()

from .api import LoadedSystem, load_system                     # noqa: F401
from .system import SimState, SystemSpec                       # noqa: F401
from .mc.driver import drift_report, initialize_state, run_block  # noqa: F401
