"""Pallas TPU kernels for the hot paths (SURVEY.md section 7 stage 7).

The XLA implementations in maniac_tpu.physics remain the reference/oracle
path (and the only path on CPU, for f64, and for tabulated potentials);
kernels here are drop-in TPU replacements selected at trace time. Two
kernels serve the step: the grouped whole-block kernel (blockg.py, the
default on TPU) and the grouped per-step kernel (stepg.py, the fallback
when whole-block residency is ineligible). Set MANIAC_PALLAS=0/1/blockg
to force the choice (default: auto - Pallas on non-CPU backends for f32).

Two earlier kernels (a per-replica fused step core and a per-replica
whole-block kernel) were deleted in round 3 after blockg superseded them:
they were opt-in, measured slower, and their only consumer was their own
parity tests, while every hot-path semantic change had to be ported 4x
(r2 VERDICT weak #7 / next #8). Their shared math lives in common.py.
"""

from __future__ import annotations

import os


def dispatch_report(spec) -> str:
    """One-line load-time explanation of which step implementation will
    serve this system and (for the XLA fallback) the first gate that
    failed — so e.g. a >4-LJ-atom molecule silently dropping off the
    Pallas path is visible in the log instead of a mystery slowdown."""
    if use_blockg(spec):
        return (f"kernel dispatch: Pallas whole-block (blockg), "
                f"G={blockg_group_size(spec)}")
    if use_pair_kernel(spec):
        return (f"kernel dispatch: Pallas per-step (stepg), "
                f"G={group_size(spec)}")
    mode = os.environ.get("MANIAC_PALLAS", "auto")
    if mode == "0":
        reason = "MANIAC_PALLAS=0"
    elif spec.force_xla:
        reason = "force_xla set on the spec"
    elif spec.dtype_name != "float32":
        reason = (f"dtype {spec.dtype_name}: kernels are f32-only, "
                  "XLA is the f64 precision oracle")
    elif spec.use_table:
        reason = "tabulated potentials (use_table) are XLA-path only"
    elif 2 * spec.Lmax > 8:
        reason = (f"molecule LJ footprint 2*Lmax={2 * spec.Lmax} exceeds "
                  "the 8-row slab layout (max 4 LJ-active atoms/molecule)")
    elif spec.is_triclinic:
        reason = ("triclinic box with inactive species outside the "
                  "framework split (blockg needs fw_split or all-active)")
    else:
        import jax
        if jax.devices()[0].platform == "cpu":
            reason = "CPU backend (auto mode enables kernels on TPU only)"
        else:
            reason = ("inactive species without framework split "
                      "(blockg needs fw_split or all-active)")
    return f"kernel dispatch: XLA path ({reason})"


def use_pair_kernel(spec) -> bool:
    """Trace-time dispatch for the grouped Pallas step-core kernel
    (kernels/stepg.py; single-replica calls run it with G=1)."""
    mode = os.environ.get("MANIAC_PALLAS", "auto")
    if mode == "0" or spec.force_xla:
        return False
    if spec.is_triclinic or spec.dtype_name != "float32":
        return False  # XLA path: 27-image search / f64 precision oracle
    if spec.use_table:
        return False  # tabulated pair potentials are XLA-path only
    if 2 * spec.Lmax > 8:
        return False  # molecules too big for the 8-row LJ slab layout
    if mode == "1":
        return True
    import jax
    return jax.devices()[0].platform != "cpu"


def group_size(spec) -> int:
    """Replicas per program for the grouped row-compacted kernel
    (kernels/stepg.py): default 16 in the Pallas regime (measured best on
    v5e for the per-step kernel), MANIAC_GROUP=N overrides (0/1 disables).
    Requires the regular kernel regime, the 8-row LJ slab layout (<=4
    LJ-active atoms per molecule), and the replica count to be divisible
    by G (callers fall back per batch otherwise)."""
    g = int(os.environ.get("MANIAC_GROUP", "16") or 16)
    if g <= 1 or not use_pair_kernel(spec) or 2 * spec.Lmax > 8:
        return 1
    return g


def blockg_group_size(spec) -> int:
    """Replicas per whole-block program (kernels/blockg.py): default 64 -
    measured best on v5e after the lane-vectorized Metropolis chain
    (G=16: 0.805 ms/step, 32: 0.755, 64: 0.720; 128 exceeds the chip's
    128 MB of physical VMEM). Multi-species / reservoir programs carry
    nA^2-sized tables and reservoir state, and large-S systems carry
    bigger per-replica state, so G scales down against a rough VMEM
    estimate rather than OOMing. MANIAC_GROUP=N overrides."""
    env = os.environ.get("MANIAC_GROUP", "")
    if env:
        return int(env)
    # multi-species starts at 64 since the round-5 generalized fw staging
    # (measured on the mixed bench: G=32 0.855 ms/step, G=64 0.791);
    # reservoir programs keep 32 (per-replica reservoir state dominates)
    g = 32 if spec.has_reservoir else 64
    JzP, JxyP = spec.amp_shape
    gb = spec.guest_base if spec.fw_split else 0
    # per-replica VMEM: pos in/out, amps in/out, COMs, footprint one-hot
    per_rep = (2 * 3 * spec.S + 4 * JzP * JxyP + 6 * (spec.Mtot + 1)
               + 2 * spec.A_act * (spec.S - gb)) * 4
    while g > 8 and g * per_rep > 40 * 1024 * 1024:
        g //= 2
    return g


def use_blockg(spec) -> bool:
    """Trace-time dispatch for the grouped whole-block kernel
    (kernels/blockg.py): G replicas x n_steps in ONE program with state
    resident in VMEM. Scope: f32, grouped LJ rows; any inactive species
    must be the frozen prefix (fw_split) so the guest keep-masks cover
    active types only. Multi-active-species (swap), reservoir systems and
    triclinic boxes (27-image min-image in-kernel; fw_split is
    orthorhombic-only so triclinic implies R == n_active) are served
    in-kernel. Default on TPU when eligible (auto); MANIAC_PALLAS=blockg
    forces it (e.g. for interpret-mode parity tests on CPU); any other
    value disables it."""
    mode = os.environ.get("MANIAC_PALLAS", "auto")
    if mode not in ("auto", "blockg") or spec.force_xla:
        return False
    ok = (spec.dtype_name == "float32"
          and not spec.use_table
          and spec.n_active >= 1
          and 2 * spec.Lmax <= 8
          and (spec.fw_split or spec.R == spec.n_active))
    if not ok:
        return False
    if mode == "blockg":
        return True
    import jax
    return jax.devices()[0].platform != "cpu"
