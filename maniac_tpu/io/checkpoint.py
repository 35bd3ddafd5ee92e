"""Full-fidelity checkpoint/resume.

The reference's only restart mechanism is the per-block LAMMPS topology.data
re-emit (configuration-only: counters, step sizes, reservoir and RNG state
are lost; reference: src/write_utils.f90:190-412, SURVEY.md section 5). That
path still works here (topology.data reloads via -d). This module adds a
real checkpoint: the complete SimState pytree (positions, populations,
structure factors, energies, counters, adaptive step sizes, PRNG key,
reservoir) in one .npz, bit-exact on reload - batched replica states
included.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..system import SimState, SystemSpec

_FORMAT_VERSION = 2  # v2: SimState stores absolute site positions ("pos")


def save_checkpoint(path: str, spec: SystemSpec, state: SimState,
                    block: int = 0) -> None:
    arrays = {}
    for f in dataclasses.fields(state):
        arrays["state__" + f.name] = np.asarray(getattr(state, f.name))
    arrays["meta__version"] = np.asarray(_FORMAT_VERSION)
    arrays["meta__block"] = np.asarray(block)
    arrays["meta__S"] = np.asarray(spec.S)
    arrays["meta__K"] = np.asarray(spec.K)
    arrays["meta__cap_list"] = np.asarray(spec.cap_list)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, spec: SystemSpec) -> tuple[SimState, int]:
    """Returns (state, block). Validates layout compatibility with spec."""
    with np.load(path) as z:
        if int(z["meta__version"]) != _FORMAT_VERSION:
            raise ValueError("incompatible checkpoint version")
        if int(z["meta__S"]) != spec.S or int(z["meta__K"]) != spec.K:
            raise ValueError(
                "checkpoint layout does not match the loaded system "
                f"(S={int(z['meta__S'])} vs {spec.S}, "
                f"K={int(z['meta__K'])} vs {spec.K}); use the same inputs "
                "and capacity")
        kw = {}
        for f in dataclasses.fields(SimState):
            arr = z["state__" + f.name]
            if f.name == "key":
                kw[f.name] = jnp.asarray(arr, dtype=jnp.uint32)
            elif np.issubdtype(arr.dtype, np.floating):
                kw[f.name] = jnp.asarray(arr, dtype=spec.dtype)
            else:
                kw[f.name] = jnp.asarray(arr)
        return SimState(**kw), int(z["meta__block"])
