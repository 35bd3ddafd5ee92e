#!/usr/bin/env python
"""Hardware matmul-precision probe + rigid-geometry drift check.

Two failure modes this catches (both invisible to the CPU test suite):

1. TPU matmuls at DEFAULT precision round f32 inputs to bfloat16 - in XLA
   and in Mosaic alike. This engine moves POSITIONS through matmuls
   (one-hot footprint reads, per-replica expansions, phase contractions;
   CLAUDE.md invariant #3), so bf16 rounding quantizes geometry to ~1e-2 A.
   maniac_tpu/__init__.py pins jax_default_matmul_precision="highest";
   stage 1 verifies that an in-kernel and an XLA one-hot read are EXACT
   under the engine's import-time config.

2. Rigid molecules must stay rigid: every accepted rotation re-derives
   site offsets from stored positions, so any read/rounding error
   accumulates as O-H bond deformation. Found as an SPC/E NVT energy
   collapse (U/N -11 -> -2000 kcal/mol as H sites escaped their oxygen's
   LJ shield). Stage 2 runs a short SPC/E NVT block sequence on the
   CURRENT default dispatch path and asserts max |d(O-H)| stays at f32
   rounding scale.

Usage: python tools/precision_probe.py [--blocks 8] [--path blockg|xla]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage1():
    import maniac_tpu  # noqa: F401  (applies the engine's precision pin)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = rng.uniform(-20, 20, (8, 256)).astype(np.float32)
    oh = np.zeros((256, 8), np.float32)
    for j in range(8):
        oh[100 + j, j] = 1.0
    want = np.stack([x[:, 100 + j] for j in range(8)], 1).astype(np.float64)

    got = np.asarray(jnp.dot(jnp.asarray(x), jnp.asarray(oh),
                             preferred_element_type=jnp.float32), np.float64)
    e_xla = np.abs(got - want).max()

    def k(x_ref, oh_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], oh_ref[...],
                             preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        interpret=jax.devices()[0].platform == "cpu")
    e_pal = np.abs(np.asarray(f(jnp.asarray(x), jnp.asarray(oh)),
                              np.float64) - want).max()
    print(f"stage 1: one-hot read error  xla={e_xla:.3e}  pallas={e_pal:.3e}")
    ok = e_xla == 0.0 and e_pal == 0.0
    print("stage 1:", "PASS" if ok else
          "FAIL (bf16 rounding live - is jax_default_matmul_precision set?)")
    return ok


def stage2(blocks, path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if path:
        os.environ["MANIAC_PALLAS"] = {"blockg": "blockg", "xla": "0"}[path]
    from maniac_tpu import load_system
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated
    from maniac_tpu.systems import make_spce_box

    tmp = tempfile.mkdtemp()
    make_spce_box(tmp, n_water=64, density=0.997, temp=298.0, cutoff=6.0,
                  tol=1e-5, probs=(0.5, 0.5, 0.0, 0.0), tstep=0.25,
                  rstep=0.4, recal=True)
    sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                       f"{tmp}/parameters.inc", dtype=jnp.float32,
                       capacity=96)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, 8)
    for _ in range(blocks):
        states = run_block_replicated(spec, states, 2000, True)
    pos = np.asarray(states.pos, np.float64)                # (B, 3, S)
    n = int(np.asarray(states.n_mol)[:, 0].min())
    dev = 0.0
    for b in range(pos.shape[0]):
        for m in range(n):
            o = pos[b, :, 3 * m]
            for h in (1, 2):
                dev = max(dev, abs(np.linalg.norm(
                    pos[b, :, 3 * m + h] - o) - 1.0))
    print(f"stage 2: {blocks} blocks x 2000 NVT steps, "
          f"max |d(O-H)| = {dev:.3e} A")
    # f32 rounding random-walk scale is ~1e-6; bf16 geometry rounding was
    # 1e-1 per 4 blocks. 1e-4 cleanly separates them.
    ok = dev < 1e-4
    print("stage 2:", "PASS" if ok else "FAIL (rigid geometry deforming)")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--path", choices=["blockg", "xla"], default=None)
    args = ap.parse_args()
    ok = stage1()
    ok = stage2(args.blocks, args.path) and ok
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
