#!/usr/bin/env python
"""Dump compiled HLO of the block step and grep interesting ops."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(os.environ.get("PROF_B", "1024"))
    NS = 50
    from maniac_tpu import load_system
    from maniac_tpu.systems import make_zif_like
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated

    with tempfile.TemporaryDirectory() as tmp:
        make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
        sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                           f"{tmp}/parameters.inc", dtype=jnp.float32,
                           capacity=512)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, B)

    lowered = jax.jit(run_block_replicated, static_argnums=(2, 3)).lower(
        spec, states, NS, False)
    txt = lowered.compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    pats = [p for p in os.environ.get(
        "HLO_GREP", "copy.669|closed_call.27|closed_call.28|"
        "select_select_fusion.3|compare_reduce_fusion.7").split("|")]
    for line in txt.splitlines():
        if any(p in line for p in pats):
            print(line.strip()[:400])


if __name__ == "__main__":
    main()
