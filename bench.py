#!/usr/bin/env python
"""Headline benchmark: aggregate GCMC step throughput per chip on the
ZIF-8-scale water-adsorption system (BASELINE.json flagship config), with
vmapped replica chains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is measured against the driver-supplied north-star target of 1e6
accepted-move-equivalent GCMC steps/sec/chip.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_STEPS_PER_SEC = 1.0e6


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    replicas = int(os.environ.get("MANIAC_BENCH_REPLICAS", "1024"))
    steps_per_block = int(os.environ.get("MANIAC_BENCH_STEPS", "200"))
    n_blocks = int(os.environ.get("MANIAC_BENCH_BLOCKS", "5"))
    dtype_name = os.environ.get("MANIAC_BENCH_DTYPE", "f32")
    if dtype_name == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32

    from maniac_tpu import load_system
    from maniac_tpu.mc.driver import resync_amplitudes_replicated
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated
    from maniac_tpu.systems import make_zif_like

    with tempfile.TemporaryDirectory() as tmp:
        make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
        sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                           f"{tmp}/parameters.inc", dtype=dtype,
                           capacity=512)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, replicas)

    def sync(st):
        # a host transfer is the only reliable barrier on remote backends
        # (block_until_ready can return early through the axon relay)
        return float(np.asarray(st.energy).reshape(-1)[-1])

    resync = dtype_name != "f64"  # f32 runs bound amplitude drift per block

    def one_block(st):
        st = run_block_replicated(spec, st, steps_per_block, False)
        if resync:
            st = resync_amplitudes_replicated(spec, st)
        return st

    # compile + warmup (excluded from timing)
    states = one_block(states)
    sync(states)

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        states = one_block(states)
    sync(states)
    elapsed = time.perf_counter() - t0

    total_steps = replicas * steps_per_block * n_blocks
    rate = total_steps / elapsed

    sys.stderr.write(
        f"# device={jax.devices()[0]} dtype={dtype_name} replicas={replicas} "
        f"S={spec.S} K={spec.K} steps={total_steps:,} elapsed={elapsed:.2f}s "
        f"mean_N={float(np.asarray(states.n_mol)[:, 1].mean()):.1f}\n")
    print(json.dumps({
        "metric": "gcmc_steps_per_sec_per_chip_zif8_h2o",
        "value": round(rate, 1),
        "unit": "MC steps/s/chip",
        "vs_baseline": round(rate / TARGET_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
