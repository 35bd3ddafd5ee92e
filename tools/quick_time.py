#!/usr/bin/env python
"""Quick TPU timing of the current step + resync at bench scale."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


_reduce = None


def sync(x):
    # reduce to one scalar ON DEVICE, then host-transfer it: block_until_ready
    # returns early through the axon relay, and np.asarray of a big leaf
    # would drag megabytes through a ~400 MB/s tunnel into the timing
    global _reduce
    if _reduce is None:
        _reduce = jax.jit(lambda l: jnp.sum(l.reshape(-1)[:8]))
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(_reduce(leaf))


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    B = int(os.environ.get("PROF_B", "1024"))
    NS = int(os.environ.get("PROF_STEPS", "50"))
    system = os.environ.get("PROF_SYSTEM", "zif")
    from maniac_tpu import load_system
    from maniac_tpu.systems import (make_framework_mixed, make_water_box,
                                    make_water_reservoir, make_zif_like)
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated
    from maniac_tpu.mc.driver import resync_amplitudes_replicated

    from maniac_tpu.utils.setupcache import cached_spec_state
    cap_default = {"bigS": 2500}.get(system, 512)
    cap = int(os.environ.get("PROF_CAP", str(cap_default)))

    def build():
        with tempfile.TemporaryDirectory() as tmp:
            res_file = None
            if system == "zif":
                make_zif_like(tmp, n_cells=6, a=5.66, n_water=32,
                              fugacity=30.0)
            elif system == "mixed":
                make_framework_mixed(tmp, n_cells=6, a=5.66, n_water=24,
                                     n_dimer=12, cutoff=8.5, tol=1e-5,
                                     probs=(0.25, 0.15, 0.4, 0.2))
            elif system == "resv":
                make_water_box(tmp, n_water=48, L=24.0, cutoff=8.0,
                               tol=1e-5, probs=(0.3, 0.2, 0.5, 0.0),
                               fugacity=4000.0)
                res_file = make_water_reservoir(tmp, n_water=96, L=24.0)
            elif system == "bigS":
                make_water_box(tmp, n_water=2000, L=40.0, cutoff=8.5,
                               tol=1e-5, probs=(0.3, 0.2, 0.5, 0.0),
                               fugacity=4000.0)
            else:
                raise SystemExit(f"unknown PROF_SYSTEM={system}")
            sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                               f"{tmp}/parameters.inc", dtype=jnp.float32,
                               capacity=cap, reservoir_file=res_file,
                               device_put=False)
        return sysm.spec, sysm.state

    spec, state = cached_spec_state(
        f"qt-v2|{system}|cap={cap}|dtype=f32", build)
    states = replicate(spec, state, B)
    # replicate() is host-side (numpy views); commit the batch to the
    # device ONCE so repeated timing dispatches from the same input
    # don't re-pay a ~120 MB relay transfer per call
    spec, states = jax.device_put((spec, states),
                                  jax.local_devices()[0])
    print(f"# B={B} S={spec.S} K={spec.K} kmax={spec.kmax_xyz} "
          f"dev={jax.devices()[0]}")

    t = timeit(lambda s: run_block_replicated(spec, s, NS, False), states)
    print(f"scan{NS}: {t/NS*1e3:8.3f} ms/step  ({B*NS/t/1e6:.3f} M steps/s)")

    t = timeit(lambda s: resync_amplitudes_replicated(spec, s), states, n=3)
    print(f"resync:  {t*1e3:8.3f} ms/block")


if __name__ == "__main__":
    main()
