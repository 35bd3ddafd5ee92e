#!/usr/bin/env python
"""Capture a jax.profiler trace of the scan step and print the top device
ops by total time (parsed from the trace protobuf/json, no tensorboard)."""
import glob
import gzip
import json
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

    from maniac_tpu.utils.setupcache import cached_spec_state
    cap = int(os.environ.get("PROF_CAP", "192"))

    def build():
        with tempfile.TemporaryDirectory() as tmp:
            make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
            sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                               f"{tmp}/parameters.inc", dtype=jnp.float32,
                               capacity=cap, device_put=False)
        return sysm.spec, sysm.state

    spec, state = cached_spec_state(f"zif6-v1|cap={cap}|dtype=f32", build)
    states = replicate(spec, state, B)
    # replicate() is host-side (numpy views); commit the batch to the
    # device ONCE so repeated timing dispatches from the same input
    # don't re-pay a ~120 MB relay transfer per call
    spec, states = jax.device_put((spec, states),
                                  jax.local_devices()[0])

    red = jax.jit(lambda l: jnp.sum(l.reshape(-1)[:8]))

    def run(st):
        st = run_block_replicated(spec, st, NS, False)
        float(red(st.energy))
        return st

    states = run(states)  # compile

    outdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        states = run(states)

    # find trace.json.gz and aggregate device op durations
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths)
    if not paths:
        return
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device ops live on TPU pids; aggregate by name
    agg = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        agg[name] = agg.get(name, 0) + dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/1e3:10.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
