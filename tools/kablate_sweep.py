#!/usr/bin/env python
"""In-process MANIAC_KABLATE sweep: build the system once, recompile the
block step per ablation flag, print the time saved by each section.

Usage: python tools/kablate_sweep.py [ablate1 ablate2 ...]
Env: PROF_B / PROF_STEPS / PROF_SYSTEM / PROF_CAP as in quick_time.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_time import sync, timeit  # noqa: E402  (same tools dir)


def main():
    import jax

    B = int(os.environ.get("PROF_B", "1024"))
    NS = int(os.environ.get("PROF_STEPS", "50"))
    system = os.environ.get("PROF_SYSTEM", "zif")
    ablations = sys.argv[1:] or ["guest", "fw", "far", "kspace", "kstruct",
                                 "pos", "fpread", "ampc", "intra", "prop",
                                 "ktab", "ft", "win", "com", "met", "cnt",
                                 "eng", "stage", "fwmath", "phase"]
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated
    from maniac_tpu.utils.setupcache import cached_spec_state
    cap_default = {"bigS": 2500}.get(system, 512)
    cap = int(os.environ.get("PROF_CAP", str(cap_default)))

    def build():  # pragma: no cover - cache miss path delegates to quick_time
        raise SystemExit("run tools/quick_time.py once first to fill the "
                         "setup cache for this config")

    spec, state = cached_spec_state(f"qt-v2|{system}|cap={cap}|dtype=f32",
                                    build)
    states = replicate(spec, state, B)
    # replicate() is host-side (numpy views); commit the batch to the
    # device ONCE so repeated timing dispatches from the same input
    # don't re-pay a ~120 MB relay transfer per call
    spec, states = jax.device_put((spec, states),
                                  jax.local_devices()[0])
    print(f"# B={B} S={spec.S} K={spec.K} kmax={spec.kmax_xyz} "
          f"dev={jax.devices()[0]}", flush=True)

    def run(flag):
        os.environ["MANIAC_KABLATE"] = flag
        # the flag is read at trace time inside run_block_grouped, and
        # run_block_replicated is itself @jax.jit - drop its cache so the
        # new flag actually retraces
        run_block_replicated.clear_cache()
        return timeit(lambda s: run_block_replicated(spec, s, NS, False),
                      states)

    # all runs force-reject every move ("rej" gate): ablating an energy
    # section otherwise changes accept decisions, so populations - and the
    # cost of the population-dependent passes - diverge between variants
    live = run("")
    base = run("rej")
    print(f"live:     {live/NS*1e3:8.3f} ms/step", flush=True)
    print(f"base(rej):{base/NS*1e3:8.3f} ms/step", flush=True)
    for ab in ablations:
        t = run(f"rej,{ab}")
        print(f"-{ab:8s} {t/NS*1e3:8.3f} ms/step  (section ~"
              f"{(base-t)/NS*1e3:6.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
