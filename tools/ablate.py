#!/usr/bin/env python
"""Ablation timing: knock out pieces of the MC step (by monkeypatching the
functions moves.py calls) and measure the scan-step delta. More honest than
standalone microbenches, which carry a multi-ms dispatch floor through the
relay."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_red = {}


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    key = (leaf.shape, str(leaf.dtype))
    if key not in _red:
        _red[key] = jax.jit(lambda l: jnp.sum(l.reshape(-1)[:8]))
    float(_red[key](leaf))


def main():
    B = int(os.environ.get("PROF_B", "1024"))
    NS = 50
    from maniac_tpu import load_system
    from maniac_tpu.systems import make_zif_like
    from maniac_tpu.parallel.replicas import replicate
    from maniac_tpu.mc import moves, driver
    from maniac_tpu.kernels import pair as kpair
    from maniac_tpu.physics import energy as E

    with tempfile.TemporaryDirectory() as tmp:
        make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
        sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                           f"{tmp}/parameters.inc", dtype=jnp.float32,
                           capacity=512)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, B)
    print(f"# B={B} S={spec.S} K={spec.K} dev={jax.devices()[0]}")

    def scan_time():
        def block(st):
            key, sub = jax.random.split(st.key)
            keys = jax.random.split(sub, NS)
            st = st.replace(key=key)
            def body(s, k):
                return moves.mc_step(spec, s, k), None
            s, _ = jax.lax.scan(body, st, keys)
            return s
        fn = jax.jit(jax.vmap(block))
        out = fn(states)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(out)
        sync(out)
        return (time.perf_counter() - t0) / 4 / NS * 1e3

    base = scan_time()
    print(f"full step              {base:8.3f} ms")

    orig_pallas = kpair.pair_footprint_pallas
    orig_amp = moves.amp_delta
    orig_red = moves.recip_energy_delta
    orig_intra = moves.intra_energy

    def zero_pair(spec_, *a, **k):
        z = jnp.zeros(2, spec_.dtype)
        return z, z
    kpair.pair_footprint_pallas = zero_pair
    t = scan_time()
    print(f"- pair kernel          {t:8.3f} ms  (pair = {base-t:6.3f})")
    kpair.pair_footprint_pallas = orig_pallas

    moves.amp_delta = lambda s, p, q, m, sg: (jnp.zeros(s.K, s.dtype),
                                              jnp.zeros(s.K, s.dtype))
    t = scan_time()
    print(f"- amp_delta            {t:8.3f} ms  (amp  = {base-t:6.3f})")
    moves.amp_delta = orig_amp

    moves.recip_energy_delta = lambda s, a, b, c, d: jnp.zeros((), s.dtype)
    t = scan_time()
    print(f"- recip_delta          {t:8.3f} ms  (rdel = {base-t:6.3f})")
    moves.recip_energy_delta = orig_red

    moves.intra_energy = lambda s, p, q, m: jnp.zeros((), s.dtype)
    t = scan_time()
    print(f"- intra                {t:8.3f} ms  (intr = {base-t:6.3f})")
    moves.intra_energy = orig_intra

    # all of the above at once (leaves RNG, slicing, acceptance, state update)
    kpair.pair_footprint_pallas = zero_pair
    moves.amp_delta = lambda s, p, q, m, sg: (jnp.zeros(s.K, s.dtype),
                                              jnp.zeros(s.K, s.dtype))
    moves.recip_energy_delta = lambda s, a, b, c, d: jnp.zeros((), s.dtype)
    moves.intra_energy = lambda s, p, q, m: jnp.zeros((), s.dtype)
    t = scan_time()
    print(f"- all energies         {t:8.3f} ms  (skeleton: rng+slice+update)")


if __name__ == "__main__":
    main()
