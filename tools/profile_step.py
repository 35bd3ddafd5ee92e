#!/usr/bin/env python
"""Per-component timing of one batched MC step on the flagship system.

Times each piece of mc_step as an isolated jitted function at the bench
batch size, so perf regressions are attributable (VERDICT r1: nobody had
profiled a step). Host-transfer sync is the only reliable barrier through
the axon relay.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[:1]


def main():
    B = int(os.environ.get("PROF_B", "1024"))
    dtype = jnp.float32

    from maniac_tpu import load_system
    from maniac_tpu.systems import make_zif_like
    from maniac_tpu.parallel.replicas import replicate
    from maniac_tpu.mc.moves import mc_step
    from maniac_tpu.mc import driver
    from maniac_tpu.physics import energy as E

    with tempfile.TemporaryDirectory() as tmp:
        make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
        sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                           f"{tmp}/parameters.inc", dtype=dtype, capacity=512)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, B)
    print(f"# B={B} S={spec.S} K={spec.K} A_act={spec.A_act} "
          f"Mtot={spec.Mtot} dev={jax.devices()[0]}")

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)

    # full step
    step = jax.jit(jax.vmap(lambda st, k: mc_step(spec, st, k)))
    t = timeit(step, states, keys)
    print(f"full_step            {t*1e3:8.3f} ms  ({B/t/1e6:.3f} M steps/s)")

    # scan block of 10 (amortizes dispatch)
    def block10(st, k):
        ks = jax.random.split(k, 10)
        def body(s, kk):
            return mc_step(spec, s, kk), None
        s, _ = jax.lax.scan(body, st, ks)
        return s
    blk = jax.jit(jax.vmap(block10))
    t10 = timeit(blk, states, keys, n=5)
    print(f"scan10/10            {t10/10*1e3:8.3f} ms  ({B*10/t10/1e6:.3f} M steps/s)")

    # ---- components -----------------------------------------------------
    A_act = spec.A_act
    P = jnp.zeros((B, 2, A_act, 3), dtype)
    q2 = jnp.zeros((B, 2, A_act), dtype)
    cls2 = jnp.zeros((B, 2, A_act), jnp.int32)
    m2 = jnp.ones((B, 2, A_act), bool)
    signs = jnp.stack([-jnp.ones(B, dtype), jnp.ones(B, dtype)], axis=1)

    def pair_only(st, P, q2, cls2, m2):
        others = jax.vmap(lambda s: E.site_positions(spec, s))(st)
        om = jax.vmap(lambda s: E.active_site_mask(spec, s.n_mol))(st.n_mol[:, None, 0] * 0 + st.n_mol) if False else jax.vmap(lambda s: E.active_site_mask(spec, s))(st.n_mol)
        return None
    # simpler: vmap the footprint kernel directly
    others_pos = jax.jit(jax.vmap(lambda st: E.site_positions(spec, st)))(states)
    others_mask = jax.jit(jax.vmap(lambda nm: E.active_site_mask(spec, nm)))(states.n_mol)

    pair = jax.jit(jax.vmap(
        lambda op, om, P, q, c, m: E.pair_energy_footprint(
            spec, op, om, P, q, c, m,
            jnp.int32(3), jnp.int32(5))))
    t = timeit(pair, others_pos, others_mask, P, q2, cls2, m2)
    print(f"pair_energy          {t*1e3:8.3f} ms")

    posfn = jax.jit(jax.vmap(lambda st: E.site_positions(spec, st)))
    t = timeit(posfn, states)
    print(f"site_positions       {t*1e3:8.3f} ms")

    amp = jax.jit(jax.vmap(
        lambda P, q, m, s: E.amp_delta(spec, P, q, m, s)))
    t = timeit(amp, P, q2, m2, signs)
    print(f"amp_delta            {t*1e3:8.3f} ms")

    rec = jax.jit(jax.vmap(lambda re, im: E.recip_energy(spec, re, im)))
    t = timeit(rec, states.amp_re, states.amp_im)
    print(f"recip_energy         {t*1e3:8.3f} ms")

    intra = jax.jit(jax.vmap(
        lambda p, q, m: E.intra_energy(spec, p, q, m)))
    t = timeit(intra, P[:, 0], q2[:, 0], m2[:, 0])
    print(f"intra_energy         {t*1e3:8.3f} ms")

    # state write: isolate the offset/com/n_mol select machinery by running
    # a step with all energies mocked? approximate: time a where-update
    def upd(st, d_re, d_im):
        from maniac_tpu.mc.moves import _place_rows
        s_idx = jnp.arange(spec.S, dtype=jnp.int32)
        rel = s_idx - 17
        in_new = (rel >= 0) & (rel < A_act)
        rows = jnp.ones((A_act, 3), spec.dtype)
        pos = _place_rows(rel, in_new, rows, st.pos)
        amp_re = st.amp_re + 0.5 * d_re
        amp_im = st.amp_im + 0.5 * d_im
        return st.replace(pos=pos, amp_re=amp_re, amp_im=amp_im)
    updj = jax.jit(jax.vmap(upd))
    d = jnp.zeros((B, spec.K), dtype)
    t = timeit(updj, states, d, d)
    print(f"state_update(approx) {t*1e3:8.3f} ms")

    # resync cost (per block)
    rs = jax.jit(driver.resync_amplitudes_replicated)
    t = timeit(rs, spec, states, n=3)
    print(f"resync_amplitudes    {t*1e3:8.3f} ms (per block)")


if __name__ == "__main__":
    main()
