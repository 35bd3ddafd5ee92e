#!/usr/bin/env python
"""Component timing v2 with on-device reduction sync (the relay pulls full
arrays to host otherwise, poisoning standalone numbers)."""
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
    leaves = jax.tree_util.tree_leaves(x)
    leaf = leaves[0]
    key = (leaf.shape, str(leaf.dtype))
    if key not in _red:
        _red[key] = jax.jit(lambda l: jnp.sum(l.reshape(-1)[:8]))
    float(_red[key](leaf))


def timeit(fn, *args, n=10, warmup=2):
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
    dtype = jnp.float32
    from maniac_tpu import load_system
    from maniac_tpu.systems import make_zif_like
    from maniac_tpu.parallel.replicas import replicate
    from maniac_tpu.mc.moves import mc_step
    from maniac_tpu.physics import energy as E
    from maniac_tpu.kernels.pair import pair_footprint_pallas

    with tempfile.TemporaryDirectory() as tmp:
        make_zif_like(tmp, n_cells=6, a=5.66, n_water=32, fugacity=30.0)
        sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                           f"{tmp}/parameters.inc", dtype=dtype, capacity=512)
    spec, state = sysm.spec, sysm.state
    states = replicate(spec, state, B)
    S, K, A_act, A_pad = spec.S, spec.K, spec.A_act, spec.F_pack
    print(f"# B={B} S={S} K={K} A_pad={A_pad} dev={jax.devices()[0]}")

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    step = jax.jit(jax.vmap(lambda st, k: mc_step(spec, st, k)))
    print(f"one_step         {timeit(step, states, keys)*1e3:8.3f} ms")

    # transpose cost
    tr = jax.jit(lambda p: jnp.swapaxes(p, -1, -2))
    print(f"pos_transpose    {timeit(tr, states.pos)*1e3:8.3f} ms")

    # pallas pair (packed layout; state.pos already (3, S))
    F = spec.F_pack
    pt = jnp.zeros((B, 3, F), dtype)
    qw = jnp.zeros((B, F), dtype)
    ljw = jnp.ones((B, F), dtype)
    t0 = jnp.ones((B,), jnp.int32)
    exa = jnp.full((B,), 3, jnp.int32)
    pairk = jax.jit(jax.vmap(
        lambda po, p, q, l, ta, ea, nm: pair_footprint_pallas(
            spec, po, p, q, l, ta, ta, nm, ea, ea)))
    print(f"pallas_pair      {timeit(pairk, states.pos, pt, qw, ljw, t0, exa, states.n_mol)*1e3:8.3f} ms")

    # amp state update alone
    d0 = jnp.zeros((B, K), dtype)
    ampupd = jax.jit(lambda st, dr, di: (st.amp_re + 0.5*dr, st.amp_im + 0.5*di))
    print(f"amp_update       {timeit(ampupd, states, d0, d0)*1e3:8.3f} ms")

    # amp_delta
    P = jnp.zeros((B, 2, A_act, 3), dtype)
    q2 = jnp.zeros((B, 2, A_act), dtype)
    m2 = jnp.ones((B, 2, A_act), bool)
    signs = jnp.stack([-jnp.ones(B, dtype), jnp.ones(B, dtype)], axis=1)
    amp = jax.jit(jax.vmap(lambda P, q, m, s: E.amp_delta(spec, P, q, m, s)))
    print(f"amp_delta        {timeit(amp, P, q2, m2, signs)*1e3:8.3f} ms")

    # recip energy delta + amp update (the k-space elementwise chain)
    d = jnp.zeros((B, K), dtype)

    def kchain(st, d_re, d_im):
        de = jax.vmap(lambda a, b, c, e: E.recip_energy_delta(spec, a, b, c, e))(
            st.amp_re, st.amp_im, d_re, d_im)
        amp_re = st.amp_re + 0.5 * d_re
        amp_im = st.amp_im + 0.5 * d_im
        return de, amp_re, amp_im
    kc = jax.jit(kchain)
    print(f"kspace_chain     {timeit(kc, states, d, d)*1e3:8.3f} ms")

    # state position update
    
    from maniac_tpu.mc.moves import _place_cols
    def upd(st):
        s_idx = jnp.arange(spec.S, dtype=jnp.int32)
        rel = s_idx - 17
        in_new = (rel >= 0) & (rel < A_act)
        cols = jnp.ones((3, A_act), dtype)
        pos = _place_cols(rel, in_new, cols, st.pos)
        pos2 = _place_cols(rel + 5, in_new, cols, pos)
        return pos2
    print(f"pos_update(x2)   {timeit(jax.jit(jax.vmap(upd)), states)*1e3:8.3f} ms")

    # intra
    intra = jax.jit(jax.vmap(lambda p, q, m: E.intra_energy(spec, p, q, m)))
    print(f"intra_energy(x2) {2*timeit(intra, P[:, 0], q2[:, 0], m2[:, 0])*1e3:8.3f} ms")

    # RNG: 12-way split + draws
    def rng(k):
        ks = jax.random.split(k, 12)
        u = [jax.random.uniform(ks[i]) for i in range(7)]
        ax = jax.random.randint(ks[5], (), 0, 3)
        return sum(u) + ax
    print(f"rng_draws        {timeit(jax.jit(jax.vmap(rng)), keys)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
