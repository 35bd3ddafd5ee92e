"""MC driver: on-device step scan, per-block recalibration, host-side loop.

The reference runs nb_block x nb_step with per-block step-size recalibration
and file output (reference: src/monte_carlo.f90:26-88 MonteCarloLoop,
src/monte_carlo_utils.f90:99-130 AdjustMoveStepSizes). Here one *block* is a
single jitted lax.scan over nb_step steps followed by an in-device
recalibration; the host loop only does I/O between blocks.

Recalibration divergence (intended-behavior fix, documented): the reference's
shrink condition `acc - 0.40 < 0.05` fires whenever the grow condition
doesn't (the tolerance band is dead code), and its rotation shrink branch
computes min(angle*1.95, MIN_ROTATION_ANGLE), pinning the angle to the
minimum (src/monte_carlo_utils.f90:108-127). We implement the symmetric rule
the constants clearly intend: grow 5% above target+tol, shrink 5% below
target-tol, clamped to [min,max].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import (MAX_ROTATION_ANGLE, MAX_TRANSLATION_STEP,
                         MIN_ROTATION_ANGLE, MIN_TRANSLATION_STEP,
                         MIN_TRIALS_FOR_RECALIBRATION, TARGET_ACCEPTANCE,
                         TOL_ACCEPTANCE, TYPE_ROTATION, TYPE_TRANSLATION)
from ..physics.energy import (active_site_mask, full_amplitudes, recip_energy,
                              site_positions, system_energy)
from ..system import E_RECIP, E_TOT, SimState, SystemSpec


def initialize_state(spec: SystemSpec, state: SimState) -> SimState:
    """Full energy + structure factors from scratch (startup; also used as
    the per-block drift audit / amplitude resync)."""
    e, amp_re, amp_im = system_energy(spec, state)
    return state.replace(amp_re=amp_re, amp_im=amp_im, energy=e)


def _recalibrate(state: SimState, recalibrate: bool, dtype) -> SimState:
    if not recalibrate:
        return state
    def adjust(step, trials, accepts, lo, hi):
        acc = accepts.astype(dtype) / jnp.maximum(trials, 1).astype(dtype)
        grown = jnp.minimum(step * 1.05, hi)
        shrunk = jnp.maximum(step * 0.95, lo)
        new = jnp.where(acc - TARGET_ACCEPTANCE > TOL_ACCEPTANCE, grown,
               jnp.where(acc - TARGET_ACCEPTANCE < -TOL_ACCEPTANCE, shrunk,
                         step))
        return jnp.where(trials > MIN_TRIALS_FOR_RECALIBRATION, new, step)

    trans = adjust(state.trans_step,
                   state.counters[0, TYPE_TRANSLATION],
                   state.counters[1, TYPE_TRANSLATION],
                   MIN_TRANSLATION_STEP, MAX_TRANSLATION_STEP)
    rot = adjust(state.rot_step,
                 state.counters[0, TYPE_ROTATION],
                 state.counters[1, TYPE_ROTATION],
                 MIN_ROTATION_ANGLE, MAX_ROTATION_ANGLE)
    return state.replace(trans_step=trans, rot_step=rot)


def run_steps(spec: SystemSpec, state: SimState, n_steps: int) -> SimState:
    """lax.scan over n_steps MC steps; the whole chain stays on device.

    All uniforms for the block come from ONE threefry invocation (per-step
    key splitting measured as a large fraction of the step cost)."""
    from .moves import N_UNIFORMS, mc_step_u
    key, sub = jax.random.split(state.key)
    uniforms = jax.random.uniform(sub, (n_steps, N_UNIFORMS),
                                  dtype=spec.dtype)
    state = state.replace(key=key)

    def body(st, u):
        return mc_step_u(spec, st, u), None

    state, _ = jax.lax.scan(body, state, uniforms)
    return state


def block_body(spec: SystemSpec, state: SimState, n_steps: int,
               recalibrate: bool) -> SimState:
    """One block: n_steps MC steps + step-size recalibration. Unjitted body,
    shared by the single-chain and vmapped-replica paths (a lax.scan of the
    unified MC step; the grouped whole-block kernel path lives in
    block_body_group)."""
    state = run_steps(spec, state, n_steps)
    return _recalibrate(state, recalibrate, spec.dtype)


@partial(jax.jit, static_argnums=(2, 3))
def run_block(spec: SystemSpec, state: SimState, n_steps: int,
              recalibrate: bool) -> SimState:
    return block_body(spec, state, n_steps, recalibrate)


def block_body_group(spec: SystemSpec, states_g: SimState, n_steps: int,
                     recalibrate: bool) -> SimState:
    """One block for a GROUP of G replicas sharing each Pallas program
    (kernels/stepg.py per step, or kernels/blockg.py for the whole block
    under MANIAC_PALLAS=blockg). Per-replica PRNG streams are identical to
    the ungrouped path, so trajectories match it exactly."""
    from ..kernels import use_blockg
    from .moves import N_UNIFORMS, mc_step_group
    split = jax.vmap(jax.random.split)(states_g.key)      # (G, 2, 2)
    uniforms = jax.vmap(lambda k: jax.random.uniform(
        k, (n_steps, N_UNIFORMS), dtype=spec.dtype))(split[:, 1])
    st = states_g.replace(key=split[:, 0])

    if use_blockg(spec):
        from ..kernels.blockg import run_block_grouped
        G = st.n_mol.shape[0]
        uq = uniforms.transpose(1, 2, 0).reshape(n_steps, N_UNIFORMS * G)
        (pos, com, amp_re, amp_im, nrow, eng, cnt, resoff, rescom,
         resn) = run_block_grouped(spec, st, uq)
        aids = [r for r in range(spec.R) if spec.active_list[r]]
        r_idx = jnp.arange(spec.R + 1)
        n_mol = st.n_mol
        for j, t in enumerate(aids):
            n_mol = jnp.where(r_idx[None, :] == t, nrow[j][:, None], n_mol)
        trials = cnt[0:5, :].T.astype(jnp.int32)          # (G, 5)
        accepts = cnt[8:13, :].T.astype(jnp.int32)
        counters = st.counters + jnp.stack([trials, accepts], axis=1)
        x_idx = jnp.arange(st.extras.shape[1])
        extras = (st.extras
                  + jnp.where(x_idx[None, :] == 0,
                              cnt[5:6, :].T.astype(jnp.int32), 0)
                  + jnp.where(x_idx[None, :] == 1,
                              cnt[6:7, :].T.astype(jnp.int32), 0))
        st = st.replace(pos=pos, com=com, amp_re=amp_re, amp_im=amp_im,
                        n_mol=n_mol, energy=eng[:6, :].T,
                        counters=counters, extras=extras)
        if spec.has_reservoir:
            Sres = st.res_offset.shape[1]
            Mres = st.res_com.shape[1]
            res_n = st.res_n
            for j, t in enumerate(aids):
                res_n = jnp.where(r_idx[None, :] == t, resn[j][:, None],
                                  res_n)
            st = st.replace(
                res_offset=resoff[:, :, :Sres].transpose(0, 2, 1)
                .astype(spec.dtype),
                res_com=rescom[:, :, :Mres].transpose(0, 2, 1)
                .astype(spec.dtype),
                res_n=res_n)
    else:
        def body(s, u_t):
            return mc_step_group(spec, s, u_t), None

        st, _ = jax.lax.scan(body, st, jnp.swapaxes(uniforms, 0, 1))
    return jax.vmap(lambda s: _recalibrate(s, recalibrate, spec.dtype))(st)


@partial(jax.jit, static_argnums=(2,))
def resync(spec: SystemSpec, state: SimState, full: bool = True) -> SimState:
    """Recompute structure factors (and the full energy) from positions."""
    return initialize_state(spec, state)


def resync_amplitudes_body(spec: SystemSpec, state: SimState) -> SimState:
    """Re-synthesize structure factors (and E_RECIP) from positions, leaving
    the other energy components running. This is the per-block float32 drift
    bound: the incremental A(k) updates accumulate rounding forever
    (reference mutates them unbounded, src/ewald_energy.f90:241-256), so f32
    runs resynthesize at block granularity (DIVERGENCES.md #13).

    On TPU this runs as a Pallas kernel accumulating in VMEM (the XLA
    expansion materializes ~45 GB of chunk temporaries per resync at bench
    scale); elsewhere it is the XLA separable synthesis."""
    from ..kernels import use_pair_kernel
    if use_pair_kernel(spec):
        from ..kernels.resync import resync_pallas
        amp_re, amp_im, energy = resync_pallas(spec, state)
        return state.replace(amp_re=amp_re, amp_im=amp_im, energy=energy)
    pos = site_positions(spec, state)
    active = active_site_mask(spec, state.n_mol)
    amp_re, amp_im = full_amplitudes(spec, pos, active)
    e_recip = recip_energy(spec, amp_re, amp_im)
    e = state.energy
    e = e.at[E_TOT].add(e_recip - e[E_RECIP])
    e = e.at[E_RECIP].set(e_recip)
    return state.replace(amp_re=amp_re, amp_im=amp_im, energy=e)


@jax.jit
def resync_amplitudes(spec: SystemSpec, state: SimState) -> SimState:
    return resync_amplitudes_body(spec, state)


@jax.jit
def refresh_reported_energy(spec: SystemSpec, states: SimState) -> SimState:
    """Exact energy components for the REPORTED replica (row 0 of a
    batched state): the reference's energy.dat is a fresh value every
    block (src/write_utils.f90:94-188), while f32 running totals wander
    by O(100 K) (DIVERGENCES.md #13). One from-scratch recompute for ONE
    replica per block replaces row 0's energy AND its amplitudes (so the
    bookkeeping invariant E_RECIP == recip_energy(amp) keeps holding for
    that replica). The chain itself never reads the non-recip components,
    so the trajectory is unperturbed."""
    st0 = jax.tree_util.tree_map(lambda x: x[0], states)
    st0 = initialize_state(spec, st0)
    return states.replace(
        energy=states.energy.at[0].set(st0.energy),
        amp_re=states.amp_re.at[0].set(st0.amp_re),
        amp_im=states.amp_im.at[0].set(st0.amp_im))


def resync_replicated_body(spec: SystemSpec, states: SimState) -> SimState:
    """Trace-time body of the replicated resync (shared by the standalone
    jit below and run_block_replicated's fused tail - one relay dispatch
    per block instead of two; the axon dispatch overhead was ~2x the
    resync's device time)."""
    import os

    from ..kernels import blockg_group_size, use_blockg, use_pair_kernel
    B = states.n_mol.shape[0]
    G = (blockg_group_size(spec) if use_blockg(spec)
         else int(os.environ.get("MANIAC_GROUP", "16") or 16))
    # the grouped resync program carries per-type/reservoir operands the
    # step kernel does not; at G=64 on multi-species systems it overflows
    # scoped VMEM (116M > 100M) even when the step kernel fits, so its
    # group size is decoupled (MANIAC_RESYNC_GROUP overrides)
    env_rg = os.environ.get("MANIAC_RESYNC_GROUP", "")
    if env_rg:
        G = int(env_rg)
    elif spec.n_active > 1 or spec.has_reservoir:
        G = min(G, 32)
    if ((use_pair_kernel(spec) or use_blockg(spec)) and G > 1
            and B % G == 0):
        # grouped resynthesis: the per-replica program was launch-overhead
        # bound at bench scale (1024 tiny programs per block)
        from ..kernels.resync import resync_pallas_grouped
        sg = jax.tree_util.tree_map(
            lambda x: x.reshape(B // G, G, *x.shape[1:]), states)

        def one(stg):
            amp_re, amp_im, eng = resync_pallas_grouped(spec, stg)
            return stg.replace(amp_re=amp_re, amp_im=amp_im, energy=eng)

        out = jax.vmap(one)(sg)
        return jax.tree_util.tree_map(
            lambda x: x.reshape(B, *x.shape[2:]), out)
    return jax.vmap(lambda st: resync_amplitudes_body(spec, st))(states)


@jax.jit
def resync_amplitudes_replicated(spec: SystemSpec,
                                 states: SimState) -> SimState:
    return resync_replicated_body(spec, states)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _sentinel_diffs(spec_x: SystemSpec, st0: SimState, stk: SimState,
                    n_steps: int, recalibrate: bool, resync: bool):
    """Replay one replica's block through the plain XLA scan path
    (spec_x.force_xla=True pins dispatch) and reduce the divergences vs the
    kernel path's output to four scalars ON DEVICE (the axon relay makes
    whole-array transfers the expensive part, CLAUDE.md)."""
    stx = block_body(spec_x, st0, n_steps, recalibrate)
    if resync:
        # the kernel path fused the per-block amplitude resynthesis into
        # its program; apply the same to the replay so E_RECIP/amplitudes
        # are compared like-for-like
        stx = resync_amplitudes_body(spec_x, stx)
    return (jnp.sum(stx.n_mol != stk.n_mol),
            jnp.sum(stx.counters != stk.counters),
            jnp.max(jnp.abs(stx.pos - stk.pos)),
            jnp.max(jnp.abs(stx.energy - stk.energy)))


def sentinel_check(spec: SystemSpec, state_pre: SimState,
                   state_post: SimState, n_steps: int, recalibrate: bool,
                   resync: bool = False) -> dict:
    """Hardware cross-check sentinel: run replica 0's block through BOTH
    step implementations on the real device and compare.

    The blockg kernel re-derives proposal geometry in-kernel, so its parity
    with the XLA scan path is ulp-level on positions and exact on decisions
    *on the test fixtures* (tests/test_blockg.py). This turns that into a
    continuously checkable property on production runs: once per N blocks
    (--sentinel N) the block replica 0 just executed through the kernel is
    replayed through the XLA path from the same pre-block state (identical
    PRNG stream: block_body_group splits per-replica keys exactly like
    run_steps), and populations/counters must match exactly while
    positions/energies must agree to f32 working precision.

    Returns {"n_mol_mismatch", "counter_mismatch", "pos_max_diff",
    "energy_max_diff"} as Python scalars (4 scalar transfers).

    Known benign-divergence source ON HARDWARE: the kernels evaluate the
    far-field / structure-factor contractions with 3-pass bf16 math
    (kernels/common.py dot3, ~1.5e-5 relative - inside the engine's f32
    dE envelope) while the XLA replay runs 6-pass "highest"; a Metropolis
    decision this close to its threshold (~1e-6/step) flips the replay
    and the rest of the block diverges. Expect roughly one such report
    per ~500 cross-checked blocks; systematic divergence (every check,
    or growing counts at block granularity) is the real signal."""
    def rep0(st):
        return (jax.tree_util.tree_map(lambda x: x[0], st)
                if st.pos.ndim == 3 else st)
    import dataclasses
    spec_x = dataclasses.replace(spec, force_xla=True)
    nm, cm, pd, ed = _sentinel_diffs(spec_x, rep0(state_pre),
                                     rep0(state_post), n_steps,
                                     recalibrate, resync)
    return {"n_mol_mismatch": int(nm), "counter_mismatch": int(cm),
            "pos_max_diff": float(pd), "energy_max_diff": float(ed)}


def drift_report(spec: SystemSpec, state: SimState) -> dict:
    """Audit: running energy/amplitudes vs full recompute (host-side)."""
    e, amp_re, amp_im = system_energy(spec, state)
    return {
        "e_total_running": float(state.energy[E_TOT]),
        "e_total_fresh": float(e[E_TOT]),
        "drift_K": float(abs(state.energy[E_TOT] - e[E_TOT])),
        "amp_drift": float(jnp.max(jnp.abs(state.amp_re - amp_re)
                                   + jnp.abs(state.amp_im - amp_im))),
        "recip_running": float(state.energy[E_RECIP]),
        "recip_fresh": float(recip_energy(spec, amp_re, amp_im)),
    }
