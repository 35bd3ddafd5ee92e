"""Pallas TPU kernel for the accept/commit tail of the MC step.

After the pair/intra/self energies and the structure-factor delta d(k) are
known, the step's tail is: reciprocal cross-energy sum -> Metropolis
decision -> conditional writes of the amplitudes and the moved molecule's
site positions. In XLA that is ~6 separate passes over the (B, K) amplitude
arrays and the (B, 3, S) position array; this kernel fuses them into one
read-modify-write per array (d is read once, the accept branch is a select,
positions update in place via aliasing).

The physics is identical to the XLA path in mc/moves.py (acceptance formula
reference: src/monte_carlo_utils.f90:184-226; incremental A(k) commit:
src/ewald_energy.f90:240-256 with accepted-only application).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _commit_kernel(
        fscal_ref,       # VMEM (1, 8) f32: e_other_old, e_other_new,
                         #   e_recip_old, pref, u_acc, inv_T, c2piv, gate
        iscal_ref,       # VMEM (1, 8) int32: start_new, start_old,
                         #   start_last, A_new, A_old, w_new, remove_like, 0
        d_re_ref,        # VMEM (1, K)
        d_im_ref,        # VMEM (1, K)
        w_ref,           # VMEM (1, K) shared k_weights (form folded)
        cols_ref,        # VMEM (3, 2*A_act): P_new cols | compaction cols
        amp_re_ref,      # VMEM (1, K)  [aliased to output 0]
        amp_im_ref,      # VMEM (1, K)  [aliased to output 1]
        pos_ref,         # VMEM (3, S)  [aliased to output 2]
        amp_re_out,      # (1, K)
        amp_im_out,      # (1, K)
        pos_out,         # (3, S)
        flags_out,       # (1, 8) f32: accf, e_recip_new, delta_e, p_acc
        *, S: int, A_act: int):
    ar = amp_re_ref[0, :]
    ai = amp_im_ref[0, :]
    dr = d_re_ref[0, :]
    di = d_im_ref[0, :]
    w = w_ref[0, :]

    cross = jnp.sum(w * (2.0 * (ar * dr + ai * di) + dr * dr + di * di))
    e_recip_old = fscal_ref[0, 2]
    c2piv = fscal_ref[0, 6]
    e_recip_new = e_recip_old + cross * c2piv
    delta_e = fscal_ref[0, 1] + e_recip_new - fscal_ref[0, 0] - e_recip_old

    pref = fscal_ref[0, 3]
    p_acc = jnp.minimum(1.0, pref * jnp.exp(-delta_e * fscal_ref[0, 5]))
    gate = fscal_ref[0, 7]
    acc = (gate > 0.0) & (fscal_ref[0, 4] <= p_acc)
    accf = acc.astype(ar.dtype)  # explicit dtype: python-scalar where would
    # promote to f64 under x64 test configs

    amp_re_out[0, :] = ar + accf * dr
    amp_im_out[0, :] = ai + accf * di

    # position commit: compaction rows first, then the written molecule
    # (same precedence as the XLA path; regions only coexist in swap moves,
    # where they are disjoint)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
    start_new = iscal_ref[0, 0]
    start_old = iscal_ref[0, 1]
    A_new = iscal_ref[0, 3]
    A_old = iscal_ref[0, 4]
    do_write = acc & (iscal_ref[0, 5] > 0)
    do_compact = acc & (iscal_ref[0, 6] > 0)
    rel_new = s_idx - start_new
    rel_old = s_idx - start_old
    in_new = do_write & (rel_new >= 0) & (rel_new < A_new)
    in_old = do_compact & (rel_old >= 0) & (rel_old < A_old)

    out = pos_ref[:, :]
    for a in range(A_act):
        sel_old = ((rel_old == a) & in_old)[None, :]
        out = jnp.where(sel_old, cols_ref[:, A_act + a][:, None], out)
    for a in range(A_act):
        sel_new = ((rel_new == a) & in_new)[None, :]
        out = jnp.where(sel_new, cols_ref[:, a][:, None], out)
    pos_out[:, :] = out

    zero = jnp.zeros((), dtype=accf.dtype)
    flags_out[0, :] = jnp.stack([
        accf, e_recip_new, delta_e, p_acc, zero, zero, zero, zero])


def commit_pallas(spec, amp_re, amp_im, pos, d_re, d_im,
                  e_other_old, e_other_new, e_recip_old, pref, u_acc, gate,
                  site_start_new, site_start_old, start_last_unused,
                  A_new, A_old, w_new, remove_like,
                  new_cols, last_cols, *, interpret=False):
    """Single-replica commit (vmap batches it). Returns
    (amp_re', amp_im', pos', accf, e_recip_new, delta_e)."""
    K = amp_re.shape[-1]
    S = pos.shape[-1]
    A_act = spec.A_act
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"

    c2piv = jnp.asarray(spec.volume, f)
    from ..constants import COULOMB_K, TWOPI
    c2piv = COULOMB_K * TWOPI / spec.volume
    fscal = jnp.stack([e_other_old, e_other_new, e_recip_old, pref, u_acc,
                       1.0 / spec.temp_K, c2piv,
                       jnp.where(gate, 1.0, 0.0)]).astype(f).reshape(1, 8)
    iscal = jnp.stack([site_start_new, site_start_old,
                       jnp.zeros((), jnp.int32), A_new, A_old,
                       w_new.astype(jnp.int32), remove_like.astype(jnp.int32),
                       jnp.zeros((), jnp.int32)]).astype(jnp.int32
                                                         ).reshape(1, 8)
    cols = jnp.concatenate([new_cols, last_cols], axis=1)   # (3, 2*A_act)

    kernel = functools.partial(_commit_kernel, S=S, A_act=A_act)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re2, amp_im2, pos2, flags = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, K), f),
                   jax.ShapeDtypeStruct((1, K), f),
                   jax.ShapeDtypeStruct((3, S), f),
                   jax.ShapeDtypeStruct((1, 8), f)),
        in_specs=[vmem] * 9,
        out_specs=(vmem, vmem, vmem, vmem),
        input_output_aliases={6: 0, 7: 1, 8: 2},
        interpret=interpret,
    )(fscal, iscal, d_re.reshape(1, K), d_im.reshape(1, K),
      spec.k_weights.reshape(1, K), cols,
      amp_re.reshape(1, K), amp_im.reshape(1, K), pos)
    return (amp_re2[0], amp_im2[0], pos2,
            flags[0, 0], flags[0, 1], flags[0, 2])
