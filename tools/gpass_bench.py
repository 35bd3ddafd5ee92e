#!/usr/bin/env python
"""Isolated microbench of the blockg guest pair pass (kernels/blockg.py
make_guest_chunk) at bigS shape, with switchable kernel variants, to
attribute the measured ~33 us/chunk (vs ~3 us speed-of-light estimate)
to tiles / transcendentals / wrap math / dynamic reads / selector
matmuls.

The real kernel at bigS: B=1024, G=64 -> 16 sequential grid instances;
guest section 1.55 ms/step => ~97 us per (G=64, 47-chunk) pass. This
harness runs ONE (G, NC)-shaped pass NSTEP times inside one kernel (the
footprint varies per step so nothing hoists) and prints us/pass.

Usage: python tools/gpass_bench.py [variant ...]
Env: GP_G (64), GP_NC (47), GP_STEPS (100), GP_FL (2), GP_FQ (6)
Variants:
  cur     tile-concat, separate LJ + C passes (mirror of the live kernel)
  rep     pltpu.repeat for the sublane tiles instead of concat
  mrg     merged pass: one FQ-row tile set + r2; LJ on the first FL rows
  noerfc  cur with the erfc/exp chain replaced by one multiply
  nowrap  cur without the round-based min-image wrap
  nodyn   python-unrolled chunk loop with static offsets (no fori/dslice)
  noeps   cur with the per-chunk eps/sig selector matmuls replaced by a
          broadcast of one row (valid for single-LJ-site species)
  read    chunk reads only (floor)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = int(os.environ.get("GP_G", "64"))
NC = int(os.environ.get("GP_NC", "47"))
NSTEP = int(os.environ.get("GP_STEPS", "100"))
FL = int(os.environ.get("GP_FL", "2"))
FQ = int(os.environ.get("GP_FQ", "6"))
S = NC * 128
L = 40.0
RC2 = 8.5 ** 2
GGR2 = 8.57 ** 2
ALPHA = 0.514

f32 = jnp.float32


def _erfc(x):
    # mirror of kernels/common.py (A&S 7.1.26 with exp)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def make_kernel(variant):
    unroll_static = variant == "nodyn"
    W = int(variant[1:]) if variant[0] == "w" and variant[1:].isdigit() else 1

    def kernel(x_ref, y_ref, z_ref, q_ref, eps_ref, sig_ref, etile_ref,
               out_ref):
        inv_l = 1.0 / L

        def tile(v, F):
            if variant == "rep":
                return pltpu.repeat(v, F, axis=0)
            return jnp.concatenate([v] * F, axis=0)

        def chunk_math(step_f, b_slice, ljacc, cacc):
            xc = x_ref[:, b_slice]
            yc = y_ref[:, b_slice]
            zc = z_ref[:, b_slice]
            qc = q_ref[0:1, b_slice]
            if variant == "read":
                keep = jnp.sum(xc + yc + zc + qc, axis=1, keepdims=True)
                return ljacc + tile(keep, FL), cacc + tile(keep, FQ)

            # per-step footprint columns (F*G, 1): varied by step_f so the
            # pass cannot be hoisted out of the step loop
            colL = (jax.lax.broadcasted_iota(jnp.int32, (FL * G, 1), 0)
                    .astype(f32) * 0.003 + step_f * 0.01)
            colQ = (jax.lax.broadcasted_iota(jnp.int32, (FQ * G, 1), 0)
                    .astype(f32) * 0.003 + step_f * 0.01)

            def r2_of(px, xa, ya, za):
                dx = xa - px
                dy = ya - px * 0.5
                dz = za - px * 0.25
                if variant != "nowrap":
                    dx = dx - L * jnp.round(dx * inv_l)
                    dy = dy - L * jnp.round(dy * inv_l)
                    dz = dz - L * jnp.round(dz * inv_l)
                return jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-8)

            if variant == "mrg":
                xa, ya, za = tile(xc, FQ), tile(yc, FQ), tile(zc, FQ)
                r2q = r2_of(colQ, xa, ya, za)
                inv_r = jax.lax.rsqrt(r2q)
                coul = colQ * qc * _erfc(ALPHA * (r2q * inv_r)) * inv_r
                cacc = cacc + jnp.sum(
                    jnp.where(r2q < GGR2, coul, 0.0), axis=1, keepdims=True)
                r2l = r2q[:FL * G, :]
                eps = jnp.dot(etile_ref[:FL * G, :FL], eps_ref[:FL, b_slice],
                              preferred_element_type=f32)
                sig2 = jnp.dot(etile_ref[:FL * G, :FL], sig_ref[:FL, b_slice],
                               preferred_element_type=f32)
                sr2 = sig2 / r2l
                sr6 = sr2 * sr2 * sr2
                ljv = 4.0 * eps * (sr6 * sr6 - sr6)
                ljacc = ljacc + jnp.sum(
                    jnp.where(r2l < RC2, ljv, 0.0), axis=1, keepdims=True)
                return ljacc, cacc

            # LJ pass
            xa, ya, za = tile(xc, FL), tile(yc, FL), tile(zc, FL)
            r2 = r2_of(colL, xa, ya, za)
            if variant == "noeps":
                eps = tile(eps_ref[0:1, b_slice], FL * G)
                sig2 = tile(sig_ref[0:1, b_slice], FL * G)
            else:
                eps = jnp.dot(etile_ref[:FL * G, :FL], eps_ref[:FL, b_slice],
                              preferred_element_type=f32)
                sig2 = jnp.dot(etile_ref[:FL * G, :FL], sig_ref[:FL, b_slice],
                               preferred_element_type=f32)
            inv_r2 = 1.0 / r2
            sr2 = sig2 * inv_r2
            sr6 = sr2 * sr2 * sr2
            ljv = 4.0 * eps * (sr6 * sr6 - sr6)
            ljacc = ljacc + jnp.sum(jnp.where(r2 < RC2, ljv, 0.0), axis=1,
                                    keepdims=True)
            # C pass
            xq, yq, zq = tile(xc, FQ), tile(yc, FQ), tile(zc, FQ)
            r2q = r2_of(colQ, xq, yq, zq)
            inv_r = jax.lax.rsqrt(r2q)
            if variant == "noerfc":
                coul = colQ * qc * inv_r
            else:
                coul = colQ * qc * _erfc(ALPHA * (r2q * inv_r)) * inv_r
            cacc = cacc + jnp.sum(jnp.where(r2q < GGR2, coul, 0.0), axis=1,
                                  keepdims=True)
            return ljacc, cacc

        def step_body(si, acc):
            ljacc = jnp.zeros((FL * G, 1), f32)
            cacc = jnp.zeros((FQ * G, 1), f32)
            step_f = si.astype(f32)
            if unroll_static:
                for ci in range(NC):
                    ljacc, cacc = chunk_math(
                        step_f, pl.dslice(ci * 128, 128), ljacc, cacc)
            else:
                def chunk_body(ci, carry):
                    lj, ca = carry
                    return chunk_math(step_f, pl.dslice(ci * 128 * W,
                                                        128 * W), lj, ca)
                ljacc, cacc = jax.lax.fori_loop(0, NC // W, chunk_body,
                                                (ljacc, cacc))
            return acc + (jnp.sum(ljacc, axis=0, keepdims=True)
                          + jnp.sum(cacc, axis=0, keepdims=True))

        out_ref[:, :] = jax.lax.fori_loop(0, NSTEP, step_body,
                                          jnp.zeros((1, 1), f32))

    return kernel


def run_variant(variant, args):
    fn = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
        in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
                  for a in args],
        out_specs=pl.BlockSpec((1, 1), lambda: (0, 0)),
    )
    jfn = jax.jit(fn)
    out = jfn(*args)
    out.block_until_ready()
    float(out[0, 0])  # tunnel barrier
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = jfn(*args)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    return dt / NSTEP * 1e6  # us per pass


def main():
    variants = sys.argv[1:] or ["read", "cur", "rep", "mrg", "noerfc",
                                "nowrap", "nodyn", "noeps"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-L / 2, L / 2, (G, S)), f32)
    y = jnp.asarray(rng.uniform(-L / 2, L / 2, (G, S)), f32)
    z = jnp.asarray(rng.uniform(-L / 2, L / 2, (G, S)), f32)
    q = jnp.asarray(rng.normal(0, 0.5, (1, S)), f32)
    eps = jnp.asarray(np.broadcast_to(rng.uniform(0.1, 0.2, (1, S)),
                                      (max(FL, 8), S)).copy(), f32)
    sig = jnp.asarray(np.broadcast_to(rng.uniform(9, 11, (1, S)),
                                      (max(FL, 8), S)).copy(), f32)
    rr = np.arange(FL * G)[:, None]
    cc = np.arange(max(FL, 8))[None, :]
    etile = jnp.asarray((cc == rr // G).astype(np.float32))
    args = (x, y, z, q, eps, sig, etile)
    print(f"# G={G} NC={NC} FL={FL} FQ={FQ} NSTEP={NSTEP} "
          f"dev={jax.devices()[0]}", flush=True)
    for v in main_variants(sys.argv[1:]):
        try:
            us = run_variant(v, args)
            print(f"{v:8s} {us:9.1f} us/pass  ({us / NC:6.2f} us/chunk)",
                  flush=True)
        except Exception as e:  # keep sweeping on a broken variant
            print(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def main_variants(argv):
    return argv or ["read", "cur", "rep", "mrg", "noerfc", "nowrap",
                    "nodyn", "noeps"]


if __name__ == "__main__":
    main()
