#!/usr/bin/env python
"""Microbenchmark VPU primitive throughput inside a Pallas TPU kernel.

Times N back-to-back applications of one primitive on a (ROWS, COLS) f32
plane (loop-carried so nothing can be DCE'd or reassociated away), at the
same plane shape as the fw-window math in kernels/blockg.py. Prints
ns/element-op so kernel op-cost models can use measured numbers instead
of guesses.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = int(os.environ.get("VPU_ROWS", "128"))
COLS = int(os.environ.get("VPU_COLS", "1280"))
N = int(os.environ.get("VPU_N", "512"))

_ERFC = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _ops(name):
    if name == "fma":
        return lambda x: x * 1.000001 + 1e-6
    if name == "mul2":
        return lambda x: (x * 1.000001) * 0.999999
    if name == "div":
        return lambda x: 1.0 / (x + 1.0)
    if name == "rsqrt":
        return lambda x: jax.lax.rsqrt(x + 1.0)
    if name == "sqrt":
        return lambda x: jnp.sqrt(x + 1.0)
    if name == "exp":
        return lambda x: jnp.exp(-x)
    if name == "round":
        return lambda x: x - jnp.round(x * 0.3)
    if name == "cmpsel":
        return lambda x: jnp.where(x > 0.5, x * 0.999, x * 1.001)
    if name == "erfc":
        def f(x):
            t = 1.0 / (1.0 + 0.3275911 * x)
            acc = _ERFC[0]
            for c in _ERFC[1:]:
                acc = acc * t + c
            return acc * jnp.exp(-x * x)
        return f
    raise SystemExit(f"unknown op {name}")


def kernel(x_ref, o_ref, *, op, n):
    def body(i, v):
        return op(v)
    o_ref[...] = jax.lax.fori_loop(0, n, body, x_ref[...])


def run(name):
    op = _ops(name)
    x = jnp.linspace(0.1, 3.0, ROWS * COLS,
                     dtype=jnp.float32).reshape(ROWS, COLS)
    f = pl.pallas_call(
        functools.partial(kernel, op=op, n=N),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda x: jnp.sum(f(x)[:8, :8]))
    float(g(x))  # compile + warm
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = g(x)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    per_el_op = dt / (N * ROWS * COLS)
    print(f"{name:8s} {dt*1e3:8.3f} ms/call  {per_el_op*1e12:8.2f} ps/elem-op"
          f"  ({per_el_op*1e9*8*128:6.2f} ns per (8,128) vreg)", flush=True)


def main():
    names = sys.argv[1:] or ["fma", "mul2", "cmpsel", "round", "div",
                             "rsqrt", "sqrt", "exp", "erfc"]
    print(f"# plane ({ROWS}, {COLS}), N={N} chained ops, "
          f"dev={jax.devices()[0]}", flush=True)
    for nm in names:
        if nm == "cpass":
            run_cpass()
        elif nm == "cpassT":
            run_cpass(transposed=True)
        else:
            run(nm)




def run_cpass(transposed=False):
    """Replicate the fw C-pass per-atom plane math (pair_r2 + erfc + select
    + accumulate, with per-row broadcast scalars) on scratch-like planes."""
    R, C = ROWS, COLS
    x = jnp.linspace(0.1, 30.0, R * C, dtype=jnp.float32).reshape(R, C)

    def kern(px_ref, py_ref, pz_ref, q_ref, row_ref, o_ref):
        f32 = jnp.float32
        ll0, il0 = 34.0, 1.0 / 34.0
        ll1, il1 = 34.0, 1.0 / 34.0
        a2, rc2sq2 = 0.52, 72.25

        def body(i, acc):
            t = (i % 7).astype(f32) * 0.1
            if transposed:
                # the real kernel's pattern: (3, R) rows -> [:, None]
                # columns = a lane->sublane relayout per scalar per pass
                rr = row_ref[...] + t                 # (4, R)
                bx = rr[0, :][:, None]
                by = rr[1, :][:, None]
                bz = rr[2, :][:, None]
                qw = rr[3, :][:, None]
            else:
                # per-row scalars, lane-broadcast like blkj[:, None]
                bx = px_ref[:, 0:1] + t
                by = py_ref[:, 0:1] + t
                bz = pz_ref[:, 0:1] + t
                qw = q_ref[:, 0:1]
            dx = px_ref[...] - bx
            dy = py_ref[...] - by
            dz = pz_ref[...] - bz
            dx = dx - ll0 * jnp.round(dx * il0)
            dy = dy - ll1 * jnp.round(dy * il1)
            r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-18)
            inv_r = jax.lax.rsqrt(r2)
            xab = a2 * (r2 * inv_r)
            tt = 1.0 / (1.0 + 0.3275911 * xab)
            e = _ERFC[0]
            for c in _ERFC[1:]:
                e = e * tt + c
            e = e * jnp.exp(-xab * xab)
            coulf = qw * q_ref[...] * e * inv_r
            return acc + jnp.where(r2 < rc2sq2, coulf, 0.0)

        o_ref[...] = jax.lax.fori_loop(0, N, body, jnp.zeros((R, C), f32))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    row = jnp.linspace(0.0, 1.0, 4 * R, dtype=jnp.float32).reshape(4, R)
    g = jax.jit(lambda x: jnp.sum(
        f(x, x + 1.0, x + 2.0, x * 0.1, row)[:8, :8]))
    float(g(x))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = g(x)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"cpass    {dt*1e3:8.3f} ms/call  {dt/N*1e6:8.2f} us/plane-iter",
          flush=True)


if __name__ == "__main__":
    main()
