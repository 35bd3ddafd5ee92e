"""Shared in-kernel math helpers for the Pallas TPU kernels.

Home of the f32 erfc and the per-axis complex phase-power table builders
used by the grouped step kernel (stepg.py), the whole-block kernel
(blockg.py) and the amplitude-resynthesis kernel (resync.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# erfcx(x) = erfc(x) e^{x^2} as a degree-9 polynomial in t = 1/(1+0.3275911x),
# least-squares fitted with relative weighting over x in [0, 9.5]. Evaluated
# in f32: |abs err| <= 3.1e-7, |rel err| <= 4.7e-6 for x < 6 - the same
# error envelope as XLA's own f32 erfc (measured 1.1e-7 / 4.7e-6), so the
# kernel matches the XLA path to f32 working precision.
_ERFCX_COEFFS = (
    0.012273162196727812, -0.21516541498666958, 0.6875869478953509,
    -0.682179947858666, 0.7005920805614151, -0.1166342824345783,
    0.2582313332019003, 0.16879952761358183, 0.18658018822068365,
    -8.372941430156162e-05)


def _erfc(x):
    """Relative-accurate f32 erfc for the VPU (see _ERFCX_COEFFS)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    acc = _ERFCX_COEFFS[0]
    for c in _ERFCX_COEFFS[1:]:
        acc = acc * t + c
    return acc * jnp.exp(-x * x)


def dot1h(a, b, dims=None, split="a"):
    """BIT-EXACT one-hot contraction in three bf16-input MXU passes.

    The engine pins jax_default_matmul_precision="highest" (6 passes)
    because TPU matmuls at DEFAULT round f32 inputs to bfloat16
    (maniac_tpu/__init__.py), and Mosaic lowers no 3-pass middle ground.
    But most kernel matmuls here have ONE operand that is an exact 0/1
    selection/expansion/summation matrix (footprint reads, per-replica
    expansions, phase-power -> k-grid expansions, side sums). For those,
    split the VALUES operand into three disjoint-significand bf16-exact
    parts (hi = bf16(x); mid = bf16(x - hi); lo = the exact remainder -
    24 bits total), run three DEFAULT-precision dots (each exact: both
    operands are bf16-representable), and add the parts back: hi, mid, lo
    have disjoint significand ranges, so the adds reconstruct the selected
    value bit-for-bit. Result: bitwise identical to a full-precision f32
    dot, at HALF the MXU passes of "highest"; interpret-mode parity tests
    on CPU see the plain-f32 result bit-for-bit too.

    ONLY for SELECTORS - one nonzero per output element (reads,
    expansions, row selections). A 0/1 SUMMATION matrix (side sums,
    block sums) must keep a plain dot: summing the three parts separately
    changes the f32 accumulation order. Value-by-value contractions
    (structure-factor / far-field math) also keep plain dots - the
    "highest" pin gives them 6-pass f32-faithful results.

    split: which operand carries VALUES ("a" or "b"); the other must be
    exactly bf16-representable (0/1 matrices, small ints < 256).
    dims: lax.dot_general dimension_numbers; None = jnp.dot semantics.
    """
    f32 = jnp.float32

    def parts(x):
        hi = x.astype(jnp.bfloat16).astype(f32)
        r = x - hi
        mid = r.astype(jnp.bfloat16).astype(f32)
        return hi, mid, r - mid

    if dims is None:
        def d(u, v):
            return jnp.dot(u, v, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)
    else:
        def d(u, v):
            return jax.lax.dot_general(u, v, dims,
                                       preferred_element_type=f32,
                                       precision=jax.lax.Precision.DEFAULT)
    if split == "a":
        hi, mid, lo = parts(a)
        return (d(hi, b) + d(mid, b)) + d(lo, b)
    hi, mid, lo = parts(b)
    return (d(a, hi) + d(a, mid)) + d(a, lo)


def dot3(a, b, dims=None):
    """Value-x-value matmul in three bf16 passes: ~1.5e-5 relative.

    The classic bf16x3 algorithm (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi with
    bf16-exact hi/lo splits): recovers ~16 of 24 mantissa bits at HALF
    the MXU passes of the "highest" pin. Used ONLY for hardware-path
    ENERGY contractions (far-field grid, structure-factor d matmuls)
    where the error lands ~30x inside the engine's own f32 per-move dE
    envelope (BASELINE.md: max 8.5e-5 kcal/mol vs f64); the launchers
    pass vv3=False in interpret mode so CPU parity tests stay bit-exact
    against the XLA oracle. NEVER route positions through this."""
    f32 = jnp.float32

    def split(x):
        hi = x.astype(jnp.bfloat16).astype(f32)
        return hi, x - hi

    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    if dims is None:
        def d(u, v):
            return jnp.dot(u, v, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)
    else:
        def d(u, v):
            return jax.lax.dot_general(u, v, dims,
                                       preferred_element_type=f32,
                                       precision=jax.lax.Precision.DEFAULT)
    return (d(a_hi, b_hi) + d(a_hi, b_lo)) + d(a_lo, b_hi)


def _powers(c, s, n):
    """Complex phase powers e^{i j theta}, j=0..n, from cos/sin rows (1,F).
    Returns two lists of (1, F) rows."""
    re = [jnp.ones_like(c)]
    im = [jnp.zeros_like(s)]
    for _ in range(n):
        r_new = re[-1] * c - im[-1] * s
        i_new = re[-1] * s + im[-1] * c
        re.append(r_new)
        im.append(i_new)
    return re, im


def _signed_table(re, im, k, pad_to=None):
    """(J, F) table over signed index j=-k..k (conjugates for j<0), rows
    stacked along sublanes; optionally zero-padded to pad_to rows."""
    rows_re = [re[j] for j in range(k, 0, -1)] + re
    rows_im = [-im[j] for j in range(k, 0, -1)] + im
    t_re = jnp.concatenate(rows_re, axis=0)
    t_im = jnp.concatenate(rows_im, axis=0)
    if pad_to is not None and pad_to > 2 * k + 1:
        z = jnp.zeros((pad_to - 2 * k - 1, t_re.shape[1]), t_re.dtype)
        t_re = jnp.concatenate([t_re, z], axis=0)
        t_im = jnp.concatenate([t_im, z], axis=0)
    return t_re, t_im


def _dotT(a, b):
    """(J, F) x (J, G) -> (F, G), contracting the leading dim (MXU)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=a.dtype)
