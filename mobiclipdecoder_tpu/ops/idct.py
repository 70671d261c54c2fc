"""Batched integer IDCT kernels (JAX, int32-exact).

The reference ships four sparse IDCT variants selected by the last-coefficient
scan position (MobiclipDecoder.cs:3435-3798).  All variants are algebraically
identical to the full shift-add butterfly restricted to the coefficient
support (verified by tests/test_idct.py against the oracle), so the device
path only needs the full 8x8 and 4x4 transforms — dense, branchless, batched:
ideal VPU shape.

All arithmetic is int32 with arithmetic right shifts, matching C# exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _btf8(c):
    """8-point butterfly along the last axis of (..., 8) int32."""
    r0, r1, r2, r3, r4, r5, r6, r7 = (c[..., k] for k in range(8))
    a0 = r0 + r4
    a1 = r0 - r4
    b0 = r2 + (r6 >> 1)
    b1 = (r2 >> 1) - r6
    e2 = a1 + b1
    e4 = a1 - b1
    e6 = a0 - b0
    e0 = a0 + b0
    o0 = r1 + r7 - r3 - (r3 >> 1)
    o1 = r7 - r1 + r5 + (r5 >> 1)
    o2 = r5 - r7 - (r7 >> 1) - r3
    o3 = r3 + r5 + r1 + (r1 >> 1)
    f1 = o2 + (o3 >> 2)
    f7 = o3 - (o2 >> 2)
    f3 = o0 + (o1 >> 2)
    f5 = (o0 >> 2) - o1
    return jnp.stack([e0 + f7, e2 + f5, e4 + f3, e6 + f1,
                      e6 - f1, e4 - f3, e2 - f5, e0 - f7], axis=-1)


def _btf4(c):
    """4-point butterfly along the last axis of (..., 4) int32."""
    r0, r1, r2, r3 = (c[..., k] for k in range(4))
    e0 = r0 + r2
    e1 = r0 - r2
    o1 = (r1 >> 1) - r3
    o0 = r1 + (r3 >> 1)
    return jnp.stack([e0 + o0, e1 + o1, e1 - o1, e0 - o0], axis=-1)


@jax.jit
def idct8(coefs):
    """(..., 8, 8) int32 coefficients -> (..., 8, 8) int32 residual.

    Mirrors IDCT64Px8's dataflow: +32 DC rounding, pass over coefficient
    rows, transpose, second pass, >>6 (MobiclipDecoder.cs:3435-3561).
    """
    c = coefs.at[..., 0, 0].add(32)
    t = _btf8(c)                       # (..., row, out) per coefficient row
    d = _btf8(jnp.swapaxes(t, -1, -2))  # (..., spatial row, spatial col)
    return d >> 6


@jax.jit
def idct4(coefs):
    """(..., 4, 4) int32 coefficients -> (..., 4, 4) int32 residual
    (IDCT16Px4, MobiclipDecoder.cs:3728-3784)."""
    c = coefs.at[..., 0, 0].add(32)
    t = _btf4(c)
    d = _btf4(jnp.swapaxes(t, -1, -2))
    return d >> 6
