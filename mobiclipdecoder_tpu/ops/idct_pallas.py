"""Pallas TPU kernel for the batched integer IDCT.

Layout is the TPU-native one: structure-of-arrays, coefficients transposed to
(64, N) so each of the 64 coefficient positions is a row vector across N
blocks (N along lanes, 128-aligned).  The whole 2-D butterfly then becomes a
fixed sequence of VPU adds/shifts on 8-sublane x 128-lane tiles — no
transposes, no gathers; HBM traffic is exactly 2 x 64 x N x 4 bytes
(roofline-bound).

Bit-exact with ops/idct.py (itself oracle-verified); tests run the kernel in
interpreter mode on CPU and compiled on real TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _btf8_rows(rows):
    """8-point butterfly over a list of 8 equal-shape vectors."""
    r0, r1, r2, r3, r4, r5, r6, r7 = rows
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
    return [e0 + f7, e2 + f5, e4 + f3, e6 + f1,
            e6 - f1, e4 - f3, e2 - f5, e0 - f7]


def _idct8_kernel(c_ref, out_ref):
    c = c_ref[:]                       # (64, LANES) int32
    # DC rounding (IDCT64Px8 +0x20); expressed as a masked add — .at[].add
    # would lower to an unsupported scatter on TPU Pallas
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    c = c + jnp.where(row == 0, 32, 0)
    # pass 1: coefficient rows -> 64 intermediate vectors t[i*8+k]
    t = [None] * 64
    for i in range(8):
        outs = _btf8_rows([c[8 * i + j, :] for j in range(8)])
        for k in range(8):
            t[8 * i + k] = outs[k]
    # pass 2: per output row m, butterfly over t[0..7][m] -> spatial row m
    rows = [None] * 64
    for m in range(8):
        outs = _btf8_rows([t[8 * i + m] for i in range(8)])
        for j in range(8):
            rows[8 * m + j] = outs[j] >> 6
    out_ref[:] = jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def idct8_soa(coefs_t, interpret: bool = False):
    """(64, N) int32 transposed coefficients -> (64, N) residuals; N must be
    a multiple of 128."""
    n = coefs_t.shape[1]
    lanes = 128
    grid = (n // lanes,)
    return pl.pallas_call(
        _idct8_kernel,
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((64, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, lanes), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coefs_t)


def idct8_blocks_via_pallas(coefs, interpret: bool = False):
    """(N, 8, 8) AoS convenience wrapper: transpose, pad to 128 lanes, run."""
    n = coefs.shape[0]
    pad = (-n) % 128
    c = jnp.pad(coefs.reshape(n, 64), ((0, pad), (0, 0))).T
    out = idct8_soa(c, interpret=interpret)
    return out.T[:n].reshape(n, 8, 8)
