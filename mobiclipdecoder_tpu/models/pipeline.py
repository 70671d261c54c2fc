"""JAX reconstruction engine: executes FramePlans on TPU (or CPU for tests).

Reconstruction is phased for parallelism (see models/plan.py for why this is
exactly equivalent to the reference's sequential macroblock loop):

  phase 1 — motion compensation: every MC leaf gathers its (half-pel
            filtered) window from the reference ring; blocks are disjoint,
            so one batched gather + scatter.
  phase 2 — inter residuals: batched integer IDCT + add-saturate scatter.
  phase 3 — intra: ops grouped into dependency levels; each level is one
            batched tap-gather -> formula-select -> residual -> scatter.
            Tap gathers mask "not yet decoded" pixels to the fresh-plane
            value via the plan's sequence map, reproducing the reference's
            read-whatever-is-there semantics bit-for-bit.

Planes live in one (H + H/2, S) int32 buffer per frame: Y on top, packed UV
(U | V halves) below — preserving the reference's flat-plane aliasing.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.idct import idct4, idct8
from ..ops.intra_tables import AVG2, AVG3, COPY, DC, KIND, PASS, TAPS
from .oracle_video import MobiclipVersion
from .plan import FramePlan, PlanningDecoder


def _pad_rows(a: np.ndarray, min_rows: int = 8) -> np.ndarray:
    n = max(min_rows, 1 << (max(a.shape[0], 1) - 1).bit_length())
    if a.shape[0] == n:
        return a
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def prepare_plan(plan: FramePlan) -> dict:
    """Pack a FramePlan into padded device arrays (static-shape buckets)."""
    H, S = plan.height, plan.stride
    mc = _pad_rows(plan.mc.astype(np.int32))
    resid = _pad_rows(plan.resid.astype(np.int32))
    resid_coef = _pad_rows(plan.resid_coef.astype(np.int32))
    resid_coef = resid_coef[:resid.shape[0]] if resid_coef.shape[0] >= resid.shape[0] \
        else np.concatenate([resid_coef, np.zeros(
            (resid.shape[0] - resid_coef.shape[0], 64), np.int32)])
    # group intra ops by level
    L = max(plan.n_levels, 1)
    intra = plan.intra.astype(np.int64)
    kmax = 1
    buckets: list[list[int]] = [[] for _ in range(L)]
    for i in range(intra.shape[0]):
        buckets[int(intra[i, 9]) - 1].append(i)
    kmax = max((len(b) for b in buckets), default=1) or 1
    kmax = 1 << (kmax - 1).bit_length()
    iops = np.zeros((L, kmax, 11), np.int32)
    icoef = np.zeros((L, kmax, 64), np.int32)
    for lv, b in enumerate(buckets):
        for j, i in enumerate(b):
            iops[lv, j] = intra[i].astype(np.int32)
            icoef[lv, j] = plan.intra_coef[i]
    seqmap = np.concatenate([plan.seq_y, plan.seq_uv], axis=0).astype(np.int32)
    return dict(mc=mc, resid=resid, resid_coef=resid_coef,
                iops=iops, icoef=icoef, seqmap=seqmap)


# --------------------------------------------------------------------- MC
def _mc_kernel(ring, buf, mc, H, S):
    """Phase 1: batched half-pel MC (CopyBlock, MobiclipDecoder.cs:418-456)."""
    HH = H + H // 2
    y, x, w, h, ref, dx, dy = (mc[:, k] for k in range(7))
    valid = w > 0

    def fetch(rows, cols, refi):
        rows = jnp.clip(rows, 0, HH - 1)
        cols = jnp.clip(cols, 0, S - 1)
        return ring[refi, rows, cols]

    def window(ybase, xbase, refi, n):
        ii = jnp.arange(n)[:, None, None]
        jj = jnp.arange(n)[None, :, None]
        rows = ybase[None, None, :] + ii
        cols = xbase[None, None, :] + jj
        return jnp.moveaxis(fetch(rows, cols, refi[None, None, :]), -1, 0)

    def halfpel(wnd, ddx, ddy, n):
        a = wnd[:, :n, :n]
        b = wnd[:, :n, 1:n + 1]
        cc = wnd[:, 1:n + 1, :n]
        d = wnd[:, 1:n + 1, 1:n + 1]
        c1 = (a >> 1) + (b >> 1)
        c2 = (a >> 1) + (cc >> 1)
        c3 = (((a >> 1) + (b >> 1)) >> 1) + (((cc >> 1) + (d >> 1)) >> 1)
        case = ((ddx & 1) | ((ddy & 1) << 1))[:, None, None]
        return jnp.where(case == 0, a,
                         jnp.where(case == 1, c1,
                                   jnp.where(case == 2, c2, c3)))

    def scatter(buf, px, ybase, xbase, bw, bh, n):
        ii = jnp.arange(n)[None, :, None]
        jj = jnp.arange(n)[None, None, :]
        rows = ybase[:, None, None] + ii
        cols = xbase[:, None, None] + jj
        ok = (valid[:, None, None] & (ii < bh[:, None, None])
              & (jj < bw[:, None, None]))
        flat = jnp.where(ok, rows * S + cols, HH * S)
        return buf.ravel().at[flat.ravel()].set(
            px.ravel(), mode="drop").reshape(HH, S)

    # luma
    wnd = window(y + (dy >> 1), x + (dx >> 1), ref, 17)
    px = halfpel(wnd, dx, dy, 16)
    buf = scatter(buf, px, y, x, w, h, 16)
    # chroma (U and V halves; MVs re-halved like the reference)
    cdx, cdy = dx >> 1, dy >> 1
    cy = H + (y >> 1) + (cdy >> 1)
    for xoff in (0, S // 2):
        cx = (x >> 1) + xoff + (cdx >> 1)
        wndc = window(cy, cx, ref, 9)
        pxc = halfpel(wndc, cdx, cdy, 8)
        buf = scatter(buf, pxc, H + (y >> 1), (x >> 1) + xoff,
                      w >> 1, h >> 1, 8)
    return buf


# ----------------------------------------------------------------- resid
def _resid_block(coef, size):
    """Residual for one 64-coef record: full IDCT at its size, in a 16x16
    tile (top-left corner)."""
    r8 = idct8(coef.reshape(8, 8))
    r4 = idct4(coef[:16].reshape(4, 4))
    out = jnp.zeros((16, 16), jnp.int32)
    out = out.at[:8, :8].set(jnp.where(size == 8, r8,
                                       jnp.pad(r4, ((0, 4), (0, 4)))))
    return out


def _resid_kernel(buf, resid, coef, H, S):
    """Phase 2: add-saturate inter residuals (MinMaxTable semantics)."""
    HH = H + H // 2
    pid, y, x, size = (resid[:, k] for k in range(4))
    row0 = y + pid * H
    res = jax.vmap(_resid_block)(coef, size)
    ii = jnp.arange(16)[None, :, None]
    jj = jnp.arange(16)[None, None, :]
    rows = jnp.clip(row0[:, None, None] + ii, 0, HH - 1)
    cols = jnp.clip(x[:, None, None] + jj, 0, S - 1)
    cur = buf[rows, cols]
    out = jnp.clip(cur + res, 0, 255)
    ok = (size[:, None, None] > 0) & (ii < size[:, None, None]) \
        & (jj < size[:, None, None])
    flat = jnp.where(ok, (row0[:, None, None] + ii) * S
                     + x[:, None, None] + jj, HH * S)
    return buf.ravel().at[flat.ravel()].set(out.ravel(),
                                            mode="drop").reshape(HH, S)


# ----------------------------------------------------------------- intra
_KIND = jnp.asarray(KIND)
_TAPS = jnp.asarray(TAPS)


def _gather_taps(buf, seqmap, row0, x, seq, HH, S):
    """Gather the 33-tap neighbor vector with decode-order masking."""
    # positions: corner, t[0..15] (row above), l[0..15] (column left)
    rows = jnp.concatenate([
        jnp.full((17,), row0 - 1, jnp.int32),
        row0 + jnp.arange(16, dtype=jnp.int32)])
    cols = jnp.concatenate([
        jnp.asarray([x - 1], jnp.int32),
        x + jnp.arange(16, dtype=jnp.int32),
        jnp.full((16,), x - 1, jnp.int32)])
    cr = jnp.clip(rows, 0, HH - 1)
    cc = jnp.clip(cols, 0, S - 1)
    vals = buf[cr, cc]
    cell_seq = seqmap[cr >> 2, cc >> 2]
    visible = (cell_seq >= 0) & (cell_seq < seq)
    return jnp.where(visible, vals, 0)


def _plane_pred(taps, size, grad):
    """Closed-form integer plane predictor (sub_1167BC / sub_116CCC /
    sub_117E98, MobiclipDecoder.cs:3017-3327), emitted through the same
    u32 word composition as the reference so out-of-range values alias
    between byte lanes identically."""
    t = taps[1:17]
    l = taps[17:33]
    idx = jnp.arange(16)
    n4, n8, n16 = size == 4, size == 8, size == 16
    nm1 = size - 1
    tr = t[nm1]
    bl = l[nm1]
    r5 = ((bl + tr + 1) >> 1) + 2 * grad
    # column-constant and row-constant linear coefficients per size
    r6 = jnp.where(n16, r5 - bl + 1, r5 - bl)
    r9 = jnp.where(n16, r5 - tr + 1, r5 - tr)
    tscale = jnp.where(n4, 4, 8)          # t_i multiplier inside B
    ascale = jnp.where(n4, 16, 64)        # A base multiplier
    rshift = jnp.where(n4, 5, 7)
    rnd = jnp.where(n4, 16, 64)
    i1 = idx + 1
    r4_i = bl * tscale + i1 * jnp.where(n16, r6 >> 1, r6)
    B = jnp.where(n16, r4_i - t * 8 + 1, r4_i - t * tscale)
    r10_r = tr * tscale + i1 * jnp.where(n16, r9 >> 1, r9)
    r7_r = jnp.where(n16, r10_r - l * 8 + 1, r10_r - l * tscale)
    # out[r, j] = (ascale*t_j + (r+1)*Bterm_j + ascale*l_r + (j+1)*r7term_r
    #              + rnd) >> rshift
    Bterm = jnp.where(n16, B >> 1, B)
    r7term = jnp.where(n16, r7_r >> 1, r7_r)
    rr = idx[:, None]
    jj = idx[None, :]
    acc = (ascale * t[None, :] + (rr + 1) * Bterm[None, :]
           + ascale * l[:, None] + (jj + 1) * r7term[:, None] + rnd)
    out = acc >> rshift
    # u32 word composition per 4 output pixels (LE lanes), then re-extract
    w0 = out[:, 0::4]
    w1 = out[:, 1::4]
    w2 = out[:, 2::4]
    w3 = out[:, 3::4]
    word = (w0 | (w1 << 8) | (w2 << 16) | (w3 << 24))
    res = jnp.zeros((16, 16), jnp.int32)
    res = res.at[:, 0::4].set(word & 0xFF)
    res = res.at[:, 1::4].set((word >> 8) & 0xFF)
    res = res.at[:, 2::4].set((word >> 16) & 0xFF)
    res = res.at[:, 3::4].set((word >> 24) & 0xFF)
    return res


def _intra_op(buf, seqmap, op, coef, H, S):
    """Predict + residual for one intra op; returns (tile16, okmask16)."""
    HH = H + H // 2
    pid, y, x, size, mode, grad, has_coef, av_t, av_l = (op[k] for k in range(9))
    seq = op[10]
    row0 = y + pid * H
    taps = _gather_taps(buf, seqmap, row0, x, seq, HH, S)
    n = size
    # current content (for PASS modes and residual-on-top)
    ii = jnp.arange(16)[:, None]
    jj = jnp.arange(16)[None, :]
    rows = jnp.clip(row0 + ii, 0, HH - 1)
    cols = jnp.clip(x + jj, 0, S - 1)
    cur_cell = seqmap[rows >> 2, cols >> 2]
    cur = jnp.where((cur_cell >= 0) & (cur_cell < seq), buf[rows, cols], 0)
    # formula path
    kind = _KIND[mode]
    tsel = _TAPS[mode]
    a = taps[tsel[:, 0]]
    b = taps[tsel[:, 1]]
    c = taps[tsel[:, 2]]
    # DC value
    npx = jnp.where(size == 4, 4, 8)
    lanes = jnp.arange(16)
    sum_t = jnp.sum(jnp.where(lanes < npx, taps[1:17], 0))
    sum_l = jnp.sum(jnp.where(lanes < npx, taps[17:33], 0))
    log_n = jnp.where(size == 4, 2, 3)
    dc_both = (sum_t + sum_l + npx) >> (log_n + 1)
    dc_top = (sum_t + (npx >> 1)) >> log_n
    dc_left = (sum_l + (npx >> 1)) >> log_n
    dc = jnp.where((av_t == 1) & (av_l == 0), dc_top,
                   jnp.where((av_l == 1) & (av_t == 0), dc_left,
                             jnp.where((av_t == 1) & (av_l == 1),
                                       dc_both, 0x80)))
    px = jnp.where(kind == COPY, a,
                   jnp.where(kind == AVG2, (a + b + 1) >> 1,
                             jnp.where(kind == AVG3, (a + 2 * b + c + 2) >> 2,
                                       jnp.where(kind == DC, dc, 0))))
    pred = px.reshape(16, 16)
    pred = jnp.where(kind.reshape(16, 16) == PASS, cur, pred)
    # plane modes override
    is_plane = (mode == 2) | (mode == 12)
    pred = jnp.where(is_plane, _plane_pred(taps, size, grad), pred)
    # residual
    res8 = idct8(coef.reshape(8, 8))
    res4 = jnp.pad(idct4(coef[:16].reshape(4, 4)), ((0, 4), (0, 4)))
    res = jnp.zeros((16, 16), jnp.int32)
    res = res.at[:8, :8].set(jnp.where(size == 4, res4, res8))
    out = jnp.where(has_coef == 1, jnp.clip(pred + res, 0, 255), pred)
    ok = (size > 0) & (ii < n) & (jj < n)
    return out, ok


def _intra_level_kernel(buf, seqmap, ops, coefs, H, S):
    HH = H + H // 2
    out, ok = jax.vmap(
        lambda op, coef: _intra_op(buf, seqmap, op, coef, H, S))(ops, coefs)
    ii = jnp.arange(16)[None, :, None]
    jj = jnp.arange(16)[None, None, :]
    rows = ops[:, 1][:, None, None] + ops[:, 0][:, None, None] * H + ii
    cols = ops[:, 2][:, None, None] + jj
    flat = jnp.where(ok, rows * S + cols, HH * S)
    return buf.ravel().at[flat.ravel()].set(out.ravel(),
                                            mode="drop").reshape(HH, S)


@functools.partial(jax.jit, static_argnames=("H", "S"))
def _decode_frame_jit(ring, mc, resid, resid_coef, iops, icoef, seqmap,
                      H: int, S: int):
    HH = H + H // 2
    buf = jnp.zeros((HH, S), jnp.int32)
    buf = _mc_kernel(ring, buf, mc, H, S)
    buf = _resid_kernel(buf, resid, resid_coef, H, S)

    def body(lv, buf):
        ops = jax.lax.dynamic_index_in_dim(iops, lv, 0, keepdims=False)
        cfs = jax.lax.dynamic_index_in_dim(icoef, lv, 0, keepdims=False)
        return _intra_level_kernel(buf, seqmap, ops, cfs, H, S)

    buf = jax.lax.fori_loop(0, iops.shape[0], body, buf)
    return buf


class JaxVideoDecoder:
    """Full TPU-path video decoder: host scanner -> device reconstruction.

    Drop-in behavioral equivalent of the oracle (bit-exact YUV), structured
    the TPU way: the sequential entropy scan runs on host, reconstruction is
    a single jitted program over the plan arrays.
    """

    def __init__(self, width: int, height: int, version: MobiclipVersion):
        self.planner = PlanningDecoder(width, height, version)
        self.width, self.height = width, height
        self.stride = self.planner.stride
        HH = height + height // 2
        self.ring = jnp.zeros((6, HH, self.stride), jnp.int32)

    @property
    def offset(self):
        return self.planner.offset

    def decode_frame(self, packet: bytes) -> tuple[np.ndarray, np.ndarray]:
        """Decode one frame packet; returns (Y, UV) uint8 numpy planes of
        shapes (H, S) and (H/2, S)."""
        self.planner.data = packet
        self.planner.offset = 0
        self.planner.decode_frame()
        plan = self.planner.plan()
        arrays = prepare_plan(plan)
        H, S = self.height, self.stride
        ring = jnp.roll(self.ring, 1, axis=0)
        buf = _decode_frame_jit(ring, arrays["mc"], arrays["resid"],
                                arrays["resid_coef"], arrays["iops"],
                                arrays["icoef"], arrays["seqmap"], H, S)
        self.ring = ring.at[0].set(buf)
        out = np.asarray(buf).astype(np.uint8)
        return out[:H], out[H:]
