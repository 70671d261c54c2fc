"""Mobiclip video encoder.

Role of the reference's MobiEncoder/MacroBlock/Analyzer stack
(LibMobiclip/Codec/Mobiclip/Encoder/*, ~4.4 kLoC), rebuilt around a key
structural idea the reference only approximates: the encoder keeps a
*decoder twin* — an OracleDecoder instance whose prediction / dequant / IDCT
methods are literally the decode implementation — and reconstructs through
it, so encoder recon and any decoder's output agree bit-for-bit by
construction (the reference hand-mirrors its decoder and hopes,
MacroBlock.cs:224-509).

Search (this version): per-MB intra mode selection by SSD over the real
prediction; P-frames try a +/-8 full-pel 16x16 motion search against SSD and
fall back to intra per MB (SwitchPBlock cases 6/7).  Residuals go through a
probe-calibrated forward transform (the integer IDCT is probed column by
column to build its float inverse) and the real coefficient VLC with
escape fallbacks.

Bitstream emission reuses the same primitives the synthesizer validates:
partition Huffman codes, CBP permutation LUT inverses, the predicted-mode
scheme, and the 15-bit varint ceiling.
"""
from __future__ import annotations

import numpy as np

from ..tables import TABLES
from ..testing.synth import _inv_lut, _pb_code
from ..utils.bitio import BitWriter
from .oracle_video import MobiclipVersion, OracleDecoder


def _probe_inverse(n: int) -> np.ndarray:
    """Probe the oracle IDCT with unit coefficients to get the (linearized)
    inverse transform matrix M (residual = M @ coefs); returns pinv-ish
    forward = inv(M) for quantization targeting."""
    dec = OracleDecoder(16, 16, MobiclipVersion.MODS_DS)
    M = np.zeros((n * n, n * n))
    base = np.full(256 * 16, 128, dtype=np.uint8)
    for k in range(n * n):
        dense = np.zeros((n, n), np.int32)
        dense[k // n, k % n] = 64  # large enough to dominate rounding
        plane = base.copy()
        dec.y_planes[0] = plane
        dec._apply_idct(plane, 0, n, (dense, 74 if n == 8 else 90))
        block = plane.reshape(16, 256)[:n, :n].astype(np.float64) - 128
        M[:, k] = block.ravel() / 64.0
    return np.linalg.inv(M)


_FWD8 = None
_FWD4 = None


def _forward(block: np.ndarray) -> np.ndarray:
    """Float forward transform of an (n,n) residual into IDCT coef space."""
    global _FWD8, _FWD4
    n = block.shape[0]
    if n == 8:
        if _FWD8 is None:
            _FWD8 = _probe_inverse(8)
        F = _FWD8
    else:
        if _FWD4 is None:
            _FWD4 = _probe_inverse(4)
        F = _FWD4
    return (F @ block.astype(np.float64).ravel()).reshape(n, n)


class _CoefCodec:
    """Inverse of ReadDCTMatrix's table path (MobiclipDecoder.cs:3330-3432):
    per (end, skip, |level|) the shortest table code, else escape 3."""

    def __init__(self, table: int = 0):
        ta = TABLES.coef_vlc1_a if table else TABLES.coef_vlc0_a
        self.codes: dict[tuple[int, int, int], tuple[int, int]] = {}
        seen = set()
        for idx in range(4096):
            e = int(ta[idx])
            if e in seen or e == 1:  # 0x0001 filler
                continue
            seen.add(e)
            nbits = e & 0xF
            value = (e >> 4) & 0x1F
            skip = (e >> 10) & 0x3F
            end = (e >> 15) & 1
            code = idx >> (12 - (nbits - 1)) if nbits > 1 else 0
            # escape-prefixed indices (peek7 == 3) are consumed specially;
            # exclude codewords that collide with the escape prefix
            if (idx >> 5) == 3:
                continue
            key = (end, skip, value)
            if key not in self.codes or nbits < self.codes[key][1] + 1:
                self.codes[key] = (code, nbits - 1)

    def emit(self, bw: BitWriter, end: int, run: int, level: int) -> None:
        mag = abs(level)
        key = (end, run, mag)
        if mag < 32 and key in self.codes:
            code, nbits = self.codes[key]
            bw.write_bits(code, nbits)
            bw.write_bits(1 if level < 0 else 0, 1)
        else:
            # escape 3: fully explicit (MobiclipDecoder.cs:3391-3405)
            bw.write_bits(0b0000011, 7)
            bw.write_bits(0b11, 2)
            bw.write_bits(end, 1)
            bw.write_bits(run, 6)
            bw.write_bits(level & 0xFFF, 12)


class MobiclipEncoder:
    """Drop-in role of MobiEncoder.EncodeFrame (MobiEncoder.cs:117-147):
    YUV in, frame packet out, I-frame every `gop` frames."""

    def __init__(self, width: int, height: int,
                 version: MobiclipVersion = MobiclipVersion.MOFLEX_3DS,
                 quantizer: int = 0x16, gop: int = 30):
        self.w, self.h = width, height
        self.version = MobiclipVersion(version)
        self.profile = ("moflex" if self.version == MobiclipVersion.MOFLEX_3DS
                        else "mods")
        self.qp = quantizer
        self.gop = gop
        self.frame_idx = 0
        self.twin = OracleDecoder(width, height, version)
        self.S = self.twin.stride
        self.coefc = _CoefCodec(0)
        self._imode = np.zeros(40, dtype=np.uint8)
        self._imode[[1, 2, 3, 4, 8, 0x10, 0x18, 0x20]] = 9

    # ------------------------------------------------------------ helpers
    def _quant_block(self, resid: np.ndarray, n: int) -> np.ndarray:
        """Quantize a residual into dequantized-levels' *levels* using the
        twin's packed dequant entries (scale per scan position)."""
        coefs = _forward(resid)
        base = 10 if n == 8 else 74
        packed = self.twin.internal[base:base + n * n].astype(np.int64)
        levels = np.zeros((n, n), np.int64)
        for scan in range(n * n):
            pos = int(packed[scan]) & 0xFF
            scale = (int(packed[scan]) & 0xFFFFFFFF) >> 8
            if scale == 0:
                continue
            lv = int(np.round(coefs[pos // n, pos % n] / scale))
            levels[pos // n, pos % n] = max(-2047, min(2047, lv))
        return levels

    def _emit_coefs(self, bw: BitWriter, levels: np.ndarray, n: int) -> bool:
        """Emit run-level codes in scan order; returns False if all zero
        (caller must not have claimed a coded block)."""
        scan = TABLES.scan_to_raster8 if n == 8 else TABLES.scan_to_raster4
        seq = [int(levels[p // n, p % n]) for p in scan[:n * n]]
        nz = [i for i, v in enumerate(seq) if v != 0]
        if not nz:
            return False
        prev = -1
        for j, i in enumerate(nz):
            self.coefc.emit(bw, int(j == len(nz) - 1), i - prev - 1, seq[i])
            prev = i
        return True

    def _sse(self, a: np.ndarray, b: np.ndarray) -> int:
        d = a.astype(np.int64) - b.astype(np.int64)
        return int((d * d).sum())

    def _plane2d(self, plane: np.ndarray) -> np.ndarray:
        return plane.reshape(-1, self.S)

    # ------------------------------------------------------------- frames
    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> bytes:
        """y: (H, W) uint8; u, v: (H/2, W/2) uint8.  Returns the packet
        (byte-aligned, no padding — containers add their own framing)."""
        is_i = (self.frame_idx % self.gop) == 0
        bw = BitWriter()
        # twin ring shift + fresh planes (decoder side of the same step)
        for i in range(5, 0, -1):
            self.twin.y_planes[i] = self.twin.y_planes[i - 1]
            self.twin.uv_planes[i] = self.twin.uv_planes[i - 1]
        self.twin.y_planes[0] = np.zeros(self.S * self.h, np.uint8)
        self.twin.uv_planes[0] = np.zeros(self.S * self.h // 2, np.uint8)
        if is_i:
            self._encode_iframe(bw, y, u, v)
        else:
            self._encode_pframe(bw, y, u, v)
        self.frame_idx += 1
        return bw.to_bytes()

    # -- I-frame -----------------------------------------------------------
    def _encode_iframe(self, bw: BitWriter, y, u, v) -> None:
        bw.write_bits(1, 1)            # I
        bw.write_bits(1, 1)            # yuv format
        bw.write_bits(0, 1)            # coefficient table 0
        bw.write_bits(self.qp, 6)
        if self.twin.quantizer != self.qp:
            self.twin._setup_quant(self.qp)
        for mby in range(self.h // 16):
            for mbx in range(self.w // 16):
                bw.write_bits(0, 1)    # full-block mode
                self._encode_intra_mb(bw, mbx, mby, y, u, v)

    def _best_mode8(self, plane2d, target, py, px, avail_t, avail_l,
                    n=8) -> tuple[int, int]:
        """Try legal modes on the twin plane (restoring after each), return
        (mode, sse)."""
        cand = [3]
        if avail_t:
            cand.append(0)
        if avail_l:
            cand += [1, 4]
        if avail_t and avail_l:
            cand += [5, 6, 7]
        off = py * self.S + px
        flat = plane2d.ravel()
        best = (3, 1 << 62)
        region = plane2d[py:py + n, px:px + n].copy()
        for m in cand:
            self.twin._predict_intra(m if n == 8 else m + 10, flat, off, None)
            sse = self._sse(plane2d[py:py + n, px:px + n], target)
            if sse < best[1]:
                best = (m, sse)
            plane2d[py:py + n, px:px + n] = region
        return best

    def _encode_intra_mb(self, bw: BitWriter, mbx: int, mby: int,
                         y, u, v) -> None:
        """Full-block intra MB (DecIntraFullBlockPMode inverse): one 8x8 mode
        for the four luma blocks, residuals on every block."""
        S = self.S
        ty = self._plane2d(self.twin.y_planes[0])
        tuv = self._plane2d(self.twin.uv_planes[0])
        py, px = mby * 16, mbx * 16
        avail_t, avail_l = mby > 0, mbx > 0
        # pick the mode by the top-left 8x8 (applies to all four)
        mode, _ = self._best_mode8(ty, y[py:py + 8, px:px + 8], py, px,
                                   avail_t, avail_l)
        cbp = 0b111111  # code residuals everywhere
        bw.write_varint_u(_inv_lut(TABLES.cbp_intra, cbp))
        bw.write_bits(mode, 3)
        for bit, (dy, dx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
            off = (py + dy) * S + px + dx
            self.twin._predict_intra(mode, self.twin.y_planes[0], off, None)
            target = y[py + dy:py + dy + 8, px + dx:px + dx + 8]
            resid = target.astype(np.int64) \
                - ty[py + dy:py + dy + 8, px + dx:px + dx + 8].astype(np.int64)
            levels = self._quant_block(resid, 8)
            bw.write_bits(1, 1)  # whole-8x8 DCT flag (sub_116508)
            if not self._emit_coefs(bw, levels, 8):
                # force a zero-ish DC code so the coded-block claim holds
                self.coefc.emit(bw, 1, 0, 1)
                levels[0, 0] = 1
            self._apply_levels(self.twin.y_planes[0], off, 8, levels)
        # chroma: same scheme on the UV halves
        cy, cxu = py // 2, px // 2
        bw.write_bits(3, 3)  # DC for chroma (cheap and always legal)
        for bit, cx0, src in ((4, cxu, u), (5, cxu + S // 2, v)):
            off = cy * S + cx0
            self.twin._predict_intra(3, self.twin.uv_planes[0], off, None)
            target = src[py // 2:py // 2 + 8, px // 2:px // 2 + 8]
            resid = target.astype(np.int64) \
                - tuv[cy:cy + 8, cx0:cx0 + 8].astype(np.int64)
            levels = self._quant_block(resid, 8)
            bw.write_bits(1, 1)
            if not self._emit_coefs(bw, levels, 8):
                self.coefc.emit(bw, 1, 0, 1)
                levels[0, 0] = 1
            self._apply_levels(self.twin.uv_planes[0], off, 8, levels)

    def _apply_levels(self, plane: np.ndarray, off: int, n: int,
                      levels: np.ndarray) -> None:
        """Reconstruct through the twin: dequantize the emitted levels with
        the packed tables and run the real IDCT add-saturate."""
        base = 10 if n == 8 else 74
        packed = self.twin.internal[base:base + n * n].astype(np.int64)
        dense = np.zeros((n, n), np.int32)
        for scan in range(n * n):
            pos = int(packed[scan]) & 0xFF
            scale = (int(packed[scan]) & 0xFFFFFFFF) >> 8
            lv = int(levels[pos // n, pos % n])
            if lv:
                dense[pos // n, pos % n] = lv * scale
        self.twin._apply_idct(plane, off, n, (dense, 74 if n == 8 else 90))

    # -- P-frame -----------------------------------------------------------
    def _encode_pframe(self, bw: BitWriter, y, u, v) -> None:
        bw.write_bits(0, 1)
        bw.write_varint_s(0)           # dQP 0
        S = self.S
        ty = self._plane2d(self.twin.y_planes[0])
        ref = self._plane2d(self.twin.y_planes[1])
        refuv = self._plane2d(self.twin.uv_planes[1])
        ncols = (self.w + 0x20 + 15) // 16
        cache = [(0, 0)] * (ncols * 2)
        for mby in range(self.h // 16):
            io = 0
            for mbx in range(self.w // 16):
                vals = [cache[io], cache[io + 1], cache[io + 2]]
                pmx = sorted(a[0] for a in vals)[1]
                pmy = sorted(a[1] for a in vals)[1]
                io += 1
                cache[io] = (0, 0)
                py, px = mby * 16, mbx * 16
                target = y[py:py + 16, px:px + 16]
                mv, sse = self._search_mv(ref, target, px, py, pmx, pmy)
                if sse > (1 << 18):  # poor match: intra MB
                    code, nbits = _pb_code(16, 16, self.profile, 6)
                    bw.write_bits(code, nbits)
                    self._encode_intra_mb(bw, mbx, mby, y, u, v)
                    continue
                if mv == (pmx, pmy):
                    code, nbits = _pb_code(16, 16, self.profile, 0)
                    bw.write_bits(code, nbits)
                else:
                    code, nbits = _pb_code(16, 16, self.profile, 1)
                    bw.write_bits(code, nbits)
                    bw.write_varint_s(mv[0] - pmx)
                    bw.write_varint_s(mv[1] - pmy)
                cache[io] = mv
                # twin-side MC (exactly the decoder's copy)
                self.twin.internal[219] = mv[0] & 0xFFFFFFFF
                self.twin.internal[220] = mv[1] & 0xFFFFFFFF
                self.twin._exec_mc(16, 16, 1, mv[0], mv[1], py * S + px)
                # residual CBP: luma quads coded when they have signal
                self._encode_inter_residual(bw, mbx, mby, y, u, v)

    def _search_mv(self, ref, target, px, py, pmx, pmy) -> tuple[tuple[int, int], int]:
        """Full-pel +/-8 window SSD search around the predictor (reference
        Analyzer does log/diamond over 5 refs; one ref + small window here)."""
        best = ((pmx, pmy), 1 << 62)
        bpx, bpy = pmx >> 1, pmy >> 1
        for dy in range(-8, 9, 2):
            for dx in range(-8, 9, 2):
                sx = px + bpx + (dx >> 1)
                sy = py + bpy + (dy >> 1)
                if sx < 0 or sy < 0 or sx + 16 > self.w or sy + 16 > self.h:
                    continue
                cand = ref[sy:sy + 16, sx:sx + 16]
                sse = self._sse(cand, target)
                mv = (pmx + dx, pmy + dy)
                if sse < best[1]:
                    best = (mv, sse)
        return best

    def _encode_inter_residual(self, bw: BitWriter, mbx, mby, y, u, v) -> None:
        S = self.S
        ty = self._plane2d(self.twin.y_planes[0])
        tuv = self._plane2d(self.twin.uv_planes[0])
        py, px = mby * 16, mbx * 16
        quads = []
        level_sets = []
        for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
            target = y[py + dy:py + dy + 8, px + dx:px + dx + 8]
            resid = target.astype(np.int64) \
                - ty[py + dy:py + dy + 8, px + dx:px + dx + 8].astype(np.int64)
            levels = self._quant_block(resid, 8)
            quads.append(int(np.any(levels)))
            level_sets.append(levels)
        ctargets = []
        for half, src in ((0, u), (S // 2, v)):
            cy, cx = py // 2, px // 2
            target = src[cy:cy + 8, cx:cx + 8]
            resid = target.astype(np.int64) \
                - tuv[cy:cy + 8, cx + half:cx + half + 8].astype(np.int64)
            levels = self._quant_block(resid, 8)
            quads.append(int(np.any(levels)))
            level_sets.append(levels)
            ctargets.append((cy * S + cx + half, levels))
        mask = sum(b << i for i, b in enumerate(quads))
        bw.write_varint_u(_inv_lut(TABLES.cbp_inter, mask))
        offs = [(py + dy) * S + px + dx
                for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8))]
        for i in range(4):
            if quads[i]:
                bw.write_bits(1, 1)  # whole 8x8 (loc_11652C)
                self._emit_coefs(bw, level_sets[i], 8)
                self._apply_levels(self.twin.y_planes[0], offs[i], 8,
                                   level_sets[i])
        for i, (off, levels) in enumerate(ctargets):
            if quads[4 + i]:
                bw.write_bits(1, 1)
                self._emit_coefs(bw, levels, 8)
                self._apply_levels(self.twin.uv_planes[0], off, 8, levels)
