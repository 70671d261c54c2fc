"""Sx coefficient-mixing precision probe.

models/audio_sx.py keeps Sx host-side because `_expand_coefs`'s pairwise
mixing (SxDecoder.cs:252-315) multiplies coefficients by each other, so a
fixed-width device kernel needs a proven bound on every intermediate.  This
probe MEASURES those intermediates — the products and running sums of the
exact mixing chain, fed the decoder's true inputs — across codebook
magnitude regimes:

* ``random-bytes``: codebooks as arbitrary file bytes.  This IS the
  format-legal bound — MODS carries the 0xC34-byte codebook as raw header
  bytes (ModsDemuxer.cs:20-29) with no validation, so any byte pattern is a
  legal input to the decoder.
* scaled regimes: codebook rows drawn from +/-X for tamer X, modeling
  well-behaved production codebooks (real LPC codebooks keep reflection
  magnitudes small).

Verdict from committed runs (SX_PRECISION.json): random-byte codebooks blow
far past 64 bits within a few frames (the saved coefficient state compounds
every predicted frame), so an int64 device lattice is UNSOUND for
format-legal input; even |rows| <= 1024 crosses 64 bits.  Sx therefore
stays host-side (arbitrary-precision ints), per-channel parallel.

  python tools/probe_sx_precision.py > SX_PRECISION.json
"""
import json
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from mobiclipdecoder_tpu.models.audio_sx import SxDecoder, _s32  # noqa: E402


class _Track:
    def __init__(self):
        self.max_abs = 0

    def __call__(self, v: int) -> int:
        a = -v if v < 0 else v
        if a > self.max_abs:
            self.max_abs = a
        return v


def run_regime(name, cb_bytes, n_frames, seed):
    rng = np.random.default_rng(seed)
    dec = SxDecoder()
    dec.codebook = cb_bytes
    buf = bytearray(rng.integers(0, 256, 16 + n_frames * 64
                                 ).astype(np.uint8).tobytes())
    buf[0], buf[1] = 0x00, 0xFE          # key-init first frame
    dec.data = bytes(buf)
    t = _Track()

    orig = SxDecoder._expand_coefs

    def hooked(self, src, off):
        out = orig(self, src, off)
        # the decoder saved the post-add/pre-mix inputs at Internal[0..0x1C]
        c_in = [self._iu32(i * 4) for i in range(8)]
        _replay_mixing(c_in, t)
        return out

    SxDecoder._expand_coefs = hooked
    try:
        for _ in range(n_frames):
            dec.decode()
    finally:
        SxDecoder._expand_coefs = orig
    return {"regime": name, "frames": n_frames,
            "max_abs_bits": t.max_abs.bit_length(),
            "int64_safe": t.max_abs < (1 << 63)}


def _replay_mixing(c, t):
    """Literal transcription of the mixing statements with tracking."""
    for v in c:
        t(v)
    c = list(c)
    c[0] = t(c[0] + (t(c[0] * c[1]) >> 15))
    tmp = t(c[0] * c[2])
    c[0] = t(c[0] + (t(c[1] * c[2]) >> 15))
    c[1] = t(c[1] + (tmp >> 15))
    tmp = t(c[0] * c[3])
    c[0] = t(c[0] + (t(c[2] * c[3]) >> 15))
    c[2] = t(c[2] + (tmp >> 15))
    c[1] = t(c[1] + (t(c[1] * c[3]) >> 15))
    tmp = t(c[0] * c[4])
    c[0] = t(c[0] + (t(c[3] * c[4]) >> 15))
    c[3] = t(c[3] + (tmp >> 15))
    tmp = t(c[1] * c[4])
    c[1] = t(c[1] + (t(c[2] * c[4]) >> 15))
    c[2] = t(c[2] + (tmp >> 15))
    tmp = t(c[0] * c[5])
    c[0] = t(c[0] + (t(c[4] * c[5]) >> 15))
    c[4] = t(c[4] + (tmp >> 15))
    tmp = t(c[1] * c[5])
    c[1] = t(c[1] + (t(c[3] * c[5]) >> 15))
    c[3] = t(c[3] + (tmp >> 15))
    c[2] = t(c[2] + (t(c[2] * c[5]) >> 15))
    tmp = t(c[0] * c[6])
    c[0] = t(c[0] + (t(c[5] * c[6]) >> 15))
    c[5] = t(c[5] + (tmp >> 15))
    tmp = t(c[1] * c[6])
    c[1] = t(c[1] + (t(c[4] * c[6]) >> 15))
    c[4] = t(c[4] + (tmp >> 15))
    tmp = t(c[2] * c[6])
    c[2] = t(c[2] + (t(c[3] * c[6]) >> 15))
    c[3] = t(c[3] + (tmp >> 15))
    tmp = t(c[0] * c[7])
    c[0] = t(c[0] + (t(c[6] * c[7]) >> 15))
    c[6] = t(c[6] + (tmp >> 15))
    tmp = t(c[1] * c[7])
    c[1] = t(c[1] + (t(c[5] * c[7]) >> 15))
    c[5] = t(c[5] + (tmp >> 15))
    tmp = t(c[2] * c[7])
    c[2] = t(c[2] + (t(c[4] * c[7]) >> 15))
    c[4] = t(c[4] + (tmp >> 15))
    c[3] = t(c[3] + (t(c[3] * c[7]) >> 15))
    for v in c:
        t(-(v >> 1))


def scaled_codebook(rng, scale: int) -> bytes:
    """Codebook whose s16 rows are bounded by ``scale`` (base row 0xC10 and
    gain table 0xC00 bounded the same way)."""
    cb = bytearray(0xC34)
    rows = rng.integers(-scale, scale + 1, 0xC34 // 2)
    struct.pack_into(f"<{len(rows)}h", cb, 0, *[int(v) for v in rows])
    return bytes(cb)


def main() -> int:
    rng = np.random.default_rng(7)
    results = []
    results.append(run_regime(
        "random-bytes (format-legal bound)",
        rng.integers(0, 256, 0xC34).astype(np.uint8).tobytes(), 64, 11))
    for scale in (16, 256, 1024, 8192, 32767):
        results.append(run_regime(
            f"rows<=+/-{scale}", scaled_codebook(rng, scale), 256,
            100 + scale))
    print(json.dumps({"metric": "sx_mixing_intermediate_bits",
                      "note": ("int64 device lattice requires int64_safe "
                               "over format-legal input; MODS codebooks "
                               "are unvalidated file bytes"),
                      "regimes": results}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
