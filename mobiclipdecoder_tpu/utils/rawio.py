"""Raw A/V output writers (the reference's avifil32-based AVI writer is
Windows-only third-party code; raw Y4M/WAV/PPM cover the same role for a
batch transcoder: file in -> decoded frames + PCM out)."""
from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


class Y4MWriter:
    """YUV4MPEG2 4:2:0 writer. Note: Mobiclip chroma is codec-native (MODS
    pseudo-YUV / Moflex YCbCr), written as-is; use rgb/PPM output for
    colorimetrically converted frames."""

    def __init__(self, path: str | Path, width: int, height: int,
                 fps: float = 25.0):
        self.f = open(path, "wb")
        num = int(round(fps * 1000))
        self.f.write(f"YUV4MPEG2 W{width} H{height} F{num}:1000 Ip A1:1 "
                     f"C420jpeg\n".encode())

    def add_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> None:
        self.f.write(b"FRAME\n")
        self.f.write(np.ascontiguousarray(y, dtype=np.uint8).tobytes())
        self.f.write(np.ascontiguousarray(u, dtype=np.uint8).tobytes())
        self.f.write(np.ascontiguousarray(v, dtype=np.uint8).tobytes())

    def close(self) -> None:
        self.f.close()


def write_wav(path: str | Path, samples: np.ndarray, rate: int,
              channels: int) -> None:
    """PCM16 WAV writer; ``samples`` is interleaved int16 (frames*channels,)."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    with open(path, "wb") as f:
        byte_rate = rate * channels * 2
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                      byte_rate, channels * 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)))
        f.write(data)


def write_ppm(path: str | Path, rgb: np.ndarray) -> None:
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgb, dtype=np.uint8).tobytes())


def interleave_channels(channels: list[np.ndarray]) -> np.ndarray:
    """Per-sample channel interleave (Form1.cs:637-650)."""
    n = min(len(c) for c in channels)
    out = np.empty(n * len(channels), dtype=np.int16)
    for i, c in enumerate(channels):
        out[i::len(channels)] = c[:n]
    return out
