"""Minimal AVI (RIFF) writer: uncompressed BGR24 video + PCM16 audio.

Replaces the reference's Windows-only avifil32.dll P/Invoke wrapper
(MobiclipDecoder/IO/AVI/Avi.cs:191-262, AviManager.cs) with a portable
pure-Python muxer, so the converter CLI can emit .avi like
MobiConverter/Program.cs does (video via AddVideoStream + accumulated PCM
audio stream, Program.cs:72,176-200,329-353).
"""
from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


class AviWriter:
    """Accumulate frames/audio in memory, write one interleaved AVI."""

    def __init__(self, path: str | Path, width: int, height: int,
                 fps: float, audio_rate: int = 0, audio_channels: int = 1):
        self.path = Path(path)
        self.w, self.h = width, height
        self.fps = max(fps, 1e-3)
        self.audio_rate = audio_rate
        self.audio_channels = max(audio_channels, 1)
        self._frames: list[bytes] = []
        self._audio: list[np.ndarray] = []

    def add_frame(self, rgb: np.ndarray) -> None:
        """rgb: (H, W, 3) uint8.  Stored as bottom-up BGR24 DIB rows padded
        to 4 bytes (the classic uncompressed AVI frame format)."""
        assert rgb.shape == (self.h, self.w, 3)
        bgr = rgb[::-1, :, ::-1]   # bottom-up, RGB->BGR
        row = self.w * 3
        pad = (-row) % 4
        if pad:
            bgr = np.concatenate(
                [bgr.reshape(self.h, row),
                 np.zeros((self.h, pad), np.uint8)], axis=1)
        self._frames.append(bgr.tobytes())

    def add_audio(self, pcm: np.ndarray) -> None:
        """pcm: interleaved int16 samples."""
        self._audio.append(np.asarray(pcm, dtype="<i2"))

    def close(self) -> None:
        n = len(self._frames)
        row = self.w * 3 + ((-self.w * 3) % 4)
        frame_bytes = row * self.h
        usec = int(round(1_000_000 / self.fps))
        has_audio = bool(self._audio) and self.audio_rate > 0
        pcm = (np.concatenate(self._audio) if has_audio
               else np.empty(0, "<i2"))

        avih = _chunk(b"avih", struct.pack(
            "<14I", usec, frame_bytes * max(int(self.fps), 1), 0, 0x10,
            n, 0, 2 if has_audio else 1, 0, self.w, self.h, 0, 0, 0, 0))

        strh_v = _chunk(b"strh", struct.pack(
            "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
            1000, int(round(self.fps * 1000)), 0, n, frame_bytes, 0xFFFFFFFF,
            0, 0, 0, self.w, self.h))
        strf_v = _chunk(b"strf", struct.pack(
            "<IiiHHIIiiII", 40, self.w, self.h, 1, 24, 0, frame_bytes,
            0, 0, 0, 0))
        strl_v = _list(b"strl", strh_v + strf_v)

        strls = strl_v
        if has_audio:
            block = 2 * self.audio_channels
            strh_a = _chunk(b"strh", struct.pack(
                "<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00\x00\x00\x00", 0, 0,
                0, 0, block, self.audio_rate * block, 0,
                len(pcm) // self.audio_channels, block, 0xFFFFFFFF, block,
                0, 0, 0, 0))
            strf_a = _chunk(b"strf", struct.pack(
                "<HHIIHH", 1, self.audio_channels, self.audio_rate,
                self.audio_rate * block, block, 16))
            strls += _list(b"strl", strh_a + strf_a)

        hdrl = _list(b"hdrl", avih + strls)

        movi_parts: list[bytes] = []
        idx: list[tuple[bytes, int, int]] = []
        pos = 4  # after 'movi' fourcc
        samples_per_frame = (len(pcm) // n if (has_audio and n) else 0)
        # align audio to channel blocks
        if has_audio:
            samples_per_frame -= samples_per_frame % self.audio_channels
        ap = 0
        for i, fr in enumerate(self._frames):
            c = _chunk(b"00db", fr)
            idx.append((b"00db", pos, len(fr)))
            movi_parts.append(c)
            pos += len(c)
            if has_audio:
                hi = len(pcm) if i == n - 1 else ap + samples_per_frame
                seg = pcm[ap:hi].tobytes()
                ap = hi
                if seg:
                    c = _chunk(b"01wb", seg)
                    idx.append((b"01wb", pos, len(seg)))
                    movi_parts.append(c)
                    pos += len(c)
        movi = _list(b"movi", b"".join(movi_parts))

        idx1 = _chunk(b"idx1", b"".join(
            fourcc + struct.pack("<III", 0x10, off, ln)
            for fourcc, off, ln in idx))

        riff = b"AVI " + hdrl + movi + idx1
        with open(self.path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)
