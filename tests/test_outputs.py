"""Presentation/outputs parity: AVI writer, YUV->RGB epilogue, Majesco stub,
info/play CLI surfaces."""
import json
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,  # noqa
                                                     OracleDecoder)
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer  # noqa
from mobiclipdecoder_tpu.utils import rawio  # noqa


def test_yuv_to_rgb_matches_oracle_epilogue():
    """rawio.yuv_to_rgb on cropped planes == OracleDecoder.to_rgb."""
    for ver in (MobiclipVersion.MODS_DS, MobiclipVersion.MOFLEX_3DS):
        W, H = 64, 48
        synth = StreamSynthesizer(W, H, ver, seed=9)
        dec = OracleDecoder(W, H, ver)
        for i in range(2):
            dec.data = synth.iframe(0x18) if i == 0 else synth.pframe()
            dec.offset = 0
            dec.decode_frame()
            y, u, v = dec.cropped_yuv()
            got = rawio.yuv_to_rgb(y, u, v,
                                   ver == MobiclipVersion.MOFLEX_3DS)
            np.testing.assert_array_equal(got, dec.to_rgb())


def test_avi_writer_structure(tmp_path):
    from mobiclipdecoder_tpu.utils.avi import AviWriter
    p = tmp_path / "t.avi"
    w = AviWriter(p, 32, 16, 24.0, audio_rate=8000, audio_channels=2)
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.add_frame(rng.integers(0, 255, (16, 32, 3)).astype(np.uint8))
    w.add_audio(rng.integers(-1000, 1000, 600).astype(np.int16))
    w.close()
    data = p.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    assert b"00db" in data and b"01wb" in data and b"idx1" in data
    # avih frame count
    avih_at = data.index(b"avih") + 8
    assert struct.unpack_from("<I", data, avih_at + 16)[0] == 3


def test_transcode_avi(tmp_path):
    from test_mods_e2e import _build_fixture
    from mobiclipdecoder_tpu.runtime.transcode import transcode
    blob = _build_fixture()
    src = tmp_path / "in.mods"
    src.write_bytes(blob)
    stats = transcode(src, tmp_path / "out", engine="oracle", fmt="avi")
    assert stats["format"] == "avi" and stats["frames"] == 6
    data = (tmp_path / "out.avi").read_bytes()
    assert data[:4] == b"RIFF" and b"01wb" in data


def test_info_and_play(tmp_path):
    from test_mods_e2e import _build_fixture
    from mobiclipdecoder_tpu.runtime.transcode import play, probe_info
    blob = _build_fixture()
    src = tmp_path / "in.mods"
    src.write_bytes(blob)
    info = probe_info(src)
    assert info["container"] == "mods" and info["width"] == 64
    assert info["audio_codec"] == "ima-adpcm"
    stats = play(src, engine="oracle", realtime=False,
                 dump_frame=1, dump_path=tmp_path / "f1.ppm")
    assert stats["frames"] == 6
    ppm = (tmp_path / "f1.ppm").read_bytes()
    assert ppm.startswith(b"P6\n64 48\n255\n")


def test_majesco_stub_parity():
    from mobiclipdecoder_tpu.models import audio_majesco as mj
    # header parsing + null-return parity (MajescoInflater.cs:368-377)
    blob = struct.pack("<I", 1234) + b"\x00" * 16
    assert mj.get_output_size(blob) == 1234
    assert mj.inflate(blob) is None
    assert mj.MajescoDecoder().decode(b"") is None
    # decode-table builder on a canonical code: lengths {A:1, B:2, C:3, D:3}
    lengths = np.array([1, 2, 3, 3], np.int32)
    primary, secondary, _ = mj.build_decode_table(lengths, primary_bits=8)
    # canonical codes: A=0, B=10, C=110, D=111
    assert primary[0b00000000] == (0 << 4) | 1
    assert primary[0b01111111] == (0 << 4) | 1
    assert primary[0b10000000] == (1 << 4) | 2
    assert primary[0b11000000] == (2 << 4) | 3
    assert primary[0b11100000] == (3 << 4) | 3
    # long codes route through the secondary table
    lengths2 = np.zeros(600, np.int32)
    lengths2[:2] = [1, 2]
    lengths2[2:6] = 10          # four 10-bit codes -> secondary
    lengths2[6] = 3
    primary2, secondary2, _ = mj.build_decode_table(lengths2)
    e = primary2[0b11100000]
    assert (e & 0xF) == 0xF
    # peek 1110000000 -> first 10-bit code (symbol 2)
    base = e >> 4
    assert secondary2[base + 0] == (2 << 4) | 10
    # over-subscribed codes must be rejected
    with pytest.raises(ValueError):
        mj.build_decode_table(np.array([1, 1, 1], np.int32))
    # bit reader: LE u16-word refill, MSB-first
    br = mj.MajescoBitReader(bytes([0x34, 0x12, 0x78, 0x56]))
    assert br.read(4) == 0x1
    assert br.read(8) == 0x23
    assert br.read(4) == 0x4

def test_avi_round_trip(tmp_path):
    """AviReader (the reference wrapper's GetFrame read-back analog) must
    recover exactly the frames and PCM the writer stored."""
    import numpy as np
    from mobiclipdecoder_tpu.utils.avi import AviReader, AviWriter
    rng = np.random.default_rng(5)
    W, H, N = 36, 20, 4   # odd row stride (36*3 = 108, pad 0) exercised below
    p = tmp_path / "rt.avi"
    w = AviWriter(p, W, H, 23.976, audio_rate=32728, audio_channels=2)
    frames = [rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
              for _ in range(N)]
    pcm = rng.integers(-32768, 32768, 2 * 500).astype(np.int16)
    for fr in frames:
        w.add_frame(fr)
    w.add_audio(pcm)
    w.close()

    r = AviReader(p)
    assert (r.width, r.height, r.n_frames) == (W, H, N)
    assert abs(r.fps - 23.976) < 0.01
    assert (r.audio_rate, r.audio_channels) == (32728, 2)
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(r.get_frame(i), fr, err_msg=str(i))
    np.testing.assert_array_equal(r.audio(), pcm)


def test_avi_reader_on_transcode_output(tmp_path):
    """Read back the converter CLI's own .avi output."""
    from test_mods_e2e import _build_fixture
    from mobiclipdecoder_tpu.runtime.transcode import transcode
    from mobiclipdecoder_tpu.utils.avi import AviReader
    src = tmp_path / "clip.mods"
    src.write_bytes(_build_fixture(nframes=4))
    transcode(src, tmp_path / "out", engine="oracle", fmt="avi")
    r = AviReader(tmp_path / "out.avi")
    assert r.n_frames == 4 and r.width == 64 and r.height == 48
    fr = r.get_frame(0)
    assert fr.shape == (48, 64, 3) and fr.dtype == np.uint8


def test_play_pipe_y4m(tmp_path):
    """The live viewing surface: play --pipe-y4m streams a valid YUV4MPEG2
    C444 sequence with one FRAME per decoded frame."""
    from test_mods_e2e import _build_fixture
    from mobiclipdecoder_tpu.runtime.transcode import play
    src = tmp_path / "clip.mods"
    src.write_bytes(_build_fixture(nframes=5))
    dest = tmp_path / "live.y4m"
    stats = play(src, engine="oracle", realtime=False, pipe_y4m=str(dest))
    assert stats["frames"] == 5
    data = dest.read_bytes()
    header, rest = data.split(b"\n", 1)
    assert header.startswith(b"YUV4MPEG2 W64 H48") and b"C444" in header
    assert rest.count(b"FRAME\n") == 5
    assert len(rest) == 5 * (len(b"FRAME\n") + 3 * 64 * 48)


def test_play_pipe_wav(tmp_path):
    """play --pipe-wav streams the decoded PCM as a WAV alongside the
    video pipe (the reference player's NAudio-output analog)."""
    import struct
    from mobiclipdecoder_tpu.containers.mods import ModsMuxer
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.runtime.transcode import play
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    rng = np.random.default_rng(9)
    W, H, ch = 64, 48, 2
    synth = StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=9)
    mux = ModsMuxer(W, H, fps=20.0, audio_codec=2, nb_channel=ch,
                    frequency=16384)
    for i in range(3):
        video = synth.iframe(0x18, pad=False) if i == 0 \
            else synth.pframe(pad=False)
        pkts = [rng.integers(0, 256, 40).astype(np.uint8).tobytes()
                for _ in range(ch)]
        mux.add_frame(video, pkts, keyframe=(i == 0))
    src = tmp_path / "clip.mods"
    src.write_bytes(mux.to_bytes())

    wav = tmp_path / "live.wav"
    stats = play(src, engine="oracle", realtime=False, pipe_wav=str(wav))
    assert stats["frames"] == 3
    assert stats["audio_samples"] == 3 * 256 * ch
    data = wav.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    got_ch, got_rate = struct.unpack_from("<HI", data, 22)
    assert (got_ch, got_rate) == (ch, 16384)
    (dlen,) = struct.unpack_from("<I", data, 40)
    assert dlen == 2 * stats["audio_samples"]  # header patched on close
    assert len(data) == 44 + dlen


def test_play_3d_layout_left_eye_parity(tmp_path):
    """A Moflex stream with a 3D layout must play like the reference
    (Form1.cs:516-530): every frame decodes (decoder state continuity)
    but only alternate frames — the left eye, starting with the first —
    display, at a doubled frame interval.  Audio attached to right-eye
    frames still plays: the reference toggle skips only the display, so
    dropping those PCM chunks would halve the audio (Form1.cs:549-558)."""
    import numpy as np
    from mobiclipdecoder_tpu.containers.moflex import (AudioStream,
                                                       MoflexMuxer,
                                                       VideoLayout,
                                                       VideoStreamWithLayout)
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.runtime.transcode import play, probe_info
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, N, NS = 64, 48, 6, 64
    synth = StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=33)
    chunks = [VideoStreamWithLayout(stream_index=0, codec_id=0, fps_rate=24,
                                    fps_scale=1, width=W, height=H,
                                    layout=VideoLayout.INTERLEAVE_LEFT_FIRST
                                    if hasattr(VideoLayout,
                                               "INTERLEAVE_LEFT_FIRST")
                                    else list(VideoLayout)[1]),
              AudioStream(stream_index=1, codec_id=2,  # PCM16
                          frequency=16384, channels=1)]
    mux = MoflexMuxer(chunks)
    rng = np.random.default_rng(33)
    for i in range(N):
        pcm = rng.integers(-2000, 2000, NS).astype("<i2")
        mux.add_frame(1, pcm.tobytes())
        pkt = synth.iframe(0x12, pad=False) if i == 0 \
            else synth.pframe(pad=False)
        mux.add_frame(0, pkt)
    f = tmp_path / "clip3d.moflex"
    f.write_bytes(mux.to_bytes())
    info = probe_info(f)
    vids = [s for s in info["streams"] if s["type"] == "video"]
    assert vids and vids[0]["layout"] != 0
    wav = tmp_path / "live3d.wav"
    stats = play(f, engine="oracle", realtime=False, pipe_wav=str(wav))
    assert stats["is3d"] is True
    assert stats["frames"] == (N + 1) // 2          # left-eye frames only
    # every decoded frame's PCM played — including right-eye frames.
    # (+1 sample/frame: the demuxer's 2 appended zero bytes reach the
    # PCM16 path, exactly as the reference feeds the whole event payload
    # to its audio buffer, MoLiveDemux.cs:353 + Form1.cs:631-633.)
    assert stats["audio_samples"] == N * (NS + 1)


def test_anaglyph_compositor():
    """R channel from the left eye, G/B from the right (Form1.cs:663-668)."""
    import numpy as np
    from mobiclipdecoder_tpu.utils import rawio
    rng = np.random.default_rng(0)
    left = rng.integers(0, 256, (8, 8, 3), np.uint8)
    right = rng.integers(0, 256, (8, 8, 3), np.uint8)
    out = rawio.anaglyph(left, right)
    np.testing.assert_array_equal(out[..., 0], left[..., 0])
    np.testing.assert_array_equal(out[..., 1:], right[..., 1:])
