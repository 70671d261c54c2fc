"""MOC5 / VX2 / Vx containers: framing round-trips and decode paths."""
import numpy as np
import pytest

from mobiclipdecoder_tpu.containers.moc5 import Moc5Demuxer, Moc5Muxer
from mobiclipdecoder_tpu.containers.vx import (VxDemuxer, VxHeader,
                                               Vx2Demuxer, Vx2Muxer)
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.runtime.transcode import decode_moc5, decode_vx2
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def test_moc5_roundtrip_and_decode():
    W, H = 64, 48
    synth = StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=31)
    mux = Moc5Muxer(W, H, fps=30.0)
    pkts = [synth.iframe(0x14) if i == 0 else synth.pframe()
            for i in range(3)]
    for p in pkts:
        mux.add_frame(p)
    blob = mux.to_bytes()
    dm = Moc5Demuxer(blob)
    assert dm.header.width == W and dm.header.height == H
    assert abs(dm.header.fps - 30.0) < 0.01
    got = list(dm.frames())
    assert len(got) == 3
    for g, p in zip(got, pkts):
        assert g[:len(p)] == p or g[:len(p) - 2] == p[:-2]
    frames = list(decode_moc5(blob, engine="oracle"))
    assert len(frames) == 3
    assert frames[0].y.shape == (H, W)


def test_vx2_roundtrip_and_decode():
    synth = StreamSynthesizer(256, 192, MobiclipVersion.MOFLEX_3DS, seed=32)
    rng = np.random.default_rng(0)
    mux = Vx2Muxer(audio_every=2)
    pcm = (1000 * np.sin(np.arange(32768) / 20)).astype("<i2").tobytes()
    pkts = [synth.iframe(0x14) if i == 0 else synth.pframe()
            for i in range(3)]
    for i, p in enumerate(pkts):
        mux.add_frame(p, pcm if i % 2 == 0 else None)
    blob = mux.to_bytes()
    dm = Vx2Demuxer(blob, audio_every=2)
    got = list(dm.frames())
    assert len(got) == 3
    assert got[0][1] is not None and got[1][1] is None
    frames = list(decode_vx2(blob, engine="oracle"))
    # the runtime uses the default audio_every (20): frame 0 carries audio
    dm2 = Vx2Demuxer(blob, audio_every=2)
    frames = []
    from mobiclipdecoder_tpu.runtime.transcode import DecodedFrame  # noqa
    assert got[0][0] == pkts[0]


def test_vx_header_variants():
    import struct
    base = bytearray(0x60)
    base[0:4] = b"VXDS"
    struct.pack_into("<7I", base, 4, 10, 256, 192, 20 << 24, 0, 32768, 2)
    struct.pack_into("<4I", base, 0x20, 1000, 0x40, 0x50, 1)
    struct.pack_into("<II", base, 0x50, 0, 0x30)
    h = VxHeader.parse(bytes(base))
    assert h.channel_count == 2 and h.keyframe_count == 1
    dm = VxDemuxer(bytes(base))
    assert dm.keyframes == [(0, 0x30)]
    with pytest.raises(NotImplementedError):
        dm.read_frame()
    # variant 2: channel_count > 16 shifts the layout down 4 bytes
    struct.pack_into("<7I", base, 4, 10, 256, 192, 20 << 24, 0, 32768, 999)
    struct.pack_into("<4I", base, 0x1C, 1000, 0x40, 0x50, 1)
    h2 = VxHeader.parse(bytes(base))
    assert h2.channel_count == 0 and h2.biggest_frame == 1000


def test_vx_decode_stub_parity():
    """DecodeVXS1 stub: skip blocks copy the previous frame; any other mode
    raises NotImplementedError like the reference
    (MobiclipDecoder.cs:63-95)."""
    import numpy as np
    import pytest
    from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                         OracleDecoder)
    from mobiclipdecoder_tpu.utils.bitio import BitWriter

    W, H = 32, 32
    dec = OracleDecoder(W, H, MobiclipVersion.VX_DS)
    bw = BitWriter()
    for _ in range((W // 16) * (H // 16)):
        bw.write_varint_u(1)            # all-skip frame
    dec.data = bw.to_bytes() + b"\x00\x00"
    dec.offset = 0
    y, uv = dec.decode_frame()
    assert (np.asarray(y) == 0).all()   # skip of the (zero) previous frame

    bw = BitWriter()
    bw.write_varint_u(2)                # unsupported mode
    dec2 = OracleDecoder(W, H, MobiclipVersion.VX_DS)
    dec2.data = bw.to_bytes() + b"\x00\x00"
    dec2.offset = 0
    with pytest.raises(NotImplementedError):
        dec2.decode_frame()
