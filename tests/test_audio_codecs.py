"""Sx and FastAudio decoder tests: determinism, state carry, packet framing,
and container integration (no golden vectors exist anywhere — the reference
has no tests and no runnable binary here; these lock OUR behavior so the
future scan-kernel ports have a target)."""
import numpy as np

from mobiclipdecoder_tpu.containers.mods import ModsMuxer
from mobiclipdecoder_tpu.models.audio_fastaudio import FastAudioDecoder
from mobiclipdecoder_tpu.models.audio_sx import SxDecoder
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.runtime.transcode import decode_mods
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def test_fastaudio_packet_framing_and_determinism():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 40 * 6).astype(np.uint8).tobytes()
    d1, d2 = FastAudioDecoder(), FastAudioDecoder()
    d1.data = d2.data = data
    for i in range(6):
        a = d1.decode()
        assert d1.offset == 40 * (i + 1)  # exactly one 40-byte packet each
        assert a.shape == (256,) and a.dtype == np.int16
        np.testing.assert_array_equal(a, d2.decode())


def test_fastaudio_state_carry():
    """Filter history carries across packets: decoding packet 2 fresh gives a
    different result than decoding it after packet 1."""
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 80).astype(np.uint8).tobytes()
    d = FastAudioDecoder()
    d.data = data
    d.decode()
    second_with_state = d.decode()
    d2 = FastAudioDecoder()
    d2.data = data
    d2.offset = 40
    second_fresh = d2.decode()
    assert not (second_with_state == second_fresh).all()


def test_sx_keyframe_and_predicted():
    rng = np.random.default_rng(3)
    cb = rng.integers(0, 256, 0xC34).astype(np.uint8).tobytes()
    buf = bytearray(rng.integers(0, 256, 4096).astype(np.uint8).tobytes())
    buf[0], buf[1] = 0x00, 0xFE  # first u16 >> 9 == 0x7F: key-init frame
    d1, d2 = SxDecoder(), SxDecoder()
    d1.codebook = d2.codebook = cb
    d1.data = d2.data = bytes(buf)
    for _ in range(4):
        a = d1.decode()
        assert a.shape == (128,) and a.dtype == np.int16
        np.testing.assert_array_equal(a, d2.decode())
    assert d1.offset == d2.offset > 0


def test_mods_fastaudio_container_path():
    """MODS audio codec 2 (FastAudio) flows through the transcoder
    (Program.cs:289-300 policy)."""
    rng = np.random.default_rng(4)
    W, H, ch = 64, 48, 2
    synth = StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=4)
    mux = ModsMuxer(W, H, fps=20.0, audio_codec=2, nb_channel=ch,
                    frequency=16384)
    for i in range(3):
        video = synth.iframe(0x18, pad=False) if i == 0 \
            else synth.pframe(pad=False)
        pkts = [rng.integers(0, 256, 40).astype(np.uint8).tobytes()
                for _ in range(ch)]
        mux.add_frame(video, pkts, keyframe=(i == 0))
    frames = list(decode_mods(mux.to_bytes(), engine="oracle"))
    assert len(frames) == 3
    total = sum(len(f.pcm) for f in frames if f.pcm is not None)
    assert total == 3 * 256 * ch  # 256 samples per packet, interleaved


def test_mods_sx_container_path():
    """MODS audio codec 1 (Sx) with per-channel codebooks from the header
    region (ModsDemuxer.cs:20-29, Program.cs:277-287)."""
    rng = np.random.default_rng(5)
    W, H, ch = 64, 48, 1
    synth = StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=5)
    mux = ModsMuxer(W, H, fps=20.0, audio_codec=1, nb_channel=ch,
                    frequency=16384)
    mux.codebooks = [rng.integers(0, 256, 0xC34).astype(np.uint8).tobytes()]
    for i in range(3):
        video = synth.iframe(0x18, pad=False) if i == 0 \
            else synth.pframe(pad=False)
        pkt = bytearray(rng.integers(0, 256, 64).astype(np.uint8).tobytes())
        if i == 0:
            pkt[0], pkt[1] = 0x00, 0xFE  # key-init Sx frame
        mux.add_frame(video, [bytes(pkt)], keyframe=(i == 0))
    frames = list(decode_mods(mux.to_bytes(), engine="oracle"))
    assert len(frames) == 3
    total = sum(len(f.pcm) for f in frames if f.pcm is not None)
    assert total == 3 * 128 * ch
