"""Metrics, stereo splitting, anaglyph, Moflex PCM16."""
import numpy as np

from mobiclipdecoder_tpu.containers.moflex import (AudioStream, MoflexMuxer,
                                                   VideoLayout, VideoStream,
                                                   VideoStreamWithLayout)
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.runtime.metrics import DecodeMetrics, StageTimer
from mobiclipdecoder_tpu.runtime.transcode import (anaglyph, decode_moflex,
                                                   split_stereo)
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def test_metrics_report():
    m = DecodeMetrics()
    m.frames = 10
    with StageTimer(m, "scan_seconds"):
        pass
    m.wall_seconds = 2.0
    r = m.report()
    assert r["fps"] == 5.0 and "mc_blocks_per_frame" in r


def test_split_stereo():
    frames = list(range(6))
    l, r = split_stereo(frames, VideoLayout.INTERLEAVE_3D_LEFT_FIRST)
    assert l == [0, 2, 4] and r == [1, 3, 5]
    l, r = split_stereo(frames, VideoLayout.INTERLEAVE_3D_RIGHT_FIRST)
    assert l == [1, 3, 5] and r == [0, 2, 4]
    l, r = split_stereo(frames, VideoLayout.SIMPLE_2D)
    assert l == frames and r == []


def test_anaglyph():
    left = np.zeros((4, 4, 3), np.uint8)
    right = np.full((4, 4, 3), 200, np.uint8)
    left[..., 0] = 50
    out = anaglyph(left, right)
    assert (out[..., 0] == 50).all() and (out[..., 1] == 200).all()


def test_moflex_pcm16():
    W, H = 64, 48
    synth = StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=41)
    chunks = [VideoStream(stream_index=0, width=W, height=H),
              AudioStream(stream_index=1, codec_id=2, frequency=22050,
                          channels=2)]
    mux = MoflexMuxer(chunks)
    pcm = np.arange(512, dtype="<i2").tobytes()
    for i in range(3):
        mux.add_frame(0, synth.iframe(0x12, pad=False) if i == 0
                      else synth.pframe(pad=False))
        mux.add_frame(1, pcm)
    frames = list(decode_moflex(mux.to_bytes(), engine="oracle"))
    assert len(frames) == 3
    total = sum(len(f.pcm) for f in frames if f.pcm is not None)
    # payload gets 2 zero pad bytes -> 257 samples per audio frame, truncated
    # to a multiple of channels
    assert total >= 3 * 256
