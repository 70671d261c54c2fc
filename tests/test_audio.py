"""IMA ADPCM: oracle round-trips and scan-kernel bit-exactness."""
import numpy as np
import pytest

from mobiclipdecoder_tpu.models.audio_ima import ImaAdpcmDecoder, encode_ima

pytest.importorskip("jax")
from mobiclipdecoder_tpu.ops.adpcm import decode_packets  # noqa: E402


def _random_packet(rng, nsamples=256):
    t = np.arange(nsamples)
    wave = (3000 * np.sin(t / 7) + rng.integers(-500, 500, nsamples)) \
        .astype(np.int16)
    return encode_ima(wave, index0=int(rng.integers(0, 40)))


def test_oracle_decode_shapes():
    rng = np.random.default_rng(0)
    pkt = _random_packet(rng)
    dec = ImaAdpcmDecoder()
    out = dec.decode(pkt, 0, len(pkt))
    assert out.dtype == np.int16
    assert len(out) == (len(pkt) - 4) * 2


def test_scan_kernel_matches_oracle():
    rng = np.random.default_rng(1)
    for _ in range(5):
        pkt = _random_packet(rng, nsamples=500)
        dec = ImaAdpcmDecoder()
        want = dec.decode(pkt, 0, len(pkt))
        index0 = int.from_bytes(pkt[0:2], "little", signed=True) & 0x7F
        last0 = int.from_bytes(pkt[2:4], "little", signed=True)
        body = np.frombuffer(pkt[4:], np.uint8)
        got = decode_packets(body, np.int32(index0), np.int32(last0))
        np.testing.assert_array_equal(got, want)


def test_scan_kernel_batched():
    rng = np.random.default_rng(2)
    pkts = [_random_packet(rng, nsamples=128)[4:] for _ in range(8)]
    L = min(len(p) for p in pkts)
    batch = np.stack([np.frombuffer(p[:L], np.uint8) for p in pkts])
    idx0 = rng.integers(0, 60, 8).astype(np.int32)
    last0 = rng.integers(-1000, 1000, 8).astype(np.int32)
    got = decode_packets(batch, idx0, last0)
    for i in range(8):
        dec = ImaAdpcmDecoder()
        dec.is_init = True
        dec.index, dec.last = int(idx0[i]), int(last0[i])
        want = dec.decode(batch[i].tobytes(), 0, L)
        np.testing.assert_array_equal(got[i], want)


def test_stateful_continuation():
    """Packet-to-packet state carry matches one continuous decode."""
    rng = np.random.default_rng(3)
    pkt = _random_packet(rng, nsamples=400)
    whole = ImaAdpcmDecoder().decode(pkt, 0, len(pkt))
    dec = ImaAdpcmDecoder()
    a = dec.decode(pkt, 0, 100)
    b = dec.decode(pkt, 100, len(pkt) - 100)
    np.testing.assert_array_equal(np.concatenate([a, b]), whole)
