"""Device-batched FastAudio synthesis vs the per-channel oracle decoder."""
import numpy as np
import pytest

pytest.importorskip("jax")

from mobiclipdecoder_tpu.models.audio_fastaudio import FastAudioDecoder  # noqa
from mobiclipdecoder_tpu.ops.audio_lpc import (FastAudioBatchDecoder,  # noqa
                                               _mulshift15)


def test_mulshift15_identity_exhaustive_edges():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    a = rng.integers(-32767, 32768, 512).astype(np.int32)
    b = np.concatenate([
        rng.integers(-2**31, 2**31, 512),
        np.array([-2**31, 2**31 - 1, -1, 0, 1, 0x7FFF, -0x8000]),
    ]).astype(np.int32)
    a = np.resize(a, b.shape)
    got = np.asarray(_mulshift15(jnp.asarray(a), jnp.asarray(b)))
    exp = np.array([(int(x) * int(y) + 0x4000) >> 15 for x, y in zip(a, b)],
                   dtype=np.int64)
    # compare with int32 wrap of the exact value (result always fits int32
    # for FastAudio's |a| < 2**15, but be explicit)
    np.testing.assert_array_equal(got.astype(np.int64),
                                  ((exp + 2**31) % 2**32) - 2**31)


def test_fastaudio_batch_matches_oracle():
    rng = np.random.default_rng(7)
    nch, npkt = 5, 6
    oracles = [FastAudioDecoder() for _ in range(nch)]
    batch = FastAudioBatchDecoder(nch)
    for _ in range(npkt):
        pkts = [rng.integers(0, 256, 40, dtype=np.uint8).tobytes()
                for _ in range(nch)]
        got = batch.decode(pkts)
        for ch in range(nch):
            o = oracles[ch]
            o.data = pkts[ch]
            o.offset = 0
            exp = o.decode()
            np.testing.assert_array_equal(got[ch], exp, err_msg=f"ch {ch}")


def test_fastaudio_batch_state_carries_like_oracle():
    """Filter history and de-emphasis state must persist across packets."""
    rng = np.random.default_rng(3)
    oracle = FastAudioDecoder()
    batch = FastAudioBatchDecoder(1)
    outs_o, outs_b = [], []
    for _ in range(4):
        pkt = rng.integers(0, 256, 40, dtype=np.uint8).tobytes()
        oracle.data = pkt
        oracle.offset = 0
        outs_o.append(oracle.decode())
        outs_b.append(batch.decode([pkt])[0])
    np.testing.assert_array_equal(np.concatenate(outs_b),
                                  np.concatenate(outs_o))
