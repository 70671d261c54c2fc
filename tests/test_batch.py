"""Batched multi-stream decode: per-stream bit-exactness + mesh sharding."""
import numpy as np
import pytest

from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                     OracleDecoder)
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

jax = pytest.importorskip("jax")
from jax.sharding import Mesh, PartitionSpec  # noqa: E402

from mobiclipdecoder_tpu.parallel.batch import BatchVideoDecoder  # noqa: E402


def _oracle_gop(version, seed, W, H, nframes):
    synth = StreamSynthesizer(W, H, version, seed=seed)
    dec = OracleDecoder(W, H, version)
    pkts, planes = [], []
    for i in range(nframes):
        pkt = synth.iframe(0x18) if i == 0 else synth.pframe()
        dec.data = pkt
        dec.offset = 0
        dec.decode_frame()
        pkts.append(pkt)
        planes.append((dec.y_planes[0].copy(), dec.uv_planes[0].copy()))
    return pkts, planes


@pytest.mark.parametrize("use_gop_scan", [False, True])
def test_batch_matches_oracle(use_gop_scan):
    W, H, B, F = 64, 48, 4, 3
    version = MobiclipVersion.MODS_DS
    data = [_oracle_gop(version, 100 + b, W, H, F) for b in range(B)]
    bd = BatchVideoDecoder(W, H, version, batch=B)
    S = bd.stride
    if use_gop_scan:
        frames = [[data[b][0][f] for b in range(B)] for f in range(F)]
        out = bd.decode_gop(frames)  # (F, B, HH, S)
        for f in range(F):
            for b in range(B):
                y_o, uv_o = data[b][1][f]
                got = out[f, b]
                np.testing.assert_array_equal(got[:H].ravel(), y_o)
                np.testing.assert_array_equal(got[H:].ravel(), uv_o)
    else:
        for f in range(F):
            out = bd.decode_frames([data[b][0][f] for b in range(B)])
            for b in range(B):
                y_o, uv_o = data[b][1][f]
                np.testing.assert_array_equal(out[b, :H].ravel(), y_o)
                np.testing.assert_array_equal(out[b, H:].ravel(), uv_o)


def test_batch_sharded_over_mesh():
    """Same decode under a (data, tile) mesh on the 8 virtual CPU devices."""
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "tile"))
    W, H, B, F = 64, 48, 4, 2
    version = MobiclipVersion.MODS_DS
    data = [_oracle_gop(version, 200 + b, W, H, F) for b in range(B)]
    bd = BatchVideoDecoder(W, H, version, batch=B, mesh=mesh)
    for f in range(F):
        out = bd.decode_frames([data[b][0][f] for b in range(B)])
        for b in range(B):
            y_o, uv_o = data[b][1][f]
            np.testing.assert_array_equal(out[b, :H].ravel(), y_o)
            np.testing.assert_array_equal(out[b, H:].ravel(), uv_o)
