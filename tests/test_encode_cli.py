"""Full circle: y4m -> encode -> .moflex -> decode -> y4m, through the CLI
layer functions (config "encode mode" the reference left as an empty stub,
MobiConverter/Program.cs:446-450)."""
import numpy as np

from mobiclipdecoder_tpu.runtime.transcode import (decode_moflex,
                                                   encode_y4m_to_moflex,
                                                   read_y4m)
from mobiclipdecoder_tpu.utils.rawio import Y4MWriter


def test_encode_decode_circle(tmp_path):
    W, H, N = 64, 48, 5
    yy, xx = np.mgrid[0:H, 0:W]
    src = tmp_path / "in.y4m"
    w = Y4MWriter(src, W, H, 24.0)
    originals = []
    for t in range(N):
        y = (128 + 80 * np.sin(xx / 11 + t / 2)).clip(0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100 + 5 * t, np.uint8)
        v = np.full((H // 2, W // 2), 140 - 5 * t, np.uint8)
        w.add_frame(y, u, v)
        originals.append((y, u, v))
    w.close()
    stats = encode_y4m_to_moflex(src, tmp_path / "out.moflex", qp=0x10, gop=4)
    assert stats["frames"] == N
    blob = (tmp_path / "out.moflex").read_bytes()
    frames = list(decode_moflex(blob, engine="oracle"))
    assert len(frames) == N
    # quality: decoded luma approximates the source
    got = frames[-1].y.astype(np.float64)
    want = originals[-1][0].astype(np.float64)
    mse = ((got - want) ** 2).mean()
    assert 10 * np.log10(255 * 255 / max(mse, 1e-9)) > 24
