"""Probe: Wii-size (MOC5, 640x480) decode on the real chip.

The reference's only negative performance statement is that Wii MOC5
decode is "not full speed" (below realtime) on a contemporary PC
(/root/reference/README.md:8).  This measures our fused whole-GOP engine
at that geometry — since round 3 in its byte-packed VMEM-ring mode
(_ring_mode 2: the 20.8 MiB int32 ring packs to 5.2 MiB and stages
on-chip, replacing the per-op HBM window DMAs of the round-2 HBM mode) —
and verifies on-chip bit-exactness vs the oracle.

    python tools/probe_wii.py [B] [F]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(B=2, F=8):
    import numpy as np
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                         OracleDecoder)
    from mobiclipdecoder_tpu.ops.vmem_engine import (VmemBatchDecoder,
                                                     _ring_mode)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H = 640, 480
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]

    bd = VmemBatchDecoder(W, H, MobiclipVersion.MOFLEX_3DS, batch=B)
    mode = {0: "HBM ring", 1: "VMEM ring", 2: "packed VMEM ring"}[
        _ring_mode(H, bd.stride)]

    t0 = time.perf_counter()
    _t1, yuv = bd._dispatch_gop_fused(frames)
    out = np.asarray(yuv)
    print(f"warm/compile {time.perf_counter() - t0:.1f}s", flush=True)

    # on-chip bit-exactness vs the oracle (frames 0..2, stream 0)
    oracle = OracleDecoder(W, H, MobiclipVersion.MOFLEX_3DS)
    S = oracle.stride
    for f in range(min(3, F)):
        oracle.data = frames[f][0]
        oracle.offset = 0
        oracle.decode_frame()
        np.testing.assert_array_equal(
            out[f, 0, :H], oracle.y_planes[0].reshape(-1, S)[:H],
            err_msg=f"frame {f} Y")
        np.testing.assert_array_equal(
            out[f, 0, H:], oracle.uv_planes[0].reshape(-1, S)[:H // 2],
            err_msg=f"frame {f} UV")
    print("on-chip bit-exact vs oracle (3 frames)", flush=True)

    t0 = time.perf_counter()
    for nv in bd.natives:
        nv.checkpoint()
    res = list(bd._pool.map(
        lambda b: bd.natives[b].scan_gop_packed(
            [frames[f][b] for f in range(F)]), range(B)))
    for nv in bd.natives:
        nv.rollback()
    t_scan = time.perf_counter() - t0
    assert all(r["done"] == F for r in res)
    print(f"native GOP scan {B * F / t_scan:.0f} fps", flush=True)

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            _t1, yuv = bd._dispatch_gop_fused(frames)
        jax.block_until_ready(yuv)
        best = max(best, B * F * 3 / (time.perf_counter() - t0))
    print(f"wii 640x480 fused ({mode}) B={B} F={F}: "
          f"device {best:8.1f} fps/chip", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
