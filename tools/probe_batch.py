"""Probe: device decode throughput vs stream batch size B (real chip).

Separates per-round fixed dispatch overhead from kernel time by sweeping B.
If fps/chip rises with B, rounds are dispatch-bound at small B.
"""
import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.ops.vmem_engine import (VmemBatchDecoder,
                                                 _decode_round_blob,
                                                 _pack_blob)
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def run(B: int, F: int = 12) -> None:
    W, H = 256, 192
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]
    bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)

    t0 = time.perf_counter()
    per = [bd.scan_packets(fp) for fp in frames]
    t_scan = time.perf_counter() - t0
    blobs = [(_pack_blob(o, c, s), o.shape[1], c.shape[1]) for o, c, s in per]

    # warm-up / compile
    ring = bd.ring
    for blob, nch, nr in blobs:
        ring, yuv = _decode_round_blob(ring, blob, nch, nr, H, bd.stride,
                                       bd.interpret)
    jax.block_until_ready(yuv)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        for blob, nch, nr in blobs:
            ring, yuv = _decode_round_blob(ring, blob, nch, nr, H,
                                           bd.stride, bd.interpret)
        jax.block_until_ready(yuv)
    dt = (time.perf_counter() - t0) / reps
    fps = B * F / dt
    print(f"B={B:3d} F={F}  device {fps:8.1f} fps/chip   "
          f"{dt*1e3/F:7.2f} ms/round   scan {B*F/t_scan:7.1f} fps",
          flush=True)


if __name__ == "__main__":
    for B in (8, 16, 32, 64):
        run(B)
