"""Benchmark: frames/s/chip on 256x192 MODS decode (BASELINE.json metric).

Measures the VMEM sequential-executor engine (ops/vmem_engine.py): B
independent synthesized 256x192 MODS streams decoded in lockstep, one Pallas
kernel per frame round with the 6-slot reference ring resident in VMEM, the
native C++ scanner producing unified op streams, single-blob argument upload
and GOP-batched result download (each host<->device round trip costs ~1-100ms
through this chip's tunnel).

value       = device decode throughput (dispatch+upload+execute, results
              left on device — the serving-path number where consumers are
              device-side or downloads are batched).
e2e_fps     = scan + decode + one full-GOP YUV download to host numpy.

Baseline: the reference is a single-threaded C# decoder whose only published
performance statement is realtime DS playback (~24 fps, BASELINE.md).

Prints ONE JSON line.
"""
import json
import sys
import time


def main() -> int:
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (VmemBatchDecoder,
                                                     _decode_round_blob,
                                                     _decode_round_sblob,
                                                     _pack_blob,
                                                     _pack_blob_sparse)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, B, F = 256, 192, 8, 24   # one GOP: I-frame + 23 P-frames
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]

    bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)

    # host scan + pack (the C++ scanner path, sparse coef upload format)
    t0 = time.perf_counter()
    per = [bd.scan_packets(fp) for fp in frames]
    blobs = []
    for o, c, s in per:
        sp = _pack_blob_sparse(o, c, s)
        if sp is not None:
            blobs.append((sp[0], o.shape[1], c.shape[1], sp[1]))
        else:
            blobs.append((_pack_blob(o, c, s), o.shape[1], c.shape[1], None))
    t_scan = time.perf_counter() - t0

    def round_(ring, blob, nch, nr, nnzb):
        if nnzb is not None:
            return _decode_round_sblob(ring, blob, nch, nr, nnzb, H,
                                       bd.stride, bd.interpret)
        return _decode_round_blob(ring, blob, nch, nr, H, bd.stride,
                                  bd.interpret)

    # warm-up: compile every shape bucket
    t0 = time.perf_counter()
    ring = bd.ring
    for blob, nch, nr, nnzb in blobs:
        ring, yuv = round_(ring, blob, nch, nr, nnzb)
    jax.block_until_ready(yuv)
    t_compile = time.perf_counter() - t0

    # device decode throughput (results stay on device)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        for blob, nch, nr, nnzb in blobs:
            ring, yuv = round_(ring, blob, nch, nr, nnzb)
        jax.block_until_ready(yuv)
    dt = (time.perf_counter() - t0) / reps
    fps = B * F / dt

    # honest end-to-end: scan + decode + one GOP download (fused
    # single-launch path: one upload, one dispatch, one fetch per GOP)
    bd2 = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    bd2.decode_gop(frames, fused=True)           # warm/compile
    t0 = time.perf_counter()
    out = bd2.decode_gop(frames, fused=True)
    e2e = B * F / (time.perf_counter() - t0)
    assert out.shape == (F, B, H + H // 2, bd.stride)

    # sustained end-to-end: stream GOPs with download/compute overlap
    n_gops = 4
    t0 = time.perf_counter()
    got = 0
    for arr in bd2.decode_gops(frames for _ in range(n_gops)):
        got += arr.shape[0] * arr.shape[1]
    e2e_sustained = got / (time.perf_counter() - t0)

    baseline_fps = 24.0  # realtime DS playback, single-threaded C# reference
    print(json.dumps({
        "metric": "mods_256x192_device_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch_streams": B,
        "gop_frames": F,
        "host_scan_fps": round(B * F / t_scan, 2),
        "e2e_fps": round(e2e, 2),
        "e2e_sustained_fps": round(e2e_sustained, 2),
        "compile_s": round(t_compile, 1),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
