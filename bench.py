"""Benchmark: frames/s/chip on 256x192 MODS decode (BASELINE.json metric).

Measures the VMEM sequential-executor engine (ops/vmem_engine.py): B
independent synthesized 256x192 MODS streams decoded in lockstep through one
Pallas kernel per frame round, with the 6-slot reference ring resident in
VMEM and the native C++ scanner producing the unified op streams on host.

Baseline: the reference is a single-threaded C# decoder whose only published
performance statement is realtime DS playback (~24 fps, BASELINE.md); the
reported vs_baseline is device frames/s per chip divided by that 24 fps.

Prints ONE JSON line.
"""
import json
import sys
import time


def main() -> int:
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (VmemBatchDecoder,
                                                     _decode_round)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, B, F = 256, 192, 8, 24   # one GOP: I-frame + 23 P-frames
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]

    bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    t0 = time.perf_counter()
    packed = [bd.scan_packets(fp) for fp in frames]
    t_scan = time.perf_counter() - t0

    # warm-up: compile every (ops, resid) shape bucket this GOP hits
    t0 = time.perf_counter()
    ring = bd.ring
    for ops, coefs, sizes in packed:
        ring, yuv = _decode_round(ring, ops, coefs, sizes, H, bd.stride,
                                  bd.interpret)
    jax.block_until_ready(yuv)
    t_compile = time.perf_counter() - t0

    # measured pass: same plans, steady-state device time
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        for ops, coefs, sizes in packed:
            ring, yuv = _decode_round(ring, ops, coefs, sizes, H, bd.stride,
                                      bd.interpret)
        jax.block_until_ready(yuv)
    dt = (time.perf_counter() - t0) / reps
    fps = B * F / dt
    scan_fps = B * F / t_scan
    # end-to-end = host scan pipelined with device decode (two stages)
    e2e = B * F / max(dt, t_scan)

    baseline_fps = 24.0  # realtime DS playback, single-threaded C# reference
    print(json.dumps({
        "metric": "mods_256x192_device_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch_streams": B,
        "gop_frames": F,
        "host_scan_fps": round(scan_fps, 2),
        "pipelined_e2e_fps": round(e2e, 2),
        "compile_s": round(t_compile, 1),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
