"""Benchmark: frames/s/chip on 256x192 MODS decode (BASELINE.json metric).

Runs on whatever chip JAX sees by default (the driver runs this on real TPU).
Measures the batched reconstruction engine on a GOP-batched workload: B
independent synthesized 256x192 MODS streams decoded in lockstep, one jitted
program per frame round (P-frame rounds all hit the same shape bucket, so
with the persistent compilation cache only a handful of programs ever
compile — first run on a fresh cache pays that once).

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
    from mobiclipdecoder_tpu.parallel.batch import BatchVideoDecoder
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, B, F = 256, 192, 8, 6
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = []
    for f in range(F):
        frames.append([s.iframe(0x18) if f == 0 else s.pframe()
                       for s in synths])

    # warm-up pass: host scan + compile every shape bucket this GOP hits
    t0 = time.perf_counter()
    bd = BatchVideoDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    arrays_per_frame = []
    for fp in frames:
        arrays_per_frame.append(bd.scan_packets(fp))
    t_scan = time.perf_counter() - t0
    t0 = time.perf_counter()
    from mobiclipdecoder_tpu.parallel.batch import _decode_batch
    import jax.numpy as jnp
    ring = bd.ring
    for arr in arrays_per_frame:
        ring = jnp.roll(ring, 1, axis=1)
        buf = _decode_batch(ring, arr["mc"], arr["resid"], arr["resid_coef"],
                            arr["iops"], arr["icoef"], arr["seqmap"],
                            arr["n_levels"], H, bd.stride)
        ring = ring.at[:, 0].set(buf)
    jax.block_until_ready(buf)
    t_compile = time.perf_counter() - t0

    # measured pass: same plans, steady-state device time
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        ring = bd.ring
        for arr in arrays_per_frame:
            ring = jnp.roll(ring, 1, axis=1)
            buf = _decode_batch(ring, arr["mc"], arr["resid"],
                                arr["resid_coef"], arr["iops"], arr["icoef"],
                                arr["seqmap"], arr["n_levels"], H, bd.stride)
            ring = ring.at[:, 0].set(buf)
        jax.block_until_ready(buf)
    dt = (time.perf_counter() - t0) / reps
    fps = B * F / dt
    scan_fps = B * F / t_scan

    baseline_fps = 24.0  # realtime DS playback, single-threaded C# reference
    print(json.dumps({
        "metric": "mods_256x192_device_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch_streams": B,
        "gop_frames": F,
        "host_scan_fps": round(scan_fps, 2),
        "compile_s": round(t_compile, 1),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
