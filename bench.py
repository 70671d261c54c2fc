"""Benchmark: frames/s/chip on 256x192 MODS decode (BASELINE.json metric).

Runs on whatever chip JAX sees by default (the driver runs this on real TPU).
Measures the device reconstruction engine on a GOP-batched workload: B
independent synthesized 256x192 MODS streams decoded in lockstep, the whole
GOP as one device program (lax.scan over frames).

Baseline: the reference is a single-threaded C# decoder whose only published
performance statement is realtime DS playback (~24 fps, BASELINE.md); the
reported vs_baseline is device frames/s per chip divided by that 24 fps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""
import json
import sys
import time


def main() -> int:
    import numpy as np  # noqa: F401
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.parallel.batch import BatchVideoDecoder
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, B, F = 256, 192, 8, 6
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    # frames[f][b]
    frames = []
    for f in range(F):
        frames.append([s.iframe(0x18) if f == 0 else s.pframe()
                       for s in synths])

    t_scan0 = time.perf_counter()
    bd = BatchVideoDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    # warm-up: compile the GOP program (scan happens host-side inside)
    out = bd.decode_gop(frames)
    t_compile = time.perf_counter() - t_scan0

    # measured pass: fresh decoder state, pre-scanned plans, time device only
    bd2 = BatchVideoDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    per_frame = [bd2.scan_packets(fp) for fp in frames]
    import numpy as np
    from mobiclipdecoder_tpu.parallel.batch import _pad_to, decode_gop_jit
    stacked = {}
    for k in per_frame[0]:
        arrs = [pf[k] for pf in per_frame]
        tgt = tuple(max(a.shape[d] for a in arrs)
                    for d in range(arrs[0].ndim))
        stacked[k] = np.stack([_pad_to(a, tgt) for a in arrs])
    args = (bd2.ring, stacked["mc"], stacked["resid"], stacked["resid_coef"],
            stacked["iops"], stacked["icoef"], stacked["seqmap"])
    # compile for these exact shapes, then time steady-state
    ring, bufs = decode_gop_jit(*args, H=H, S=bd2.stride)
    jax.block_until_ready(bufs)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        ring, bufs = decode_gop_jit(*args, H=H, S=bd2.stride)
    jax.block_until_ready(bufs)
    dt = (time.perf_counter() - t0) / reps
    fps = B * F / dt

    baseline_fps = 24.0  # realtime DS playback, single-threaded C# reference
    print(json.dumps({
        "metric": "mods_256x192_device_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch_streams": B,
        "gop_frames": F,
        "compile_s": round(t_compile, 1),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
