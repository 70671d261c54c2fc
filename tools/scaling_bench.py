"""Scaling-efficiency harness (BASELINE.md: >=0.8 from 1 chip to N).

Measures decode throughput of the shard_map'd VMEM frame round at mesh
sizes 1..N and reports efficiency = fps(N) / (N * fps(1)).  GOP streams are
independent, so the design is embarrassingly parallel; this harness verifies
the runtime actually delivers that (shard balance, no accidental
collectives, per-device dispatch overheads).

On CI this runs over virtual CPU devices (interpret-mode kernel — real
parallel compute across host cores): efficiency is only meaningful up to
the PHYSICAL core count (reported as host_cores; virtual devices beyond it
share cores by construction).  Pin one thread per device with
  XLA_FLAGS="--xla_force_host_platform_device_count=8 \
             --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
Measured here: 0.93 efficiency at 2 devices on a 2-core host.  On a pod
slice, run as-is per host — each chip is independent hardware and the
program contains no collectives, so the chip-count axis has no shared
resource at all.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/scaling_bench.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# This image's sitecustomize imports jax at startup on the axon TPU, so env
# vars alone are too late (same dance as tests/conftest.py): honor a
# requested CPU mesh by reconfiguring jax before any backend initializes.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main() -> int:
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (VmemBatchDecoder,
                                                     decode_round_sharded)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    interpret = jax.default_backend() != "tpu"
    devs = jax.devices()
    W, H, F = 128, 96, 6
    v = MobiclipVersion.MODS_DS
    streams_per_dev = 2

    results = {}
    n = 1
    while n <= len(devs):
        B = streams_per_dev * n
        mesh = Mesh(np.array(devs[:n]), ("data",))
        synths = [StreamSynthesizer(W, H, v, seed=b) for b in range(B)]
        bd = VmemBatchDecoder(W, H, v, batch=B, interpret=interpret)
        rounds = []
        for f in range(F):
            pkts = [s.iframe(0x18) if f == 0 else s.pframe()
                    for s in synths]
            rounds.append(bd.scan_packets(pkts))
        ring = bd.ring
        for ops, coefs, sizes in rounds:   # warm/compile
            ring, yuv = decode_round_sharded(mesh, ring, ops, coefs, sizes,
                                             H, bd.stride, interpret)
        jax.block_until_ready(yuv)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            for ops, coefs, sizes in rounds:
                ring, yuv = decode_round_sharded(mesh, ring, ops, coefs,
                                                 sizes, H, bd.stride,
                                                 interpret)
            jax.block_until_ready(yuv)
        dt = (time.perf_counter() - t0) / reps
        results[n] = B * F / dt
        n *= 2

    # full-pipeline phase: host scan+pack INCLUDED in the timed loop (the
    # contention axis the device-only number hides).  Dispatches are async,
    # so frame f+1's host scan overlaps frame f's device round — the same
    # overlap shape as the production decode path.
    e2e = {}
    n = 1
    while n <= len(devs):
        B = streams_per_dev * n
        mesh = Mesh(np.array(devs[:n]), ("data",))
        synths = [StreamSynthesizer(W, H, v, seed=b) for b in range(B)]
        gop = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
               for f in range(F)]
        bd = VmemBatchDecoder(W, H, v, batch=B, interpret=interpret)
        ring = bd.ring
        for pkts in gop:   # warm/compile
            ops, coefs, sizes = bd.scan_packets(pkts)
            ring, yuv = decode_round_sharded(mesh, ring, ops, coefs, sizes,
                                             H, bd.stride, interpret)
        jax.block_until_ready(yuv)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            for pkts in gop:
                ops, coefs, sizes = bd.scan_packets(pkts)
                ring, yuv = decode_round_sharded(mesh, ring, ops, coefs,
                                                 sizes, H, bd.stride,
                                                 interpret)
            jax.block_until_ready(yuv)
        dt = (time.perf_counter() - t0) / reps
        e2e[n] = B * F / dt
        n *= 2

    base = results[1]
    base_e = e2e[1]
    report = {
        "metric": "vmem_round_scaling",
        "geometry": f"{W}x{H}",
        "fps": {str(k): round(vv, 1) for k, vv in results.items()},
        "efficiency": {str(k): round(vv / (k * base), 3)
                       for k, vv in results.items()},
        "e2e_fps": {str(k): round(vv, 1) for k, vv in e2e.items()},
        "e2e_efficiency": {str(k): round(vv / (k * base_e), 3)
                           for k, vv in e2e.items()},
        "devices": len(devs),
        "host_cores": __import__("os").cpu_count(),
        "backend": jax.default_backend(),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
