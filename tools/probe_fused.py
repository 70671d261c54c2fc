"""Probe: device decode throughput of the fused whole-GOP kernel vs the
per-round dispatch loop, and the per-round path's scaling with stream batch
size B (real chip).

The headline bench (bench.py) measures the per-round loop; if one fused
launch per GOP beats 24 per-frame launches with results left on device,
the fused number becomes the headline lever.  Run on the tunneled chip:

    python tools/probe_fused.py [fused|sweep]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_frames(B, F, W=256, H=192):
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    return [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
            for f in range(F)]


def probe_fused(B=8, F=24, W=256, H=192):
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (
        CHUNK, VmemBatchDecoder, _decode_gop_fused, _decode_gop_fused_sblob,
        _pack_gop_blob_sparse, _pack_gop_chunks)

    frames = make_frames(B, F, W, H)
    bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    plans_fb = [bd._scan_all(fp) for fp in frames]
    ops, coefs, sizes = _pack_gop_chunks(plans_fb, B)
    nct = ops.shape[1]
    sp = _pack_gop_blob_sparse(ops, coefs, sizes.reshape(B, nct * CHUNK))
    assert sp is not None
    blob, nnzb = sp

    ring = bd.ring
    t0 = time.perf_counter()
    ring, yuv = _decode_gop_fused_sblob(ring, blob, F, nct, nnzb,
                                        H, bd.stride, bd.interpret)
    jax.block_until_ready(yuv)
    print(f"fused warm/compile {time.perf_counter() - t0:.1f}s "
          f"nct={nct} nnzb={nnzb}", flush=True)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        ring, yuv = _decode_gop_fused_sblob(ring, blob, F, nct, nnzb,
                                            H, bd.stride, bd.interpret)
    jax.block_until_ready(yuv)
    dt = (time.perf_counter() - t0) / reps
    print(f"fused B={B} F={F}: device {B * F / dt:8.1f} fps/chip  "
          f"({dt * 1e3:.2f} ms/GOP, upload {blob.nbytes / 1024:.0f} KiB)",
          flush=True)


def probe_sweep(F=12):
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (
        VmemBatchDecoder, _decode_round_blob, _decode_round_sblob,
        _pack_blob, _pack_blob_sparse)

    W, H = 256, 192
    for B in (8, 16, 32):
        frames = make_frames(B, F, W, H)
        bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
        per = [bd.scan_packets(fp) for fp in frames]
        blobs = []
        for o, c, s in per:
            sp = _pack_blob_sparse(o, c, s)
            if sp is not None:
                blobs.append((sp[0], o.shape[1], c.shape[1], sp[1]))
            else:
                blobs.append((_pack_blob(o, c, s), o.shape[1], c.shape[1],
                              None))

        def round_(ring, blob, nch, nr, nnzb):
            if nnzb is not None:
                return _decode_round_sblob(ring, blob, nch, nr, nnzb, H,
                                           bd.stride, bd.interpret)
            return _decode_round_blob(ring, blob, nch, nr, H, bd.stride,
                                      bd.interpret)

        ring = bd.ring
        t0 = time.perf_counter()
        for blob, nch, nr, nnzb in blobs:
            ring, yuv = round_(ring, blob, nch, nr, nnzb)
        jax.block_until_ready(yuv)
        t_compile = time.perf_counter() - t0

        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            for blob, nch, nr, nnzb in blobs:
                ring, yuv = round_(ring, blob, nch, nr, nnzb)
            jax.block_until_ready(yuv)
        dt = (time.perf_counter() - t0) / reps
        print(f"per-round B={B:3d} F={F}: device {B * F / dt:8.1f} fps/chip"
              f"   ({dt * 1e3 / F:6.2f} ms/round, warm {t_compile:.1f}s)",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    if mode == "fused":
        probe_fused()
    elif mode == "sweep":
        probe_sweep()
