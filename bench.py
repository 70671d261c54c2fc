"""Benchmark: frames/s/chip on 256x192 MODS decode (BASELINE.json metric).

Measures the VMEM sequential-executor engine (ops/vmem_engine.py): B
independent synthesized 256x192 MODS streams decoded in lockstep, one Pallas
kernel per frame round with the 6-slot reference ring resident in VMEM, the
native C++ scanner producing unified op streams, single-blob argument upload
and GOP-batched result download (each host<->device round trip costs ~1-100ms
through this chip's tunnel).

value       = device decode throughput (dispatch+upload+execute, results
              left on device — the serving-path number where consumers are
              device-side or downloads are batched): best of the per-frame
              dispatch loop (per_round_fps) and the fused single-launch
              whole-GOP path (fused_gop_fps).
device_compute_fps = fused kernel with arguments device-resident — what a
              directly-attached chip sees once transfers are amortized.
e2e_fps     = scan + decode + one full-GOP YUV download to host numpy.

TIMING METHODOLOGY (fixed in round 3): jax.block_until_ready does NOT
synchronize execution through this chip's axon tunnel, which silently
inflated the round-1/2 device numbers ~40x (BENCH_r01/r02 report 21-48k
fps where the true chained-dispatch rate is ~1.2k).  Every window now
chains dispatches through the donated ring and ends with a scalar
reduction fetch — a true barrier whose fixed cost is amortized across
reps.  e2e numbers always fetched real data and were never affected.

Baseline: the reference is a single-threaded C# decoder whose only published
performance statement is realtime DS playback (~24 fps, BASELINE.md).

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import (CHUNK,
                                                     VmemBatchDecoder,
                                                     _assemble_gop_parts,
                                                     _decode_gop_fused,
                                                     _decode_gop_fused_sblob,
                                                     _decode_round_blob,
                                                     _decode_round_sblob,
                                                     _gop_part,
                                                     _pack_blob,
                                                     _pack_blob_sparse,
                                                     _pack_gop_chunks)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H, B, F = 256, 192, 8, 24   # one GOP: I-frame + 23 P-frames
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]

    bd = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)

    # host scan + pack — the e2e path's form: ONE C++ scanner_scan_gop call
    # per stream emits the fused sparse upload blob directly, Python only
    # pads to buckets and concatenates (checkpoint/rollback keeps reps
    # starting from identical scanner state)
    per_stream = [[frames[f][b] for f in range(F)] for b in range(B)]

    def scan_gop_blob():
        for nv in bd.natives:
            nv.checkpoint()
        res = list(bd._pool.map(
            lambda b: bd.natives[b].scan_gop_packed(per_stream[b]),
            range(B)))
        for nv in bd.natives:
            nv.rollback()
        return _assemble_gop_parts([_gop_part(r) for r in res])

    scan_gop_blob()   # warm (page in buffers)
    t_scan = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        gblob, gnct, gnnzb = scan_gop_blob()
        t_scan = min(t_scan, time.perf_counter() - t0)

    # per-round upload blobs (per-frame dispatch path)
    per = [bd.scan_packets(fp) for fp in frames]
    blobs = []
    for o, c, s in per:
        sp = _pack_blob_sparse(o, c, s)
        if sp is not None:
            blobs.append((sp[0], o.shape[1], c.shape[1], sp[1]))
        else:
            blobs.append((_pack_blob(o, c, s), o.shape[1], c.shape[1], None))

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

    # device decode throughput (results stay on device).  The tunnel's
    # effective dispatch/upload throughput drifts non-deterministically
    # (shared link; content-dedup caches); every timing below takes the
    # best of a few short windows so the number reflects the machine, not
    # the link's worst moment.
    #
    # SYNC NOTE (round 3): jax.block_until_ready does NOT synchronize
    # execution through the axon tunnel (measured: repeated resident-args
    # dispatches "complete" in 0 ms).  Steps chain through the donated
    # ring, so forcing ONE tiny dependent reduction to host after the last
    # dispatch is a true barrier for the whole window; its fixed fetch
    # cost (~30 ms) is amortized across reps and included in the number.
    import jax.numpy as _jnp

    def _sync(x):
        float(_jnp.sum(x[..., :1].astype(_jnp.int32)))

    def best_window(step, n_frames, reps=3, windows=3):
        best = 0.0
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = step()
            _sync(out)
            best = max(best, n_frames * reps / (time.perf_counter() - t0))
        return best

    def rounds_step():
        nonlocal ring
        for blob, nch, nr, nnzb in blobs:
            ring, yuv = round_(ring, blob, nch, nr, nnzb)
        return yuv

    fps_rounds = best_window(rounds_step, B * F)

    # fused whole-GOP path: ONE upload + ONE kernel launch per GOP
    # (per-stream scatter reconstruction; results left on device).  The
    # sparse upload blob is the native scanner's (bit-identical to the
    # Python pack, tests/test_native_gop.py); the Python pack below only
    # feeds the dense device-resident compute metric.
    bdf = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    plans_fb = [bdf._scan_all(fp) for fp in frames]
    gops, gcoefs, gsizes = _pack_gop_chunks(plans_fb, B)
    nct = gops.shape[1]
    assert nct == gnct, (nct, gnct)
    gring = bdf.ring
    t0 = time.perf_counter()
    gring, gyuv = _decode_gop_fused_sblob(gring, gblob, F, nct, gnnzb, H,
                                          bdf.stride, bdf.interpret)
    jax.block_until_ready(gyuv)
    t_compile_f = time.perf_counter() - t0

    def fused_step():
        nonlocal gring
        gring, gyuv = _decode_gop_fused_sblob(gring, gblob, F, nct, gnnzb,
                                              H, bdf.stride, bdf.interpret)
        return gyuv

    fps_fused = best_window(fused_step, B * F)

    # pure device compute (arguments resident): the number a
    # directly-attached chip would see, with host->device transfer amortized
    d_ops, d_coefs = jnp.asarray(gops), jnp.asarray(gcoefs)
    d_sizes = jnp.asarray(gsizes.reshape(B, nct * CHUNK))
    jax.block_until_ready((d_ops, d_coefs, d_sizes))
    gring, gyuv = _decode_gop_fused(gring, d_ops, d_coefs, d_sizes, F, H,
                                    bdf.stride, bdf.interpret)
    jax.block_until_ready(gyuv)

    def compute_step():
        nonlocal gring
        gring, gyuv = _decode_gop_fused(gring, d_ops, d_coefs, d_sizes, F,
                                        H, bdf.stride, bdf.interpret)
        return gyuv

    fps_compute = best_window(compute_step, B * F, reps=10)

    fps = max(fps_rounds, fps_fused)

    # The host<->device link is a remote tunnel whose bandwidth drifts by
    # >100x across sessions (measured 0.2-1200 MB/s); probe it BEFORE the
    # fetch-bound sections so (a) the report carries the context and (b)
    # a degraded link scales the e2e measurement down instead of running
    # for tens of minutes.
    probe = np.random.randint(0, 255, (4 << 20,), np.uint8)
    t0 = time.perf_counter()
    dprobe = jax.device_put(probe)
    # block_until_ready does not synchronize through the axon tunnel; a
    # tiny dependent scalar fetch is the true completion barrier for the
    # upload (its fixed ~30 ms cost biases the rate DOWN, never up)
    float(_jnp.sum(dprobe[:1].astype(_jnp.int32)))
    up_mbps = 4.0 / max(time.perf_counter() - t0, 1e-9)
    t0 = time.perf_counter()
    np.asarray(dprobe)
    down_mbps = 4.0 / max(time.perf_counter() - t0, 1e-9)
    link_ok = down_mbps >= 3.0
    e2e_passes = 2 if link_ok else 1

    # honest end-to-end: scan + decode + one GOP download (fused
    # single-launch path: one upload, one dispatch, one fetch per GOP)
    bd2 = VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    bd2.decode_gop(frames, fused=True)           # warm/compile
    t0 = time.perf_counter()
    out = bd2.decode_gop(frames, fused=True)
    e2e = B * F / (time.perf_counter() - t0)
    assert out.shape == (F, B, H + H // 2, bd.stride)

    # sustained end-to-end: stream GOPs with download/compute overlap
    # (best of two passes — the tunnel's fetch bandwidth drifts)
    n_gops = 4 if link_ok else 2
    e2e_sustained = 0.0
    for _ in range(e2e_passes):
        t0 = time.perf_counter()
        got = 0
        for arr in bd2.decode_gops(frames for _ in range(n_gops)):
            got += arr.shape[0] * arr.shape[1]
        e2e_sustained = max(e2e_sustained,
                            got / (time.perf_counter() - t0))

    # Wii-size MOC5 secondary metric (the reference's only negative perf
    # statement: "not full speed" on a PC, README.md:8).  Fused engine in
    # HBM-ring mode; small workload so it stays cheap in this bench.
    fps_wii = None
    fps_wii_compute = None
    wii_error = None
    try:
        WB, WF = 2, 8
        wsyn = [StreamSynthesizer(640, 480, MobiclipVersion.MOFLEX_3DS,
                                  seed=b) for b in range(WB)]
        wframes = [[s.iframe(0x18) if f == 0 else s.pframe() for s in wsyn]
                   for f in range(WF)]
        bdw = VmemBatchDecoder(640, 480, MobiclipVersion.MOFLEX_3DS,
                               batch=WB)
        wres = list(bdw._pool.map(
            lambda b: bdw.natives[b].scan_gop_packed(
                [wframes[f][b] for f in range(WF)]), range(WB)))
        wblob, wnct, wnnzb = _assemble_gop_parts(
            [_gop_part(r) for r in wres])
        wring = bdw.ring
        wring, wyuv = _decode_gop_fused_sblob(      # warm/compile
            wring, wblob, WF, wnct, wnnzb, 480, bdw.stride, bdw.interpret)
        _sync(wyuv)

        def wii_step():
            nonlocal wring
            wring, wyuv = _decode_gop_fused_sblob(
                wring, wblob, WF, wnct, wnnzb, 480, bdw.stride,
                bdw.interpret)
            return wyuv

        fps_wii = round(best_window(wii_step, WB * WF, reps=5, windows=2), 2)

        # device-resident Wii rate (transfers amortized), like
        # device_compute_fps for DS — the number attached hardware sees
        from mobiclipdecoder_tpu.ops.vmem_engine import (_decode_gop_fused,
                                                         _pack_gop_chunks)
        bdw2c = VmemBatchDecoder(640, 480, MobiclipVersion.MOFLEX_3DS,
                                 batch=WB)
        wplans = [bdw2c._scan_all(fp) for fp in wframes]
        wops, wcoefs, wsizes = _pack_gop_chunks(wplans, WB)
        wd_ops = jnp.asarray(wops)
        wd_coefs = jnp.asarray(wcoefs)
        wd_sizes = jnp.asarray(wsizes.reshape(WB, -1))
        jax.block_until_ready((wd_ops, wd_coefs, wd_sizes))
        wring2 = bdw2c.ring
        wring2, wyuv2 = _decode_gop_fused(wring2, wd_ops, wd_coefs,
                                          wd_sizes, WF, 480, bdw2c.stride,
                                          bdw2c.interpret)
        _sync(wyuv2)

        def wii_compute_step():
            nonlocal wring2
            wring2, wyuv2 = _decode_gop_fused(
                wring2, wd_ops, wd_coefs, wd_sizes, WF, 480, bdw2c.stride,
                bdw2c.interpret)
            return wyuv2

        fps_wii_compute = round(best_window(wii_compute_step, WB * WF,
                                            reps=5, windows=2), 2)
    except Exception as e:  # surfaced in the JSON, not swallowed
        wii_error = repr(e)

    # Cropped end-to-end at the two stride-padded geometries: the device
    # crops Y to frame width and repacks U|V adjacent before download
    # (VmemBatchDecoder crop=True), cutting the fetch-bound transfer by
    # 21.9% at 400x240 (stride 512) and 37.5% at 640x480 (stride 1024).
    e2e_3ds = None
    e2e_wii = None
    try:
        B3, F3 = 4, 12
        syn3 = [StreamSynthesizer(400, 240, MobiclipVersion.MOFLEX_3DS,
                                  seed=b) for b in range(B3)]
        gop3 = [[s.iframe(0x18) if f == 0 else s.pframe() for s in syn3]
                for f in range(F3)]
        bd3 = VmemBatchDecoder(400, 240, MobiclipVersion.MOFLEX_3DS,
                               batch=B3, crop=True)
        list(bd3.decode_gops(iter([gop3])))            # warm/compile
        best = 0.0
        for _ in range(e2e_passes):
            t0 = time.perf_counter()
            got = 0
            for arr in bd3.decode_gops(gop3 for _ in
                                       range(3 if link_ok else 1)):
                got += arr.shape[0] * arr.shape[1]
            best = max(best, got / (time.perf_counter() - t0))
        e2e_3ds = round(best, 2)
    except Exception as e:
        e2e_3ds = repr(e)
    try:
        bdw2 = VmemBatchDecoder(640, 480, MobiclipVersion.MOFLEX_3DS,
                                batch=WB, crop=True)
        list(bdw2.decode_gops(iter([wframes])))        # warm
        best = 0.0
        for _ in range(e2e_passes):
            t0 = time.perf_counter()
            got = 0
            for arr in bdw2.decode_gops(wframes for _ in
                                        range(2 if link_ok else 1)):
                got += arr.shape[0] * arr.shape[1]
            best = max(best, got / (time.perf_counter() - t0))
        e2e_wii = round(best, 2)
    except Exception as e:
        e2e_wii = repr(e)

    baseline_fps = 24.0  # realtime DS playback, single-threaded C# reference
    print(json.dumps({
        "metric": "mods_256x192_device_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch_streams": B,
        "gop_frames": F,
        "per_round_fps": round(fps_rounds, 2),
        "fused_gop_fps": round(fps_fused, 2),
        "device_compute_fps": round(fps_compute, 2),
        "host_scan_fps": round(B * F / t_scan, 2),
        "e2e_fps": round(e2e, 2),
        "e2e_sustained_fps": round(e2e_sustained, 2),
        "wii_640x480_fps": fps_wii,
        "wii_device_compute_fps": fps_wii_compute,
        "e2e_400x240_cropped_fps": e2e_3ds,
        "wii_e2e_cropped_fps": e2e_wii,
        **({"wii_error": wii_error} if wii_error else {}),
        "tunnel_up_MBps": round(up_mbps, 1),
        "tunnel_down_MBps": round(down_mbps, 1),
        "compile_s": round(t_compile + t_compile_f, 1),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
