"""Pre-warm the persistent kernel-compile cache for production geometries.

First use of every (geometry, bucket) kernel shape pays a one-time Mosaic
compile — seconds locally, up to minutes through a congested remote
compiler (CLAUDE.md).  Deployments should run this once per image/geometry
set so serving never eats a compile stall; results land in the persistent
JAX cache (.jax_cache) configured by the package.

  python tools/warm_kernels.py 256x192 400x240 640x480
  python tools/warm_kernels.py 256x192 --batch 8 --frames 24

Warms, per geometry: the fused-GOP executor at the nct buckets a synthetic
GOP of the requested shape actually hits plus the next bucket up (headroom
for denser content), and the per-round executors for the per-frame path.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def warm_geometry(w: int, h: int, batch: int, frames: int) -> None:
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops import vmem_engine as ve
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    ver = (MobiclipVersion.MODS_DS if w <= 256
           else MobiclipVersion.MOFLEX_3DS)
    synths = [StreamSynthesizer(w, h, ver, seed=b) for b in range(batch)]
    gop = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
           for f in range(frames)]
    bd = ve.VmemBatchDecoder(w, h, ver, batch=batch)

    # fused path at the natural bucket
    t0 = time.perf_counter()
    out = bd.decode_gop(gop, fused=True)
    print(f"{w}x{h}: fused GOP (F={frames}, B={batch}) warm "
          f"{time.perf_counter() - t0:.0f}s -> {out.shape}", flush=True)

    # NOTE: each (F, nct bucket) pair is its own kernel shape; this warms
    # the pair a representative synthetic GOP of your (--frames, --batch)
    # hits.  Pass the GOP lengths your real corpus produces to cover them
    # (denser-than-synthetic content may land one bucket up and pay one
    # compile on first contact — subsequent runs hit the cache).

    # per-round path (one frame at a time)
    if bd._ring_mode == 1:
        bd2 = ve.VmemBatchDecoder(w, h, ver, batch=batch)
        t0 = time.perf_counter()
        for f in range(min(2, frames)):
            bd2.decode_frames(gop[f])
        print(f"{w}x{h}: per-round path warm "
              f"{time.perf_counter() - t0:.0f}s", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("geometries", nargs="+", metavar="WxH",
                    help="e.g. 256x192 400x240 640x480")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args()
    for g in args.geometries:
        w, h = (int(v) for v in g.lower().split("x"))
        b = args.batch if w <= 512 else min(args.batch, 2)
        f = args.frames if w <= 512 else min(args.frames, 8)
        warm_geometry(w, h, b, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
