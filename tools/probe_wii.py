"""Probe: Wii-size (MOC5, 640x480) decode on the real chip.

The reference's only negative performance statement is that Wii MOC5
decode is "not full speed" (below realtime) on a contemporary PC
(/root/reference/README.md:8).  This measures our fused whole-GOP engine
in its HBM-ring mode (the 19.8 MiB 6-slot ring exceeds the VMEM stage
budget, so MC windows DMA straight from HBM) at that geometry.

    python tools/probe_wii.py [B] [F]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(B=2, F=8):
    import jax
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops.vmem_engine import VmemBatchDecoder
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    W, H = 640, 480
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]

    bd = VmemBatchDecoder(W, H, MobiclipVersion.MOFLEX_3DS, batch=B)
    t0 = time.perf_counter()
    plans_fb = [bd._scan_all(fp) for fp in frames]
    t_scan = time.perf_counter() - t0
    print(f"scan {B * F / t_scan:.0f} fps", flush=True)

    t0 = time.perf_counter()
    _t1, yuv = bd._dispatch_plans(plans_fb)
    jax.block_until_ready(yuv)
    print(f"warm/compile {time.perf_counter() - t0:.1f}s", flush=True)

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            _t1, yuv = bd._dispatch_plans(plans_fb)
        jax.block_until_ready(yuv)
        best = max(best, B * F * 3 / (time.perf_counter() - t0))
    print(f"wii 640x480 fused (HBM ring) B={B} F={F}: "
          f"device {best:8.1f} fps/chip", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
