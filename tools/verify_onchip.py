"""On-chip bit-exactness sweep: every supported geometry vs the oracle.

CI runs the suite on a virtual CPU mesh (interpret-mode kernels); this
script is the REAL-HARDWARE gate — run it on the attached TPU after any
kernel change to prove the Mosaic-compiled kernels still reproduce the
oracle exactly at DS (256x192 MODS), 3DS (400x240 Moflex) and Wii
(640x480 MOC5 profile, byte-packed VMEM ring) geometries, through the
production decode_stream_chunk path (native whole-GOP scan, sparse
upload, fused kernel).

  python tools/verify_onchip.py            # all three geometries
  python tools/verify_onchip.py 640x480    # just one
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = {
    "256x192": ("MODS_DS", 8),
    "400x240": ("MOFLEX_3DS", 6),
    "640x480": ("MOFLEX_3DS", 6),
}


def main(argv) -> int:
    import numpy as np

    from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                         OracleDecoder)
    from mobiclipdecoder_tpu.ops.vmem_engine import VmemVideoDecoder
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    geoms = argv or list(CASES)
    for g in geoms:
        vname, n = CASES[g]
        w, h = (int(v) for v in g.split("x"))
        ver = getattr(MobiclipVersion, vname)
        synth = StreamSynthesizer(w, h, ver, seed=1234)
        pkts = [synth.iframe(0x18) if i == 0 else synth.pframe()
                for i in range(n)]
        dec = VmemVideoDecoder(w, h, ver)
        yuv, offs, err = dec.decode_stream_chunk(pkts)
        assert err is None and yuv.shape[0] == n, (g, err, yuv.shape)
        odec = OracleDecoder(w, h, ver)
        S = odec.stride
        for k in range(n):
            odec.data = pkts[k]
            odec.offset = 0
            odec.decode_frame()
            assert offs[k] == len(pkts[k])
            np.testing.assert_array_equal(
                yuv[k][:h], odec.y_planes[0].reshape(-1, S)[:h],
                err_msg=f"{g} frame {k} Y")
            np.testing.assert_array_equal(
                yuv[k][h:], odec.uv_planes[0].reshape(-1, S)[:h // 2],
                err_msg=f"{g} frame {k} UV")
        print(f"{g} ({vname}, ring mode {dec._ring_mode}): "
              f"{n} frames bit-exact vs oracle", flush=True)
    print("on-chip verification PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
