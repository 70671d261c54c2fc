"""On-chip bit-exactness sweep: every supported geometry vs the oracle.

CI runs the suite on a virtual CPU mesh (interpret-mode kernels); this
script is the REAL-HARDWARE gate — run it on the attached TPU after any
kernel change to prove the Mosaic-compiled kernels still reproduce the
oracle exactly at DS (256x192 MODS), 3DS (400x240 Moflex) and Wii
(640x480 MOC5 profile, byte-packed VMEM ring) geometries, through the
production decode_stream_chunk path (native whole-GOP scan, sparse
upload, fused kernel).

Each geometry sweeps the full format surface (VERDICT r4 item 3): the
default stream, VLC table 1 with a dQP ladder, Moflex QP-clamp edges,
a big-levels stream (dense-fallback upload path), and one encoder-
generated stream per geometry — so the compiled kernels, not just
interpret mode, are proven on every branch class the synthesizer covers.

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


def _check(tag, dec, pkts, oracle_cls, w, h, ver):
    import numpy as np
    yuv, offs, err = dec.decode_stream_chunk(pkts)
    assert err is None and yuv.shape[0] == len(pkts), (tag, err, yuv.shape)
    odec = oracle_cls(w, h, ver)
    S = odec.stride
    for k in range(len(pkts)):
        odec.data = pkts[k]
        odec.offset = 0
        odec.decode_frame()
        assert offs[k] == len(pkts[k]), (tag, k)
        np.testing.assert_array_equal(
            yuv[k][:h], odec.y_planes[0].reshape(-1, S)[:h],
            err_msg=f"{tag} frame {k} Y")
        np.testing.assert_array_equal(
            yuv[k][h:], odec.uv_planes[0].reshape(-1, S)[:h // 2],
            err_msg=f"{tag} frame {k} UV")
    return len(pkts)


def _encoder_pkts(w, h, ver, n=3):
    import numpy as np
    from mobiclipdecoder_tpu.models.encoder import MobiclipEncoder
    rng = np.random.default_rng(5)
    enc = MobiclipEncoder(w, h, ver, quantizer=0x14, gop=4, refs=2,
                          me_range=6)
    yy, xx = np.mgrid[0:h, 0:w]
    pkts = []
    for f in range(n):
        y = (128 + 60 * np.sin(xx / 11 + f / 2) * np.cos(yy / 7)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin(xx[::2, ::2] / 13)).clip(0,
                                                        255).astype(np.uint8)
        v = (128 + 40 * np.cos(yy[::2, ::2] / 9)).clip(0,
                                                       255).astype(np.uint8)
        pkts.append(enc.encode_frame(y, u, v) + b"\x00\x00")
    return pkts


def main(argv) -> int:
    from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                         OracleDecoder)
    from mobiclipdecoder_tpu.ops.vmem_engine import VmemVideoDecoder
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    geoms = argv or list(CASES)
    for g in geoms:
        vname, n = CASES[g]
        w, h = (int(v) for v in g.split("x"))
        ver = getattr(MobiclipVersion, vname)
        total = 0
        dec = VmemVideoDecoder(w, h, ver)

        synth = StreamSynthesizer(w, h, ver, seed=1234)
        pkts = [synth.iframe(0x18) if i == 0 else synth.pframe()
                for i in range(n)]
        total += _check(f"{g} default", dec, pkts, OracleDecoder, w, h, ver)

        # VLC table 1 + dQP ladder on the production path
        s2 = StreamSynthesizer(w, h, ver, seed=77)
        pkts = [s2.iframe(0x18, table=1), s2.pframe(dq=2), s2.pframe(dq=-1),
                s2.pframe(dq=3)]
        total += _check(f"{g} table1+dqp", dec, pkts, OracleDecoder, w, h,
                        ver)

        if ver == MobiclipVersion.MOFLEX_3DS:
            # QP clamp edges (MobiclipDecoder.cs:3886-3890)
            s3 = StreamSynthesizer(w, h, ver, seed=78)
            pkts = [s3.iframe(2), s3.pframe(dq=-3), s3.iframe(0x3F, table=1),
                    s3.pframe(dq=7)]
            total += _check(f"{g} qp-clamp", dec, pkts, OracleDecoder, w, h,
                            ver)

        # big escape-3 levels: the dense-fallback upload path
        s4 = StreamSynthesizer(w, h, ver, seed=79, big_levels=0.3)
        pkts = [s4.iframe(0x18), s4.pframe()]
        total += _check(f"{g} big-levels", dec, pkts, OracleDecoder, w, h,
                        ver)

        # encoder-generated stream (full VLC cascade + half-pel ME).  The
        # encoder emits the Moflex profile (reference parity: table 0,
        # MobiEncoder.cs); run it under that profile at every geometry.
        epk = _encoder_pkts(w, h, MobiclipVersion.MOFLEX_3DS)
        edec = VmemVideoDecoder(w, h, MobiclipVersion.MOFLEX_3DS)
        total += _check(f"{g} encoder", edec, epk, OracleDecoder, w, h,
                        MobiclipVersion.MOFLEX_3DS)

        print(f"{g} ({vname}, ring mode {dec._ring_mode}): {total} frames "
              f"bit-exact vs oracle across default/table1+dqp"
              f"{'/qp-clamp' if ver == MobiclipVersion.MOFLEX_3DS else ''}"
              f"/big-levels/encoder streams", flush=True)
    print("on-chip verification PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
