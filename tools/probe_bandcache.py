"""A/B the RMW/ring band caches on real hardware (DS + Wii workloads).

Builds the fused GOP executor with ops/vmem_engine._BAND_CACHE on and off
(fresh Mosaic compile each; persistently cached per variant) and times both
with chained device-resident dispatches + a scalar-fetch sync.

    python tools/probe_bandcache.py [ds|wii ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time_gop(ve, run, d_ops, ring0, resid, n_ops, reps=10):
    import jax.numpy as jnp
    t0 = time.perf_counter()
    ring, fr = run(d_ops, ring0, resid)
    float(jnp.sum(fr[..., :1].astype(jnp.int32)))
    t_compile = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            ring, fr = run(d_ops, ring, resid)
        float(jnp.sum(fr[..., :1].astype(jnp.int32)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, t_compile


def run_case(name, W, H, ver, B, F):
    import jax
    import jax.numpy as jnp
    from mobiclipdecoder_tpu.ops import vmem_engine as ve
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    synths = [StreamSynthesizer(W, H, ver, seed=b) for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]
    bd = ve.VmemBatchDecoder(W, H, ver, batch=B)
    plans_fb = [bd._scan_all(fp) for fp in frames]
    ops, coefs, sizes = ve._pack_gop_chunks(plans_fb, B)
    nct = ops.shape[1]
    S = bd.stride
    _hh, G8, SP = ve._geom(H, S)
    SPX = ve._ring_spx(H, S)
    resid = ve._residuals(
        jnp.asarray(coefs).reshape(B * nct * ve.CHUNK, 64),
        jnp.asarray(sizes).reshape(-1))
    d_ops = jnp.asarray(ops).reshape(B * nct * ve.CHUNK, 4)
    ring0 = jnp.zeros((B, 6 * G8, 8, SPX), jnp.int32)
    jax.block_until_ready((d_ops, resid, ring0))
    n_ops = sum(int(p["ops"][0, 0]) for row in plans_fb for p in row)
    print(f"{name}: {B}x{F} frames, {n_ops} ops, nct {nct}", flush=True)

    for cache in (True, False):
        ve._BAND_CACHE = cache
        ve._build_gop_executor.cache_clear()
        run = ve._build_gop_executor(F, B, H, S, nct, False)
        dt, tc = _time_gop(ve, run, d_ops, ring0, resid, n_ops)
        print(f"  band_cache={cache}: {dt * 1e3:7.1f} ms/GOP "
              f"({dt / n_ops * 1e9:5.0f} ns/op, "
              f"{B * F / dt:7.1f} fps) [compile {tc:.0f}s]", flush=True)
    ve._BAND_CACHE = True
    ve._build_gop_executor.cache_clear()


def main(which):
    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    if not which or "ds" in which:
        run_case("DS 256x192", 256, 192, MobiclipVersion.MODS_DS, 8, 24)
    if not which or "wii" in which:
        run_case("Wii 640x480", 640, 480, MobiclipVersion.MOFLEX_3DS, 2, 8)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
