"""Per-component runtime breakdown of the fused sequential-executor kernel.

Compiles WRONG-RESULT kernel variants that skip one cost component each
(ops/vmem_engine._PROBE_SKIP) and times them with chained dispatches plus a
forced scalar-fetch sync (jax.block_until_ready does not synchronize through
the axon tunnel).  The deltas attribute the ~1 us/op sequential cost to MC
ring-window DMAs, plane RMW DMAs, or the three op-type compute bodies.

  python tools/probe_kernel_breakdown.py [variants...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# current hooks in ops/vmem_engine._PROBE_SKIP; combine with "+"
VARIANTS = ("base", "rolls", "mcfres", "mcdma", "rmwdma", "mchroma", "rres", "itaps",
            "iluts", "idc", "ipred", "ires", "mc", "resid", "intra",
            "body")


def main(variants) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.ops import vmem_engine as ve
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    B, F, W, H = 8, 24, 256, 192
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=b)
              for b in range(B)]
    frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths]
              for f in range(F)]
    bd = ve.VmemBatchDecoder(W, H, MobiclipVersion.MODS_DS, batch=B)
    plans_fb = [bd._scan_all(fp) for fp in frames]
    ops, coefs, sizes = ve._pack_gop_chunks(plans_fb, B)
    nct = ops.shape[1]
    S = bd.stride
    _hh, G8, SP = ve._geom(H, S)
    SPX = ve._ring_spx(H, S)

    # device-resident args (the probe isolates kernel execution); the
    # residual pre-pass is the engine's own (_residuals handles the
    # quad-merged size-4 rows)
    resid = ve._residuals(jnp.asarray(coefs).reshape(B * nct * ve.CHUNK, 64),
                          jnp.asarray(sizes).reshape(-1))
    d_ops = jnp.asarray(ops).reshape(B * nct * ve.CHUNK, 4)
    ring0 = jnp.zeros((B, 6 * G8, 8, SPX), jnp.int32)
    jax.block_until_ready((d_ops, resid, ring0))

    n_ops = sum(int(p["ops"][0, 0]) for row in plans_fb for p in row)
    print(f"workload: {B}x{F} frames, {n_ops} ops, nct {nct}", flush=True)

    results = {}
    for var in variants:
        ve._PROBE_SKIP = (frozenset() if var == "base"
                          else frozenset(var.split("+")))
        ve._build_gop_executor.cache_clear()
        t0 = time.perf_counter()
        run = ve._build_gop_executor(F, B, H, S, nct, False)
        ring, fr = run(d_ops, ring0, resid)
        float(jnp.sum(fr[..., :1].astype(jnp.int32)))
        t_compile = time.perf_counter() - t0
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            ring, fr = run(d_ops, ring, resid)
        float(jnp.sum(fr[..., :1].astype(jnp.int32)))
        dt = (time.perf_counter() - t0) / K
        results[var] = dt
        print(f"{var:8s}: {dt * 1e3:7.1f} ms/GOP  "
              f"({dt / n_ops * 1e9:6.0f} ns/op)  "
              f"[compile {t_compile:.0f}s]", flush=True)

    ve._PROBE_SKIP = frozenset()
    ve._build_gop_executor.cache_clear()
    if "base" in results:
        base = results["base"]
        for var, dt in results.items():
            if var != "base":
                print(f"  {var}: saves {100 * (base - dt) / base:5.1f}% "
                      f"of base", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or VARIANTS))
