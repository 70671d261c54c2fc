"""Wii-geometry (640x480 MOC5) fused-kernel cost attribution.

Runs ONE _PROBE_SKIP variant per invocation and prints its GOP time —
run each variant in a FRESH process: the in-process jit caches
(_decode_gop_fused's inner jit) do not invalidate on _PROBE_SKIP
changes, which silently reuses the first-compiled kernel (this bit
round 4's first Wii probes).

  for v in base body rolls mchroma mcdma+rmwdma prologue; do
      python tools/probe_wii_breakdown.py $v; done
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.ops import vmem_engine as ve
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

var = sys.argv[1]
B, F, W, H = 2, 8, 640, 480
synths = [StreamSynthesizer(W, H, MobiclipVersion.MOFLEX_3DS, seed=b) for b in range(B)]
frames = [[s.iframe(0x18) if f == 0 else s.pframe() for s in synths] for f in range(F)]
bd = ve.VmemBatchDecoder(W, H, MobiclipVersion.MOFLEX_3DS, batch=B)
res = list(bd._pool.map(lambda b: bd.natives[b].scan_gop_packed(
    [frames[f][b] for f in range(F)]), range(B)))
blob, nct, nnzb = ve._assemble_gop_parts([ve._gop_part(r) for r in res])
S = bd.stride
d_blob = jnp.asarray(blob)
ring0 = jnp.zeros_like(bd.ring)
jax.block_until_ready((d_blob, ring0))

if var.startswith("prologue"):
    import functools
    @functools.partial(jax.jit, static_argnames=("F", "nct", "nnzb", "H", "S"))
    def prol(ring, blob, F, nct, nnzb, H, S):
        # replicate _decode_gop_fused_sblob's unpack + _residuals pre-pass
        Bl = ring.shape[0]
        nrows = Bl * nct * ve.CHUNK
        rows = nct * ve.CHUNK
        a = nrows * 3
        nsb = (nrows + 31) // 32
        b2 = a + nsb
        c = b2 + Bl * nnzb
        ops = ve._unpack_ops3(blob[:a].reshape(Bl, nct, ve.CHUNK, 3))
        sbits = blob[a:b2]
        idx = blob[b2:c].reshape(Bl, nnzb)
        v32 = blob[c:c + Bl * nnzb // 2].reshape(Bl, nnzb // 2)
        lo = jax.lax.shift_right_arithmetic(v32 << 16, 16)
        hi = jax.lax.shift_right_arithmetic(v32, 16)
        val = jnp.stack([lo, hi], axis=2).reshape(Bl, nnzb)
        if var == "prologue-noscatter":
            coefs = (val[:, :rows * 64 // 1].reshape(Bl, -1)[:, :1].reshape(Bl, 1, 1, 1)
                     * jnp.zeros((Bl, nct, ve.CHUNK, 64), jnp.int32))
        elif var == "prologue-noresid":
            denses = [jnp.zeros(rows * 64, jnp.int32).at[idx[bb]].add(
                val[bb], mode="drop", indices_are_sorted=True, unique_indices=True)
                for bb in range(Bl)]
            coefs = jnp.stack(denses).reshape(Bl, nct, ve.CHUNK, 64)
            return jnp.sum(coefs[..., :1])
        else:
            denses = [jnp.zeros(rows * 64, jnp.int32).at[idx[bb]].add(
                val[bb], mode="drop", indices_are_sorted=True, unique_indices=True)
                for bb in range(Bl)]
            coefs = jnp.stack(denses).reshape(Bl, nct, ve.CHUNK, 64)
        word = sbits[jnp.arange(nrows) // 32]
        bit = (word >> (jnp.arange(nrows) % 32)) & 1
        sizes = jnp.where(bit == 1, 4, 8).astype(jnp.int32)
        resid = ve._residuals(coefs.reshape(-1, 64), sizes)
        return jnp.sum(ops[..., :1]) + jnp.sum(resid[:, :1])
    out = prol(ring0, d_blob, F=F, nct=nct, nnzb=nnzb, H=H, S=S)
    float(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = prol(ring0, d_blob, F=F, nct=nct, nnzb=nnzb, H=H, S=S)
        float(out)
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"{var:14s}: {best*1e3:7.1f} ms/GOP")
    sys.exit(0)

ve._PROBE_SKIP = frozenset() if var == "base" else frozenset(var.split("+"))
t0 = time.perf_counter()
ring, fr = ve._decode_gop_fused_sblob(jnp.copy(ring0), d_blob, F, nct, nnzb, H, S, False)
float(jnp.sum(fr[..., :1].astype(jnp.int32)))
t_c = time.perf_counter() - t0
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(4):
        ring, fr = ve._decode_gop_fused_sblob(ring, d_blob, F, nct, nnzb, H, S, False)
    float(jnp.sum(fr[..., :1].astype(jnp.int32)))
    best = min(best, (time.perf_counter() - t0) / 4)
print(f"{var:14s}: {best*1e3:7.1f} ms/GOP  ({B*F/best:6.1f} fps)  [compile {t_c:.0f}s]")
