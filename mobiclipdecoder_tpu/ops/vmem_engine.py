"""Single-kernel VMEM reconstruction engine (Pallas TPU).

The whole-frame decode — motion compensation, inter residuals, intra
prediction — runs as ONE Pallas kernel per (stream-batch x frame) round.  The
6-slot reference ring and the working frame plane live in VMEM for the whole
kernel; the unified op stream (models/plan.py pack_unified) is executed
sequentially in the reference's exact decode order, so the reference's
"read whatever is in the plane right now" semantics (fresh-plane zeros for
not-yet-decoded taps, MobiclipDecoder.cs:2368-2471; pass-through residual
bases) hold by construction — no sequence maps, no wavefront levels, no
hundreds of full-plane scatter passes like the XLA wavefront engine
(models/pipeline.py), which this replaces on the hot path.

Hardware mapping notes (probed on TPU v5e via this repo's tunnel):
  * Dynamic-start vector loads/stores are only safe on <=128-lane arrays and
    dynamic-offset DMAs crash the Mosaic AOT pipeline — so ALL dynamic plane
    addressing uses async DMA with dynamic *leading-dim* indices over
    row-group-major buffers (plane = (rows/8, 8, S_padded)), the same access
    discipline as paged-attention kernels.
  * Lane/sublane positioning inside a row-group window uses pltpu.roll with
    traced shifts.
  * Tap->pixel selection for the 18 directional intra modes is a one-hot
    bf16 matmul against LUTs baked from ops/intra_tables.py (exact: taps are
    <=255, each output row has exactly one nonzero weight).
  * (1,64)->(8,8) / (1,256)->(16,16) reshapes are not lowerable; they are
    done as two exact HIGHEST-precision one-hot matmuls.

Integer semantics are bit-exact vs models/oracle_video.py (the executable
spec of MobiclipDecoder.cs): truncating arithmetic shifts for half-pel
averaging (CopyBlock :418-456), u32 word-composition byte aliasing in the
plane predictors (:3017-3327), H.264-style add-clamp (:3551-3558).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .idct import idct4, idct8
from .intra_tables import AVG2, AVG3, DC, KIND, TAPS
from ..models.plan import OP_INTRA, OP_MC, OP_RESID

MR = 8       # top margin rows (taps at row -1 read zeros, like fresh planes)
MCOL = 8     # left margin lanes
# SMEM charges 128 bytes per scalar (measured: 1 MiB total on v5e), so the
# op stream is fed in 256-row chunks via a second grid dimension; each chunk
# carries its own header row with its op count.
CHUNK = 256
# Per-round op-count ladder.  Each step is a distinct kernel grid => a fresh
# multi-minute Mosaic compile through the tunnel on first use (then cached
# persistently) — keep the ladder short.  Steps were sized on the synth
# workload: P-frames ~600 ops fit 768; I-frames ~1900 fit 2048 (the r2
# 2048/4096 split replaced a 3072 middle step so typical I-frames stop
# padding 50%).
NOPS_BUCKETS = (768, 2048, 4096, 12288)
NR_BUCKETS = (256, 1024, 4096, 12288)

_HP = jax.lax.Precision.HIGHEST

# Perf-probe hooks (tools/probe_kernel_breakdown.py): building an executor
# with entries here produces a WRONG-RESULT kernel variant that skips a
# cost component, isolating its share of runtime.  Never set in production
# paths; builders are lru-cached per shape, so probe processes must set
# this before the first build of the probed shape.
_PROBE_SKIP: frozenset = frozenset()
# RMW/ring band caches (see the kernel's band-cache block).  A build-time
# toggle so the probe can A/B the cached vs per-op-DMA forms on real
# hardware (flip + cache_clear like _PROBE_SKIP).
_BAND_CACHE: bool = True


def _geom(height: int, stride: int) -> tuple[int, int, int]:
    hh = height + height // 2
    hhp = hh + 32            # 8 top margin + >=17 bottom slack, 8-aligned
    return hh, hhp // 8, stride + 128     # (HH, G8, SP)


def _ring_mode(height: int, stride: int) -> int:
    """How the fused kernel holds the 6-slot reference ring:
    1 = int32 ring staged into VMEM (DS/3DS sizes), 2 = byte-packed ring
    (4 px/int32 lane-packed) staged into VMEM (Wii 640x480: 20.8 MB int32
    -> 5.2 MB packed), 0 = ring stays in HBM (beyond even packed budget).
    Modes 2/0 store the ring ARRAY packed/unpacked int32 respectively —
    the host unpacks mode-2 rings with a uint8 view (little-endian)."""
    _hh, G8, SP = _geom(height, stride)
    nbytes = 6 * G8 * 8 * SP * 4
    if nbytes <= _VMEM_RING_BUDGET:
        return 1
    # charge mode 2 at the 128-lane-rounded width the staging actually
    # allocates (_ring_spx), not SP//4 — up to ~66% larger for widths just
    # above a 128 multiple (a borderline geometry would otherwise pick
    # mode 2 and oversubscribe VMEM into a Mosaic compile failure)
    spx_packed = -(-(SP // 4) // 128) * 128
    if 6 * G8 * 8 * spx_packed * 4 <= _VMEM_RING_BUDGET:
        return 2
    return 0


def _ring_spx(height: int, stride: int) -> int:
    """Lane width of the stored ring.  Packed mode keeps SP/4 words,
    rounded up to a multiple of 128 lanes — Mosaic's dynamic lane rotate
    (pltpu.roll) requires it (a 288-lane rotate crashes the remote
    compiler; 1152 = 9*128 is why the unpacked path never hit this).
    Padding words are zero and sit beyond every valid window read."""
    _hh, _G8, SP = _geom(height, stride)
    if _ring_mode(height, stride) != 2:
        return SP
    return -(-(SP // 4) // 128) * 128


@functools.lru_cache(maxsize=None)
def _lut_tables() -> tuple[np.ndarray, np.ndarray]:
    """Weighted tap-select matrices per mode: top-row taps (corner at 0,
    t[k] at 1+k) and left-column taps (l[k]).

    The per-pixel combination KINDS fold directly into the weights —
    COPY/PASS (w0=1), AVG2 ((t1+t2+1)>>1 == floor(.5 t1+.5 t2+.5)), AVG3
    ((t1+2 t2+t3+2)>>2 == floor(.25 t1+.5 t2+.25 t3+.5)) — so the whole
    directional prediction is ONE matmul pair + a uniform +0.5 floor (the
    bias is harmless for COPY: floor(int+0.5) == int).  Weights are sums
    of {0.25, 0.5, 1} <= 2: exact in bf16, and every product against taps
    <= 255 is exact too (<= 8 significant bits), with exact f32
    accumulation.  DC pixels (modes 3/13) carry zero weight and are
    overridden by the computed dc value in-kernel."""
    _W = {AVG2: (0.5, 0.5, 0.0), AVG3: (0.25, 0.5, 0.25)}
    wt = np.zeros((20, 32, 256), np.float32)
    wl = np.zeros((20, 16, 256), np.float32)
    for mode in range(20):
        for pix in range(256):
            kind = int(KIND[mode, pix])
            if kind == DC:
                continue
            ws = _W.get(kind, (1.0, 0.0, 0.0))
            for j, w in enumerate(ws):
                if w == 0.0:
                    continue
                tap = int(TAPS[mode, pix, j])
                if tap <= 16:
                    wt[mode, tap, pix] += w
                else:
                    wl[mode, tap - 17, pix] += w
    return wt.astype(jnp.bfloat16), wl.astype(jnp.bfloat16)


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


def _ops_bucket(n_ops: int) -> int:
    """Smallest bucket whose chunked capacity holds n_ops rows."""
    for b in NOPS_BUCKETS:
        if n_ops <= (b // CHUNK) * (CHUNK - 1):
            return b
    raise ValueError(f"{n_ops} ops exceed largest bucket")


def _chunk_ops(ops_arr: np.ndarray, bucket: int) -> np.ndarray:
    """(1+n, 4) single-header op array -> (NCHUNK, CHUNK, 4) with per-chunk
    header rows (SMEM element budget forces small chunks)."""
    n = int(ops_arr[0, 0])
    rows = ops_arr[1:1 + n]
    nchunk = bucket // CHUNK
    cap = CHUNK - 1
    out = np.zeros((nchunk, CHUNK, 4), np.int32)
    for c in range(nchunk):
        seg = rows[c * cap:(c + 1) * cap]
        out[c, 0, 0] = seg.shape[0]
        out[c, 1:1 + seg.shape[0]] = seg
    return out



def _btf8_ax0(c):
    """8-point butterfly along axis 0 of (8, ..., N) int32 — same
    shift-add dataflow as ops/idct.py _btf8 (MobiclipDecoder.cs:3450-3505),
    laid out with the batch on the LANE axis for full VPU utilization."""
    r0, r1, r2, r3, r4, r5, r6, r7 = (c[k] for k in range(8))
    a0 = r0 + r4
    a1 = r0 - r4
    b0 = r2 + (r6 >> 1)
    b1 = (r2 >> 1) - r6
    e2 = a1 + b1
    e4 = a1 - b1
    e6 = a0 - b0
    e0 = a0 + b0
    o0 = r1 + r7 - r3 - (r3 >> 1)
    o1 = r7 - r1 + r5 + (r5 >> 1)
    o2 = r5 - r7 - (r7 >> 1) - r3
    o3 = r3 + r5 + r1 + (r1 >> 1)
    f1 = o2 + (o3 >> 2)
    f7 = o3 - (o2 >> 2)
    f3 = o0 + (o1 >> 2)
    f5 = (o0 >> 2) - o1
    return jnp.stack([e0 + f7, e2 + f5, e4 + f3, e6 + f1,
                      e6 - f1, e4 - f3, e2 - f5, e0 - f7], axis=0)


def _btf4_ax0(c):
    """4-point butterfly along axis 0 (IDCT16Px4, :3728-3784)."""
    r0, r1, r2, r3 = (c[k] for k in range(4))
    e0 = r0 + r2
    e1 = r0 - r2
    o1 = (r1 >> 1) - r3
    o0 = r1 + (r3 >> 1)
    return jnp.stack([e0 + o0, e1 + o1, e1 - o1, e0 - o0], axis=0)


def _residuals(flat, sizes_flat):
    """IDCT pre-pass shared by every decode path.

    Rows flagged size 8 hold one 8x8 coefficient block.  Rows flagged 4
    hold up to FOUR 4x4 blocks in quadrant slots [q0|q1|q2|q3] (the
    scanner's quad-merge: the 4x4 residuals of one inter 8x8 are emitted
    as ONE op whose (8,8) residual is assembled here; intra 4x4 residual
    rows are the degenerate q0-only case, and empty quadrants IDCT to
    zero, so an absent sub-block leaves its pixels untouched through the
    kernel's clip(cur + 0) identity).  Returns (N, 64) rows whose (8,8)
    view is the spatial residual.

    Layout: the row axis rides the VPU LANES ((64, N) transposed form) —
    the previous (N, 8, 8) form used 8 of 128 lanes and cost ~9 ms/GOP
    at Wii scale, ~half the fused path's XLA prologue."""
    N = flat.shape[0]
    xT = flat.T                              # (64, N)
    # --- 8x8: coefficient rows (8r, 8c, N); butterfly over coef cols,
    # transpose-free axis swap, second pass, >>6 (idct8's dataflow)
    c8 = xT.reshape(8, 8, N).at[0, 0].add(32)
    t8 = _btf8_ax0(jnp.swapaxes(c8, 0, 1))   # (8out_c, 8r, N)
    d8 = _btf8_ax0(jnp.swapaxes(t8, 0, 1))   # (8out_r?, 8c, N)
    r8 = jnp.swapaxes(d8, 0, 1) >> 6         # (8r, 8c, N) spatial
    # --- 4x4 quads: [q0|q1|q2|q3] slots -> (4q, 4r, 4c, N); +32 DC
    # rounding applies to EVERY quad's [0,0]
    c4 = xT.reshape(4, 4, 4, N).at[:, 0, 0].add(32)
    tq = _btf4_ax0(jnp.moveaxis(c4, 2, 0))   # (4out_c, 4q, 4r, N)
    dq = _btf4_ax0(jnp.moveaxis(tq, 2, 0))   # (4out_r, 4out_c, 4q, N)
    # (q, out_c, out_r, N): mirror idct4's output orientation (the full
    # path's output block index is [transformed_coef, transformed_row])
    rq4 = jnp.moveaxis(dq, 2, 0).swapaxes(1, 2) >> 6
    # assemble quads: spatial row = (q>>1)*4 + out_c, col = (q&1)*4 + out_r
    rq = rq4.reshape(2, 2, 4, 4, N).transpose(0, 2, 1, 3, 4) \
        .reshape(8, 8, N)
    resid = jnp.where((sizes_flat == 4)[None, None, :], rq, r8)
    return resid.transpose(2, 0, 1).reshape(N, 64)


# ===================================================================== kernel
def _make_kernel(H: int, S: int, G8: int, SP: int, interpret: bool,
                 fused: tuple[int, int] | None = None):
    """Build the sequential-executor kernel.

    ``fused=None``: per-round form — grid (B, nchunk), ring is a VMEM block
    (one stream's 6 slots), decoded frame is the pallas output block.

    ``fused=(B, nchunk_total, stage)``: whole-GOP form — grid
    (B, nchunk_total), one pallas launch decodes the whole GOP (on a
    tunneled chip this collapses F dispatch round trips into one).  The op
    stream is a PACKED chunk sequence per stream: each (CHUNK, 4) chunk's
    header row is [count, frame_idx, first_flag, last_flag] — frames take
    exactly ceil(nops/255) chunks with no per-frame padding (an I-frame
    doesn't inflate every P-frame's footprint), which cuts both upload
    bytes and wasted grid steps ~4x vs a per-frame-bucketed layout.

    Frame->ring-slot assignment is modular: frame f writes slot
    (5 - f) mod 6, reference r of frame f reads slot (5 - f + r) mod 6 —
    no ring roll exists at all.  With ``stage`` (ring fits VMEM): stream
    b's entire 6-slot ring is staged HBM->VMEM once, all frames run
    against the VMEM-resident ring, one write-back at stream end (per-op
    MC against an HBM ring pays ~microsecond DMA latency each — measured
    ~10x slower).  Without ``stage`` (Wii-size frames): MC windows DMA
    straight from the HBM ring.  Finished frames are DMA'd to the (F*B)
    frames output as they complete.
    """
    HMASK = 0xFFFF

    def roll(x, s, axis):
        if "rolls" in _PROBE_SKIP and not isinstance(s, int):
            return x  # probe: cost attribution of DYNAMIC rolls
        if interpret:
            return jnp.roll(x, s, axis)
        # pltpu.roll requires non-negative shifts
        size = x.shape[axis]
        if isinstance(s, int):
            s %= size
            if s == 0:
                return x
        else:
            s = jnp.remainder(s, size)
        return pltpu.roll(x, s, axis)

    def kernel(ops_ref, ring_ref, resid_ref, wt_ref, wl_ref, *rest):
        if fused is not None:
            FB, NCT, STAGE = fused
            PACKED = STAGE == 2      # byte-packed VMEM ring (_ring_mode)
            if PACKED:
                (ring_out_ref, frames_ref,
                 winl, winc, cur, curc, fresl, fresc, plane, pplane,
                 vring, bandst, sems) = rest
            elif STAGE:
                (ring_out_ref, frames_ref,
                 winl, winc, cur, curc, fresl, fresc, plane, vring,
                 bandst, sems) = rest
            else:
                (ring_out_ref, frames_ref,
                 winl, winc, cur, curc, fresl, fresc, plane,
                 bandst, sems) = rest
                vring = None
            out_ref = plane
            bid = pl.program_id(0)
            chid = pl.program_id(1)
            fid = ops_ref[0, 1]
            first = ops_ref[0, 2]
            last = ops_ref[0, 3]
            fm = jax.lax.rem(fid, 6)

            if STAGE:
                ring_src = vring

                @pl.when(chid == 0)
                def _stage_ring():
                    # stream b's whole 6-slot ring: HBM->VMEM, one bulk DMA
                    d = pltpu.make_async_copy(ring_out_ref.at[bid], vring,
                                              sems.at[0])
                    d.start()
                    d.wait()

                def ring_group(ref, g):
                    # slot of reference r for frame f: (5 - f + r) mod 6
                    slot = jax.lax.rem(5 - fm + ref, 6)
                    return slot * G8 + g
            else:
                # ring too big for VMEM (Wii-size frames): MC windows DMA
                # straight from the HBM-resident ring (latency-bound but
                # still far above realtime; ring is flat (B*6*G8, 8, SP))
                ring_src = ring_out_ref

                def ring_group(ref, g):
                    slot = jax.lax.rem(5 - fm + ref, 6)
                    return (bid * 6 + slot) * G8 + g

            @pl.when(first == 1)
            def _zero_fused():
                for g in range(G8):
                    out_ref[g] = jnp.zeros((8, SP), jnp.int32)
        else:
            PACKED = False
            (out_ref, winl, winc, cur, curc, fresl, fresc,
             bandst, sems) = rest
            chid = pl.program_id(1)
            ring_src = ring_ref

            def ring_group(ref, g):
                return ref * G8 + g

            @pl.when(chid == 0)
            def _zero():
                for g in range(G8):
                    out_ref[g] = jnp.zeros((8, SP), jnp.int32)

        # 1-D iota vectors for selection masks: a rectangle select is the
        # broadcast-AND of a (rows, 1) row window and a (1, SP) lane window
        # (ONE full-width op instead of four full-width iota compares)
        rc24 = jax.lax.broadcasted_iota(jnp.int32, (24, 1), 0)
        rc16s = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        lr_sp = jax.lax.broadcasted_iota(jnp.int32, (1, SP), 1)

        def rect(rcol, r0, r1, c0, c1):
            return ((rcol >= r0) & (rcol < r1)) & ((lr_sp >= c0)
                                                   & (lr_sp < c1))
        ii16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        jj16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        jr1 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)   # lane idx
        ic1 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)   # sublane idx
        # one-hot reshape matmuls: (1,256)->(16,16) and (1,64)->(8,8)
        rm1_16 = (jax.lax.broadcasted_iota(jnp.int32, (16, 256), 1) // 16
                  == jax.lax.broadcasted_iota(jnp.int32, (16, 256), 0)
                  ).astype(jnp.bfloat16)
        rm2_16 = (jax.lax.broadcasted_iota(jnp.int32, (256, 16), 0) % 16
                  == jax.lax.broadcasted_iota(jnp.int32, (256, 16), 1)
                  ).astype(jnp.bfloat16)
        rm1_8 = (jax.lax.broadcasted_iota(jnp.int32, (8, 64), 1) // 8
                 == jax.lax.broadcasted_iota(jnp.int32, (8, 64), 0)
                 ).astype(jnp.float32)
        rm2_8 = (jax.lax.broadcasted_iota(jnp.int32, (64, 8), 0) % 8
                 == jax.lax.broadcasted_iota(jnp.int32, (64, 8), 1)
                 ).astype(jnp.float32)
        eye16 = (ii16 == jj16).astype(jnp.float32)
        ones16 = jnp.ones((1, 16), jnp.float32)

        if PACKED:
            # Byte-packed ring domain (4 px per int32 word, little-endian).
            # Words unpack to pixel lanes with two exact halfword-interleave
            # matmul stages (operands <= 65535 -> f32 HIGHEST is exact); the
            # matrices are one-hot selects built from iotas, like the other
            # reshape tricks in this kernel.  The 0..3 sub-word column shift
            # is folded INTO the byte-stage matrices (4 static variants
            # selected elementwise on the traced shift) — Mosaic's dynamic
            # lane rotate requires 128-aligned lane counts, so a narrow
            # (24, 32) dynamic roll would not compile.
            def _ileave(n, s=0):
                i0 = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 0)
                i1 = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * n), 1)
                j = (i1 + s) % (2 * n)
                return ((j == 2 * i0).astype(jnp.float32),
                        (j == 2 * i0 + 1).astype(jnp.float32))

            _il = {n: _ileave(n) for n in (4, 8)}
            _ils = {(n, s): _ileave(n, s)
                    for n in (8, 16) for s in range(4)}

            def _sel4(s, ms):
                r = ms[0]
                for sv in range(1, 4):
                    r = jnp.where(s == sv, ms[sv], r)
                return r

            def _ilv(lo, hi, mlo, mhi):
                return (jnp.dot(lo.astype(jnp.float32), mlo, precision=_HP,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(hi.astype(jnp.float32), mhi,
                                  precision=_HP,
                                  preferred_element_type=jnp.float32)
                        ).astype(jnp.int32)

            def unpack_words(w, n, s):
                """(r, n) int32 packed words -> (r, 4n) pixel bytes,
                left-rotated by the traced sub-word shift s in 0..3."""
                h = _ilv(w & 0xFFFF,
                         jax.lax.shift_right_logical(w, 16), *_il[n])
                mlo = _sel4(s, [_ils[(2 * n, sv)][0] for sv in range(4)])
                mhi = _sel4(s, [_ils[(2 * n, sv)][1] for sv in range(4)])
                return _ilv(h & 0xFF,
                            jax.lax.shift_right_logical(h, 8), mlo, mhi)

        def copy_groups(src_ref, gbase, dst, n):
            dmas = [pltpu.make_async_copy(src_ref.at[gbase + k], dst.at[k],
                                          sems.at[k]) for k in range(n)]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        def write_groups(dst_ref, gbase, src, n):
            dmas = [pltpu.make_async_copy(src.at[k], dst_ref.at[gbase + k],
                                          sems.at[k]) for k in range(n)]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        # ---- RMW band caches -------------------------------------------
        # bandst (SMEM, per-chunk lifetime): [0] = cached out-plane band of
        # the 3-group `cur` window, [1] = cached 2-group `curc` chroma
        # band, [2]/[3] = cached ring-window group keys of winl/winc
        # (read-only), all -1 when invalid.  Decode order is raster, so
        # consecutive ops usually target the same band — a hit skips the
        # whole load/flush DMA pair (measured the largest non-body cost
        # slice, PROBE_R4_KERNEL dma_waits).  The two write-back caches
        # flush each other on range overlap (an op-stream can touch the
        # same chroma rows through either window form), and both flush at
        # chunk end — before the frame commit reads out_ref.
        def _flush_luma():
            @pl.when(bandst[0] >= 0)
            def _():
                write_groups(out_ref, bandst[0], cur, 3)
            bandst[0] = -1

        def _flush_chroma():
            @pl.when(bandst[1] >= 0)
            def _():
                write_groups(out_ref, bandst[1], curc, 2)
            bandst[1] = -1

        def rmw_load(rr):
            """The 24 output rows covering rows rr-1 .. rr+16, through the
            luma band cache."""
            base = rr - 1
            g = base >> 3
            o = base & 7
            if "rmwdma" not in _PROBE_SKIP:
                if not _BAND_CACHE:
                    copy_groups(out_ref, g, cur, 3)
                else:
                    @pl.when(g != bandst[0])
                    def _miss():
                        _flush_luma()
                        gc = bandst[1]

                        @pl.when((gc >= 0) & (gc < g + 3) & (g < gc + 2))
                        def _overlap():
                            _flush_chroma()
                        copy_groups(out_ref, g, cur, 3)
                        bandst[0] = g
            c24 = jnp.concatenate([cur[0], cur[1], cur[2]], axis=0)
            return c24, g, o

        def rmw_commit(new24, g):
            # dirty rows stay in the band cache until a miss or chunk end
            cur[0] = new24[:8]
            cur[1] = new24[8:16]
            cur[2] = new24[16:24]
            if not _BAND_CACHE and "rmwdma" not in _PROBE_SKIP:
                write_groups(out_ref, g, cur, 3)

        def chroma_win(g2):
            """The 16 output rows at group g2, through the chroma band
            cache (fused-MC chroma commits and U+V pair residuals)."""
            if "rmwdma" not in _PROBE_SKIP:
                if not _BAND_CACHE:
                    copy_groups(out_ref, g2, curc, 2)
                else:
                    @pl.when(g2 != bandst[1])
                    def _miss():
                        _flush_chroma()
                        gl = bandst[0]

                        @pl.when((gl >= 0) & (gl < g2 + 2) & (g2 < gl + 3))
                        def _overlap():
                            _flush_luma()
                        copy_groups(out_ref, g2, curc, 2)
                        bandst[1] = g2
            return jnp.concatenate([curc[0], curc[1]], axis=0)

        def chroma_commit(g2):
            if not _BAND_CACHE and "rmwdma" not in _PROBE_SKIP:
                write_groups(out_ref, g2, curc, 2)

        def ring_win_luma(gl):
            """3-group MC window from the ring, cached on the absolute
            ring group (read-only: no flush, reset per chunk)."""
            if "mcdma" not in _PROBE_SKIP:
                if not _BAND_CACHE:
                    copy_groups(ring_src, gl, winl, 3)
                else:
                    @pl.when(gl != bandst[2])
                    def _miss():
                        copy_groups(ring_src, gl, winl, 3)
                        bandst[2] = gl
            return jnp.concatenate([winl[0], winl[1], winl[2]], axis=0)

        def ring_win_chroma(gc):
            if "mcdma" not in _PROBE_SKIP:
                if not _BAND_CACHE:
                    copy_groups(ring_src, gc, winc, 2)
                else:
                    @pl.when(gc != bandst[3])
                    def _miss():
                        copy_groups(ring_src, gc, winc, 2)
                        bandst[3] = gc
            return jnp.concatenate([winc[0], winc[1]], axis=0)

        def place24(blk16, cc, o):
            p = jnp.pad(blk16, ((0, 8), (0, SP - 16)))
            return roll(roll(p, cc, 1), o + 1, 0)

        def halfpel(w, n, dx, dy):
            """CopyBlock's 4 filter cases on an (n+1, n+1) window
            (truncating >>1 per operand, MobiclipDecoder.cs:433-449)."""
            a = w[:n, :n]
            b = w[:n, 1:n + 1]
            cv = w[1:n + 1, :n]
            d = w[1:n + 1, 1:n + 1]
            cs = (dx & 1) | ((dy & 1) << 1)
            return jnp.where(
                cs == 0, a,
                jnp.where(cs == 1, (a >> 1) + (b >> 1),
                          jnp.where(cs == 2, (a >> 1) + (cv >> 1),
                                    (((a >> 1) + (b >> 1)) >> 1)
                                    + (((cv >> 1) + (d >> 1)) >> 1))))

        def reshape_res8(row64f):
            y = rm1_8 * row64f
            return jnp.dot(y, rm2_8, preferred_element_type=jnp.float32,
                           precision=_HP).astype(jnp.int32)

        def body(i, _carry):
            w0 = ops_ref[i, 0]
            w1 = ops_ref[i, 1]
            w2 = ops_ref[i, 2]
            w3 = ops_ref[i, 3]
            typ = w0 & 3
            rr = w1 & HMASK
            cc = w1 >> 16

            # ------------------------------------------------------ MC (1)
            def _mc():
                bw = (w0 >> 16) & 0x1F
                bh = (w0 >> 21) & 0x1F
                ref = (w0 >> 13) & 7
                # fused residual rows (scanner op fusion): an unsplit
                # 16x16 inter MB carries its <=6 residual rows on the MC
                # op — bits 3..8 of w0 are the cbp mask (4 luma quadrant
                # bits + U + V), w3 the first of its consecutive rows
                rmask = (w0 >> 3) & 0x3F
                dx = (w2 << 16) >> 16
                dy = w2 >> 16
                # luma
                yb = rr + (dy >> 1)
                xb = cc + (dx >> 1)
                gl = ring_group(ref, jnp.clip(yb >> 3, 0, G8 - 3))
                w24 = ring_win_luma(gl)
                if PACKED:
                    # word-granular roll, then unpack 8 words (32 px >=
                    # 3+17) with the sub-word remainder folded in
                    wq = roll(roll(w24, -(yb & 7), 0), -(xb >> 2), 1)
                    wnd = unpack_words(wq[:, :8], 8, xb & 3)
                else:
                    wnd = roll(roll(w24, -(yb & 7), 0), -xb, 1)
                px = halfpel(wnd, 16, dx, dy)
                fresl[...] = px

                @pl.when(rmask & 0xF != 0)
                def _fold_luma_res():
                    res16 = jnp.zeros((16, 16), jnp.int32)
                    ri = w3
                    rmax = resid_ref.shape[0] - 1
                    for q in range(4):
                        bit = (rmask >> q) & 1
                        # dead loads (bit==0) may index one row past the
                        # block (a chunk can close with w3+n == CHUNK);
                        # clamp instead of relying on Mosaic OOB clamping
                        row = resid_ref[pl.ds(jnp.minimum(ri, rmax), 1),
                                        :].astype(jnp.float32)
                        r8 = jnp.pad(reshape_res8(row), ((0, 8), (0, 8)))
                        qpad = roll(roll(r8, 8 * (q >> 1), 0),
                                    8 * (q & 1), 1)
                        res16 = res16 + jnp.where(bit == 1, qpad, 0)
                        ri = ri + bit
                    fresl[...] = jnp.clip(fresl[...] + res16, 0, 255)

                px = fresl[...]
                c24, g, o = rmw_load(rr)
                sel = rect(rc24, o + 1, o + 1 + bh, cc, cc + bw)
                rmw_commit(jnp.where(sel, place24(px, cc, o), c24), g)
                # chroma (U | V halves of the packed plane; MVs re-halved)
                if "mchroma" in _PROBE_SKIP:
                    return
                cdx = dx >> 1
                cdy = dy >> 1
                cy = MR + H + ((rr - MR) >> 1)
                ccu = MCOL + ((cc - MCOL) >> 1)
                ccv = ccu + S // 2
                cyb = cy + (cdy >> 1)
                gc = ring_group(ref, jnp.clip(cyb >> 3, 0, G8 - 2))
                w16 = ring_win_chroma(gc)
                wr = roll(w16, -(cyb & 7), 0)
                # ONE dynamic roll serves both chroma halves: after
                # rolling to the U window base, the V window sits at the
                # STATIC +S/2 offset (ccv - ccu = S/2; in the packed word
                # domain (x + S/2) >> 2 == (x >> 2) + S/8 exactly and the
                # sub-word shift x & 3 is identical since S/2 % 4 == 0)
                xu = ccu + (cdx >> 1)
                if PACKED:
                    wq = roll(wr, -(xu >> 2), 1)
                    pxu = halfpel(unpack_words(wq[:, :4], 4, xu & 3), 8,
                                  cdx, cdy)
                    pxv = halfpel(unpack_words(wq[:, S // 8:S // 8 + 4],
                                               4, xu & 3), 8, cdx, cdy)
                else:
                    wru = roll(wr, -xu, 1)
                    pxu = halfpel(wru, 8, cdx, cdy)
                    pxv = halfpel(wru[:, S // 2:], 8, cdx, cdy)
                fresc[0] = pxu
                fresc[1] = pxv

                @pl.when((rmask >> 4) != 0)
                def _fold_chroma_res():
                    nl = w3
                    for pq in range(4):
                        nl = nl + ((rmask >> pq) & 1)
                    bu = (rmask >> 4) & 1
                    bv = (rmask >> 5) & 1
                    rmax = resid_ref.shape[0] - 1
                    rowu = resid_ref[pl.ds(jnp.minimum(nl, rmax), 1),
                                     :].astype(jnp.float32)
                    rowv = resid_ref[pl.ds(jnp.minimum(nl + bu, rmax), 1),
                                     :].astype(jnp.float32)
                    ru = jnp.where(bu == 1, reshape_res8(rowu), 0)
                    rv = jnp.where(bv == 1, reshape_res8(rowv), 0)
                    fresc[0] = jnp.clip(fresc[0] + ru, 0, 255)
                    fresc[1] = jnp.clip(fresc[1] + rv, 0, 255)

                pxu = fresc[0]
                pxv = fresc[1]
                basec = cy - 1
                g2 = basec >> 3
                o2 = basec & 7
                c16 = chroma_win(g2)
                cw = bw >> 1
                ch = bh >> 1
                # U and V tiles placed in ONE pass: V sits at its static
                # +S/2 offset before the shared roll (ccv = ccu + S/2)
                puv = (jnp.pad(pxu, ((0, 8), (0, SP - 8)))
                       + jnp.pad(pxv, ((0, 8), (S // 2, SP - 8 - S // 2))))
                placed = roll(roll(puv, ccu, 1), o2 + 1, 0)
                rowm = (rc16s >= o2 + 1) & (rc16s < o2 + 1 + ch)
                colm = (((lr_sp >= ccu) & (lr_sp < ccu + cw))
                        | ((lr_sp >= ccv) & (lr_sp < ccv + cw)))
                new16 = jnp.where(rowm & colm, placed, c16)
                curc[0] = new16[:8]
                curc[1] = new16[8:16]
                chroma_commit(g2)

            # -------------------------------------------------- resid (2)
            # three region forms (models/plan.py pack_unified): plain
            # 4x4/8x8, masked 16x16 (a split-MB's luma quads in ONE op),
            # and the chroma U+V pair (one shared window + placement)
            def _res():
                sl = (w0 >> 2) & 7
                rmax = resid_ref.shape[0] - 1

                @pl.when(sl < 4)
                def _res_plain():
                    size = 1 << sl
                    c24, g, o = rmw_load(rr)
                    # roll the block's first row to index 0 (offset-0
                    # slices keep Mosaic's pad/concat lowering happy)
                    a = roll(roll(c24, -(o + 1), 0), -cc, 1)
                    cur8 = a[:8, :8]
                    row = resid_ref[pl.ds(w3, 1), :].astype(jnp.float32)
                    res8 = (jnp.zeros((8, 8), jnp.int32)
                            if "rres" in _PROBE_SKIP else reshape_res8(row))
                    out8 = jnp.clip(cur8 + res8, 0, 255)
                    p = jnp.pad(out8, ((0, 16), (0, SP - 8)))
                    placed = roll(roll(p, cc, 1), o + 1, 0)
                    sel = rect(rc24, o + 1, o + 1 + size, cc, cc + size)
                    rmw_commit(jnp.where(sel, placed, c24), g)

                @pl.when(sl == 4)
                def _res16():
                    mask = (w0 >> 5) & 0xF
                    c24, g, o = rmw_load(rr)
                    a = roll(roll(c24, -(o + 1), 0), -cc, 1)
                    cur16 = a[:16, :16]
                    res16 = jnp.zeros((16, 16), jnp.int32)
                    ri = w3
                    for q in range(4):
                        bit = (mask >> q) & 1
                        row = resid_ref[pl.ds(jnp.minimum(ri, rmax), 1),
                                        :].astype(jnp.float32)
                        r8 = jnp.pad(reshape_res8(row), ((0, 8), (0, 8)))
                        qpad = roll(roll(r8, 8 * (q >> 1), 0),
                                    8 * (q & 1), 1)
                        res16 = res16 + jnp.where(bit == 1, qpad, 0)
                        ri = ri + bit
                    # uncoded quads add 0: clip(cur + 0) == cur rewrites
                    # them unchanged, so one full-region commit is exact
                    out16 = jnp.clip(cur16 + res16, 0, 255)
                    p = jnp.pad(out16, ((0, 8), (0, SP - 16)))
                    placed = roll(roll(p, cc, 1), o + 1, 0)
                    sel = rect(rc24, o + 1, o + 1 + 16, cc, cc + 16)
                    rmw_commit(jnp.where(sel, placed, c24), g)

                @pl.when(sl == 5)
                def _res_uv():
                    bu = (w0 >> 5) & 1
                    bv = (w0 >> 6) & 1
                    basec = rr - 1
                    g2 = basec >> 3
                    o2 = basec & 7
                    c16 = chroma_win(g2)
                    # ONE roll serves both chroma halves (V at the static
                    # +S/2 offset, like the fused-MC chroma commit)
                    a = roll(roll(c16, -(o2 + 1), 0), -cc, 1)
                    curu = a[:8, :8]
                    curv = a[:8, S // 2:S // 2 + 8]
                    rowu = resid_ref[pl.ds(jnp.minimum(w3, rmax), 1),
                                     :].astype(jnp.float32)
                    rowv = resid_ref[pl.ds(jnp.minimum(w3 + bu, rmax), 1),
                                     :].astype(jnp.float32)
                    ru = jnp.where(bu == 1, reshape_res8(rowu), 0)
                    rv = jnp.where(bv == 1, reshape_res8(rowv), 0)
                    outu = jnp.clip(curu + ru, 0, 255)
                    outv = jnp.clip(curv + rv, 0, 255)
                    puv = (jnp.pad(outu, ((0, 8), (0, SP - 8)))
                           + jnp.pad(outv,
                                     ((0, 8), (S // 2, SP - 8 - S // 2))))
                    placed = roll(roll(puv, cc, 1), o2 + 1, 0)
                    rowm = (rc16s >= o2 + 1) & (rc16s < o2 + 1 + 8)
                    colm = (((lr_sp >= cc) & (lr_sp < cc + 8))
                            | ((lr_sp >= cc + S // 2)
                               & (lr_sp < cc + S // 2 + 8)))
                    new16 = jnp.where(rowm & colm, placed, c16)
                    curc[0] = new16[:8]
                    curc[1] = new16[8:16]
                    chroma_commit(g2)

            # -------------------------------------------------- intra (3)
            def pred_dir(trow32, l16, mode, npx, logn, avt, avl,
                         wtm=None, wlm=None):
                """Finished directional/DC prediction as a (16,16) block:
                weighted tap-select LUT matmuls (kinds folded into
                weights, uniform floor(x+0.5)) with the DC-with-edge-
                availability override for modes 3/13 (:1920-2022).
                trow32 (1,32): corner @0, t[k] @1+k; l16 (16,1).
                wtm/wlm: pre-loaded LUT slices (callers inside value
                branches hoist the ref reads)."""
                if wtm is None:
                    wtm = wt_ref[mode]
                    wlm = wl_ref[mode]
                l16f = l16.astype(jnp.float32)
                lrow = jnp.dot(ones16, l16f * eye16,
                               preferred_element_type=jnp.float32,
                               precision=_HP)      # (1,16) transpose
                trb = trow32.astype(jnp.bfloat16)
                lrb = lrow.astype(jnp.bfloat16)
                if "iluts" in _PROBE_SKIP:
                    pdir = jnp.zeros((1, 256), jnp.int32)
                else:
                    pdir = (jnp.dot(trb, wtm,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(lrb, wlm,
                                      preferred_element_type=jnp.float32)
                            + 0.5).astype(jnp.int32)
                t16 = trow32[:, 1:17]
                # (measured: cross-lane jnp.sum beats tiny MXU dots here)
                if "idc" in _PROBE_SKIP:
                    sum_t = sum_l = 0x80
                else:
                    sum_t = jnp.sum(jnp.where(jr1 < npx, t16, 0))
                    sum_l = jnp.sum(jnp.where(ic1 < npx, l16, 0))
                dc = jnp.where(
                    (avt == 1) & (avl == 1),
                    (sum_t + sum_l + npx) >> (logn + 1),
                    jnp.where((avt == 1),
                              (sum_t + (npx >> 1)) >> logn,
                              jnp.where((avl == 1),
                                        (sum_l + (npx >> 1)) >> logn,
                                        0x80)))
                is_dc = (mode == 3) | (mode == 13)
                pred256 = jnp.where(is_dc, dc, pdir)
                if "ipred" in _PROBE_SKIP:
                    return jnp.zeros((16, 16), jnp.int32)
                # bf16 exact: pred256 in 0..255, matrices one-hot
                predb = rm1_16 * pred256.astype(jnp.bfloat16)
                return jnp.dot(predb, rm2_16,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)

            def _intra_quad(ssz):
                """Luma quad batch (sl 5: four 4x4s of an 8x8; sl 6: four
                8x8s of a 16x16) applied in q order against a locally
                updated window, so each sub-block's taps read exactly the
                pixels the plain op sequence would (inner neighbors come
                from the just-predicted sub-blocks, outer from the
                plane)."""
                avt = w2 & 1
                avl = (w2 >> 1) & 1
                c24, g, o = rmw_load(rr)
                a = roll(roll(c24, -o, 0), -(cc - 1), 1)
                aq = a[:, :40]   # [0,0] = (rr-1, cc-1); 40 cols cover the
                #                  16x16 group + 16 above-right taps
                rmax = resid_ref.shape[0] - 1
                ri = w3
                off = 10 if ssz == 4 else 0
                rc24i = jax.lax.broadcasted_iota(jnp.int32, (24, 1), 0)
                lr40 = jax.lax.broadcasted_iota(jnp.int32, (1, 40), 1)
                out16 = jnp.zeros((16, 16), jnp.int32)
                for q in range(4):
                    ro, co = ssz * (q >> 1), ssz * (q & 1)
                    nib = (w0 >> (5 + 4 * q)) & 0xF
                    present = nib != 0xF
                    mode = jnp.minimum(nib + off, 19)
                    hasq = (w0 >> (21 + q)) & 1
                    # ref reads hoisted out of the skippable value branch
                    wtm = wt_ref[mode]
                    wlm = wl_ref[mode]
                    row = resid_ref[pl.ds(jnp.minimum(ri, rmax), 1),
                                    :].astype(jnp.float32)
                    avtq = avt if q < 2 else 1
                    avlq = avl if (q & 1) == 0 else 1

                    def _compute(aq, out16, q=q, ro=ro, co=co, mode=mode,
                                 hasq=hasq, wtm=wtm, wlm=wlm, row=row,
                                 avtq=avtq, avlq=avlq):
                        trow32 = aq[ro:ro + 1, co:co + 32]
                        # left column rows rr+ro..: a direct (16,1) slice
                        # when it fits; the bottom 8x8 quads (ro=8) use a
                        # rotated twin whose wrapped last row is the taps
                        # row (l-weight zero here).  Plain offset slices
                        # are fine — only PADS of offset-carrying slices
                        # trip Mosaic's concat lowering.
                        if ro + 17 <= 24:
                            l16 = aq[ro + 1:ro + 17, co:co + 1]
                        else:
                            l16 = roll(aq, -1, 0)[ro:ro + 16, co:co + 1]
                        pred16 = pred_dir(trow32, l16, mode, ssz,
                                          2 if ssz == 4 else 3, avtq,
                                          avlq, wtm, wlm)
                        res16 = jnp.pad(reshape_res8(row),
                                        ((0, 8), (0, 8)))
                        outb = jnp.where(hasq == 1,
                                         jnp.clip(pred16 + res16, 0, 255),
                                         pred16)
                        # paste the finished sub-block into the local
                        # window (static offset-0 pads: no rolls)
                        op24 = jnp.pad(outb[:ssz, :ssz],
                                       ((ro + 1, 23 - ro - ssz),
                                        (co + 1, 39 - co - ssz)))
                        selq = (((rc24i >= ro + 1)
                                 & (rc24i < ro + 1 + ssz))
                                & ((lr40 >= co + 1)
                                   & (lr40 < co + 1 + ssz)))
                        aq = jnp.where(selq, op24, aq)
                        o16 = jnp.pad(outb[:ssz, :ssz],
                                      ((ro, 16 - ro - ssz),
                                       (co, 16 - co - ssz)))
                        q16 = (((ii16 >= ro) & (ii16 < ro + ssz))
                               & ((jj16 >= co) & (jj16 < co + ssz)))
                        return aq, jnp.where(q16, o16, out16)

                    # absent slots skip the whole prediction chain (a
                    # real branch, not a masked select)
                    aq, out16 = jax.lax.cond(present, _compute,
                                             lambda a, o: (a, o),
                                             aq, out16)
                    ri = ri + hasq
                placed = place24(out16, cc, o)
                # exact union of the present quads' rects
                sel = jnp.zeros((24, SP), jnp.int32) > 0
                for q in range(4):
                    ro, co = ssz * (q >> 1), ssz * (q & 1)
                    nibq = (w0 >> (5 + 4 * q)) & 0xF
                    pq = nibq != 0xF
                    sel = sel | (pq
                                 & ((rc24 >= o + 1 + ro)
                                    & (rc24 < o + 1 + ro + ssz))
                                 & ((lr_sp >= cc + co)
                                    & (lr_sp < cc + co + ssz)))
                rmw_commit(jnp.where(sel, placed, c24), g)

            def _intra_uv():
                """Chroma U+V intra pair: both 8x8 predictions of one MB
                (same mode) from one 2-group window, committed in one
                placement pass — the halves' taps are independent (V's
                left column lies in the V half even at the U/V seam)."""
                mode = (w0 >> 5) & 0x1F
                hasu = (w0 >> 10) & 1
                hasv = (w0 >> 11) & 1
                avt = jnp.where(rr != MR + H, 1, 0)
                avl = jnp.where(cc != MCOL, 1, 0)
                basec = rr - 1
                g2 = basec >> 3
                o2 = basec & 7
                c16 = chroma_win(g2)
                a = roll(roll(c16, -o2, 0), -(cc - 1), 1)
                trow_u = a[0:1, 0:32]
                trow_v = a[0:1, S // 2:S // 2 + 32]
                # left columns via the rotated twin (offset-0 16-row
                # slices; the wrapped last row's l-weight is zero)
                av = roll(a, -1, 0)
                lu = av[0:16, 0:1]
                lv = av[0:16, S // 2:S // 2 + 1]
                predu = pred_dir(trow_u, lu, mode, 8, 3, avt, avl)
                predv = pred_dir(trow_v, lv, mode, 8, 3, avt, avl)
                rmax = resid_ref.shape[0] - 1
                rowu = resid_ref[pl.ds(jnp.minimum(w3, rmax), 1),
                                 :].astype(jnp.float32)
                rowv = resid_ref[pl.ds(jnp.minimum(w3 + hasu, rmax), 1),
                                 :].astype(jnp.float32)
                resu = reshape_res8(rowu)
                resv = reshape_res8(rowv)
                outu = jnp.where(hasu == 1,
                                 jnp.clip(predu[:8, :8] + resu, 0, 255),
                                 predu[:8, :8])
                outv = jnp.where(hasv == 1,
                                 jnp.clip(predv[:8, :8] + resv, 0, 255),
                                 predv[:8, :8])
                puv = (jnp.pad(outu, ((0, 8), (0, SP - 8)))
                       + jnp.pad(outv, ((0, 8), (S // 2, SP - 8 - S // 2))))
                placed = roll(roll(puv, cc, 1), o2 + 1, 0)
                rowm = (rc16s >= o2 + 1) & (rc16s < o2 + 1 + 8)
                colm = (((lr_sp >= cc) & (lr_sp < cc + 8))
                        | ((lr_sp >= cc + S // 2)
                           & (lr_sp < cc + S // 2 + 8)))
                new16 = jnp.where(rowm & colm, placed, c16)
                curc[0] = new16[:8]
                curc[1] = new16[8:16]
                chroma_commit(g2)

            def _intra():
                isl = (w0 >> 2) & 7

                @pl.when(isl == 5)
                def _q4():
                    _intra_quad(4)

                @pl.when(isl == 6)
                def _q8():
                    _intra_quad(8)

                @pl.when(isl == 7)
                def _uvp():
                    _intra_uv()

                @pl.when(isl < 5)
                def _intra_single():
                    _intra_one()

            def _intra_one():
                size = 1 << ((w0 >> 2) & 7)
                mode = (w0 >> 5) & 0x1F
                has = (w0 >> 10) & 1
                avt = (w0 >> 11) & 1
                avl = (w0 >> 12) & 1
                grad = w2
                c24, g, o = rmw_load(rr)
                a = (c24 if "itaps" in _PROBE_SKIP
                     else roll(roll(c24, -o, 0), -(cc - 1), 1))
                # row 0 = taps row (rr-1); col 0 = taps col (cc-1)
                trow32 = a[:1, :32]          # corner @0, t[k] @1+k
                t16 = a[:1, 1:17]
                l16 = a[1:17, :1]

                # residual is shared by both prediction branches
                if "ires" in _PROBE_SKIP:
                    res16 = jnp.zeros((16, 16), jnp.int32)
                else:
                    row = resid_ref[pl.ds(w3, 1), :].astype(jnp.float32)
                    res16 = jnp.pad(reshape_res8(row), ((0, 8), (0, 8)))

                def icommit(predv):
                    outb = jnp.where(has == 1,
                                     jnp.clip(predv + res16, 0, 255),
                                     predv)
                    sel = rect(rc24, o + 1, o + 1 + size, cc, cc + size)
                    rmw_commit(jnp.where(sel, place24(outb, cc, o), c24),
                               g)

                # the two prediction families are disjoint per op and the
                # per-op branch is scalar, so each skips the other's whole
                # chain (measured: the plane closed form costs
                # ~250-450 ns/intra op and runs on a minority of ops)
                is_plane = (mode == 2) | (mode == 12)

                @pl.when(jnp.logical_not(is_plane))
                def _directional():
                    npx = jnp.where(size == 4, 4, 8)
                    logn = jnp.where(size == 4, 2, 3)
                    icommit(pred_dir(trow32, l16, mode, npx, logn, avt,
                                     avl))

                @pl.when(is_plane)
                def _plane():
                    # --- plane modes 2/12 + plane16: closed form of the
                    # sub_1167BC/sub_116CCC/sub_117E98 recurrences
                    # (:3017-3327)
                    n16 = size == 16
                    n16i = n16.astype(jnp.int32)
                    tr = jnp.sum(jnp.where(jr1 == size - 1, t16, 0))
                    bl = jnp.sum(jnp.where(ic1 == size - 1, l16, 0))
                    r5 = ((bl + tr + 1) >> 1) + 2 * grad
                    r6 = r5 - bl + n16i
                    r9 = r5 - tr + n16i
                    tsc = jnp.where(size == 4, 4, 8)
                    asc = jnp.where(size == 4, 16, 64)
                    rsh = jnp.where(size == 4, 5, 7)
                    r4i = bl * tsc + (jr1 + 1) * jnp.where(n16, r6 >> 1,
                                                           r6)
                    bi = jnp.where(n16, r4i - t16 * 8 + 1,
                                   r4i - t16 * tsc)
                    bt = jnp.where(n16, bi >> 1, bi)
                    r10 = tr * tsc + (ic1 + 1) * jnp.where(n16, r9 >> 1,
                                                           r9)
                    r7 = jnp.where(n16, r10 - l16 * 8 + 1,
                                   r10 - l16 * tsc)
                    r7t = jnp.where(n16, r7 >> 1, r7)
                    acc = (asc * t16 + (ii16 + 1) * bt
                           + asc * l16 + (jj16 + 1) * r7t + asc)
                    pout = acc >> rsh
                    # u32 word composition byte aliasing (_store_pred_row)
                    gk = []
                    for k in range(4):
                        mk = jnp.where((jj16 & 3) == k, pout, 0)
                        acc_k = mk
                        for sft in range(4):
                            if sft != k:
                                acc_k = acc_k + roll(mk, sft - k, 1)
                        gk.append(acc_k)
                    word = (gk[0] | (gk[1] << 8) | (gk[2] << 16)
                            | (gk[3] << 24))
                    b0 = word & 0xFF
                    b1 = jax.lax.shift_right_logical(word, 8) & 0xFF
                    b2 = jax.lax.shift_right_logical(word, 16) & 0xFF
                    b3 = jax.lax.shift_right_logical(word, 24) & 0xFF
                    lane4 = jj16 & 3
                    plane16 = jnp.where(
                        lane4 == 0, b0,
                        jnp.where(lane4 == 1, b1,
                                  jnp.where(lane4 == 2, b2, b3)))
                    icommit(plane16)

            if "mc" not in _PROBE_SKIP:
                pl.when(typ == 1)(_mc)
            if "resid" not in _PROBE_SKIP:
                pl.when(typ == 2)(_res)
            if "intra" not in _PROBE_SKIP:
                pl.when(typ == 3)(_intra)
            return 0

        if "body" not in _PROBE_SKIP:
            if _BAND_CACHE:
                bandst[0] = -1
                bandst[1] = -1
                bandst[2] = -1
                bandst[3] = -1
            jax.lax.fori_loop(1, 1 + ops_ref[0, 0], body, 0)
            if _BAND_CACHE:
                # chunk-end flush: dirty bands land in out_ref before the
                # frame commit (or the next chunk) reads it
                _flush_luma()
                _flush_chroma()

        if fused is not None and "fcommit" not in _PROBE_SKIP:
            @pl.when(last == 1)
            def _commit():
                # finished frame -> its ring slot (5 - f) mod 6 (row-group
                # DMAs, dynamic leading-dim indexing) and the GOP frames
                # output in HBM (one bulk DMA)
                if STAGE:
                    rbase = (5 - fm) * G8
                    rdst = vring
                else:
                    rbase = (bid * 6 + (5 - fm)) * G8
                    rdst = ring_out_ref
                if PACKED:
                    # pack the whole int32 plane (pixels <= 255) into
                    # 4-px words with TWO bf16 matmuls: pair weights
                    # {1, 256} keep each accumulation <= 65535 (f32-exact
                    # on the MXU), halves combine with a 16-bit shift.
                    # Output lanes are the 128-aligned padded word width
                    # (_ring_spx); pad lanes have all-zero one-hot columns.
                    SPP = -(-(SP // 4) // 128) * 128
                    rI = jax.lax.broadcasted_iota(jnp.int32, (SP, SPP), 0)
                    cI = jax.lax.broadcasted_iota(jnp.int32, (SP, SPP), 1)
                    n01 = (jnp.where(rI == 4 * cI, 1, 0)
                           + jnp.where(rI == 4 * cI + 1, 256, 0)
                           ).astype(jnp.bfloat16)
                    n23 = (jnp.where(rI == 4 * cI + 2, 1, 0)
                           + jnp.where(rI == 4 * cI + 3, 256, 0)
                           ).astype(jnp.bfloat16)
                    p2 = out_ref[...].reshape(G8 * 8, SP
                                              ).astype(jnp.bfloat16)
                    lo = jnp.dot(p2, n01,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)
                    hi = jnp.dot(p2, n23,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.int32)
                    pplane[...] = (lo | (hi << 16)).reshape(G8, 8, SPP)
                    rsrc = pplane
                else:
                    rsrc = out_ref
                dmas = [pltpu.make_async_copy(rsrc.at[g],
                                              rdst.at[rbase + g],
                                              sems.at[g % 3])
                        for g in range(G8)]
                for i, d in enumerate(dmas):
                    d.start()
                    if i % 3 == 2:
                        dmas[i - 2].wait()
                        dmas[i - 1].wait()
                        d.wait()
                for i in range(G8 - G8 % 3, G8):
                    dmas[i].wait()
                dk = pltpu.make_async_copy(out_ref,
                                           frames_ref.at[fid * FB + bid],
                                           sems.at[0])
                dk.start()
                dk.wait()

            if STAGE:
                @pl.when(chid == NCT - 1)
                def _writeback_ring():
                    d = pltpu.make_async_copy(vring, ring_out_ref.at[bid],
                                              sems.at[1])
                    d.start()
                    d.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _build_executor(B: int, H: int, S: int, nops: int, nr: int,
                    interpret: bool):
    _hh, G8, SP = _geom(H, S)
    kernel = _make_kernel(H, S, G8, SP, interpret)
    # NOTE: keep the LUTs as host numpy here — the builder is lru_cached and
    # may first run inside a trace; jnp arrays created there would leak
    # tracers into later traces.
    wt, wl = _lut_tables()

    nchunk = nops // CHUNK
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * G8, 8, SP), jnp.int32),
        grid=(B, nchunk),
        in_specs=[
            pl.BlockSpec((CHUNK, 4),
                         lambda b, ch: (b * nchunk + ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((6 * G8, 8, SP), lambda b, ch: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 64), lambda b, ch: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 32, 256), lambda b, ch: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 16, 256), lambda b, ch: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G8, 8, SP), lambda b, ch: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 8, SP), jnp.int32),   # luma MC window
            pltpu.VMEM((2, 8, SP), jnp.int32),   # chroma MC window
            pltpu.VMEM((3, 8, SP), jnp.int32),   # RMW block
            pltpu.VMEM((2, 8, SP), jnp.int32),   # chroma RMW block
            pltpu.VMEM((16, 16), jnp.int32),     # fused-resid luma px
            pltpu.VMEM((2, 8, 8), jnp.int32),    # fused-resid chroma px
            pltpu.SMEM((4,), jnp.int32),         # band-cache keys
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    def run(ops, ring, resid):
        return call(ops, ring, resid, wt, wl)

    return run


# Whole-GOP packed-chunk-stream buckets: chunks per stream per GOP.
# Coefficient rows are partitioned BY CHUNK (each row is referenced by
# exactly one op, in decode order), so the kernel's resid block is a fixed
# (CHUNK, 64) = 64 KiB regardless of GOP length.
# Post-quad-merge footprints: a DS 24-frame GOP stream is ~104 chunks and
# a Wii 8-frame stream ~219 — the 112/256 steps stop padding those 35-57%
# (each wasted chunk still costs a grid step + SMEM feed).  Each step is a
# one-time kernel compile per geometry (persistently cached).
# 76/136 added in r5: post-batching DS GOPs sit at 73-74 chunks (88 was
# wasting 14 grid steps x 8 streams ~ 1.3 ms/GOP) and Wii at 130 (160
# wasted 30 x 2)
NCT_BUCKETS = (16, 64, 76, 88, 112, 136, 160, 256, 512, 1024)
# Stage the per-stream 6-slot ring into VMEM when it fits the budget
# (everything else in the kernel needs ~4-6 MiB); Wii-size rings exceed it
# and fall back to direct-HBM MC windows.
_VMEM_RING_BUDGET = 8 * 2 ** 20


@functools.lru_cache(maxsize=None)
def _build_gop_executor(F: int, B: int, H: int, S: int, nct: int,
                        interpret: bool):
    """Whole-GOP executor: ONE pallas launch, grid (B, nct) over packed op
    chunks (header row = [count, frame, first, last]).  The ring (all B
    streams x 6 slots) stays in HBM and is updated in place (input/output
    aliased); returns (ring, frames (F*B*G8, 8, SP) int32)."""
    _hh, G8, SP = _geom(H, S)
    stage = _ring_mode(H, S)
    SPX = _ring_spx(H, S)                  # stored-ring lane width
    kernel = _make_kernel(H, S, G8, SP, interpret, fused=(B, nct, stage))
    wt, wl = _lut_tables()
    ring_shape = (B, 6 * G8, 8, SPX) if stage else (B * 6 * G8, 8, SPX)

    scratch = [
        pltpu.VMEM((3, 8, SPX), jnp.int32),       # luma MC window
        pltpu.VMEM((2, 8, SPX), jnp.int32),       # chroma MC window
        pltpu.VMEM((3, 8, SP), jnp.int32),        # RMW block
        pltpu.VMEM((2, 8, SP), jnp.int32),        # chroma RMW block
        pltpu.VMEM((16, 16), jnp.int32),          # fused-resid luma px
        pltpu.VMEM((2, 8, 8), jnp.int32),         # fused-resid chroma px
        pltpu.VMEM((G8, 8, SP), jnp.int32),       # working plane
    ]
    if stage == 2:
        scratch.append(pltpu.VMEM((G8, 8, SPX), jnp.int32))  # packed commit
    if stage:
        scratch.append(pltpu.VMEM((6 * G8, 8, SPX), jnp.int32))  # stream ring
    scratch.append(pltpu.SMEM((4,), jnp.int32))              # band-cache keys
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(ring_shape, jnp.int32),            # ring
            jax.ShapeDtypeStruct((F * B, G8, 8, SP), jnp.int32),    # frames
        ),
        grid=(B, nct),
        in_specs=[
            pl.BlockSpec((CHUNK, 4), lambda b, ch: (b * nct + ch, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),                   # ring
            pl.BlockSpec((CHUNK, 64), lambda b, ch: (b * nct + ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 32, 256), lambda b, ch: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 16, 256), lambda b, ch: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={1: 0},
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def run(ops, ring, resid):
        ring2, frames = call(ops, ring.reshape(ring_shape), resid,
                             wt, wl)
        return ring2.reshape(B, 6 * G8, 8, SPX), frames

    return run


def _op_nrows(w0: int) -> int:
    """Coefficient rows referenced by one op row: plain resid/intra-with-
    coef reference one; a fused MC references popcount of its residual
    mask (w0 bits 3..8); batched residuals (size_log 4 masked-16x16 /
    size_log 5 U+V pair) popcount of their masks (w0 bits 5..)."""
    typ = w0 & 3
    if typ == OP_RESID:
        sl = (w0 >> 2) & 7
        if sl == 4:
            return bin((w0 >> 5) & 0xF).count("1")
        if sl == 5:
            return bin((w0 >> 5) & 0x3).count("1")
        return 1
    if typ == OP_INTRA:
        sl = (w0 >> 2) & 7
        if sl in (5, 6):                       # luma quad batch
            return bin((w0 >> 21) & 0xF).count("1")
        if sl == 7:                            # chroma U+V pair
            return bin((w0 >> 10) & 0x3).count("1")
        return (w0 >> 10) & 1
    if typ == OP_MC:
        return bin((w0 >> 3) & 0x3F).count("1")
    return 0


def _frame_chunk_spans(rows: np.ndarray) -> list[tuple[int, int]]:
    """Greedy chunk partition of one frame's op rows: a chunk holds at most
    CHUNK-1 op rows AND at most CHUNK coefficient rows (fused MC ops carry
    up to 6 rows each, so the coefficient block can fill first).  This is
    the executable spec of the C++ scanner's chunk-close rule
    (native/scanner.cpp) — both must split identically."""
    n = rows.shape[0]
    spans = []
    i = 0
    cap = CHUNK - 1
    while i < n or not spans:
        j = i
        crow = 0
        while j < n and (j - i) < cap:
            nr = _op_nrows(int(rows[j, 0]))
            if crow + nr > CHUNK:
                break
            crow += nr
            j += 1
        spans.append((i, j))
        i = j
        if i >= n:
            break
    return spans


def _pack_gop_chunks(plans_fb: list[list[dict]], B: int) -> tuple:
    """Pack per-frame scan plans into the packed-chunk-stream GOP layout.

    plans_fb[f][b] = scan_unified dict.  Returns (ops (B, NCT, CHUNK, 4),
    coefs (B, NCT, CHUNK, 64), sizes (B, NCT, CHUNK)).  Chunk headers
    carry [count, frame_idx, first_flag, last_flag]; chunk spans follow
    _frame_chunk_spans.  Coefficient rows are re-partitioned per chunk
    (w3 references become chunk-local), so the device-side residual block
    stays a fixed (CHUNK, 64) slice."""
    F = len(plans_fb)
    spans_fb = [[_frame_chunk_spans(
        plans_fb[f][b]["ops"][1:1 + int(plans_fb[f][b]["ops"][0, 0])])
        for f in range(F)] for b in range(B)]
    nct = _bucket(max(sum(len(s) for s in spans_fb[b]) for b in range(B)),
                  NCT_BUCKETS)
    ops = np.zeros((B, nct, CHUNK, 4), np.int32)
    coefs = np.zeros((B, nct, CHUNK, 64), np.int32)
    sizes = np.full((B, nct, CHUNK), 8, np.int32)
    for b in range(B):
        k = 0
        for f in range(F):
            p = plans_fb[f][b]
            n = int(p["ops"][0, 0])
            rows = p["ops"][1:1 + n]
            spans = spans_fb[b][f]
            for c, (i0, i1) in enumerate(spans):
                m = i1 - i0
                dst = ops[b, k, 1:1 + m]
                dst[:] = rows[i0:i1]
                crow = 0
                for r in range(m):
                    nr = _op_nrows(int(dst[r, 0]))
                    if nr:
                        w3 = int(dst[r, 3])
                        coefs[b, k, crow:crow + nr] = \
                            p["coefs"][w3:w3 + nr]
                        sizes[b, k, crow:crow + nr] = \
                            p["sizes"][w3:w3 + nr]
                        dst[r, 3] = crow
                        crow += nr
                    else:
                        dst[r, 3] = 0
                ops[b, k, 0] = (m, f,
                                1 if c == 0 else 0,
                                1 if c == len(spans) - 1 else 0)
                k += 1
    return ops, coefs, sizes


@functools.partial(jax.jit, static_argnames=("F", "H", "S", "interpret"),
                   donate_argnums=(0,))
def _decode_gop_fused(ring, ops, coefs, sizes, F: int, H: int, S: int,
                      interpret: bool):
    """Whole-GOP decode as ONE kernel launch (vs _decode_gop's lax.scan of
    launches, which the remote-execution tunnel runs pathologically slowly).

    ops: (B, NCT, CHUNK, 4) packed chunk stream;
    coefs: (B, NCT, CHUNK, 64) chunk-partitioned coefficient rows;
    sizes: (B, NCT, CHUNK); ring: (B, 6, G8, 8, SP).
    Returns (ring, yuv (F, B, HH, S) uint8).
    """
    B = ops.shape[0]
    nct = ops.shape[1]
    HH, G8, SP = _geom(H, S)
    SPX = _ring_spx(H, S)     # ring lane width (packed mode stores SP/4)
    flat = coefs.reshape(B * nct * CHUNK, 64)
    resid = _residuals(flat, sizes.reshape(-1))
    run = _build_gop_executor(F, B, H, S, nct, interpret)
    ring2, frames = run(ops.reshape(B * nct * CHUNK, 4),
                        ring.reshape(B, 6 * G8, 8, SPX), resid)
    # renormalize the modular ring back to slot 0 = newest (frame F-1 wrote
    # slot (5 - (F-1)) mod 6)
    w_last = (5 - (F - 1)) % 6
    ring2 = jnp.roll(ring2.reshape(B, 6, G8, 8, SPX), -w_last, axis=1)
    yuv = frames.reshape(F, B, G8 * 8, SP)[:, :, MR:MR + HH, MCOL:MCOL + S]
    return ring2, yuv.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _crop_gop_yuv(yuv, H: int, W: int, S: int):
    """Device-side crop of a fused result (..., H+H/2, S) to (..., H+H/2, W):
    Y columns [0, W); the packed UV rows keep U from [0, W/2) and V from
    [S/2, S/2+W/2), repacked adjacent.  Saves 22%/37.5% of the download at
    400x240/640x480 over a fetch-bound link (VERDICT r3 weak #5)."""
    y = yuv[..., :H, :W]
    u = yuv[..., H:, :W // 2]
    v = yuv[..., H:, S // 2:S // 2 + W // 2]
    return jnp.concatenate([y, jnp.concatenate([u, v], axis=-1)], axis=-2)


def _gop_part(r: dict) -> dict:
    """Normalize a NativePlanner.scan_gop_packed result into a sliceable
    'part': a frame range over the scan's packed chunk stream.  Parts are
    cheap views into the scan buffers; slicing at frame boundaries (see
    _split_gop_part) re-bases frame ids and coefficient indices at assembly
    time, so oversized GOPs split WITHOUT rescanning."""
    return dict(ops3=r["ops3"], szw=r["szw"],
                idx=r["idx"][:r["nnz"]], val=r["val"][:r["nnz"]],
                fnct=r["frame_nct"], fnnz=r["frame_nnz"],
                c0=0, c1=r["nct"], fbase=0)


def _split_gop_part(q: dict, f0: int, f1: int) -> dict:
    """Sub-part covering the part's local frames [f0, f1)."""
    cn = np.concatenate([[0], np.cumsum(q["fnct"])]).astype(np.int64)
    zn = np.concatenate([[0], np.cumsum(q["fnnz"])]).astype(np.int64)
    return dict(ops3=q["ops3"], szw=q["szw"],
                idx=q["idx"][zn[f0]:zn[f1]], val=q["val"][zn[f0]:zn[f1]],
                fnct=q["fnct"][f0:f1], fnnz=q["fnnz"][f0:f1],
                c0=q["c0"] + int(cn[f0]), c1=q["c0"] + int(cn[f1]),
                fbase=q["fbase"] + f0)


def _part_dense_arrays(parts: list[dict]) -> tuple:
    """Host-side dense reconstruction of per-stream parts: the fallback
    when a SINGLE frame's sparse footprint exceeds the nnz bucket ladder
    (reachable for maximal-density Wii frames: 1200 MBs x 384 coefs >
    262144) — mirrors the plan path's dense upload so such frames decode
    instead of raising.  Returns (ops4 (B,nct,CHUNK,4), coefs, sizes)."""
    B = len(parts)
    nct = _bucket(max(q["c1"] - q["c0"] for q in parts), NCT_BUCKETS)
    ops = np.zeros((B, nct, CHUNK, 4), np.int32)
    coefs = np.zeros((B, nct * CHUNK, 64), np.int32)
    sizes = np.full((B, nct * CHUNK), 8, np.int32)
    for b, q in enumerate(parts):
        c0, c1 = q["c0"], q["c1"]
        n = c1 - c0
        p3 = np.ascontiguousarray(q["ops3"][c0:c1]).view(np.uint32)
        a, bw = p3[..., 0], p3[..., 1]
        w0 = a & np.uint32(0x03FFFFFF)
        w3 = (((a >> np.uint32(26)) & np.uint32(0x3F)) << np.uint32(8)) \
            | ((bw >> np.uint32(24)) & np.uint32(0xFF))
        w1 = (bw & np.uint32(0xFFF)) | (((bw >> np.uint32(12))
                                         & np.uint32(0xFFF))
                                        << np.uint32(16))
        o4 = np.stack([w0, w1, p3[..., 2], w3],
                      axis=-1).view(np.int32)
        ops[b, :n] = o4
        if q["fbase"]:
            ops[b, :n, 0, 1] -= q["fbase"]
        idx = q["idx"] - c0 * CHUNK * 64
        coefs[b].reshape(-1)[idx] = q["val"].astype(np.int32)
        spc = CHUNK // 32
        bits = np.unpackbits(
            q["szw"][c0 * spc:c1 * spc].view(np.uint8), bitorder="little")
        sizes[b, :n * CHUNK][bits[:n * CHUNK] == 1] = 4
    return ops, coefs.reshape(B, nct, CHUNK, 64), sizes


def _assemble_gop_parts(parts: list[dict]) -> tuple:
    """Assemble B per-stream parts into the _decode_gop_fused_sblob blob
    (identical layout to _pack_gop_chunks + _pack_gop_blob_sparse, which
    these parts replace on the native hot path).  Caller guarantees every
    part fits the bucket ladders.  Returns (blob, nct, nnzb)."""
    B = len(parts)
    nct = _bucket(max(q["c1"] - q["c0"] for q in parts), NCT_BUCKETS)
    nnzb = _bucket(max(max(q["idx"].size for q in parts), 2),
                   NNZ_PS_BUCKETS)
    rows = nct * CHUNK
    spc = CHUNK // 32                      # size-bit words per chunk
    ops3 = np.zeros((B, nct, CHUNK, 3), np.int32)
    swords = np.zeros((B, nct * spc), np.int32)
    idx = np.full((B, nnzb), rows * 64, np.int32)
    val = np.zeros((B, nnzb), np.int16)
    for b, q in enumerate(parts):
        c0, c1 = q["c0"], q["c1"]
        n = c1 - c0
        ops3[b, :n] = q["ops3"][c0:c1]
        if q["fbase"]:
            # chunk header word B carries the frame id in its low 12 bits
            ops3[b, :n, 0, 1] -= q["fbase"]
        swords[b, :n * spc] = q["szw"][c0 * spc:c1 * spc]
        k = q["idx"].size
        idx[b, :k] = q["idx"]
        if c0:
            idx[b, :k] -= c0 * CHUNK * 64
        val[b, :k] = q["val"]
    val_words = val.reshape(-1).astype('<i2').view('<i4').astype(np.int32)
    blob = np.concatenate([ops3.reshape(-1), swords.reshape(-1),
                           idx.reshape(-1), val_words])
    return blob, nct, nnzb


def _pack_gop_blob_sparse(ops, coefs, sizes):
    """Host-side sparse pack for the fused whole-GOP path, or None when
    the round must take the dense fallback.

    Unlike _pack_blob_sparse, coefficient indices are PER STREAM (local to
    stream b's (nct*CHUNK, 64) rows, padded to a common per-stream bucket)
    so the device-side reconstruction is B independent scatters into
    ~2.6 MB targets that stay VMEM-resident — a single whole-GOP scatter
    into the 84 MB dense tensor degenerates to one HBM read-modify-write
    per index (measured ~145 ns each vs ~12 ns on a small target).

    Blob (int32): [ops3 | size_bits | idx (B, nnzb) | val16 (B, nnzb/2)].
    """
    B = sizes.shape[0]
    rows = coefs.reshape(B, -1, 64).shape[1]
    if rows * 64 > (1 << 31) - 1:
        return None
    per = []
    for b in range(B):
        fb = coefs[b].reshape(-1)
        idx = np.flatnonzero(fb)
        val = fb[idx]
        if val.size and (int(val.min()) < -32768 or int(val.max()) > 32767):
            return None
        per.append((idx, val))
    nnz_max = max(max((int(i.size) for i, _ in per), default=0), 2)
    if nnz_max > NNZ_PS_BUCKETS[-1]:
        return None
    ops3 = _pack_ops3(ops)
    if ops3 is None:
        return None
    nnzb = _bucket(nnz_max, NNZ_PS_BUCKETS)
    idx_a = np.full((B, nnzb), rows * 64, np.int32)
    val_a = np.zeros((B, nnzb), np.int16)
    for b, (idx, val) in enumerate(per):
        idx_a[b, :idx.size] = idx
        val_a[b, :idx.size] = val.astype(np.int16)
    nsb = (B * rows + 31) // 32
    sbits = np.zeros(nsb * 32, np.uint32)
    sbits[:B * rows] = (sizes.reshape(-1) == 4)
    swords = (sbits.reshape(-1, 32)
              << np.arange(32, dtype=np.uint32)).sum(
                  axis=1, dtype=np.uint32).view(np.int32)
    val_words = val_a.reshape(-1).astype('<i2').view('<i4').astype(np.int32)
    blob = np.concatenate([ops3.ravel(), swords, idx_a.ravel(), val_words])
    return blob, nnzb


@functools.partial(jax.jit,
                   static_argnames=("F", "nct", "nnzb", "H", "S",
                                    "interpret"),
                   donate_argnums=(0,))
def _decode_gop_fused_sblob(ring, blob, F: int, nct: int,
                            nnzb: int, H: int, S: int, interpret: bool):
    """Sparse-upload whole-GOP round: ONE host->device blob, ONE kernel
    launch, ONE download (see _pack_gop_blob_sparse)."""
    B = ring.shape[0]
    nrows = B * nct * CHUNK
    rows = nct * CHUNK
    a = nrows * 3
    nsb = (nrows + 31) // 32
    b = a + nsb
    c = b + B * nnzb
    ops = _unpack_ops3(blob[:a].reshape(B, nct, CHUNK, 3))
    sbits = blob[a:b]
    idx = blob[b:c].reshape(B, nnzb)
    v32 = blob[c:c + B * nnzb // 2].reshape(B, nnzb // 2)
    lo = jax.lax.shift_right_arithmetic(v32 << 16, 16)
    hi = jax.lax.shift_right_arithmetic(v32, 16)
    val = jnp.stack([lo, hi], axis=2).reshape(B, nnzb)
    # one scatter per stream; indices are unique by construction (one
    # entry per nonzero of the dense coefs) and pads sit out of range, so
    # scatter-SET applies — measured 16% cheaper than scatter-add on the
    # Wii workload (no read-modify-write of the target)
    denses = [
        jnp.zeros(rows * 64, jnp.int32).at[idx[bb]].set(
            val[bb], mode="drop", indices_are_sorted=True,
            unique_indices=True)
        for bb in range(B)
    ]
    coefs = jnp.stack(denses).reshape(B, nct, CHUNK, 64)
    word = sbits[jnp.arange(nrows) // 32]
    bit = (word >> (jnp.arange(nrows) % 32)) & 1
    sizes = jnp.where(bit == 1, 4, 8).astype(jnp.int32).reshape(B, nct,
                                                                CHUNK)
    return _decode_gop_fused(ring, ops, coefs, sizes, F, H, S, interpret)


def _decode_round_impl(ring, ops, coefs, sizes, H: int, S: int,
                       interpret: bool):
    """One frame round for a (B, ...) stream batch.

    ring: (B, 6, G8, 8, SP) int32; ops: (B, NOPS, 4) int32 (row 0 = header);
    coefs: (B, NR, 64) int32 dequantized DCT coefficients;
    sizes: (B, NR) int32 in {4, 8}.
    Returns (new_ring, yuv (B, HH, S) uint8).
    """
    B = ops.shape[0]
    nops = ops.shape[1] * ops.shape[2]   # (B, NCHUNK, CHUNK, 4)
    nr = coefs.shape[1]
    HH, G8, SP = _geom(H, S)
    # residual pre-pass: full-support IDCT, quad-merged 4x4 rows
    resid = _residuals(coefs.reshape(B * nr, 64), sizes.reshape(-1))

    ringn = jnp.roll(ring, 1, axis=1)
    run = _build_executor(B, H, S, nops, nr, interpret)
    out = run(ops.reshape(B * nops, 4),
              ringn.reshape(B * 6 * G8, 8, SP), resid)
    ringn = ringn.at[:, 0].set(out.reshape(B, G8, 8, SP))
    yuv = out.reshape(B, G8 * 8, SP)[:, MR:MR + HH, MCOL:MCOL + S]
    return ringn, yuv.astype(jnp.uint8)


_decode_round = functools.partial(jax.jit, static_argnames=("H", "S",
                                                            "interpret"),
                                  donate_argnums=(0,))(_decode_round_impl)


@functools.lru_cache(maxsize=None)
def _sharded_round(mesh, H: int, S: int, interpret: bool):
    """shard_map'd frame round: the stream batch splits over the mesh's
    'data' axis (corpus data parallelism); each device runs the full VMEM
    kernel on its local shard.  Streams are independent, so no collectives
    cross ICI — scaling is embarrassingly parallel by construction."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(ring, ops, coefs, sizes):
        return _decode_round_impl(ring, ops, coefs, sizes, H, S, interpret)

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no vma
    # annotation, which newer JAX rejects under the default check.  This
    # disables vma checking for the whole wrapped fn, not just pallas_call —
    # revisit once pallas outputs carry vma so spec mistakes are caught
    # again; today every in/out spec is plain P('data') so there is nothing
    # the check could catch here.
    sm = shard_map(fn, mesh=mesh,
                   in_specs=(P("data"), P("data"), P("data"), P("data")),
                   out_specs=(P("data"), P("data")), check_vma=False)
    return jax.jit(sm, donate_argnums=(0,))


def decode_round_sharded(mesh, ring, ops, coefs, sizes, H: int, S: int,
                         interpret: bool):
    """Multi-device frame round (B must be divisible by the data-axis
    size).  Returns (ring, yuv) like _decode_round."""
    return _sharded_round(mesh, H, S, interpret)(ring, ops, coefs, sizes)


@functools.lru_cache(maxsize=None)
def _sharded_gop_fused(mesh, F: int, H: int, S: int, interpret: bool):
    """shard_map'd fused whole-GOP decode — the PRODUCTION dispatch shape
    (one kernel launch per GOP, modular ring slots) split over the mesh's
    'data' axis.  Every argument and result carries the stream batch as a
    leading/inner axis, so the specs are plain data-parallel splits and no
    collectives cross ICI (streams are independent)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(ring, ops, coefs, sizes):
        return _decode_gop_fused(ring, ops, coefs, sizes, F, H, S, interpret)

    # check_vma=False: see _sharded_round
    sm = shard_map(fn, mesh=mesh,
                   in_specs=(P("data"), P("data"), P("data"), P("data")),
                   out_specs=(P("data"), P(None, "data")), check_vma=False)
    return jax.jit(sm, donate_argnums=(0,))


def decode_gop_fused_sharded(mesh, ring, ops, coefs, sizes, F: int, H: int,
                             S: int, interpret: bool):
    """Multi-device fused GOP (B divisible by the data-axis size).
    Returns (ring, yuv (F, B, HH, S)) like _decode_gop_fused."""
    return _sharded_gop_fused(mesh, F, H, S, interpret)(ring, ops, coefs,
                                                        sizes)


# Sparse-upload buckets: nonzero dequantized coefficients per frame round
# (whole stream batch).  Measured ~17k on the bench workload; the dense
# (B, NR, 64) int32 tensor they reconstruct is ~2.1 MB vs ~150 KB sparse —
# and the host->device upload is the dominant cost of a round on a
# tunneled chip (~125 MB/s measured), so this is the headline lever.
NNZ_BUCKETS = (8192, 24576, 98304, 393216, 786432, 1572864)
# Per-STREAM nnz buckets for the fused whole-GOP path (see
# _pack_gop_blob_sparse): one scatter per stream into an ~2.6 MB target
# that XLA keeps VMEM-resident — measured ~12 ns/index vs ~145 ns/index
# for a single scatter into the 84 MB whole-GOP dense tensor (each index
# becomes an HBM RMW once the target exceeds VMEM).
NNZ_PS_BUCKETS = (16384, 65536, 131072, 262144)


def _pack_ops3(ops: np.ndarray):
    """Pack (..., 4) int32 op rows into (..., 3) for upload, or None when a
    field exceeds its packed width (caller falls back to the 4-word form).

    Op rows (models/plan.py pack_unified) are [w0, w1=rr|cc<<16, w2, w3]
    with w0 using bits 0..25, rr/cc < 4096 (row/col inside the padded
    plane; Wii stride 1024 + margins < 1216), and w3 a coefficient-row
    index < 2^14 (NR_BUCKETS max 12288; chunk-local fused indices < 256).
    Packed: A = w0 | (w3>>8)<<26;  B = rr | cc<<12 | (w3&0xFF)<<24;  C = w2.
    Chunk header rows [count, frame, first, last] satisfy the same bounds
    (count < 2^26, frame < 4096, last < 2^14) so they round-trip too.
    w2 (MV pair / plane gradient) keeps its full 32 bits.
    """
    u = np.ascontiguousarray(ops).view(np.uint32)
    w0, w1, w3 = u[..., 0], u[..., 1], u[..., 3]
    rr = w1 & np.uint32(0xFFFF)
    cc = w1 >> np.uint32(16)
    # negative fields view as huge unsigned values, so the max-checks also
    # reject them
    if int(w0.max(initial=0)) >= 1 << 26:
        return None
    if int(rr.max(initial=0)) >= 1 << 12 or int(cc.max(initial=0)) >= 1 << 12:
        return None
    if int(w3.max(initial=0)) >= 1 << 14:
        return None
    packed = np.empty(ops.shape[:-1] + (3,), np.uint32)
    packed[..., 0] = w0 | (w3 >> np.uint32(8)) << np.uint32(26)
    packed[..., 1] = (rr | cc << np.uint32(12)
                      | (w3 & np.uint32(0xFF)) << np.uint32(24))
    packed[..., 2] = u[..., 2]
    return packed.view(np.int32)


def _unpack_ops3(p3):
    """Device-side inverse of _pack_ops3: (..., 3) -> (..., 4) int32."""
    a = p3[..., 0]
    b = p3[..., 1]
    w0 = a & 0x03FFFFFF
    w3 = ((jax.lax.shift_right_logical(a, 26) & 0x3F) << 8) \
        | (jax.lax.shift_right_logical(b, 24) & 0xFF)
    rr = b & 0xFFF
    cc = jax.lax.shift_right_logical(b, 12) & 0xFFF
    w1 = rr | (cc << 16)
    return jnp.stack([w0, w1, p3[..., 2], w3], axis=-1)


def _unpack_sparse(ring, blob, nchunk: int, nr: int, nnzb: int):
    """Device-side blob split + scatter back to the dense coef tensor.

    Blob layout (int32): [ops3 | size_bits | idx | val16 pairs].  ``ops3``
    is the 3-word packed op stream (_pack_ops3, widened back to 4 words
    here — 25% off the dominant upload term).  ``idx`` is the flat index
    into (B*NR*64); ``val16`` holds two little-endian int16 levels per
    word.  Real indices are ascending and unique (flatnonzero order) —
    declared to XLA so the scatter vectorizes; padding entries point one
    past the end and are dropped.
    """
    B = ring.shape[0]
    a = B * nchunk * CHUNK * 3
    nsb = (B * nr + 31) // 32
    b = a + nsb
    c = b + nnzb
    ops = _unpack_ops3(blob[:a].reshape(B, nchunk, CHUNK, 3))
    sbits = blob[a:b]
    idx = blob[b:c]
    v32 = blob[c:c + nnzb // 2]
    lo = jax.lax.shift_right_arithmetic(v32 << 16, 16)
    hi = jax.lax.shift_right_arithmetic(v32, 16)
    val = jnp.stack([lo, hi], axis=1).reshape(-1)
    dense = jnp.zeros(B * nr * 64, jnp.int32).at[idx].set(
        val, mode="drop", indices_are_sorted=True, unique_indices=True)
    coefs = dense.reshape(B, nr, 64)
    word = sbits[jnp.arange(B * nr) // 32]
    bit = (word >> (jnp.arange(B * nr) % 32)) & 1
    sizes = jnp.where(bit == 1, 4, 8).astype(jnp.int32).reshape(B, nr)
    return ops, coefs, sizes


def _pack_blob_sparse(ops, coefs, sizes):
    """Host-side sparse pack; returns (blob, nnz_bucket) or None when the
    round doesn't fit the sparse format (huge values / nnz overflow) and
    must take the dense path."""
    B, nr = sizes.shape
    flat = coefs.reshape(-1)
    idx = np.flatnonzero(flat)
    if idx.size > NNZ_BUCKETS[-1] or (B * nr * 64) > (1 << 31) - 1:
        return None
    val = flat[idx]
    # int16-range guard; min/max compares (not np.abs, which returns
    # INT32_MIN unchanged and would wrongly pass it through).
    if val.size and (int(val.min()) < -32768 or int(val.max()) > 32767):
        return None
    nnzb = _bucket(max(int(idx.size), 2), NNZ_BUCKETS)
    ops3 = _pack_ops3(ops)
    if ops3 is None:
        return None
    # padding indices point one past the end: dropped by the device-side
    # scatter (mode="drop"), keeping the real index list sorted+unique
    idx_a = np.full(nnzb, B * nr * 64, np.int32)
    idx_a[:idx.size] = idx
    val_a = np.zeros(nnzb, np.int16)
    val_a[:val.size] = val.astype(np.int16)
    nsb = (B * nr + 31) // 32
    sbits = np.zeros(nsb * 32, np.uint32)
    sbits[:B * nr] = (sizes.reshape(-1) == 4)
    swords = (sbits.reshape(-1, 32)
              << np.arange(32, dtype=np.uint32)).sum(
                  axis=1, dtype=np.uint32).view(np.int32)
    # Explicit little-endian pack so the device-side low/high int16 split in
    # _unpack_sparse holds regardless of host byte order.
    val_words = val_a.astype('<i2').view('<i4').astype(np.int32)
    blob = np.concatenate([ops3.ravel(), swords, idx_a, val_words])
    return blob, nnzb


@functools.partial(jax.jit,
                   static_argnames=("nchunk", "nr", "nnzb", "H", "S",
                                    "interpret"),
                   donate_argnums=(0,))
def _decode_round_sblob(ring, blob, nchunk: int, nr: int, nnzb: int,
                        H: int, S: int, interpret: bool):
    """Sparse-upload frame round (see _pack_blob_sparse)."""
    ops, coefs, sizes = _unpack_sparse(ring, blob, nchunk, nr, nnzb)
    return _decode_round(ring, ops, coefs, sizes, H, S, interpret)


@functools.partial(jax.jit,
                   static_argnames=("nchunk", "nr", "nnzb", "H", "S",
                                    "interpret"),
                   donate_argnums=(0, 1))
def _decode_round_acc_sparse(ring, acc, blob, f, nchunk: int, nr: int,
                             nnzb: int, H: int, S: int, interpret: bool):
    """Sparse-upload round accumulating into GOP row ``f`` (one download
    per GOP, like _decode_round_acc)."""
    ops, coefs, sizes = _unpack_sparse(ring, blob, nchunk, nr, nnzb)
    ring, yuv = _decode_round(ring, ops, coefs, sizes, H, S, interpret)
    return ring, jax.lax.dynamic_update_index_in_dim(acc, yuv, f, 0)


@functools.partial(jax.jit,
                   static_argnames=("nchunk", "nr", "H", "S", "interpret"),
                   donate_argnums=(0,))
def _decode_round_blob(ring, blob, nchunk: int, nr: int, H: int, S: int,
                       interpret: bool):
    """Single-upload frame round: ops+coefs+sizes ship as ONE int32 blob
    (each device_put is a host round trip on a tunneled chip — measured ~1 ms
    apiece — so three arguments cost more than the decode itself)."""
    B = ring.shape[0]
    a = B * nchunk * CHUNK * 4
    b = a + B * nr * 64
    ops = blob[:a].reshape(B, nchunk, CHUNK, 4)
    coefs = blob[a:b].reshape(B, nr, 64)
    sizes = blob[b:b + B * nr].reshape(B, nr)
    return _decode_round(ring, ops, coefs, sizes, H, S, interpret)


def _pack_blob(ops, coefs, sizes) -> np.ndarray:
    return np.concatenate([ops.ravel(), coefs.ravel(), sizes.ravel()])


@functools.partial(jax.jit,
                   static_argnames=("nchunk", "nr", "H", "S", "interpret"),
                   donate_argnums=(0, 1))
def _decode_round_acc(ring, acc, blob, f, nchunk: int, nr: int, H: int,
                      S: int, interpret: bool):
    """Frame round that also writes its output into row ``f`` of a
    device-resident (F, B, HH, S) accumulator, so a whole GOP needs only ONE
    device->host download at the end (a fetch costs a fixed ~0.1 s through
    the remote tunnel; on local hosts it simply batches PCIe traffic)."""
    B = ring.shape[0]
    a = B * nchunk * CHUNK * 4
    b = a + B * nr * 64
    ops = blob[:a].reshape(B, nchunk, CHUNK, 4)
    coefs = blob[a:b].reshape(B, nr, 64)
    sizes = blob[b:b + B * nr].reshape(B, nr)
    ring, yuv = _decode_round(ring, ops, coefs, sizes, H, S, interpret)
    return ring, jax.lax.dynamic_update_index_in_dim(acc, yuv, f, 0)


@functools.partial(jax.jit, static_argnames=("H", "S", "interpret"),
                   donate_argnums=(0,))
def _decode_gop(ring, ops, coefs, sizes, H: int, S: int, interpret: bool):
    """Whole-GOP decode in ONE dispatch: lax.scan over frame rounds with the
    reference ring as carry.  Collapses F host->device round trips into one
    upload + one download — the dominant cost on a tunneled chip; on a local
    host it amortizes dispatch overhead the same way.

    ops: (F, B, NCHUNK, CHUNK, 4); coefs: (F, B, NR, 64); sizes: (F, B, NR).
    Returns (ring, yuv (F, B, HH, S) uint8).
    """
    F, B = ops.shape[0], ops.shape[1]
    nops = ops.shape[2] * ops.shape[3]
    nr = coefs.shape[2]
    HH, G8, SP = _geom(H, S)
    run = _build_executor(B, H, S, nops, nr, interpret)

    def step(ring, xs):
        fops, fcoefs, fsizes = xs
        resid = _residuals(fcoefs.reshape(B * nr, 64), fsizes.reshape(-1))
        ringn = jnp.roll(ring, 1, axis=1)
        out = run(fops.reshape(B * nops, 4),
                  ringn.reshape(B * 6 * G8, 8, SP), resid)
        ringn = ringn.at[:, 0].set(out.reshape(B, G8, 8, SP))
        yuv = out.reshape(B, G8 * 8, SP)[:, MR:MR + HH, MCOL:MCOL + S]
        return ringn, yuv.astype(jnp.uint8)

    return jax.lax.scan(step, ring, (ops, coefs, sizes))


# ==================================================================== driver
class VmemBatchDecoder:
    """Decodes B independent streams in lockstep through the VMEM engine."""

    def __init__(self, width: int, height: int, version, batch: int = 1,
                 interpret: bool | None = None, native: bool | None = None,
                 crop: bool = False):
        # crop=True slices fused-path results to frame width ON DEVICE
        # before download — (F, B, HH, W) with the UV halves repacked as
        # U|V in [0,W) — instead of shipping the full stride (22% padding
        # at 400x240/S=512, 37.5% at 640x480/S=1024) over the fetch-bound
        # link.  Default off: the full-stride layout is the bit-exactness
        # contract surface the tests compare against.
        from ..models.plan import PlanningDecoder
        self.B = batch
        self.crop = bool(crop)
        self.width, self.height = width, height
        self.planners = [PlanningDecoder(width, height, version)
                         for _ in range(batch)]
        self.natives = None
        if native is not False:
            try:
                from ..utils.native import NativePlanner
                if not hasattr(NativePlanner, "scan_unified"):
                    raise AttributeError("native scanner lacks unified mode")
                self.natives = [NativePlanner(width, height, int(version))
                                for _ in range(batch)]
            except Exception:
                if native is True:
                    raise
        self.stride = self.planners[0].stride
        import concurrent.futures as _cf
        self._pool = _cf.ThreadPoolExecutor(max_workers=min(batch, 16))
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)
        _hh, G8, SP = _geom(height, self.stride)
        # ring storage follows _ring_mode: mode 2 (Wii sizes) keeps it
        # byte-packed (4 px/word) so the fused kernel stages it in VMEM
        self._ring_mode = _ring_mode(height, self.stride)
        spx = _ring_spx(height, self.stride)
        self.ring = jnp.zeros((batch, 6, G8, 8, spx), jnp.int32)
        # per-round kernels hold one stream's whole int32 ring as a VMEM
        # block; other modes route everything through the fused kernel
        self._ring_hbm = self._ring_mode != 1
        from ..runtime.metrics import DecodeMetrics
        self.metrics = DecodeMetrics()

    @property
    def offset(self):
        if self.natives is not None:
            return self.natives[0].offset
        return self.planners[0].offset

    def ring_frame_np(self, b: int = 0, slot: int = 0) -> np.ndarray:
        """Host copy of one ring frame as uint8 rows (G8*8, SP) — the
        layout-independent accessor for the containment path (packed rings
        unpack with a little-endian byte view)."""
        arr = np.asarray(self.ring[b, slot])           # (G8, 8, SPX)
        if self._ring_mode == 2:
            _hh, _G8, SP = _geom(self.height, self.stride)
            arr = arr[..., :SP // 4]                   # drop 128-pad words
            arr = arr.astype('<i4').view(np.uint8)     # (G8, 8, SP)
        arr = arr.astype(np.uint8)
        return arr.reshape(-1, arr.shape[-1])

    def _scan_one(self, b: int, packet: bytes) -> dict:
        if self.natives is not None:
            return self.natives[b].scan_unified(packet)
        p = self.planners[b]
        p.data = packet
        p.offset = 0
        p.decode_frame()
        return p.unified_plan()

    def _scan_all(self, packets: list[bytes]) -> list[dict]:
        if self.natives is not None and self.B > 1:
            # the C++ scanner releases the GIL (plain ctypes call) and each
            # stream has its own context -> streams scan in parallel on
            # host cores
            return list(self._pool.map(
                lambda a: self._scan_one(*a), enumerate(packets)))
        return [self._scan_one(b, pkt) for b, pkt in enumerate(packets)]

    def scan_packets(self, packets: list[bytes]) -> tuple:
        plans = self._scan_all(packets)
        bucket = _ops_bucket(max(int(p["ops"][0, 0]) for p in plans))
        nchunk = bucket // CHUNK
        nr = _bucket(max(p["coefs"].shape[0] for p in plans), NR_BUCKETS)
        ops = np.zeros((self.B, nchunk, CHUNK, 4), np.int32)
        coefs = np.zeros((self.B, nr, 64), np.int32)
        sizes = np.full((self.B, nr), 8, np.int32)
        for b, p in enumerate(plans):
            ops[b] = _chunk_ops(p["ops"], bucket)
            coefs[b, :p["coefs"].shape[0]] = p["coefs"]
            sizes[b, :p["sizes"].shape[0]] = p["sizes"]
        return ops, coefs, sizes

    def decode_frames(self, packets: list[bytes]) -> np.ndarray:
        """One frame per stream; returns (B, HH, S) uint8 planes.

        Stages carry jax.profiler trace annotations (SURVEY.md §5 tracing)
        so `jax.profiler.trace()` captures host-scan vs device-decode split;
        wall-clock lands in self.metrics.

        Large geometries (Wii MOC5: stride 1024) exceed the per-round
        kernel's VMEM ring block; those route through the fused kernel with
        F=1, whose unstaged mode keeps the ring in HBM."""
        import time
        if self._ring_hbm:
            t0 = time.perf_counter()
            t1, yuv = self._dispatch_gop_fused([packets])
            out = np.asarray(yuv)[0]
            t2 = time.perf_counter()
            m = self.metrics
            m.frames += self.B
            m.bytes_in += sum(len(p) for p in packets)
            m.scan_seconds += t1 - t0
            m.device_seconds += t2 - t1
            m.wall_seconds += t2 - t0
            return out
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation("mobiclip.scan"):
            ops, coefs, sizes = self.scan_packets(packets)
        t1 = time.perf_counter()
        with jax.profiler.TraceAnnotation("mobiclip.device_decode"):
            sp = _pack_blob_sparse(ops, coefs, sizes)
            if sp is not None:
                blob, nnzb = sp
                self.ring, yuv = _decode_round_sblob(
                    self.ring, blob, ops.shape[1], coefs.shape[1], nnzb,
                    self.height, self.stride, self.interpret)
            else:
                self.ring, yuv = _decode_round_blob(
                    self.ring, _pack_blob(ops, coefs, sizes),
                    ops.shape[1], coefs.shape[1], self.height, self.stride,
                    self.interpret)
            out = np.asarray(yuv)
        t2 = time.perf_counter()
        m = self.metrics
        m.frames += self.B
        m.bytes_in += sum(len(p) for p in packets)
        m.scan_seconds += t1 - t0
        m.device_seconds += t2 - t1
        m.wall_seconds += t2 - t0
        return out


    def _gop_arrays(self, per: list[tuple]) -> tuple:
        """Stack per-frame scan results into (F, B, ...) GOP arrays."""
        F = len(per)
        nchunk = max(p[0].shape[1] for p in per)
        nr = max(p[1].shape[1] for p in per)
        ops = np.zeros((F, self.B, nchunk, CHUNK, 4), np.int32)
        coefs = np.zeros((F, self.B, nr, 64), np.int32)
        sizes = np.full((F, self.B, nr), 8, np.int32)
        for f, (o, c, s) in enumerate(per):
            ops[f, :, :o.shape[1]] = o
            coefs[f, :, :c.shape[1]] = c
            sizes[f, :, :s.shape[1]] = s
        return ops, coefs, sizes

    def _dispatch_gop_fused(self, frames: list[list[bytes]]):
        """Scan + pack + dispatch one GOP through the fused single-launch
        path; returns (scan_end_time, device yuv array) WITHOUT blocking on
        the result (dispatch is async).

        Hot path: the C++ scanner emits the packed upload blob directly
        (scanner_scan_gop) — one native call per stream covering the whole
        GOP, no Python pack loops.  Falls back to the per-frame plan path
        when native scanning is unavailable or the GOP doesn't fit the
        native format (the C++ state is rewound first, so the re-scan is
        bit-identical)."""
        if self.natives is not None:
            out = self._dispatch_gop_native(frames)
            if out is not None:
                return out[0], self._maybe_crop(out[1])
        with jax.profiler.TraceAnnotation("mobiclip.scan"):
            plans_fb = [self._scan_all(fp) for fp in frames]
        t1, yuv = self._dispatch_plans(plans_fb)
        return t1, self._maybe_crop(yuv)

    def _maybe_crop(self, yuv):
        """Apply the device-side width crop when enabled (see __init__)."""
        if not self.crop or self.width == self.stride:
            return yuv
        return _crop_gop_yuv(yuv, self.height, self.width, self.stride)

    def _dispatch_gop_native(self, frames: list[list[bytes]]):
        """Whole-GOP native scan+pack+dispatch, or None to fall back (with
        all stream states rewound to the GOP start)."""
        F = len(frames)
        if F == 0 or F >= 4096:
            return None
        per = [[frames[f][b] for f in range(F)] for b in range(self.B)]
        with jax.profiler.TraceAnnotation("mobiclip.scan"):
            for nv in self.natives:
                nv.checkpoint()
            if self.B > 1:
                res = list(self._pool.map(
                    lambda b: self.natives[b].scan_gop_packed(per[b]),
                    range(self.B)))
            else:
                res = [self.natives[0].scan_gop_packed(per[0])]
        if any(r["err"] or r["val_overflow"] or r["done"] != F
               for r in res):
            # malformed frame, >int16 coefficient, or a stream outgrew the
            # scan buffers: rewind every stream and let the plan path (which
            # has no such limits and raises at the right frame) redo the GOP
            for nv in self.natives:
                nv.rollback()
            return None
        return self._dispatch_parts([_gop_part(r) for r in res])

    def _dispatch_parts(self, parts: list[dict]):
        """Dispatch per-stream GOP parts, splitting at frame boundaries
        while any stream exceeds the chunk/nnz bucket ladders (mirrors
        _dispatch_plans' split; the ring carries across dispatches)."""
        import time
        F = len(parts[0]["fnct"])
        if (max(q["c1"] - q["c0"] for q in parts) > NCT_BUCKETS[-1]
                or max(q["idx"].size for q in parts) > NNZ_PS_BUCKETS[-1]):
            if F <= 1:
                if max(q["c1"] - q["c0"] for q in parts) > NCT_BUCKETS[-1]:
                    raise ValueError(
                        "single frame exceeds fused-GOP chunk buckets")
                # a lone frame too dense for the sparse format: dense
                # upload, like the plan path's _pack_gop_blob_sparse=None
                # fallback
                import time
                ops, coefs, sizes = _part_dense_arrays(parts)
                t1 = time.perf_counter()
                self.ring, yuv = _decode_gop_fused(
                    self.ring, jnp.asarray(ops), jnp.asarray(coefs),
                    jnp.asarray(sizes), F, self.height, self.stride,
                    self.interpret)
                return t1, yuv
            mid = F // 2
            _ta, ya = self._dispatch_parts(
                [_split_gop_part(q, 0, mid) for q in parts])
            tb, yb = self._dispatch_parts(
                [_split_gop_part(q, mid, F) for q in parts])
            return tb, jnp.concatenate([ya, yb], axis=0)
        with jax.profiler.TraceAnnotation("mobiclip.pack"):
            blob, nct, nnzb = _assemble_gop_parts(parts)
        t1 = time.perf_counter()
        self.ring, yuv = _decode_gop_fused_sblob(
            self.ring, blob, F, nct, nnzb,
            self.height, self.stride, self.interpret)
        return t1, yuv

    def _dispatch_plans(self, plans_fb: list[list[dict]]):
        """Pack pre-scanned per-frame plans and dispatch the fused GOP.
        A GOP whose packed chunk stream would overflow the largest bucket
        is split into consecutive dispatches (the ring carries across them
        — each dispatch leaves it renormalized), results concatenated on
        device so there is still only one fetch."""
        cap = NCT_BUCKETS[-1]
        totals = [0] * self.B
        for row in plans_fb:
            for b, p in enumerate(row):
                n = int(p["ops"][0, 0])
                totals[b] += len(_frame_chunk_spans(p["ops"][1:1 + n]))
        if max(totals) > cap and len(plans_fb) > 1:
            mid = len(plans_fb) // 2
            t1a, ya = self._dispatch_plans(plans_fb[:mid])
            t1b, yb = self._dispatch_plans(plans_fb[mid:])
            return t1b, jnp.concatenate([ya, yb], axis=0)
        return self._dispatch_plans_one(plans_fb)

    def _dispatch_plans_one(self, plans_fb: list[list[dict]]):
        import time
        F = len(plans_fb)
        with jax.profiler.TraceAnnotation("mobiclip.pack"):
            ops, coefs, sizes = _pack_gop_chunks(plans_fb, self.B)
        t1 = time.perf_counter()
        nct = ops.shape[1]
        sp = _pack_gop_blob_sparse(ops, coefs,
                                   sizes.reshape(self.B, nct * CHUNK))
        if sp is not None:
            blob, nnzb = sp
            self.ring, yuv = _decode_gop_fused_sblob(
                self.ring, blob, F, nct, nnzb,
                self.height, self.stride, self.interpret)
        else:
            self.ring, yuv = _decode_gop_fused(
                self.ring, jnp.asarray(ops), jnp.asarray(coefs),
                jnp.asarray(sizes), F, self.height, self.stride,
                self.interpret)
        return t1, yuv

    def decode_gops(self, gops) -> "Iterator[np.ndarray]":
        """Streaming multi-GOP decode with download/compute overlap: GOP
        n's device->host fetch streams WHILE GOP n+1 is scanned on host and
        decoded on device (the fetch costs ~0.5 s per GOP through the
        tunnel — fully hidden here as long as scan+decode take comparably
        long).  Yields (F, B, HH, S) uint8 per GOP, in order."""
        import time
        pending = None
        for frames in gops:
            t0 = time.perf_counter()
            _t1, yuv = self._dispatch_gop_fused(frames)
            try:
                yuv.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                out, pf, pt0 = pending
                arr = np.asarray(out)
                self._account_gop(pf, time.perf_counter() - pt0)
                yield arr
            pending = (yuv, len(frames) * self.B, t0)
        if pending is not None:
            out, pf, pt0 = pending
            arr = np.asarray(out)
            self._account_gop(pf, time.perf_counter() - pt0)
            yield arr

    def _account_gop(self, n_frames: int, wall: float) -> None:
        m = self.metrics
        m.frames += n_frames
        m.wall_seconds += wall

    def decode_gop(self, frames: list[list[bytes]],
                   single_dispatch: bool = False,
                   fused: bool = False) -> np.ndarray:
        """frames[f][b] = packet of frame f of stream b; returns
        (F, B, HH, S) uint8.

        Default: pipelined — frame f+1 is scanned on the host WHILE the
        device decodes frame f (dispatches are async), and the whole GOP is
        downloaded ONCE at the end (a result fetch costs a fixed ~50-200 ms
        through this chip's tunnel, so per-frame downloads dominate
        everything else).  Wall clock ~ max(scan, device) instead of their
        sum.  ``fused=True`` runs the whole GOP as ONE kernel launch with
        the ring resident in HBM (one upload, one dispatch, one download —
        the fastest shape on the tunneled chip).  ``single_dispatch=True``
        instead runs a lax.scan of per-frame launches — measured
        pathological through the remote-execution tunnel, kept for
        directly-attached comparison."""
        import time
        t0 = time.perf_counter()
        F = len(frames)
        if self._ring_hbm:
            # only the fused kernel supports HBM-resident / packed rings
            fused, single_dispatch = True, False
        if fused:
            t1, yuv = self._dispatch_gop_fused(frames)
            with jax.profiler.TraceAnnotation("mobiclip.device_decode"):
                out = np.asarray(yuv)
            t_scan = t1 - t0
        elif single_dispatch:
            with jax.profiler.TraceAnnotation("mobiclip.scan"):
                per = [self.scan_packets(fp) for fp in frames]
                ops, coefs, sizes = self._gop_arrays(per)
            t1 = time.perf_counter()
            with jax.profiler.TraceAnnotation("mobiclip.device_decode"):
                self.ring, yuv = _decode_gop(self.ring, ops, coefs, sizes,
                                             self.height, self.stride,
                                             self.interpret)
                out = np.asarray(yuv)
            t_scan = t1 - t0
        else:
            HH = self.height + self.height // 2
            acc = jnp.zeros((F, self.B, HH, self.stride), jnp.uint8)
            t_scan = 0.0
            for f, fp in enumerate(frames):
                ts = time.perf_counter()
                with jax.profiler.TraceAnnotation("mobiclip.scan"):
                    ops, coefs, sizes = self.scan_packets(fp)
                t_scan += time.perf_counter() - ts
                # async dispatch: the device chews on this round while the
                # host loop scans the next frame's packets
                sp = _pack_blob_sparse(ops, coefs, sizes)
                if sp is not None:
                    blob, nnzb = sp
                    self.ring, acc = _decode_round_acc_sparse(
                        self.ring, acc, blob, f, ops.shape[1],
                        coefs.shape[1], nnzb, self.height, self.stride,
                        self.interpret)
                else:
                    self.ring, acc = _decode_round_acc(
                        self.ring, acc, _pack_blob(ops, coefs, sizes), f,
                        ops.shape[1], coefs.shape[1], self.height,
                        self.stride, self.interpret)
            with jax.profiler.TraceAnnotation("mobiclip.device_decode"):
                out = np.asarray(acc)
        t2 = time.perf_counter()
        m = self.metrics
        m.frames += F * self.B
        m.bytes_in += sum(len(p) for fp in frames for p in fp)
        m.scan_seconds += t_scan
        m.device_seconds += (t2 - t0) - t_scan
        m.wall_seconds += t2 - t0
        return out


class VmemVideoDecoder(VmemBatchDecoder):
    """Single-stream convenience wrapper (JaxVideoDecoder-compatible)."""

    def decode_stream_chunk(self, packets: list[bytes]
                            ) -> tuple[np.ndarray, list[int], int | None]:
        """Decode consecutive frames of ONE stream as a single fused
        dispatch (one upload + one fetch instead of one per frame — the
        transcoder's throughput path).  Scans run per packet so each
        frame's bitstream end offset is captured (MODS audio packets start
        where the video reader stopped, Program.cs:250-252).

        Returns (yuv (K, HH, S) uint8, K end offsets, err_index): the K
        successfully scanned prefix frames are decoded and committed to
        the ring; ``err_index`` is the index of the packet whose scan
        failed (its frame is NOT decoded — per-frame containment is the
        caller's job, matching the reference player's swallow policy), or
        None when the whole chunk scanned.

        Hot path: ONE native scanner_scan_gop call covers the whole chunk
        (per-frame consumed offsets come back from C++); malformed frames
        keep the prefix and report err at the C++ frame boundary.
        """
        import time
        t0 = time.perf_counter()
        yuvs: list[np.ndarray] = []
        offsets: list[int] = []
        err = None
        t_scan = 0.0
        rem = list(packets)
        ndone = 0
        nv = self.natives[0] if self.natives is not None else None
        while rem and nv is not None:
            ts = time.perf_counter()
            nv.checkpoint()
            r = nv.scan_gop_packed(rem)
            t_scan += time.perf_counter() - ts
            if r["val_overflow"]:
                # >int16 coefficient somewhere: rewind and take the dense
                # per-packet path for the remainder
                nv.rollback()
                break
            done = r["done"]
            offsets.extend(int(c) for c in r["consumed"])
            if done:
                _t1, yuv = self._dispatch_parts([_gop_part(r)])
                yuvs.append(np.asarray(self._maybe_crop(yuv))[:, 0])
                ndone += done
                rem = rem[done:]
            if r["err"]:
                err = ndone
                rem = []
                break
            if done == 0:
                # a frame bigger than the native scan caps: the per-packet
                # plan path below has no such limits — decode the rest there
                break
        if rem and err is None:
            # native scanner unavailable (or val_overflow): per-packet
            # scan + plan dispatch, dense coefficient rows
            plans_fb: list[list[dict]] = []
            ts = time.perf_counter()
            for i, pkt in enumerate(rem):
                try:
                    plans_fb.append([self._scan_one(0, pkt)])
                    offsets.append(self.offset)
                except Exception:
                    err = ndone + i
                    break
            t_scan += time.perf_counter() - ts
            if plans_fb:
                _t1, yuv = self._dispatch_plans(plans_fb)
                yuvs.append(np.asarray(self._maybe_crop(yuv))[:, 0])
                ndone += len(plans_fb)
        out_w = (self.width if self.crop else self.stride)
        out = (np.concatenate(yuvs, axis=0) if yuvs else
               np.zeros((0, self.height + self.height // 2, out_w),
                        np.uint8))
        t2 = time.perf_counter()
        m = self.metrics
        m.frames += ndone
        m.bytes_in += sum(len(p) for p in packets[:ndone])
        m.scan_seconds += t_scan
        m.device_seconds += (t2 - t0) - t_scan
        m.wall_seconds += t2 - t0
        return out, offsets, err

    def __init__(self, width: int, height: int, version,
                 interpret: bool | None = None, native: bool | None = None,
                 crop: bool = False):
        super().__init__(width, height, version, batch=1,
                         interpret=interpret, native=native, crop=crop)

    def decode_frame(self, packet: bytes) -> tuple[np.ndarray, np.ndarray]:
        out = self.decode_frames([packet])[0]
        H = self.height
        return out[:H], out[H:]
