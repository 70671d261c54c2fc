"""Multi-host corpus decoding: `jax.distributed` runtime + worker loop.

The codec's scaling story (SURVEY.md §5): GOPs are fully independent
(keyframes reset every piece of decoder state), so corpus-level scaling is
host-level data parallelism over GOP shards — DCN distributes work by
deterministic assignment, each host's chip(s) decode their shards through the
VMEM engine, and results land in per-shard files that a driver gathers.
Nothing crosses ICI between shards; scaling efficiency is bounded only by
host scan throughput and shard balance (assign_shards is size-balanced).

The worker is restartable: a JSONL ledger records finished (file, gop) pairs
(ShardProgress), mirroring the reference's JumpToKeyFrame seek design
(ModsDemuxer.cs:88-95) — decoder state is never checkpointed because
keyframes rebuild all of it (MobiclipDecoder.cs:231-236).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..models.oracle_video import MobiclipVersion
from .gop import (GopShard, ShardProgress, assign_shards, shard_mods,
                  shard_moflex)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize the jax.distributed runtime (DCN rendezvous).  Returns
    (process_id, num_processes).  With no arguments, runs standalone."""
    import jax
    if coordinator is None:
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_corpus(files: list[str | Path]) -> list[GopShard]:
    """Cut every container file of a corpus into GOP shards."""
    shards: list[GopShard] = []
    for fid, f in enumerate(files):
        data = Path(f).read_bytes()
        if data[:4] == b"MODS":
            shards.extend(shard_mods(data, file_id=fid))
        elif data[:2] == b"\x4c\x32":
            shards.extend(shard_moflex(data, file_id=fid))
        else:
            raise ValueError(f"{f}: not a GOP-shardable container")
    return shards


def _load_ledger(path: Path) -> ShardProgress:
    prog = ShardProgress()
    if path.exists():
        for line in path.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                prog.done.add((rec["file_id"], rec["gop_index"]))
    return prog


def run_worker(files: list[str | Path], out_dir: str | Path,
               worker_id: int = 0, n_workers: int = 1,
               width: int | None = None, height: int | None = None,
               engine: str = "tpu", batch: int = 8) -> dict:
    """Decode this worker's GOP shards to per-shard .yuv files.

    Idempotent: a ledger at <out_dir>/worker<k>.ledger.jsonl records finished
    shards; rerunning (e.g. after a preemption) resumes from partial
    progress.  Returns summary stats."""
    from ..runtime.transcode import probe_info
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ledger_path = out_dir / f"worker{worker_id}.ledger.jsonl"
    prog = _load_ledger(ledger_path)

    all_shards = shard_corpus(files)
    mine = assign_shards(all_shards, n_workers, worker_id)
    pending = prog.pending(mine)

    # geometry + codec profile per file
    geos = {}
    for fid, f in enumerate(files):
        info = probe_info(f)
        if info["container"] == "moflex":
            vs = [s for s in info["streams"] if s["type"] == "video"][0]
            geos[fid] = (vs["width"], vs["height"],
                         MobiclipVersion.MOFLEX_3DS)
        else:
            geos[fid] = (info["width"], info["height"],
                         MobiclipVersion.MODS_DS)

    frames = 0

    def _finish(shard, out, ledger):
        nonlocal frames
        np.save(out_dir / f"f{shard.file_id}_g{shard.gop_index}.npy", out)
        ledger.write(json.dumps({"file_id": shard.file_id,
                                 "gop_index": shard.gop_index,
                                 "frames": shard.frame_count}) + "\n")
        ledger.flush()
        prog.mark(shard)
        frames += shard.frame_count

    with open(ledger_path, "a") as ledger:
        if engine == "tpu":
            # lockstep batching: group same-(geometry, length) shards and
            # decode up to `batch` of them per fused-GOP device program
            # (BASELINE.md: many small streams at once is what fills a chip)
            groups: dict[tuple, list] = {}
            for shard in pending:
                key = geos[shard.file_id] + (shard.frame_count,)
                groups.setdefault(key, []).append(shard)
            from ..ops.vmem_engine import VmemBatchDecoder
            for (W, H, ver, F), shards in groups.items():
                for i in range(0, len(shards), batch):
                    grp = shards[i:i + batch]
                    bd = VmemBatchDecoder(W, H, ver, batch=len(grp))
                    gop = [[grp[b].packets[f] for b in range(len(grp))]
                           for f in range(F)]
                    out = bd.decode_gop(gop, fused=True)  # (F, B, HH, S)
                    for b, shard in enumerate(grp):
                        _finish(shard, out[:, b], ledger)
        else:
            for shard in pending:
                W, H, ver = geos[shard.file_id]
                dec = _make_decoder(W, H, engine, ver)
                planes = []
                for pkt in shard.packets:
                    y, uv = _decode_one(dec, pkt)
                    planes.append(np.concatenate([y, uv], axis=0))
                _finish(shard, np.stack(planes), ledger)
    return {"worker": worker_id, "n_workers": n_workers,
            "shards_total": len(mine), "shards_decoded": len(pending),
            "shards_skipped": len(mine) - len(pending), "frames": frames}


def _make_decoder(W: int, H: int, engine: str,
                  version=MobiclipVersion.MODS_DS):
    if engine == "oracle":
        from ..models.oracle_video import OracleDecoder
        return OracleDecoder(W, H, version)
    from ..ops.vmem_engine import VmemVideoDecoder
    return VmemVideoDecoder(W, H, version)


def _decode_one(dec, pkt: bytes):
    from ..models.oracle_video import OracleDecoder
    if isinstance(dec, OracleDecoder):
        dec.data = pkt
        dec.offset = 0
        dec.decode_frame()
        S = dec.stride
        return (dec.y_planes[0].reshape(-1, S),
                dec.uv_planes[0].reshape(-1, S))
    return dec.decode_frame(pkt)


def gather_corpus(files: list[str | Path], out_dir: str | Path) -> dict:
    """Host-0 gather: verify every (file, gop) shard result is present and
    stitch per-file frame counts.  Returns {file_id: total_frames}."""
    out_dir = Path(out_dir)
    shards = shard_corpus(files)
    totals: dict[int, int] = {}
    for s in shards:
        p = out_dir / f"f{s.file_id}_g{s.gop_index}.npy"
        if not p.exists():
            raise FileNotFoundError(f"missing shard result {p}")
        arr = np.load(p)
        assert arr.shape[0] == s.frame_count
        totals[s.file_id] = totals.get(s.file_id, 0) + s.frame_count
    return totals
