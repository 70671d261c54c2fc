"""GOP sharding: boundary cuts, worker assignment, resume ledger."""
import numpy as np

from mobiclipdecoder_tpu.containers.mods import ModsMuxer
from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion, OracleDecoder
from mobiclipdecoder_tpu.parallel.gop import (ShardProgress, assign_shards,
                                              shard_mods)
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer


def _mods_with_gops(ngops=3, frames_per=3, W=64, H=48, seed=9) -> bytes:
    synth = StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=seed)
    mux = ModsMuxer(W, H, fps=24.0)
    for g in range(ngops):
        for f in range(frames_per):
            if f == 0:
                synth.frame_idx = 0
                pkt = synth.iframe(0x18, pad=False)
            else:
                pkt = synth.pframe(pad=False)
            mux.add_frame(pkt, None, keyframe=(f == 0))
    return mux.to_bytes()


def test_shard_mods_boundaries():
    blob = _mods_with_gops()
    shards = shard_mods(blob)
    assert len(shards) == 3
    assert [s.frame_count for s in shards] == [3, 3, 3]
    assert [s.first_frame for s in shards] == [0, 3, 6]


def test_shards_decode_independently():
    """Each shard decodes standalone to the same planes as a straight-through
    decode — the property that makes GOPs the distribution unit."""
    blob = _mods_with_gops()
    shards = shard_mods(blob)
    W, H = 64, 48
    # straight-through
    dec = OracleDecoder(W, H, MobiclipVersion.MODS_DS)
    full = []
    from mobiclipdecoder_tpu.containers.mods import ModsDemuxer
    dm = ModsDemuxer(blob)
    while (rec := dm.read_frame()) is not None:
        dec.data = rec[0]
        dec.offset = 0
        dec.decode_frame()
        full.append(dec.y_planes[0].copy())
    # per-shard fresh decoders
    i = 0
    for s in shards:
        d2 = OracleDecoder(W, H, MobiclipVersion.MODS_DS)
        for pkt in s.packets:
            d2.data = pkt
            d2.offset = 0
            d2.decode_frame()
            np.testing.assert_array_equal(d2.y_planes[0], full[i])
            i += 1


def test_assignment_and_progress():
    blob = _mods_with_gops(ngops=5)
    shards = shard_mods(blob)
    seen = set()
    for w in range(2):
        for s in assign_shards(shards, 2, w):
            assert (s.file_id, s.gop_index) not in seen
            seen.add((s.file_id, s.gop_index))
    assert len(seen) == 5
    prog = ShardProgress()
    prog.mark(shards[0])
    assert len(prog.pending(shards)) == 4
