"""Batch transcoder: container file in -> raw YUV/PCM/RGB out.

The TPU-native equivalent of the reference CLI converter
(MobiConverter/Program.cs:18-490): signature-based container dispatch, video
decode through either the oracle (spec) or the TPU pipeline, per-frame audio
packet round-robin across channels, channel interleave, raw writers instead
of the Windows AVI library.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator

import numpy as np

from ..containers.mods import ModsDemuxer
from ..models.audio_fastaudio import FastAudioDecoder
from ..models.audio_ima import ImaAdpcmDecoder
from ..models.audio_sx import SxDecoder
from ..models.oracle_video import MobiclipVersion, OracleDecoder
from ..utils import rawio


@dataclasses.dataclass
class DecodedFrame:
    index: int
    y: np.ndarray       # (H, W) uint8
    u: np.ndarray       # (H/2, W/2)
    v: np.ndarray
    keyframe: bool
    pcm: np.ndarray | None  # interleaved int16 for this frame, or None
    corrupt: bool = False   # video decode raised; planes are best-effort


def _decode_contained(dec, pkt: bytes):
    """Per-frame error containment, mirroring the reference player's
    swallow-and-show-current-state policy (`catch {}`,
    MobiclipDecoder.cs:325-326): on a decode exception the oracle's planes
    hold the partially-decoded frame; the device engine falls back to its
    last committed frame.  Returns (y, uv, end_offset, corrupt)."""
    if isinstance(dec, OracleDecoder):
        S = dec.stride
        try:
            dec.decode_frame()
            corrupt = False
        except Exception:
            corrupt = True
        return (dec.y_planes[0].reshape(-1, S),
                dec.uv_planes[0].reshape(-1, S), dec.offset, corrupt)
    try:
        y, uv = dec.decode_frame(pkt)
        return y, uv, dec.offset, False
    except Exception:
        # ring slot 0 = last successfully committed frame (the ring is only
        # advanced when a round completes)
        H, S = dec.height, dec.stride
        prev = dec.ring_frame_np()[8:8 + H + H // 2, 8:8 + S]
        return prev[:H], prev[H:], len(pkt), True



def _uv_halves(uv: np.ndarray, W: int, S: int) -> tuple[np.ndarray, np.ndarray]:
    """U/V halves of a packed UV slab in either layout: full-stride rows
    (U at [0,S/2), V at [S/2,S/2+W/2)) or the device-cropped rows the VMEM
    engine produces with crop=True (U|V adjacent in [0,W))."""
    if uv.shape[1] == S:
        return uv[:, :W // 2], uv[:, S // 2:S // 2 + W // 2]
    return uv[:, :W // 2], uv[:, W // 2:W]

def width_stride(width: int) -> int:
    """Reference stride policy (MobiclipDecoder.cs:50-52)."""
    return 256 if width <= 256 else (512 if width <= 512 else 1024)


def _make_video_decoder(width: int, height: int, version: MobiclipVersion,
                        engine: str):
    if engine == "oracle":
        return OracleDecoder(width, height, version)
    if engine == "tpu":
        # the VMEM sequential-executor kernel: the single-chip hot path.
        # Wii-size frames (stride 1024, e.g. MOC5 640x480), whose 6-slot
        # ring exceeds VMEM, automatically route through its fused kernel's
        # HBM-ring mode (VmemBatchDecoder._ring_hbm).
        from ..ops.vmem_engine import VmemVideoDecoder
        # crop=True: results come back at frame width (U|V adjacent) —
        # 22-37.5%% smaller downloads at 400x240/640x480 (fetch-bound link)
        return VmemVideoDecoder(width, height, version, crop=True)
    if engine == "tpu-xla":
        # the wavefront XLA engine (mesh-shardable; slower single-chip)
        from ..models.pipeline import JaxVideoDecoder
        return JaxVideoDecoder(width, height, version)
    raise ValueError(f"unknown engine {engine!r}")


#: frames decoded per fused device dispatch on the chunked transcode path
#: (amortizes the per-dispatch/per-fetch round-trip cost of a tunneled chip)
CHUNK_FRAMES = 16


def decode_mods(data: bytes, engine: str = "oracle") -> Iterator[DecodedFrame]:
    """Decode a MODS container (video + MODS-style per-frame audio packets,
    Program.cs:206-358).  Yields DecodedFrame per frame.

    With a chunk-capable device engine, CHUNK_FRAMES frames go through one
    fused device dispatch; the per-frame bitstream end offsets the audio
    layer needs come from the host scanner."""
    dm = ModsDemuxer(data)
    h = dm.header
    W, H = h.width, h.height
    dec = _make_video_decoder(W, H, MobiclipVersion.MODS_DS, engine)
    S = dec.stride if hasattr(dec, "stride") else 256
    nch = h.nb_channel
    has_audio = h.audio_codec in (1, 2, 3) and nch > 0 and h.frequency > 0

    def _fresh_decoders():
        return ([ImaAdpcmDecoder() for _ in range(nch)],
                [SxDecoder() for _ in range(nch)],
                [FastAudioDecoder() for _ in range(nch)],
                [False] * nch)

    adpcm, sxd, fad, sx_init = _fresh_decoders()
    queues: list[list[np.ndarray]] = [[] for _ in range(nch)]
    state = {"cur_channel": 0, "frame_idx": 0}

    def audio_for(pkt: bytes, n_audio: int, is_key: bool,
                  end_off: int) -> np.ndarray | None:
        nonlocal adpcm, sxd, fad, sx_init, queues
        if n_audio <= 0 or not has_audio:
            return None
        # audio starts where the video bit reader stopped, minus its
        # one-word over-read (Program.cs:250-252); TagId 'N3' quirk: +4
        off = end_off - 2
        if h.tag_id == 0x334E and len(pkt) >= 2 \
                and (pkt[0] | (pkt[1] << 8)) & 0x8000:
            off += 4
        if is_key and h.audio_codec == 3:
            # IMA resets at keyframes (Program.cs:255-265)
            adpcm, sxd, fad, sx_init = _fresh_decoders()
            queues = [[] for _ in range(nch)]
        cur_channel = state["cur_channel"]
        for _ in range(n_audio):
            if h.audio_codec == 3:          # IMA ADPCM
                d = adpcm[cur_channel]
                ln = 128 + (0 if d.is_init else 4)
                queues[cur_channel].append(d.decode(pkt, off, ln))
                off += ln
            elif h.audio_codec == 1:        # Sx (Program.cs:277-287)
                s = sxd[cur_channel]
                if not sx_init[cur_channel]:
                    s.codebook = dm.audio_codebooks[cur_channel]
                    sx_init[cur_channel] = True
                s.data = pkt
                s.offset = off
                queues[cur_channel].append(s.decode())
                off = s.offset
            elif h.audio_codec == 2:        # FastAudio (Program.cs:289-300)
                f = fad[cur_channel]
                f.data = pkt
                f.offset = off
                queues[cur_channel].append(f.decode())
                off = f.offset
            cur_channel = (cur_channel + 1) % nch
        state["cur_channel"] = cur_channel
        smallest = min((sum(len(a) for a in q) for q in queues), default=0)
        if smallest <= 0:
            return None
        chans = []
        for i in range(nch):
            buf = np.concatenate(queues[i]) if queues[i] else \
                np.empty(0, np.int16)
            chans.append(buf[:smallest])
            rest = buf[smallest:]
            queues[i] = [rest] if len(rest) else []
        return rawio.interleave_channels(chans)

    def emit(y, uv, rec, end_off, corrupt) -> DecodedFrame:
        pkt, n_audio, is_key = rec
        pcm = None if corrupt else audio_for(pkt, n_audio, is_key, end_off)
        fr = DecodedFrame(
            index=state["frame_idx"],
            y=y[:H, :W].copy(),
            u=_uv_halves(uv[:H // 2], W, S)[0].copy(),
            v=_uv_halves(uv[:H // 2], W, S)[1].copy(),
            keyframe=is_key, pcm=pcm, corrupt=corrupt)
        state["frame_idx"] += 1
        return fr

    if hasattr(dec, "decode_stream_chunk"):
        pending: list = []
        eof = False
        while True:
            while not eof and len(pending) < CHUNK_FRAMES:
                rec = dm.read_frame()
                if rec is None:
                    eof = True
                    break
                pending.append(rec)
            if not pending:
                return
            yuv, offs, err = dec.decode_stream_chunk(
                [p[0] for p in pending])
            K = yuv.shape[0]
            for k in range(K):
                yield emit(yuv[k][:H], yuv[k][H:], pending[k], offs[k],
                           False)
            if err is not None:
                # containment: the failed frame shows the last committed
                # ring frame, like the reference player's `catch {}`
                prev = dec.ring_frame_np()[8:8 + H + H // 2, 8:8 + S]
                yield emit(prev[:H], prev[H:], pending[K],
                           len(pending[K][0]), True)
                pending = pending[K + 1:]
            else:
                pending = []
        return

    while True:
        rec = dm.read_frame()
        if rec is None:
            return
        pkt, _n_audio, _is_key = rec
        if isinstance(dec, OracleDecoder):
            dec.data = pkt
            dec.offset = 0
        y, uv, end_off, corrupt = _decode_contained(dec, pkt)
        yield emit(y, uv, rec, end_off, corrupt)


def transcode(path: str | Path, out_prefix: str | Path,
              engine: str = "oracle", fmt: str = "y4m") -> dict:
    """File -> <prefix>.y4m (+ <prefix>.wav when the container carries audio)
    or <prefix>.avi (``fmt="avi"``, the reference converter's output format,
    MobiConverter/Program.cs:72,329-353).  Signature-based container dispatch
    like the reference apps (Form1.cs:193-224).  Returns summary stats."""
    data = Path(path).read_bytes()

    def _write(frames, name, width, height, fps, freq=0, nch=1,
               moflex_rgb=True):
        if fmt == "avi":
            from ..utils.avi import AviWriter
            avi = AviWriter(str(out_prefix) + ".avi", width, height, fps,
                            audio_rate=freq, audio_channels=nch)
            n = 0
            has_pcm = False
            for fr in frames:
                avi.add_frame(rawio.yuv_to_rgb(fr.y, fr.u, fr.v, moflex_rgb))
                if fr.pcm is not None:
                    avi.add_audio(fr.pcm)
                    has_pcm = True
                n += 1
            avi.close()
            return {"container": name, "frames": n, "audio": has_pcm,
                    "width": width, "height": height, "format": "avi"}
        y4m = rawio.Y4MWriter(str(out_prefix) + ".y4m", width, height, fps)
        pcm_parts = []
        n = 0
        for fr in frames:
            y4m.add_frame(fr.y, fr.u, fr.v)
            if fr.pcm is not None:
                pcm_parts.append(fr.pcm)
            n += 1
        y4m.close()
        if pcm_parts and freq:
            rawio.write_wav(str(out_prefix) + ".wav",
                            np.concatenate(pcm_parts), freq, nch)
        return {"container": name, "frames": n, "audio": bool(pcm_parts),
                "width": width, "height": height, "format": "y4m"}

    if data[:4] == b"MOC5":
        from ..containers.moc5 import Moc5Header
        h = Moc5Header.parse(data)
        return _write(decode_moc5(data, engine=engine), "moc5",
                      h.width, h.height, h.fps)
    if str(path).endswith(".vx2"):
        from ..containers.vx import VX2_HEIGHT, VX2_WIDTH
        return _write(decode_vx2(data, engine=engine), "vx2",
                      VX2_WIDTH, VX2_HEIGHT, 20.0, freq=32768, nch=1)
    if data[:2] == b"\x4c\x32":
        from ..containers.moflex import MoflexDemuxer, VideoStream, \
            VideoStreamWithLayout, AudioStream
        # probe stream declarations for geometry/fps/audio params
        info = {}

        def probe(chunk, _):
            if isinstance(chunk, (VideoStream, VideoStreamWithLayout)) \
                    and "w" not in info:
                info.update(w=chunk.width, h=chunk.height,
                            fps=chunk.fps_rate / max(chunk.fps_scale, 1))
            if isinstance(chunk, AudioStream) and "freq" not in info:
                info.update(freq=chunk.frequency, nch=chunk.channels)
        dm = MoflexDemuxer(data, on_frame=probe)
        dm.read_packet()
        dm.read_packet()
        if "w" not in info:
            for _, (chunk, _b) in dm.streams.items():
                probe(chunk, b"")
        return _write(decode_moflex(data, engine=engine), "moflex",
                      info.get("w", 256), info.get("h", 192),
                      info.get("fps", 24.0), freq=info.get("freq", 0),
                      nch=info.get("nch", 1))
    if data[:4] == b"MODS":
        dm = ModsDemuxer(data)
        h = dm.header
        return _write(decode_mods(data, engine=engine), "mods",
                      h.width, h.height, h.fps_float, freq=h.frequency,
                      nch=h.nb_channel, moflex_rgb=False)
    raise ValueError("unrecognized container signature")


def probe_info(path: str | Path) -> dict:
    """Container header probe without decoding (the role of the reference
    apps' signature dispatch + header display, Form1.cs:188-224)."""
    data = Path(path).read_bytes()
    if data[:4] == b"MOC5":
        from ..containers.moc5 import Moc5Header
        h = Moc5Header.parse(data)
        return {"container": "moc5", "codec": "mobiclip/moflex3ds-profile",
                "width": h.width, "height": h.height, "fps": h.fps}
    if str(path).endswith(".vx2"):
        from ..containers.vx import VX2_HEIGHT, VX2_WIDTH
        return {"container": "vx2", "codec": "mobiclip/moflex3ds-profile",
                "width": VX2_WIDTH, "height": VX2_HEIGHT, "fps": 20.0,
                "audio": "pcm16 mono 32768 Hz"}
    if data[:4] == b"VXDS":
        from ..containers.vx import VxDemuxer
        h = VxDemuxer(data).header
        return {"container": "vx", "codec": "mobiclip-vx (decode stub)",
                "width": h.width, "height": h.height,
                "frame_count": h.frame_count}
    if data[:2] == b"\x4c\x32":
        from ..containers.moflex import (AudioStream, MoflexDemuxer,
                                         VideoStream, VideoStreamWithLayout)
        info: dict = {"container": "moflex", "streams": []}

        def probe(chunk, _):
            rec = None
            if isinstance(chunk, (VideoStream, VideoStreamWithLayout)):
                rec = {"type": "video", "index": chunk.stream_index,
                       "width": chunk.width, "height": chunk.height,
                       "fps": chunk.fps_rate / max(chunk.fps_scale, 1)}
                if isinstance(chunk, VideoStreamWithLayout):
                    rec["layout"] = int(chunk.layout)
            elif isinstance(chunk, AudioStream):
                rec = {"type": "audio", "index": chunk.stream_index,
                       "codec": {0: "fastaudio", 1: "ima-adpcm",
                                 2: "pcm16"}.get(chunk.codec_id,
                                                 str(chunk.codec_id)),
                       "frequency": chunk.frequency,
                       "channels": chunk.channels}
            if rec is not None and rec not in info["streams"]:
                info["streams"].append(rec)
        dm = MoflexDemuxer(data, on_frame=probe)
        dm.read_packet()
        dm.read_packet()
        for _, (chunk, _b) in dm.streams.items():
            probe(chunk, b"")
        return info
    if data[:4] == b"MODS":
        h = ModsDemuxer(data).header
        return {"container": "mods", "codec": "mobiclip/mods-ds-profile",
                "width": h.width, "height": h.height,
                "fps": h.fps_float, "frame_count": h.frame_count,
                "audio_codec": {1: "sx", 2: "fastaudio",
                                3: "ima-adpcm"}.get(h.audio_codec, "none"),
                "channels": h.nb_channel, "frequency": h.frequency,
                "keyframes": h.keyframe_count}
    raise ValueError("unrecognized container signature")


def play(path: str | Path, engine: str = "tpu", realtime: bool = True,
         dump_frame: int | None = None,
         dump_path: str | Path | None = None,
         pipe_y4m: str | None = None,
         pipe_wav: str | None = None) -> dict:
    """Player (the Form1 player's decode/pacing loop, Form1.cs:486-535):
    decodes frames, paces against 1/fps when ``realtime``, reports achieved
    fps + deadline misses.  ``dump_frame`` writes one RGB frame as PPM.
    ``pipe_y4m`` streams paced display frames as YUV4MPEG2 to a path/FIFO
    or stdout ('-') — the live viewing surface:
    ``play clip.mods --pipe-y4m - | mpv -``.  ``pipe_wav`` streams the
    decoded PCM alongside (the NAudio-output analog, Form1.cs:549-558):
    ``mpv video.y4m --audio-file=audio.wav`` over two FIFOs."""
    import time

    info = probe_info(path)
    data = Path(path).read_bytes()
    arate, ach = 0, 0
    is3d = False
    if info["container"] == "moflex":
        vids = [s for s in info["streams"] if s["type"] == "video"]
        fps = vids[0]["fps"] if vids else 24.0
        # 3D layouts: the reference player decodes every frame (decoder
        # state continuity) but DISPLAYS alternate frames (the left eye,
        # starting with the first) at a doubled interval
        # (Form1.cs:516-530: `left = !left`, 2000 ms / fps)
        is3d = bool(vids) and vids[0].get("layout", 0) != 0
        auds = [s for s in info["streams"] if s["type"] == "audio"]
        if auds:
            arate, ach = auds[0]["frequency"], auds[0]["channels"]
        frames = decode_moflex(data, engine=engine)
        moflex_rgb = True
    elif info["container"] == "mods":
        fps = info["fps"]
        if info.get("audio_codec", "none") != "none":
            arate, ach = info["frequency"], info["channels"]
        frames = decode_mods(data, engine=engine)
        moflex_rgb = False
    elif info["container"] == "moc5":
        fps = info["fps"]
        frames = decode_moc5(data, engine=engine)
        moflex_rgb = True
    elif info["container"] == "vx2":
        fps = info["fps"]
        arate, ach = 32768, 1
        frames = decode_vx2(data, engine=engine)
        moflex_rgb = True
    else:
        raise ValueError("unplayable container")
    period = (2.0 if is3d else 1.0) / max(fps, 1e-3)
    t0 = time.perf_counter()
    n = 0
    late = 0
    n_samples = 0
    sink = None
    asink = None
    left = False
    try:
        for fr in frames:
            left = not left
            # audio attached to ANY decoded frame plays — the reference only
            # toggles *display* on the left/right eye (Form1.cs:516-530);
            # audio chunks decode and buffer regardless of the toggle
            if pipe_wav is not None and fr.pcm is not None and arate:
                if asink is None:
                    asink = rawio.LiveWavPipe(pipe_wav, arate, ach)
                asink.add(fr.pcm)
                n_samples += len(fr.pcm)
            if dump_frame is not None and fr.index == dump_frame:
                rgb = rawio.yuv_to_rgb(fr.y, fr.u, fr.v, moflex_rgb)
                rawio.write_ppm(dump_path or (str(path)
                                              + f".{fr.index}.ppm"), rgb)
            if is3d and not left:
                # right-eye frame: decoded (state + audio), not displayed
                continue
            deadline = t0 + (n + 1) * period
            now = time.perf_counter()
            if pipe_y4m is not None:
                if sink is None:
                    sink = rawio.LiveY4MPipe(pipe_y4m, fr.y.shape[1],
                                             fr.y.shape[0],
                                             fps / 2 if is3d else fps)
                sink.add_rgb(rawio.yuv_to_rgb(fr.y, fr.u, fr.v, moflex_rgb))
            if realtime:
                if now > deadline:
                    late += 1
                else:
                    # busy-wait pacing like HiResTimer (Form1.cs:530-535)
                    while time.perf_counter() < deadline:
                        pass
            n += 1
    finally:
        if sink is not None:
            sink.close()
        if asink is not None:
            asink.close()
    wall = time.perf_counter() - t0
    return {"frames": n, "fps_target": round(fps, 3), "is3d": is3d,
            "fps_achieved": round(n / wall, 2) if wall else 0.0,
            "audio_samples": n_samples,
            "late_frames": late, "realtime": realtime and late == 0}


def decode_moflex(data: bytes, engine: str = "oracle",
                  video_stream: int | None = None):
    """Decode a Moflex container (video + audio streams; Form1.cs:510-633
    consumption policy).  Yields DecodedFrame for video frames; audio PCM is
    attached to the most recent video frame boundary (interleaved int16)."""
    from ..containers.moflex import (AudioStream, MoflexDemuxer, VideoStream,
                                     VideoStreamWithLayout)

    state = {"dec": None, "S": 0, "W": 0, "H": 0, "vid": video_stream,
             "idx": 0}
    out_frames: list[DecodedFrame] = []
    pcm_pending: list[np.ndarray] = []
    pending_v: list[tuple[bytes, np.ndarray | None]] = []

    def _emit(y, uv, pcm, corrupt) -> None:
        W, H, S = state["W"], state["H"], state["S"]
        out_frames.append(DecodedFrame(
            index=state["idx"], y=y[:H, :W].copy(),
            u=_uv_halves(uv[:H // 2], W, S)[0].copy(),
            v=_uv_halves(uv[:H // 2], W, S)[1].copy(),
            keyframe=False, pcm=pcm, corrupt=corrupt))
        state["idx"] += 1

    def _flush_chunk(final: bool) -> None:
        """Decode buffered video payloads, CHUNK_FRAMES per fused
        dispatch (device engines only)."""
        dec = state["dec"]
        H, S = state["H"], state["S"]
        while pending_v and (final or len(pending_v) >= CHUNK_FRAMES):
            batch = pending_v[:CHUNK_FRAMES]
            if not final and len(batch) < CHUNK_FRAMES:
                break
            yuv, _offs, err = dec.decode_stream_chunk(
                [p for p, _ in batch])
            K = yuv.shape[0]
            for k in range(K):
                _emit(yuv[k][:H], yuv[k][H:], batch[k][1], False)
            if err is not None:
                prev = dec.ring_frame_np()[8:8 + H + H // 2, 8:8 + S]
                _emit(prev[:H], prev[H:], batch[K][1], True)
                del pending_v[:K + 1]
            else:
                del pending_v[:len(batch)]

    def on_frame(chunk, payload: bytes) -> None:
        if isinstance(chunk, (VideoStream, VideoStreamWithLayout)):
            if state["vid"] is None:
                state["vid"] = chunk.stream_index
            if chunk.stream_index != state["vid"]:
                return
            if state["dec"] is None:
                state["W"], state["H"] = chunk.width, chunk.height
                state["dec"] = _make_video_decoder(
                    chunk.width, chunk.height, MobiclipVersion.MOFLEX_3DS,
                    engine)
                state["S"] = state["dec"].stride
            dec = state["dec"]
            pcm = (np.concatenate(pcm_pending) if pcm_pending else None)
            pcm_pending.clear()
            if hasattr(dec, "decode_stream_chunk"):
                pending_v.append((payload, pcm))
                _flush_chunk(final=False)
                return
            if isinstance(dec, OracleDecoder):
                dec.data = payload
                dec.offset = 0
            y, uv, _end, corrupt = _decode_contained(dec, payload)
            _emit(y, uv, pcm, corrupt)
        elif isinstance(chunk, AudioStream):
            try:
                _decode_audio_chunk(chunk, payload)
            except Exception:
                pass  # corrupt audio packet: drop it, keep the stream going

    def _decode_audio_chunk(chunk, payload: bytes) -> None:
            ch = chunk.channels
            if chunk.codec_id == 1:  # IMA ADPCM (Form1.cs:601-630)
                decs = [ImaAdpcmDecoder() for _ in range(ch)]
                for i in range(ch):
                    decs[i].decode(payload, 4 * i, 4)
                chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
                off = 4 * ch
                while off + 128 * ch < len(payload):
                    for i in range(ch):
                        chans[i].append(decs[i].decode(payload, off, 128))
                        off += 128
                arrs = [np.concatenate(c) if c else np.empty(0, np.int16)
                        for c in chans]
                pcm_pending.append(rawio.interleave_channels(arrs))
            elif chunk.codec_id == 2:  # PCM16 (Form1.cs:631-633)
                n = len(payload) - (len(payload) % (ch * 2))
                pcm_pending.append(
                    np.frombuffer(payload[:n], dtype="<i2").copy())
            elif chunk.codec_id == 0:  # FastAudio (Form1.cs:561-599)
                key = ("fad", chunk.stream_index)
                decs = state.setdefault(key, [FastAudioDecoder()
                                              for _ in range(ch)])
                chans2: list[list[np.ndarray]] = [[] for _ in range(ch)]
                off = 0
                while off + 40 < len(payload):
                    for i in range(ch):
                        decs[i].data = payload
                        decs[i].offset = off
                        chans2[i].append(decs[i].decode())
                        off = decs[i].offset
                arrs = [np.concatenate(c) if c else np.empty(0, np.int16)
                        for c in chans2]
                pcm_pending.append(rawio.interleave_channels(arrs))

    dm = MoflexDemuxer(data, on_frame=on_frame)
    stall = 0
    last_pos = -1
    while True:
        r = dm.read_packet()
        for fr in out_frames:
            yield fr
        out_frames.clear()
        if r in (1, 0x80):
            break
        if dm.position == last_pos:
            stall += 1
            if stall > 2:
                break
        else:
            stall = 0
        last_pos = dm.position
    if pending_v and state["dec"] is not None:
        _flush_chunk(final=True)
        for fr in out_frames:
            yield fr
        out_frames.clear()


def _chunked_video_frames(dec, packets, W: int, H: int,
                          pcms=None) -> Iterator[DecodedFrame]:
    """Shared chunked video-only consumption: CHUNK_FRAMES per fused
    dispatch with per-frame containment (failed frame = last committed
    ring frame, corrupt=True).  ``pcms`` optionally pairs each packet with
    its PCM payload (VX2)."""
    S = dec.stride
    idx = 0

    def emit(y, uv, corrupt):
        nonlocal idx
        fr = DecodedFrame(
            index=idx, y=y[:H, :W].copy(),
            u=_uv_halves(uv[:H // 2], W, S)[0].copy(),
            v=_uv_halves(uv[:H // 2], W, S)[1].copy(),
            keyframe=(idx == 0),
            pcm=(pcms[idx] if pcms is not None else None),
            corrupt=corrupt)
        idx += 1
        return fr

    pending: list[bytes] = list(packets)
    while pending:
        yuv, _offs, err = dec.decode_stream_chunk(pending[:CHUNK_FRAMES])
        K = yuv.shape[0]
        for k in range(K):
            yield emit(yuv[k][:H], yuv[k][H:], False)
        if err is not None:
            prev = dec.ring_frame_np()[8:8 + H + H // 2, 8:8 + S]
            yield emit(prev[:H], prev[H:], True)
            pending = pending[K + 1:]
        else:
            pending = pending[min(CHUNK_FRAMES, len(pending)):]


def decode_moc5(data: bytes, engine: str = "oracle") -> Iterator[DecodedFrame]:
    """Decode a MOC5 (Wii) container: video-only, Moflex3DS codec profile
    (Form1.cs:282-320; audio format unknown upstream, README.md:14)."""
    from ..containers.moc5 import Moc5Demuxer
    dm = Moc5Demuxer(data)
    h = dm.header
    dec = _make_video_decoder(h.width, h.height, MobiclipVersion.MOFLEX_3DS,
                              engine)
    if hasattr(dec, "decode_stream_chunk"):
        yield from _chunked_video_frames(dec, dm.frames(),
                                         h.width, h.height)
        return
    S = dec.stride
    for i, pkt in enumerate(dm.frames()):
        if isinstance(dec, OracleDecoder):
            dec.data = pkt
            dec.offset = 0
        y, uv, _end, corrupt = _decode_contained(dec, pkt)
        yield DecodedFrame(
            index=i, y=y[:h.height, :h.width].copy(),
            u=uv[:h.height // 2, :h.width // 2].copy(),
            v=uv[:h.height // 2, S // 2:S // 2 + h.width // 2].copy(),
            keyframe=(i == 0), pcm=None, corrupt=corrupt)


def decode_vx2(data: bytes, engine: str = "oracle") -> Iterator[DecodedFrame]:
    """Decode a raw VX2 stream: 256x192 Moflex3DS-profile video with
    interleaved raw mono PCM16 chunks (Program.cs:367-438)."""
    from ..containers.vx import VX2_HEIGHT, VX2_WIDTH, Vx2Demuxer
    dm = Vx2Demuxer(data)
    dec = _make_video_decoder(VX2_WIDTH, VX2_HEIGHT,
                              MobiclipVersion.MOFLEX_3DS, engine)
    if hasattr(dec, "decode_stream_chunk"):
        recs = list(dm.frames())
        pcms = [(np.frombuffer(p, dtype="<i2").copy() if p is not None
                 else None) for _, p in recs]
        yield from _chunked_video_frames(dec, [pkt for pkt, _ in recs],
                                         VX2_WIDTH, VX2_HEIGHT, pcms=pcms)
        return
    S = dec.stride
    for i, (pkt, pcm) in enumerate(dm.frames()):
        if isinstance(dec, OracleDecoder):
            dec.data = pkt
            dec.offset = 0
        y, uv, _end, corrupt = _decode_contained(dec, pkt)
        yield DecodedFrame(
            index=i, y=y[:VX2_HEIGHT, :VX2_WIDTH].copy(),
            u=uv[:VX2_HEIGHT // 2, :VX2_WIDTH // 2].copy(),
            v=uv[:VX2_HEIGHT // 2, S // 2:S // 2 + VX2_WIDTH // 2].copy(),
            keyframe=(i == 0), corrupt=corrupt,
            pcm=(np.frombuffer(pcm, dtype="<i2").copy()
                 if pcm is not None else None))


def read_y4m(path: str | Path):
    """Minimal YUV4MPEG2 reader (4:2:0): yields (y, u, v) + (W, H, fps)."""
    data = Path(path).read_bytes()
    nl = data.index(b"\n")
    fields = data[:nl].split(b" ")
    W = H = 0
    fps = 24.0
    for f in fields[1:]:
        if f[:1] == b"W":
            W = int(f[1:])
        elif f[:1] == b"H":
            H = int(f[1:])
        elif f[:1] == b"F":
            num, den = f[1:].split(b":")
            fps = int(num) / int(den)
    pos = nl + 1
    frames = []
    ysz, csz = W * H, (W // 2) * (H // 2)
    while pos < len(data) and data[pos:pos + 5] == b"FRAME":
        pos = data.index(b"\n", pos) + 1
        y = np.frombuffer(data, np.uint8, ysz, pos).reshape(H, W)
        u = np.frombuffer(data, np.uint8, csz, pos + ysz).reshape(H // 2, W // 2)
        v = np.frombuffer(data, np.uint8, csz,
                          pos + ysz + csz).reshape(H // 2, W // 2)
        frames.append((y, u, v))
        pos += ysz + 2 * csz
    return frames, (W, H, fps)


def encode_y4m_to_moflex(in_path: str | Path, out_path: str | Path,
                         qp: int = 0x16, gop: int = 30) -> dict:
    """Encode a .y4m into a single-video-stream .moflex (the role of
    MoflexSimpleVideoMuxer, MoflexSimpleVideoMuxer.cs:14-71)."""
    from ..containers.moflex import MoflexMuxer, VideoStream
    from ..models.encoder import MobiclipEncoder
    frames, (W, H, fps) = read_y4m(in_path)
    enc = MobiclipEncoder(W, H, MobiclipVersion.MOFLEX_3DS,
                          quantizer=qp, gop=gop)
    mux = MoflexMuxer([VideoStream(stream_index=0, codec_id=0,
                                   fps_rate=int(round(fps * 1000)),
                                   fps_scale=1000, width=W, height=H)])
    for y, u, v in frames:
        mux.add_frame(0, enc.encode_frame(y, u, v))
    Path(out_path).write_bytes(mux.to_bytes())
    return {"frames": len(frames), "width": W, "height": H,
            "bytes": Path(out_path).stat().st_size}


def split_stereo(frames, layout):
    """3D stream handling (Form1.cs:516-535 parity): for the interleaved
    3D layouts, even/odd frames are left/right eyes; returns (left, right)
    frame lists.  For Simple2D returns (frames, [])."""
    from ..containers.moflex import VideoLayout
    frames = list(frames)
    if layout in (VideoLayout.INTERLEAVE_3D_LEFT_FIRST,
                  VideoLayout.INTERLEAVE_3D_RIGHT_FIRST):
        a = frames[0::2]
        b = frames[1::2]
        if layout == VideoLayout.INTERLEAVE_3D_RIGHT_FIRST:
            a, b = b, a
        return a, b
    return frames, []


def anaglyph(left_rgb, right_rgb):
    """Red/cyan anaglyph compositor (Form1.cs:652-675 role): left frame's
    red channel + right frame's green/blue."""
    out = right_rgb.copy()
    out[..., 0] = left_rgb[..., 0]
    return out
