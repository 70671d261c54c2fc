#!/usr/bin/env python3
"""Extract codec constant tables from the reference C# sources into a binary .npz.

The Mobiclip codec is table-driven: VLC tables, Huffman mode LUTs, quantizer
matrices, zigzag scans and clamp LUTs are part of the *bitstream format*, not of
any particular implementation.  We pull them out of the reference sources
(/root/reference, read-only) by parsing the C# array initializers by name, and
bake them into `mobiclipdecoder_tpu/tables/mobiclip_tables.npz` with semantic
names.  Nothing else of the reference is machine-translated.

Sources:
  LibMobiclip/Codec/Mobiclip/MobiConst.cs        (coefficient VLC, clamp, zigzag)
  LibMobiclip/Codec/Mobiclip/MobiclipDecoder.cs  (partition Huffman LUTs, CBP
                                                  permutations, quant matrices)

Run:  python tools/extract_tables.py
"""
import re
import sys
import numpy as np
from pathlib import Path

REF = Path("/root/reference/LibMobiclip/Codec/Mobiclip")
OUT = Path(__file__).resolve().parent.parent / "mobiclipdecoder_tpu" / "tables" / "mobiclip_tables.npz"


def parse_csharp_array(src: str, name: str) -> np.ndarray:
    """Parse a 1-D C# array initializer `T[] name = { ... };` into int64 array
    (handles negative hex/decimal literals)."""
    m = re.search(
        r"(?:ushort|byte|int|uint)\[\]\s+" + re.escape(name) + r"\s*=\s*\{(.*?)\};",
        src,
        re.DOTALL,
    )
    if m is None:
        raise KeyError(f"array {name} not found")
    body = m.group(1)
    vals = [int(tok.replace(" ", ""), 0)
            for tok in re.findall(r"-?\s*0x[0-9A-Fa-f]+|-?\d+", body)]
    return np.array(vals, dtype=np.int64)


def parse_csharp_array3(src: str, name: str) -> np.ndarray:
    """Parse a 3-D C# array initializer `int[, ,] name = { {{a,b},...}, ... };`."""
    m = re.search(
        r"int\[\s*,\s*,\s*\]\s+" + re.escape(name) + r"\s*=\s*\{(.*?)\n\s*\};",
        src,
        re.DOTALL,
    )
    if m is None:
        raise KeyError(f"array {name} not found")
    body = m.group(1)
    rows = re.findall(r"\{((?:\{[^{}]*\},?\s*)+)\}", body)
    out = []
    for row in rows:
        pairs = re.findall(r"\{([^{}]*)\}", row)
        out.append([[int(t, 0) for t in re.findall(r"-?\d+", p)] for p in pairs])
    return np.array(out, dtype=np.int64)


def main() -> None:
    const_src = (REF / "MobiConst.cs").read_text()
    dec_src = (REF / "MobiclipDecoder.cs").read_text()

    t: dict[str, np.ndarray] = {}

    # --- coefficient VLC / clamp / zigzag (MobiConst.cs) -------------------
    # Entry format of coef_vlc*_a (MobiConst.cs:10-14): E SSSSSS VVVVV BBBB
    t["coef_vlc0_a"] = parse_csharp_array(const_src, "Vx2Table0_A").astype(np.uint16)
    t["coef_vlc0_b"] = parse_csharp_array(const_src, "Vx2Table0_B").astype(np.uint8)
    t["coef_vlc1_a"] = parse_csharp_array(const_src, "Vx2Table1_A").astype(np.uint16)
    t["coef_vlc1_b"] = parse_csharp_array(const_src, "Vx2Table1_B").astype(np.uint8)
    # 384-entry saturation LUT: idx 0x40+v == clip(v, 0, 255) (MobiConst.cs:587)
    t["minmax"] = parse_csharp_array(const_src, "Vx2MinMaxTable").astype(np.uint8)
    # scan-order -> raster-position tables (decoder uses these directly)
    t["scan_to_raster8"] = parse_csharp_array(const_src, "DeZigZagTable8x8").astype(np.uint8)
    t["raster_to_scan8"] = parse_csharp_array(const_src, "ZigZagTable8x8").astype(np.uint8)
    t["scan_to_raster4"] = parse_csharp_array(const_src, "DeZigZagTable4x4").astype(np.uint8)
    t["raster_to_scan4"] = parse_csharp_array(const_src, "ZigZagTable4x4").astype(np.uint8)
    # encoder-side inverse coefficient VLC ([level-class][run][2] -> code info)
    t["coef_vlc0_inv"] = parse_csharp_array3(const_src, "VxTable0_A_Ref")

    # --- FastAudio codec tables (LibMobiclip/Codec/FastAudio/
    #     FastAudioDecoder.cs:74-128, 313-379) ------------------------------
    fa_src = (REF.parent / "FastAudio" / "FastAudioDecoder.cs").read_text()
    t["fa_lpc_q0"] = parse_csharp_array(fa_src, "dword_9C8")
    t["fa_lpc_q1"] = parse_csharp_array(fa_src, "dword_AC8")
    t["fa_lpc_q2"] = parse_csharp_array(fa_src, "dword_B48")
    t["fa_lpc_q3"] = parse_csharp_array(fa_src, "dword_BC8")
    t["fa_lpc_q4"] = parse_csharp_array(fa_src, "dword_C08")
    t["fa_lpc_q5"] = parse_csharp_array(fa_src, "dword_C28")
    t["fa_lpc_q6"] = parse_csharp_array(fa_src, "dword_11B4")
    t["fa_pulse"] = parse_csharp_array(fa_src, "dword_1570")

    # --- quantizer matrices (MobiclipDecoder.cs:3800-3880) -----------------
    t["qscale8"] = parse_csharp_array(dec_src, "byte_118DD4").astype(np.uint8).reshape(6, 64)
    t["qscale4"] = parse_csharp_array(dec_src, "byte_118F94").astype(np.uint8).reshape(6, 16)
    t["qp_div6"] = parse_csharp_array(dec_src, "byte_119004").astype(np.uint8)
    t["qp_mod6"] = parse_csharp_array(dec_src, "byte_11903A").astype(np.uint8)

    # --- CBP permutation LUTs (MobiclipDecoder.cs) --------------------------
    t["cbp_intra"] = parse_csharp_array(dec_src, "byte_115FC4").astype(np.uint8)   # :1748
    t["cbp_inter"] = parse_csharp_array(dec_src, "byte_116160").astype(np.uint8)   # :1809
    t["cbp_split8"] = parse_csharp_array(dec_src, "byte_1164F4").astype(np.uint8)  # :2863
    t["cbp_sub4"] = parse_csharp_array(dec_src, "byte_1165C4").astype(np.uint8)    # :2904

    # --- P-block partition-mode Huffman LUTs -------------------------------
    # (mode LUT indexed by an N-bit peek, bit-count LUT indexed by mode;
    #  MobiclipDecoder.cs:458-1746, one pair per block size per profile)
    pblock = {
        # (w, h): (moflex_mode, moflex_bits, moflex_peek, mods_mode, mods_bits, mods_peek)
        (16, 16): ("byte_114884", "byte_1148EC", 6,
                   "PBlock16x16HuffmanTableModsDS", "PBlock16x16BitCountTableModsDS", 5),
        (8, 16): ("PBlock8x16HuffmanTableMoflex3DS", "PBlock8x16BitCountTableMoflex3DS", 5,
                  "PBlock8x16HuffmanTableModsDS", "PBlock8x16BitCountTableModsDS", 4),
        (4, 16): ("byte_114D80", "byte_114DB8", 4,
                  "PBlock4x16HuffmanTableModsDS", "PBlock4x16BitCountTableModsDS", 4),
        (2, 16): ("byte_114FA8", "byte_114FE0", 4,
                  "PBlock2x16HuffmanTableModsDS", "PBlock2x16BitCountTableModsDS", 5),
        (16, 8): ("byte_1150B4", "byte_1150FC", 5,
                  "PBlock16x8HuffmanTableModsDS", "PBlock16x8BitCountTableModsDS", 4),
        (16, 4): ("byte_1151E8", "byte_115220", 4,
                  "PBlock16x4HuffmanTableModsDS", "PBlock16x4BitCountTableModsDS", 4),
        (16, 2): ("byte_11530C", "byte_115344", 4,
                  "PBlock16x2HuffmanTableModsDS", "PBlock16x2BitCountTableModsDS", 4),
        (8, 8): ("byte_115418", "byte_115450", 4,
                 "PBlock8x8HuffmanTableModsDS", "PBlock8x8BitCountTableModsDS", 4),
        (8, 4): ("byte_11553C", "byte_115584", 5,
                 "PBlock8x4HuffmanTableModsDS", "PBlock8x4BitCountTableModsDS", 4),
        (8, 2): ("byte_115670", "byte_1156A8", 4,
                 "PBlock8x2HuffmanTableModsDS", "PBlock8x2BitCountTableModsDS", 4),
        (4, 8): ("byte_11577C", "byte_1157C4", 5,
                 "PBlock4x8HuffmanTableModsDS", "PBlock4x8BitCountTableModsDS", 4),
        (4, 4): ("byte_1158B0", "byte_1158E8", 4,
                 "PBlock4x4HuffmanTableModsDS", "PBlock4x4BitCountTableModsDS", 5),
        (4, 2): ("byte_1159D4", "byte_115A0C", 4,
                 "PBlock4x2HuffmanTableModsDS", "PBlock4x2BitCountTableModsDS", 4),
        (2, 8): ("byte_115AE0", "byte_115B18", 4,
                 "PBlock2x8HuffmanTableModsDS", "PBlock2x8BitCountTableModsDS", 5),
        (2, 4): ("byte_115BEC", "byte_115C24", 4,
                 "PBlock2x4HuffmanTableModsDS", "PBlock2x4BitCountTableModsDS", 4),
        (2, 2): ("byte_115CF8", "byte_115D28", 3,
                 "PBlock2x2HuffmanTableModsDS", "PBlock2x2BitCountTableModsDS", 3),
    }
    for (w, h), (mo_m, mo_b, mo_p, md_m, md_b, md_p) in pblock.items():
        mo_mode = parse_csharp_array(dec_src, mo_m).astype(np.uint8)
        md_mode = parse_csharp_array(dec_src, md_m).astype(np.uint8)
        assert len(mo_mode) == 1 << mo_p, (w, h, "moflex", len(mo_mode), mo_p)
        assert len(md_mode) == 1 << md_p, (w, h, "mods", len(md_mode), md_p)
        t[f"pb{w}x{h}_mode_moflex"] = mo_mode
        t[f"pb{w}x{h}_bits_moflex"] = parse_csharp_array(dec_src, mo_b).astype(np.uint8)
        t[f"pb{w}x{h}_peek_moflex"] = np.array(mo_p, dtype=np.uint8)
        t[f"pb{w}x{h}_mode_mods"] = md_mode
        t[f"pb{w}x{h}_bits_mods"] = parse_csharp_array(dec_src, md_b).astype(np.uint8)
        t[f"pb{w}x{h}_peek_mods"] = np.array(md_p, dtype=np.uint8)

    # sanity checks against known structure
    assert t["coef_vlc0_a"].shape == (4096,)
    assert t["coef_vlc1_a"].shape == (4096,)
    assert t["minmax"].shape == (384,)
    assert t["minmax"][0x40] == 0 and t["minmax"][0x40 + 255] == 255
    assert (t["scan_to_raster8"][t["raster_to_scan8"].astype(int)] ==
            np.arange(64)).all()
    assert (t["scan_to_raster4"][t["raster_to_scan4"].astype(int)] ==
            np.arange(16)).all()
    assert t["cbp_intra"].shape == (64,) and t["cbp_inter"].shape == (64,)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **t)
    print(f"wrote {OUT} with {len(t)} tables "
          f"({OUT.stat().st_size / 1024:.1f} KiB)")


if __name__ == "__main__":
    sys.exit(main())
