"""Differential fuzz: the Python planner and the C++ scanner must agree on
every byte string — identical unified op streams on accept, and agreement
on rejection for malformed input (the reference decoder throws on illegal
codes, e.g. MobiclipDecoder.cs:625,730; our oracle mirrors that and the
C++ scanner flags ``bad``).

Until now bit-identity was only asserted on the synthesizer's legal-stream
distribution (test_native.py / test_native_gop.py); a divergence in an
accept/reject decision or in a rarely-taken parse branch would go unseen.
Seeded structured fuzz: random bytes, bit-flipped legal streams, truncated
legal streams, plus valid controls.
"""
import shutil

import numpy as np
import pytest

from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
from mobiclipdecoder_tpu.models.plan import PlanningDecoder
from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from mobiclipdecoder_tpu.utils.native import NativePlanner  # noqa: E402

W, H = 64, 48


def _py_scan(version, packets):
    """Scan ``packets`` in sequence with a fresh Python planner; returns
    ("ok", unified_plan_of_last, offset) or ("reject",) if any raises."""
    py = PlanningDecoder(W, H, version)
    try:
        for pkt in packets:
            py.data = pkt
            py.offset = 0
            py.decode_frame()
            plan = py.unified_plan()
        return ("ok", plan, py.offset)
    except Exception:
        return ("reject",)


def _nat_scan(nat, packets):
    """Same through the C++ scanner; caller passes a rolled-back context."""
    try:
        for pkt in packets:
            un = nat.scan_unified(pkt)
        return ("ok", un, nat.offset)
    except ValueError:
        return ("reject",)


def _agree(version, nat, packets, ctx):
    r_py = _py_scan(version, packets)
    nat.rollback()
    nat.checkpoint()
    r_nat = _nat_scan(nat, packets)
    assert r_py[0] == r_nat[0], (ctx, r_py[0], r_nat[0])
    if r_py[0] == "ok":
        up, un = r_py[1], r_nat[1]
        assert (up["ops"] == un["ops"]).all(), ctx
        assert (up["coefs"] == un["coefs"]).all(), ctx
        assert (up["sizes"] == un["sizes"]).all(), ctx
        assert r_py[2] == r_nat[2], (ctx, "consumed offset")
    return r_py[0]


@pytest.mark.parametrize("version", [MobiclipVersion.MODS_DS,
                                     MobiclipVersion.MOFLEX_3DS])
def test_fuzz_planner_vs_scanner(version):
    rng = np.random.default_rng(0xF022 + int(version))
    nat = NativePlanner(W, H, int(version))
    nat.checkpoint()
    outcomes = {"ok": 0, "reject": 0}

    # a pool of legal streams to mutate (fresh synth per pool entry so the
    # packets are self-consistent)
    pool = []
    for seed in range(8):
        s = StreamSynthesizer(W, H, version, seed=seed)
        i = s.iframe(0x18, table=seed & 1)
        p = s.pframe(dq=(seed % 3) - 1)
        pool.append((i, p))

    n_cases = 0
    for case in range(500):
        kind = case % 5
        if kind == 0:
            # random bytes, arbitrary length incl. odd/tiny
            ln = int(rng.integers(0, 300))
            pkts = [rng.integers(0, 256, ln, dtype=np.uint8).tobytes()]
        elif kind == 4:
            # zero-biased bytes: long zero runs drive degenerate varint
            # prefixes (up to 31/32 leading zeros — the C# int-wrap edge)
            ln = int(rng.integers(2, 200))
            pool_b = np.array([0, 0, 0, 0, 0, 1, 0x80, 0xFF], np.uint8)
            pkts = [pool_b[rng.integers(0, 8, ln)].tobytes()]
        elif kind == 1:
            # bit-flipped I-frame
            i, _p = pool[case % len(pool)]
            buf = bytearray(i)
            for _ in range(int(rng.integers(1, 16))):
                pos = int(rng.integers(0, len(buf)))
                buf[pos] ^= 1 << int(rng.integers(0, 8))
            pkts = [bytes(buf)]
        elif kind == 2:
            # good I-frame, bit-flipped P-frame (exercises cross-frame
            # state: MV cache, quantizer, imode cache)
            i, p = pool[case % len(pool)]
            buf = bytearray(p)
            for _ in range(int(rng.integers(1, 16))):
                pos = int(rng.integers(0, len(buf)))
                buf[pos] ^= 1 << int(rng.integers(0, 8))
            pkts = [i, bytes(buf)]
        else:
            # truncation (odd lengths reach the odd-tail refill contract)
            i, p = pool[case % len(pool)]
            cut = int(rng.integers(0, len(i)))
            pkts = [i[:cut]]
        outcomes[_agree(version, nat, pkts, ctx=(case, kind))] += 1
        n_cases += 1

    # the distribution must exercise both outcomes heavily
    assert outcomes["ok"] >= 25, outcomes
    assert outcomes["reject"] >= 100, outcomes
    assert n_cases == 500


@pytest.mark.parametrize("version", [MobiclipVersion.MODS_DS,
                                     MobiclipVersion.MOFLEX_3DS])
def test_fuzz_valid_controls(version):
    """Valid multi-frame streams (controls) must always accept and match."""
    nat = NativePlanner(W, H, int(version))
    nat.checkpoint()
    for seed in (100, 101):
        s = StreamSynthesizer(W, H, version, seed=seed)
        pkts = [s.iframe(0x18, table=1), s.pframe(), s.pframe(dq=2)]
        assert _agree(version, nat, pkts, ctx=seed) == "ok"
