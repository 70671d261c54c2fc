"""IDCT kernels: device transforms vs oracle, and sparse-variant equivalence.

Locks the claim that the reference's sparse IDCT variants (IDCT1Px8, IDCT3Px8,
IDCT16Px8, IDCT1Px4) are exactly the full butterfly restricted to their
coefficient support — which is why the device path only implements the full
transforms.
"""
import numpy as np
import pytest

from mobiclipdecoder_tpu.models.oracle_video import (MobiclipVersion,
                                                     OracleDecoder)

jnp = pytest.importorskip("jax.numpy")
from mobiclipdecoder_tpu.ops.idct import idct4, idct8  # noqa: E402


def _oracle_apply(dense, last, n):
    """Run the oracle's variant-dispatched IDCT on a gray plane, return the
    resulting block (prediction 128 subtracted away by comparison)."""
    dec = OracleDecoder(16, 16, MobiclipVersion.MODS_DS)
    plane = np.full(256 * 16, 128, dtype=np.uint8)
    dec.y_planes[0] = plane
    dec._apply_idct(plane, 0, n, (dense, last))
    return plane.reshape(16, 256)[:n, :n].astype(np.int32) - 128


@pytest.mark.parametrize("last,support", [
    (11, [(0, 0)]),                                  # IDCT1Px8
    (13, [(0, 0), (0, 1), (1, 0)]),                  # IDCT3Px8
    (20, [(r, c) for r in range(4) for c in range(4)]),  # IDCT16Px8
    (74, None),                                      # IDCT64Px8 (full)
])
def test_idct8_variants_match_device(last, support):
    rng = np.random.default_rng(last)
    N = 20
    dense = np.zeros((N, 8, 8), np.int32)
    cells = support or [(r, c) for r in range(8) for c in range(8)]
    for i in range(N):
        for (r, c) in cells:
            dense[i, r, c] = int(rng.integers(-3000, 3000))
    got = np.asarray(idct8(jnp.asarray(dense)))
    for i in range(N):
        want = _oracle_apply(dense[i], last, 8)
        np.testing.assert_array_equal(np.clip(128 + got[i], 0, 255) - 128, want)


@pytest.mark.parametrize("last,support", [
    (75, [(0, 0)]),                                  # IDCT1Px4
    (90, None),                                      # IDCT16Px4 (full)
])
def test_idct4_variants_match_device(last, support):
    rng = np.random.default_rng(last)
    N = 20
    dense = np.zeros((N, 4, 4), np.int32)
    cells = support or [(r, c) for r in range(4) for c in range(4)]
    for i in range(N):
        for (r, c) in cells:
            dense[i, r, c] = int(rng.integers(-3000, 3000))
    got = np.asarray(idct4(jnp.asarray(dense)))
    for i in range(N):
        want = _oracle_apply(dense[i], last, 4)
        np.testing.assert_array_equal(np.clip(128 + got[i], 0, 255) - 128, want)


def test_idct8_batched():
    rng = np.random.default_rng(0)
    dense = rng.integers(-2000, 2000, size=(32, 8, 8)).astype(np.int32)
    got = np.asarray(idct8(jnp.asarray(dense)))
    for i in range(32):
        want = _oracle_apply(dense[i], 74, 8)
        np.testing.assert_array_equal(np.clip(128 + got[i], 0, 255) - 128, want)
