"""Pallas IDCT kernel vs the XLA reference kernel (interpreter mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mobiclipdecoder_tpu.ops.idct import idct8  # noqa: E402
from mobiclipdecoder_tpu.ops.idct_pallas import idct8_blocks_via_pallas  # noqa: E402


def test_pallas_idct_matches_reference():
    rng = np.random.default_rng(0)
    blocks = rng.integers(-3000, 3000, size=(200, 8, 8)).astype(np.int32)
    want = np.asarray(idct8(jnp.asarray(blocks)))
    got = np.asarray(idct8_blocks_via_pallas(jnp.asarray(blocks),
                                             interpret=True))
    np.testing.assert_array_equal(got, want)
