"""Measurement: does GSPMD 'tile' sharding of the plane width actually
partition the wavefront engine, or silently gather?

Run on an 8-device CPU mesh; compiles the XLA batch engine with the ring
width sharded over a 'tile' axis and inspects the compiled HLO.

Committed finding (round 3, this probe): GSPMD inserts
``all-gather s32[1,6,HH,S] dimensions={3}`` immediately — the scattered
decode-order plane updates make width partitioning unprofitable to the
partitioner, so every device materializes the full plane and ~3x more ops
run at full width than sharded width.  The 'tile' axis was therefore
REMOVED from parallel/batch.py (streams/GOPs are the scaling axis; a DS
ring is 432 KiB and even Wii frames decode 4x realtime on one chip, so
intra-frame spatial sharding has no workload).  SURVEY.md §5's ppermute
halo design remains the recipe if a >4K-frame profile ever appears.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/probe_tile_hlo.py
"""
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mobiclipdecoder_tpu.models.oracle_video import MobiclipVersion
    from mobiclipdecoder_tpu.parallel.batch import (BatchVideoDecoder,
                                                    _decode_batch)
    from mobiclipdecoder_tpu.testing.synth import StreamSynthesizer

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "tile"))
    B, W, H = 2, 128, 96
    bd = BatchVideoDecoder(W, H, MobiclipVersion.MODS_DS, batch=B,
                           mesh=mesh)
    synths = [StreamSynthesizer(W, H, MobiclipVersion.MODS_DS, seed=s)
              for s in range(B)]
    arrays = bd.scan_packets([s.iframe(0x18) for s in synths])
    arrays = {k: jax.device_put(v, bd.data_sharding)
              for k, v in arrays.items()}
    # force the width-tiled ring sharding this probe is about (batch.py no
    # longer requests it by default — this probe documents why)
    ring = jax.device_put(np.zeros((B, 6, H + H // 2, bd.stride), np.int32),
                          NamedSharding(mesh, P("data", None, None, "tile")))
    ring = jnp.roll(ring, 1, axis=1)
    comp = _decode_batch.lower(
        ring, arrays["mc"], arrays["resid"], arrays["resid_coef"],
        arrays["iops"], arrays["icoef"], arrays["seqmap"],
        arrays["n_levels"], H, bd.stride).compile()
    txt = comp.as_text()
    gathers = re.findall(r"all-gather[^\n]*", txt)
    full = len(re.findall(r"\b\d+,%d\]" % bd.stride, txt))
    shard = len(re.findall(r"\b\d+,%d\]" % (bd.stride // 4), txt))
    print(json.dumps({
        "metric": "tile_axis_partitioning",
        "all_gather_count": len(gathers),
        "first_gather": gathers[0][:120] if gathers else None,
        "full_width_ops": full,
        "tile_width_ops": shard,
        "verdict": ("GSPMD gathers the full plane -> tile axis dropped"
                    if gathers else "partitioned"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
