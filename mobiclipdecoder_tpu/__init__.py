"""mobiclipdecoder_tpu: a TPU-native Mobiclip A/V decode engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Gericom/MobiclipDecoder (C#): Mobiclip video decode (DS MODS and
3DS Moflex profiles, Wii MOC5), container demuxing (Moflex/MODS/MOC5/VX2),
audio codecs (IMA ADPCM, Sx, FastAudio), an encoder, and pod-scale batch
transcoding via GOP sharding.
"""
__version__ = "0.1.0"


def _enable_persistent_cache() -> None:
    """Point JAX at a repo-local persistent compilation cache.

    The VMEM executor kernels compile slowly through the remote-TPU
    tunnel's AOT pipeline (the fused whole-GOP kernel measured ~4-6 min);
    with the cache every (geometry, bucket) shape compiles exactly once
    ever, across processes.  Central here so every entry point (bench,
    CLI, library use) gets it — not just models.pipeline."""
    import os
    try:
        import jax
        cache = os.environ.get(
            "MOBICLIP_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:   # jax absent or knobs renamed: non-fatal
        pass


_enable_persistent_cache()
