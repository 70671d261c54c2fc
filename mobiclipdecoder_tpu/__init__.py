"""mobiclipdecoder_tpu: a TPU-native Mobiclip A/V decode engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Gericom/MobiclipDecoder (C#): Mobiclip video decode (DS MODS and
3DS Moflex profiles, Wii MOC5), container demuxing (Moflex/MODS/MOC5/VX2),
audio codecs (IMA ADPCM, Sx, FastAudio), an encoder, and pod-scale batch
transcoding via GOP sharding.
"""
__version__ = "0.1.0"
