"""LiveTalking-TPU: a TPU-native real-time streaming digital-human framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of lipku/LiveTalking:
text/audio in -> TTS -> per-frame acoustic features (mel / Whisper / HuBERT)
-> lip-sync network (Wav2Lip / MuseTalk / Ultralight) repainting the mouth of
a looping avatar -> 25 fps A/V out over WebRTC / RTMP / virtual camera.

Architecture (TPU-first, not a port):
  - all NN compute is pure-functional JAX, jit-compiled once with static
    shapes, bfloat16 weights on the MXU (models/, ops/);
  - per-session control flow (queues, threads, back-pressure) is host Python
    mirroring the reference engine contracts (avatars/base_avatar.py of the
    reference);
  - multi-session inference coalesces into one padded device batch per tick
    (engine/scheduler.py) instead of one GPU stream per session;
  - multi-chip scaling uses jax.sharding.Mesh + XLA collectives over ICI
    (parallel/).
"""

__version__ = "0.1.0"
