"""Device-side ops: mel spectrogram, image gather/paste-back, fused kernels."""
