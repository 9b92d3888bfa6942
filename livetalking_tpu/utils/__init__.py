"""Host-side utilities: logging, images, audio decode/resample, timing."""
