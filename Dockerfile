# livetalking_tpu serving image (reference ships a CUDA Dockerfile,
# reference Dockerfile:1; this is the TPU-native equivalent).
#
# Build:  docker build -t livetalking-tpu .
# Run  :  docker run --rm -p 8010:8010 --privileged livetalking-tpu \
#             --transport webrtc --model wav2lip
# On a TPU VM pass the libtpu runtime through (--privileged +
# /dev/accel*) and `pip install jax[tpu]` flavors as the host requires;
# the image defaults to CPU JAX so it also serves as the CI image.

FROM python:3.11-slim-bookworm

# g++ + ffmpeg dev libs: the first-party C++ A/V muxer
# (livetalking_tpu/native/avmux.cpp) self-builds at import time.
RUN apt-get update -yq \
 && DEBIAN_FRONTEND=noninteractive apt-get install -yq --no-install-recommends \
    g++ make pkg-config ffmpeg \
    libavformat-dev libavcodec-dev libavutil-dev libswscale-dev libswresample-dev \
 && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/livetalking_tpu

COPY requirements.txt pyproject.toml README.md ./
RUN pip install --no-cache-dir -r requirements.txt

COPY livetalking_tpu ./livetalking_tpu
COPY web ./web
COPY config.yaml ./
RUN pip install --no-cache-dir --no-deps -e .

# rtc + tts extras are pure-python; bake them so the default transport works
RUN pip install --no-cache-dir aiortc av edge-tts websockets || true

EXPOSE 8010
ENTRYPOINT ["python", "-m", "livetalking_tpu.app"]
CMD ["--transport", "webrtc", "--model", "wav2lip", "--listenport", "8010"]
