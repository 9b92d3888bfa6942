"""Native A/V module tests: build, mux/encode round-trip, in-memory decode,
RTMP streamout plugin against a local RTMP-less file sink, and the
engine's native recording path."""

import os

import numpy as np
import pytest

native = pytest.importorskip("livetalking_tpu.native")

if not native.available():  # toolchain missing: skip whole module
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_encoder_available():
    assert native.video_encoder_name() != "none"


def test_mux_decode_roundtrip(tmp_path):
    path = str(tmp_path / "out.mp4")
    m = native.AVMuxer(path, 160, 120, 25)
    tone = (np.sin(2 * np.pi * 440 * np.arange(640) / 16000) * 16000).astype(np.int16)
    for i in range(25):
        m.write_video(np.full((120, 160, 3), (i * 9) % 255, np.uint8))
        m.write_audio(tone)
    m.close()
    assert os.path.getsize(path) > 1000

    with open(path, "rb") as f:
        audio = native.decode_audio_bytes(f.read())
    # 1 s = 16000 samples written = 15x1024 + 640: the fifo tail drain must
    # keep the final partial AAC frame (without it only 15360 survive)
    assert 15700 < audio.shape[0] <= 16600, audio.shape
    # the 440 Hz tone must survive the aac round trip
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / 16000)
    assert abs(freqs[np.argmax(spec)] - 440) < 30


def test_decode_wav_bytes():
    import io
    import wave

    buf = io.BytesIO()
    pcm = (np.sin(2 * np.pi * 220 * np.arange(24000) / 24000) * 16000).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(pcm.tobytes())
    audio = native.decode_audio_bytes(buf.getvalue(), 16000)
    assert abs(audio.shape[0] - 16000) < 50  # resampled 24k -> 16k


def test_rtmp_plugin_writes_flv(tmp_path):
    """The RTMP plugin against a local file URL (flv format, no server)."""
    from livetalking_tpu.config import default_opt
    from livetalking_tpu.streamout.rtmp import RTMPOutput

    flv = str(tmp_path / "stream.flv")
    opt = default_opt(push_url=flv, fps=25)
    out = RTMPOutput(opt=opt, parent=None)
    out.push_url = flv
    out.start()
    tone = (np.zeros(320)).astype(np.int16)
    out.push_audio_frame(tone)  # audio before video must be buffered
    for _ in range(5):
        out.push_video_frame(np.zeros((120, 160, 3), np.uint8))
        out.push_audio_frame(tone)
        out.push_audio_frame(tone)
    out.stop()
    assert os.path.getsize(flv) > 500


def test_engine_native_recording(tmp_path, monkeypatch):
    """BaseAvatar recording through the native muxer (no ffmpeg CLI)."""
    monkeypatch.chdir(tmp_path)
    from livetalking_tpu.avatars.base_avatar import BaseAvatar
    from livetalking_tpu.config import default_opt

    opt = default_opt(transport="null", tts="dummy", sessionid="rec1")
    session = BaseAvatar(opt)
    session.start_recording()
    assert session.recording
    tone = (np.zeros(320)).astype(np.int16)
    for _ in range(25):
        session.record_video_data(np.zeros((120, 160, 3), np.uint8))
        session.record_audio_data(tone)
        session.record_audio_data(tone)
    session.stop_recording()
    out = tmp_path / "data" / "record" / "rec1.mp4"
    assert out.exists() and out.stat().st_size > 1000
