"""TTS plugin protocol tests against a local fake provider server.

Each HTTP plugin is exercised against an in-process aiohttp server that
speaks the provider's wire protocol (streamed PCM at the provider's rate);
assertions cover chunking (320-sample 20 ms frames), start/end
eventpoints, resampling, interrupt (PAUSE) behavior and error paths.
Doubao runs against a local fake websocket server speaking the binary
framing.
"""

import asyncio
import gzip
import io
import json
import struct
import threading
import time
import wave

import numpy as np
import pytest
from aiohttp import web

from livetalking_tpu.config import default_opt
from livetalking_tpu.tts.base import State

PORT = 18721


def _tone_pcm16(sr: int, seconds: float = 0.3, freq: float = 440.0) -> bytes:
    t = np.arange(int(sr * seconds)) / sr
    return (np.sin(2 * np.pi * freq * t) * 16000).astype("<i2").tobytes()


def _wav_bytes(sr: int, pcm16: bytes) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16)
    return buf.getvalue()


async def _stream(request, payload: bytes, chunk: int):
    resp = web.StreamResponse(status=200)
    await resp.prepare(request)
    for i in range(0, len(payload), chunk):
        await resp.write(payload[i : i + chunk])
    await resp.write_eof()
    return resp


@pytest.fixture(scope="module")
def fake_server():
    loop = asyncio.new_event_loop()
    app = web.Application()

    async def sovits_tts(request):
        body = await request.json()
        assert body["media_type"] == "ogg" and body["streaming_mode"] is True
        # one self-contained (decodable) segment per chunk; WAV stands in
        # for ogg since the plugin decodes each chunk as a container
        seg = _wav_bytes(32000, _tone_pcm16(32000, 0.2))
        resp = web.StreamResponse(status=200)
        await resp.prepare(request)
        for _ in range(2):
            await resp.write(seg)
        await resp.write_eof()
        return resp

    async def cosy(request):
        return await _stream(request, _tone_pcm16(24000), 9600)

    async def fish(request):
        body = await request.json()
        assert body["streaming"] is True
        return await _stream(request, _tone_pcm16(44100), 17640)

    async def tencent(request):
        body = await request.json()
        if body["VoiceType"] == 999999:  # error path
            err = json.dumps({"Response": {"Error": {"Code": "x", "Message": "bad voice"}}})
            return await _stream(request, err.encode(), 6400)
        return await _stream(request, _tone_pcm16(16000), 6400)

    async def clone_speaker(request):
        return web.json_response({"gpt_cond_latent": [0.0], "speaker_embedding": [0.0]})

    async def xtts_stream(request):
        body = await request.json()
        assert "gpt_cond_latent" in body and body["text"]
        return await _stream(request, _tone_pcm16(24000), 4800)

    async def omni(request):
        body = await request.json()
        assert body["response_format"] == "pcm"
        return await _stream(request, _tone_pcm16(24000), 1920)

    app.router.add_post("/tts", sovits_tts)
    app.router.add_route("GET", "/inference_zero_shot", cosy)
    app.router.add_post("/v1/tts", fish)
    app.router.add_post("/tencent_stream", tencent)
    app.router.add_post("/clone_speaker", clone_speaker)
    app.router.add_post("/tts_stream", xtts_stream)
    app.router.add_post("/v1/audio/speech", omni)

    def run():
        asyncio.set_event_loop(loop)
        runner = web.AppRunner(app)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", PORT)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.5)
    yield f"http://127.0.0.1:{PORT}"
    loop.call_soon_threadsafe(loop.stop)


class FakeParent:
    def __init__(self):
        self.frames = []
        self.sessionid = "t"

    def put_audio_frame(self, chunk, eventpoint=None):
        self.frames.append((np.asarray(chunk), eventpoint or {}))


def _mk(plugin_cls, server, **opt_kw):
    opt = default_opt(TTS_SERVER=server, **opt_kw)
    parent = FakeParent()
    return plugin_cls(opt, parent), parent


def _assert_stream_contract(parent, expect_audio=True):
    assert parent.frames, "no frames emitted"
    for frame, _ev in parent.frames:
        assert frame.shape == (320,) and frame.dtype == np.float32
    events = [ev for _f, ev in parent.frames if ev.get("status")]
    assert events[0]["status"] == "start"
    assert events[-1]["status"] == "end"
    if expect_audio:
        energy = max(float(np.abs(f).max()) for f, _ in parent.frames)
        assert energy > 0.01, "stream is silent"


def test_sovits(fake_server):
    from livetalking_tpu.tts.sovits import SovitsTTS

    tts, parent = _mk(SovitsTTS, fake_server, REF_FILE="ref.wav", REF_TEXT="hi")
    tts.txt_to_audio(("hello", {}))
    _assert_stream_contract(parent)


def test_cosyvoice(fake_server, tmp_path):
    from livetalking_tpu.tts.cosyvoice import CosyVoiceTTS

    ref = tmp_path / "prompt.wav"
    ref.write_bytes(_wav_bytes(16000, _tone_pcm16(16000, 0.1)))
    tts, parent = _mk(CosyVoiceTTS, fake_server, REF_FILE=str(ref), REF_TEXT="prompt")
    tts.txt_to_audio(("hello", {}))
    _assert_stream_contract(parent)
    # 0.3 s of source audio -> ~15 frames of 20 ms
    assert 10 <= len(parent.frames) <= 20


def test_fish(fake_server):
    from livetalking_tpu.tts.fish import FishTTS

    tts, parent = _mk(FishTTS, fake_server, REF_FILE="speaker-1")
    tts.txt_to_audio(("hello", {}))
    _assert_stream_contract(parent)


def test_tencent_ok_and_error(fake_server, monkeypatch):
    from livetalking_tpu.tts import tencent as mod

    monkeypatch.setenv("TENCENT_APPID", "123")
    monkeypatch.setenv("TENCENT_SECRET_ID", "sid")
    monkeypatch.setenv("TENCENT_SECRET_KEY", "skey")
    opt = default_opt(REF_FILE="101001", tencent_endpoint=f"{fake_server}/tencent_stream")
    parent = FakeParent()
    tts = mod.TencentTTS(opt, parent)
    tts.txt_to_audio(("hello", {}))
    _assert_stream_contract(parent)

    # error path: server returns a JSON error envelope -> only the end frame
    parent2 = FakeParent()
    tts2 = mod.TencentTTS(opt, parent2)
    tts2.txt_to_audio(("hello", {"tts": {"ref_file": "999999"}}))
    assert len(parent2.frames) == 1
    assert parent2.frames[0][1]["status"] == "end"


def test_xtts(fake_server):
    from livetalking_tpu.tts.xtts import XTTS

    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(_wav_bytes(16000, _tone_pcm16(16000, 0.1)))
        ref = f.name
    try:
        tts, parent = _mk(XTTS, fake_server, REF_FILE=ref)
        tts.txt_to_audio(("hello", {}))
        _assert_stream_contract(parent)
        assert tts.speaker is not None
    finally:
        os.unlink(ref)


def test_omni(fake_server):
    from livetalking_tpu.tts.omnitts import OmniTTS

    tts, parent = _mk(OmniTTS, fake_server, REF_FILE="voice-a")
    tts.txt_to_audio(("hello", {}))
    _assert_stream_contract(parent)


def test_pause_stops_emission(fake_server):
    from livetalking_tpu.tts.cosyvoice import CosyVoiceTTS

    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(_wav_bytes(16000, _tone_pcm16(16000, 0.1)))
        ref = f.name
    try:
        tts, parent = _mk(CosyVoiceTTS, fake_server, REF_FILE=ref, REF_TEXT="p")
        tts.state = State.PAUSE  # interrupted before synthesis
        tts.txt_to_audio(("hello", {}))
        # only the trailing end marker may appear
        speech = [f for f, ev in parent.frames if ev.get("status") == "start"]
        assert not speech
    finally:
        os.unlink(ref)


def test_doubao_binary_protocol():
    import websockets
    from livetalking_tpu.tts import doubao as mod

    pcm = _tone_pcm16(16000, 0.2)

    async def handler(ws):
        req = await ws.recv()
        assert req[:4] == b"\x11\x10\x11\x00"
        size = int.from_bytes(req[4:8], "big")
        body = json.loads(gzip.decompress(req[8 : 8 + size]))
        assert body["request"]["operation"] == "submit"
        # two audio messages; the last has a negative sequence number
        for seq, chunk in ((1, pcm[: len(pcm) // 2]), (-2, pcm[len(pcm) // 2 :])):
            payload = struct.pack(">iI", seq, len(chunk)) + chunk
            header = b"\x11\xb1\x00\x00"
            await ws.send(header + payload)

    loop = asyncio.new_event_loop()
    server_ready = threading.Event()
    port_holder = {}

    def run_server():
        asyncio.set_event_loop(loop)

        async def main():
            server = await websockets.serve(handler, "127.0.0.1", 0)
            port_holder["port"] = server.sockets[0].getsockname()[1]
            server_ready.set()
            await asyncio.Future()

        try:
            loop.run_until_complete(main())
        except RuntimeError:
            pass

    t = threading.Thread(target=run_server, daemon=True)
    t.start()
    assert server_ready.wait(5)

    opt = default_opt(REF_FILE="voice-x",
                      doubao_url=f"ws://127.0.0.1:{port_holder['port']}")
    parent = FakeParent()
    tts = mod.DoubaoTTS(opt, parent)
    tts.txt_to_audio(("hello doubao", {}))
    loop.call_soon_threadsafe(loop.stop)
    _assert_stream_contract(parent)
