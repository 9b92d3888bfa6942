"""HTTP API surface test: boots the real aiohttp app in a thread (queue
transport, dummy TTS, synthetic avatar) and exercises the byte-compatible
endpoint contract of SURVEY §2.2 with plain HTTP requests."""

import asyncio
import json
import time
from threading import Thread

import pytest
import requests

from livetalking_tpu import app as appmod
from livetalking_tpu.config import default_opt
from livetalking_tpu.server.session_manager import session_manager
from livetalking_tpu.utils.synthetic import make_synthetic_avatar

def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()  # unique per process: safe under pytest-xdist


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(str(data_dir / "avatars" / "srv1"), n_frames=4)

    opt = default_opt(
        transport="queue", tts="dummy", batch_size=2, dtype="float32",
        avatar_id="srv1", data_dir=str(data_dir), max_session=2,
        listenport=PORT, modelfile="__nonexistent__",
    )
    appmod.load_plugin_stack(opt)
    web_app = appmod.build_web_app()

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        from aiohttp import web

        runner = web.AppRunner(web_app)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", PORT)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = Thread(target=run, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{PORT}"
    deadline = time.time() + 15
    while time.time() < deadline:
        try:
            requests.get(base + "/api/admin/config", timeout=1)
            break
        except requests.ConnectionError:
            time.sleep(0.2)
    yield base
    # stop every render thread before interpreter shutdown: a daemon thread
    # inside a jitted call at exit aborts the process (pthread cancel in XLA)
    for sid in list(appmod._render_threads):
        t_obj, quit_event = appmod._render_threads.pop(sid)
        quit_event.set()
        t_obj.join(timeout=10)
        session_manager.remove_session(sid)
    loop.call_soon_threadsafe(loop.stop)


@pytest.fixture(scope="module")
def sessionid(server):
    r = requests.post(server + "/session", json={}).json()
    assert r["code"] == 0, r
    return r["data"]["sessionid"]


def test_admin_config_envelope(server):
    r = requests.get(server + "/api/admin/config").json()
    assert r["code"] == 0 and r["msg"] == "ok"
    assert r["data"]["config"]["model"] == "wav2lip"


def test_session_lifecycle_and_admin_sessions(server, sessionid):
    r = requests.get(server + "/api/admin/sessions").json()
    sids = [s["sessionid"] for s in r["data"]["sessions"]]
    assert sessionid in sids
    entry = next(s for s in r["data"]["sessions"] if s["sessionid"] == sessionid)
    assert entry["model"] == "wav2lip"
    assert entry["batch_size"] == 2


def test_human_echo_and_is_speaking(server, sessionid):
    r = requests.post(server + "/human", json={
        "sessionid": sessionid, "type": "echo", "text": "hello over http",
    }).json()
    assert r["code"] == 0

    deadline = time.time() + 60
    speaking = False
    while time.time() < deadline:
        r = requests.post(server + "/is_speaking", json={"sessionid": sessionid}).json()
        if r["data"]:
            speaking = True
            break
        time.sleep(0.2)
    assert speaking


def test_interrupt_talk(server, sessionid):
    requests.post(server + "/human", json={
        "sessionid": sessionid, "type": "echo",
        "text": "long text to interrupt " * 50,
    })
    r = requests.post(server + "/interrupt_talk", json={"sessionid": sessionid}).json()
    assert r["code"] == 0
    deadline = time.time() + 30
    while time.time() < deadline:
        r = requests.post(server + "/is_speaking", json={"sessionid": sessionid}).json()
        if not r["data"]:
            break
        time.sleep(0.2)
    assert not r["data"]


def test_numeric_sessionid_coerced_to_string_key(server, sessionid):
    """Reference clients send the sessionid back as a JSON number
    (reference web/client.js posts the integer it got from /offer);
    sessions are keyed by string, so routes must coerce before lookup."""
    session_manager.sessions["41"] = session_manager.get_session(sessionid)
    try:
        r = requests.post(server + "/is_speaking", json={"sessionid": 41}).json()
        assert r["code"] == 0
    finally:
        session_manager.sessions.pop("41", None)


def test_unknown_session_error_envelope(server):
    r = requests.post(server + "/human", json={
        "sessionid": "nope", "type": "echo", "text": "x",
    }).json()
    assert r["code"] == -1
    assert "session not found" in r["msg"]


def test_max_session_gate(server, sessionid):
    # one slot left (max=2, session 'sessionid' active)
    r2 = requests.post(server + "/session", json={}).json()
    assert r2["code"] == 0
    r3 = requests.post(server + "/session", json={}).json()
    assert r3["code"] == -1 and "Maximum session" in r3["msg"]
    # close the extra session frees the slot
    rc = requests.post(server + "/session/close",
                       json={"sessionid": r2["data"]["sessionid"]}).json()
    assert rc["code"] == 0
    r4 = requests.post(server + "/session", json={}).json()
    assert r4["code"] == 0
    requests.post(server + "/session/close",
                  json={"sessionid": r4["data"]["sessionid"]})


def test_capacity_admission(server, sessionid):
    """VERDICT r3 item 5: measured-capacity admission. strict rejects
    with a clean envelope; warn admits, flags /api/admin/sessions."""
    from livetalking_tpu.server.session_manager import session_manager as sm

    old = (sm.capacity, sm.capacity_policy, sm.over_capacity)
    try:
        # one session active ('sessionid'); measured capacity = 1
        sm.configure_capacity(1, "strict")
        r = requests.post(server + "/session", json={}).json()
        assert r["code"] == -1 and "capacity" in r["msg"], r

        sm.configure_capacity(1, "warn")
        r2 = requests.post(server + "/session", json={}).json()
        assert r2["code"] == 0, r2  # admitted anyway
        adm = requests.get(server + "/api/admin/sessions").json()
        assert adm["data"]["capacity"]["over_capacity"] is True
        assert adm["data"]["capacity"]["measured_sessions"] == 1
        requests.post(server + "/session/close",
                      json={"sessionid": r2["data"]["sessionid"]})
    finally:
        sm.capacity, sm.capacity_policy, sm.over_capacity = old


def test_sse_stream_delivers_eventpoints(server, sessionid):
    # subscribe first, then speak; start eventpoint must arrive on the stream
    resp = requests.get(server + f"/sse?sessionid={sessionid}", stream=True, timeout=90)
    requests.post(server + "/human", json={
        "sessionid": sessionid, "type": "echo", "text": "sse check",
    })
    got = None
    start = time.time()
    for line in resp.iter_lines():
        if line.startswith(b"data:"):
            payload = json.loads(line[5:].strip())
            if payload.get("status") == "start":
                got = payload
                break
        if time.time() - start > 80:
            break
    resp.close()
    assert got is not None and got["text"] == "sse check"


def test_admin_metrics(server):
    r = requests.get(server + "/api/admin/metrics", timeout=5).json()
    assert r["code"] == 0
    assert "sessions" in r["data"]
    assert r["data"].get("backend") == "cpu"
