"""Shared-scheduler config contract under --coalesce (HTTP level).

The process-wide BatchScheduler is built from the FIRST session's flags;
a later session with conflicting flags must be rejected with a clean
error envelope, not silently batched with the wrong configuration
(VERDICT r1 weak #6)."""

import asyncio
import time
from threading import Thread

import pytest
import requests

from livetalking_tpu import app as appmod
from livetalking_tpu.avatars.wav2lip_avatar import reset_shared_scheduler
from livetalking_tpu.config import default_opt
from livetalking_tpu.engine.scheduler import SchedulerConfigError
from livetalking_tpu.server.session_manager import session_manager
from livetalking_tpu.utils.synthetic import make_synthetic_avatar


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    reset_shared_scheduler()  # isolate from other coalesce tests
    data_dir = tmp_path_factory.mktemp("data")
    make_synthetic_avatar(str(data_dir / "avatars" / "sc1"), n_frames=4)

    opt = default_opt(
        transport="queue", tts="dummy", batch_size=2, dtype="float32",
        avatar_id="sc1", data_dir=str(data_dir), max_session=4,
        listenport=PORT, modelfile="__nonexistent__", coalesce=True,
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
    for sid in list(appmod._render_threads):
        t_obj, quit_event = appmod._render_threads.pop(sid)
        quit_event.set()
        t_obj.join(timeout=10)
        session_manager.remove_session(sid)
    loop.call_soon_threadsafe(loop.stop)
    reset_shared_scheduler()


def test_conflicting_batch_size_rejected_with_clean_envelope(server):
    r1 = requests.post(server + "/session", json={}).json()
    assert r1["code"] == 0, r1

    r2 = requests.post(server + "/session",
                       json={"batch_size": 4}).json()
    assert r2["code"] != 0, r2
    assert "coalesce" in r2["msg"]

    # matching config is still accepted
    r3 = requests.post(server + "/session", json={"batch_size": 2}).json()
    assert r3["code"] == 0, r3

    # the rejected session must not leak a session slot
    sess = requests.get(server + "/api/admin/sessions").json()
    assert len(sess["data"]["sessions"]) == 2, sess


def test_direct_raise_type():
    """The rejection is a typed error so programmatic callers can catch."""
    assert issubclass(SchedulerConfigError, ValueError)
