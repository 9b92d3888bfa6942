"""Server bootstrap: ``python -m livetalking_tpu.app [flags]``.

Mirrors the reference boot sequence (reference app.py:121-216): parse
config, import the selected avatar plugin module, load model + default
avatar globally (shared across sessions), warm up the compiled step, wire
the session manager, start the aiohttp server.  WebRTC signaling (/offer)
is attached when aiortc is available; ``rtmp``/``virtualcam``/``queue``
transports start a session-0 render thread at boot.

Extension over the reference: ``POST /session`` creates a session without
WebRTC signaling (returns ``{"sessionid": ...}``) so headless/queue
deployments and tests can drive the full engine over plain HTTP.
"""

from __future__ import annotations

import asyncio
import copy
import json
from threading import Event, Thread

from aiohttp import web

from livetalking_tpu import registry
from livetalking_tpu.avatars import AVATAR_MODULES
from livetalking_tpu.config import parse_args
from livetalking_tpu.llm import llm_response
from livetalking_tpu.server.routes import json_error, json_ok, setup_routes
from livetalking_tpu.server.session_manager import session_manager
from livetalking_tpu.utils.logger import logger

opt = None
model = None
global_avatars = {}
_load_avatar = None
rtc_manager = None
_render_threads = {}


def build_avatar_session(sessionid: str, params: dict):
    """Session factory: per-request overrides over a copy of the global opt
    (reference app.py:76-100)."""
    opt_this = copy.deepcopy(opt)
    opt_this.sessionid = sessionid

    avatar_id = params.get("avatar", opt.avatar_id)
    opt_this.avatar_id = avatar_id
    if avatar_id not in global_avatars:
        global_avatars[avatar_id] = _load_avatar(avatar_id, opt.data_dir)
    avatar_this = global_avatars[avatar_id]

    ref_audio = params.get("refaudio", "")
    if ref_audio:
        opt_this.REF_FILE = ref_audio
        opt_this.REF_TEXT = params.get("reftext", "")
    custom_config = params.get("custom_config", "")
    if custom_config:
        opt_this.customopt = json.loads(custom_config)
    if "batch_size" in params:
        # per-session batch override; under --coalesce a conflicting value
        # is rejected by the shared scheduler (SchedulerConfigError)
        opt_this.batch_size = int(params["batch_size"])

    return registry.create("avatar", opt.model, opt=opt_this, model=model, avatar=avatar_this)


def start_render_thread(sessionid: str) -> Event:
    """Start the per-session render pipeline in a worker thread."""
    quit_event = Event()
    avatar_session = session_manager.get_session(sessionid)
    t = Thread(target=avatar_session.render, args=(quit_event,), daemon=True,
               name=f"render-{sessionid}")
    t.start()
    _render_threads[sessionid] = (t, quit_event)
    return quit_event


async def create_session_route(request: web.Request) -> web.Response:
    """POST /session — create + start a session without WebRTC signaling."""
    try:
        try:
            params = await request.json()
        except Exception:
            params = {}
        sessionid = await session_manager.create_session(params)
        start_render_thread(sessionid)
        return json_ok({"sessionid": sessionid})
    except Exception as e:
        logger.exception("create_session exception:")
        return json_error(str(e))


async def close_session_route(request: web.Request) -> web.Response:
    """POST /session/close — stop the render thread and drop the session."""
    try:
        params = await request.json()
        sessionid = params.get("sessionid", "")
        if sessionid in _render_threads:
            t, quit_event = _render_threads.pop(sessionid)
            quit_event.set()
            t.join(timeout=5)
        session_manager.remove_session(sessionid)
        return json_ok()
    except Exception as e:
        logger.exception("close_session exception:")
        return json_error(str(e))


def load_plugin_stack(options):
    """Import the avatar plugin module and load model + default avatar."""
    global opt, model, _load_avatar
    opt = options
    import importlib

    mod = importlib.import_module(AVATAR_MODULES[opt.model])
    _load_avatar = mod.load_avatar

    if opt.model == "wav2lip":
        model = mod.load_model(opt.modelfile or f"{opt.models_dir}/wav2lip.pth", opt)
        mod.warm_up(opt.batch_size, model, 256)
    elif opt.model == "musetalk":
        model = mod.load_model(opt)
        mod.warm_up(opt.batch_size, model, 256, opt)
    elif opt.model == "ultralight":
        model = mod.load_model(opt)
        mod.warm_up(opt.batch_size, model, 160)
    elif opt.model == "ernerf":
        model = mod.load_model(opt)
        mod.warm_up(opt.batch_size, model,
                    int(getattr(opt, "ernerf_size", 128) or 128))
    global_avatars[opt.avatar_id] = _load_avatar(opt.avatar_id, opt.data_dir)

    session_manager.set_max_session(opt.max_session)
    cap = int(getattr(opt, "capacity_sessions", -1))
    if cap < 0:
        from livetalking_tpu.server.session_manager import MEASURED_CAPACITY

        cap = MEASURED_CAPACITY.get(opt.model) or 0
    session_manager.configure_capacity(
        cap or None, str(getattr(opt, "capacity_policy", "warn")))
    session_manager.init_builder(build_avatar_session)


def build_web_app() -> web.Application:
    app = web.Application(client_max_size=1024**2 * 100)
    app["llm_response"] = llm_response
    app["opt"] = opt

    global rtc_manager
    try:
        from livetalking_tpu.server.rtc_manager import RTCManager

        rtc_manager = RTCManager(opt, start_render_thread)
        app["rtc_manager"] = rtc_manager

        async def offer(request):
            return await rtc_manager.handle_offer(request)

        async def on_shutdown(_app):
            await rtc_manager.shutdown()

        app.router.add_post("/offer", offer)
        app.on_shutdown.append(on_shutdown)
    except ImportError as e:
        logger.warning("WebRTC unavailable (aiortc missing: %s) - /offer disabled", e)

    app.router.add_post("/session", create_session_route)
    app.router.add_post("/session/close", close_session_route)

    async def download_record(request):
        import os

        sessionid = request.match_info.get("sessionid")
        record_file = os.path.join("data", "record", f"{sessionid}.mp4")
        if os.path.exists(record_file):
            return web.FileResponse(record_file)
        return web.Response(status=404, text="Record not found")

    app.router.add_get("/record/{sessionid}", download_record)
    setup_routes(app)
    return app


def main() -> None:
    try:
        from dotenv import load_dotenv

        load_dotenv()  # provider keys from .env (reference app.py:230)
    except ImportError:
        pass

    options = parse_args()
    logger.info(options)
    load_plugin_stack(options)

    if getattr(opt, "profile_dir", ""):
        # device-side tracing (SURVEY §5: the reference has only manual fps
        # counters; we add jax.profiler on top of the same log shapes)
        import atexit

        import jax

        jax.profiler.start_trace(opt.profile_dir)
        atexit.register(jax.profiler.stop_trace)  # flush on shutdown
        logger.info("jax.profiler tracing to %s", opt.profile_dir)

    if opt.transport in ("virtualcam", "rtmp", "queue", "null"):
        # boot-time session 0 with a background render thread
        session_manager.add_session("0", build_avatar_session("0", {}))
        start_render_thread("0")

    app = build_web_app()
    logger.info("start http server; http://<serverip>:%d/", opt.listenport)

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    runner = web.AppRunner(app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "0.0.0.0", opt.listenport)
    loop.run_until_complete(site.start())
    if opt.transport == "rtcpush" and rtc_manager is not None:
        for k in range(opt.max_session):
            push_url = opt.push_url if k == 0 else opt.push_url + str(k)
            loop.run_until_complete(rtc_manager.handle_rtcpush(push_url, str(k)))
    loop.run_forever()


if __name__ == "__main__":
    main()
