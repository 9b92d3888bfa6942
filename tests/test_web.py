"""Web frontend tests: every console page is served by the app's static
route (SURVEY §2.11) and only calls endpoints the server actually
registers."""

import os
import re

import requests

from tests.test_server import server  # noqa: F401  (reuse the app fixture)

WEB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "web")

PAGES = ["index.html", "dashboard.html", "avatar.html", "admin.html",
         "asr.html", "whep.html", "tts.html", "webrtcapi.html",
         "webrtcapi-asr.html", "rtmp.html", "virtualcam.html"]
SCRIPTS = ["client.js", "asr-client.js", "whep.js"]
# pinned third-party player builds served as-is (VERDICT r2 item 7: the
# rtmp demo must play out of the box, like the reference's vendored copy)
VENDORED = ["mpegts-1.7.3.min.js"]

# endpoints build_web_app registers (app.py + routes.py + avatar_routes.py)
SERVER_ENDPOINTS = {
    "/offer", "/human", "/humanaudio", "/interrupt_talk", "/is_speaking",
    "/set_audiotype", "/record", "/sse", "/session", "/session/close",
    "/api/admin/config", "/api/admin/sessions", "/api/admin/metrics", "/api/asr",
    "/api/avatar/task", "/api/avatar/tasks",
}


def test_pages_exist_on_disk():
    for name in PAGES + SCRIPTS + VENDORED + ["style.css"]:
        assert os.path.isfile(os.path.join(WEB_DIR, name)), name


def test_static_pages_served(server):  # noqa: F811
    for name in PAGES:
        r = requests.get(f"{server}/{name}", timeout=5)
        assert r.status_code == 200, name
        assert "<html" in r.text.lower(), name
    for name in SCRIPTS:
        r = requests.get(f"{server}/{name}", timeout=5)
        assert r.status_code == 200, name
        assert "use strict" in r.text, name
    # vendored mpegts.js must be served so rtmp.html plays with no
    # manual download (its <script> tag names exactly this file)
    r = requests.get(f"{server}/mpegts-1.7.3.min.js", timeout=5)
    assert r.status_code == 200
    assert "mpegts" in r.text[:400]
    with open(os.path.join(WEB_DIR, "rtmp.html")) as f:
        assert 'src="mpegts-1.7.3.min.js"' in f.read()


def test_pages_reference_only_real_endpoints():
    """Every absolute local URL fetched/posted by the frontend must be a
    route the server registers (catches drift between web/ and routes)."""
    url_re = re.compile(r"""["'](/(?:api/)?[a-z_]+(?:/[a-z_]+)?)["']""")
    allowed = SERVER_ENDPOINTS | {"/record"}  # /record/{id} handled below
    for name in PAGES + SCRIPTS:
        with open(os.path.join(WEB_DIR, name)) as f:
            text = f.read()
        for m in url_re.finditer(text):
            url = m.group(1)
            if url.startswith(("/record/", "/api/avatar/task/")):
                continue  # parameterized routes
            if "." in url or url == "/":  # static assets / root
                continue
            assert url in allowed, f"{name} references unknown endpoint {url}"


def test_pages_wire_shared_assets():
    for name in PAGES:
        with open(os.path.join(WEB_DIR, name)) as f:
            text = f.read()
        assert 'href="style.css"' in text, name
