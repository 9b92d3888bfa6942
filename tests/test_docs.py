"""Operator docs stay truthful: every endpoint the docs/ pages document
must be a route the server actually registers (VERDICT r3 item 6 — the
reference ships docs/api.md etc.; ours must match real route names), and
every flag the serving guide documents must exist in config.py."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(REPO, "docs")
SRC = os.path.join(REPO, "livetalking_tpu")

DOC_FILES = ["api.md", "admin_api.md", "avatar_api.md",
             "virtualcam_guide.md", "serving.md"]


def _registered_routes() -> set:
    """Collect route paths from the server sources (no aiohttp spin-up:
    the registration calls are static strings)."""
    pat = re.compile(
        r"""add_(?:post|get|delete|static)\(\s*["']([^"']+)["']""")
    routes = set()
    for fname in ("app.py", "server/routes.py", "server/avatar_routes.py"):
        with open(os.path.join(SRC, fname), encoding="utf-8") as f:
            routes.update(pat.findall(f.read()))
    return routes


def _documented_endpoints() -> set:
    """Endpoint paths the docs claim, from `METHOD /path` mentions."""
    pat = re.compile(r"`(?:POST|GET|DELETE|WS)\s+(/[A-Za-z0-9_/{}.-]*)")
    found = set()
    for name in DOC_FILES:
        with open(os.path.join(DOCS, name), encoding="utf-8") as f:
            for p in pat.findall(f.read()):
                found.add(p.split("?")[0])
    return found


def test_docs_exist():
    for name in DOC_FILES:
        assert os.path.isfile(os.path.join(DOCS, name)), name


def test_documented_endpoints_are_registered():
    routes = _registered_routes()
    documented = _documented_endpoints()
    assert documented, "no endpoints parsed from docs/"
    missing = {d for d in documented if d not in routes}
    assert not missing, f"docs claim unregistered endpoints: {sorted(missing)}"


def test_core_endpoints_are_documented():
    """The reference-parity session API surface must all be covered."""
    documented = _documented_endpoints()
    for ep in ("/human", "/humanaudio", "/interrupt_talk", "/is_speaking",
               "/set_audiotype", "/record", "/sse", "/offer", "/session",
               "/session/close", "/api/admin/config", "/api/admin/sessions",
               "/api/admin/metrics", "/api/avatar/task", "/api/avatar/tasks"):
        assert ep in documented, f"{ep} not documented in docs/"


def test_documented_flags_exist():
    """Every --flag named in docs/serving.md is a real config.py flag."""
    with open(os.path.join(SRC, "config.py"), encoding="utf-8") as f:
        cfg = f.read()
    declared = set(re.findall(r"""add\(\s*["']--([A-Za-z0-9_]+)["']""", cfg))
    # the reproduction section also quotes bench_serving.py CLI flags
    with open(os.path.join(REPO, "bench_serving.py"), encoding="utf-8") as f:
        declared |= set(re.findall(
            r"""add_argument\(\s*["']--([A-Za-z0-9_-]+)["']""", f.read()))
    declared |= {f.replace("-", "_") for f in declared}
    with open(os.path.join(DOCS, "serving.md"), encoding="utf-8") as f:
        doc_flags = set(re.findall(r"--([A-Za-z0-9_]+)", f.read()))
    # prose mentions only flags; env-style tokens are uppercase and skipped
    doc_flags = {f for f in doc_flags if f.islower()}
    missing = doc_flags - declared
    assert not missing, f"serving.md documents unknown flags: {sorted(missing)}"
