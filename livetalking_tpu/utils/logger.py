"""Framework logger.

Keeps the reference's published metric log shapes (``inferfps`` /
``finalfps`` counters, reference avatars/base_avatar.py:371 and
server/webrtc.py:149) so downstream tooling that scrapes the log keeps
working. File handler writes ``livetalking.log`` like the reference
(utils/logger.py:1-11); a stream handler is added as well because this is a
server meant for containers.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("livetalking_tpu")
logger.setLevel(logging.DEBUG)

if not logger.handlers:
    _fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

    _logfile = os.environ.get("LIVETALKING_LOG", "livetalking.log")
    try:
        _fh = logging.FileHandler(_logfile, encoding="utf-8")
        _fh.setFormatter(_fmt)
        _fh.setLevel(logging.INFO)
        logger.addHandler(_fh)
    except OSError:  # read-only fs etc.
        pass

    _sh = logging.StreamHandler()
    _sh.setFormatter(_fmt)
    _sh.setLevel(os.environ.get("LIVETALKING_LOGLEVEL", "INFO"))
    logger.addHandler(_sh)
