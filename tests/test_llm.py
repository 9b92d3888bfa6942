"""LLM bridge (llm.py): streaming punctuation splitter semantics and the
llm_response wiring against a faked OpenAI client (the module-injection
technique of reference tests/test_asr_server.py:29-72)."""

import sys
import types
from unittest.mock import patch

from livetalking_tpu.llm import llm_response, split_into_segments


def test_splitter_min_length_and_punctuation():
    deltas = ["你好，", "今天天气", "真不错。", "我们去", "散步吧！"]
    segs = list(split_into_segments(iter(deltas), min_len=10))
    assert "".join(segs) == "".join(deltas)  # lossless
    # every yielded segment except possibly the last exceeds min_len and
    # ends on punctuation
    for s in segs[:-1]:
        assert len(s) > 10
        assert s[-1] in "，。！？：；,.!;:"


def test_splitter_trailing_remainder():
    segs = list(split_into_segments(iter(["no punctuation at all"])))
    assert segs == ["no punctuation at all"]


def test_splitter_skips_none_deltas():
    segs = list(split_into_segments(iter([None, "a,", None, "bbbbbbbbbbb."])))
    assert "".join(segs) == "a,bbbbbbbbbbb."


def test_llm_response_streams_segments_to_session():
    """llm_response drives put_msg_txt with split segments from a faked
    streaming completion."""
    text = "第一句话讲完了。第二句话也讲完了。最后一句结束。"
    chunks = [text[i : i + 3] for i in range(0, len(text), 3)]

    class _Delta:
        def __init__(self, c):
            self.content = c

    class _Choice:
        def __init__(self, c):
            self.delta = _Delta(c)

    class _Chunk:
        def __init__(self, c):
            self.choices = [_Choice(c)]

    class _Completions:
        def create(self, **kw):
            assert kw["stream"] is True
            return iter([_Chunk(c) for c in chunks])

    class _Chat:
        completions = _Completions()

    class _FakeClient:
        chat = _Chat()

        def __init__(self, **kw):
            pass

    fake_openai = types.ModuleType("openai")
    fake_openai.OpenAI = _FakeClient

    class _Session:
        def __init__(self):
            self.msgs = []

        def put_msg_txt(self, msg, datainfo=None):
            self.msgs.append((msg, datainfo))

    sess = _Session()
    with patch.dict(sys.modules, {"openai": fake_openai}):
        llm_response("你好", sess, {"tts": {"speed": 1.0}})

    assert sess.msgs, "no segments reached the session"
    assert "".join(m for m, _d in sess.msgs) == text
    assert all(d == {"tts": {"speed": 1.0}} for _m, d in sess.msgs)
