"""server/textnorm: the SenseVoice-parity transcript post-pass
(punctuation restoration + inverse text normalization)."""

from livetalking_tpu.server.textnorm import (
    inverse_normalize,
    postprocess,
    restore_punctuation,
)


def test_sentence_final_punctuation_en():
    assert restore_punctuation("hello world") == "Hello world."
    assert restore_punctuation("  hello   world  ") == "Hello world."
    # existing terminal mark kept, no double punctuation
    assert restore_punctuation("hello world.") == "Hello world."
    assert restore_punctuation("is it done?") == "Is it done?"


def test_sentence_final_punctuation_zh():
    assert restore_punctuation("今天天气很好") == "今天天气很好。"
    assert restore_punctuation("今天天气很好。") == "今天天气很好。"


def test_capitalizes_each_sentence():
    assert (restore_punctuation("first point. second point")
            == "First point. Second point.")


def test_space_before_punct_dropped():
    assert restore_punctuation("hello , world .") == "Hello, world."


def test_en_itn_numbers():
    assert inverse_normalize("twenty three") == "23"
    assert inverse_normalize("three hundred and five") == "305"
    assert inverse_normalize("one thousand two hundred") == "1200"
    assert inverse_normalize("it costs twenty dollars") == "it costs $20"
    assert inverse_normalize("about fifty percent done") == "about 50% done"
    # a lone determiner "one" is NOT a numeral
    assert inverse_normalize("one of the best") == "one of the best"
    assert inverse_normalize("twenty-five") == "25"


def test_zh_itn_numbers():
    assert inverse_normalize("三百零五") == "305"
    assert inverse_normalize("两万三千") == "23000"
    assert inverse_normalize("十五个人") == "15个人"
    assert inverse_normalize("百分之三十") == "30%"
    # single-character number words in normal prose stay words
    assert inverse_normalize("一起去") == "一起去"


def test_postprocess_fixture_transcript():
    raw = ("twenty five people joined the call and sent "
           "three hundred and five messages")
    out = postprocess(raw)
    assert out.endswith(".")
    assert not out[0].islower()  # digit start is fine after ITN
    assert "25" in out and "305" in out


def test_adjacent_numbers_stay_separate():
    # "three thirty" is a time / two numbers, never 33
    assert "33" not in inverse_normalize("at three thirty today")


def test_postprocess_itn_flag_off():
    out = postprocess("twenty three", itn=False)
    assert out == "Twenty three."
