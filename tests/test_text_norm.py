"""Golden-vector tests for TTSD text normalization.

The expected outputs are the observed behavior of the reference TTSD app's
normalize_text (clis/moss_ttsd_app.py:125-182) — they pin the behavioral
contract so the implementation is free to be structured differently.
"""
import pytest

from mosstts_tpu.serve.text_norm import (
    build_prefixed_text,
    merge_consecutive_speaker_tags,
    normalize_text,
    validate_dialogue_text,
)

GOLDEN = [
    # bare [N] tags are promoted to [SN]; dashes/ellipses fold to CJK comma
    ("[1]你好——世界……再见", "[S1]你好，世界，再见"),
    # laughter mapping, CJK and latin
    ("[S1]哈哈哈哈！ [S2]ha ha ha really?", "[S1][笑]！[S2][laugh] really?"),
    # decorative brackets dropped; mid-sentence colon/semicolon/enum comma fold
    ("[S1]《新闻》报道：今天；明天、后天。 [S1]继续说。",
     "[S1]新闻报道，今天，明天，后天。继续说。"),
    # untagged text still normalized
    ("no tags at all... just text,,,!!", "no tags at all， just text."),
    # same-speaker merge; terminal comma promoted to period
    ("[S1]first. [S1]second, [S2]third;", "[S1]first.second.[S2]third."),
    ("", ""),
    ("[S1]，", "[S1]，"),  # single char: terminal fold skipped
    ("[S2]x", "[S2]x"),
    ("line one\n[S1]line two\n line three", "line one[S1]line two  line three"),
    ("[S1]“quoted” ‘single’ ~tilde~ –dash_underscore-",
     "[S1]quoted single tilde –dashunderscore"),
    # internal 。 demoted to ，; the final one kept
    ("[S3]句子。句子。句子，", "[S3]句子，句子，句子。"),
    ("[S1]Mixed 哈哈哈 and ha ha together...", "[S1]Mixed [笑] and [laugh] together。"),
    ("[S1]   ", "[S1]"),
    # punctuation runs collapse to the first mark
    ("[S1]a，。？！,.?!b", "[S1]a，b"),
    ("⸺―…start", "，start"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_normalize_text_golden(raw, expected):
    assert normalize_text(raw) == expected


def test_validate_dialogue_text():
    assert validate_dialogue_text("[S1]hi [S2]yo", 2) == "[S1]hi [S2]yo"
    with pytest.raises(ValueError):
        validate_dialogue_text("", 2)
    with pytest.raises(ValueError):
        validate_dialogue_text("no tags", 2)
    with pytest.raises(ValueError):
        validate_dialogue_text("[S3]over", 2)


def test_merge_consecutive_speaker_tags():
    # segments are stripped before merging (reference clis/moss_ttsd_app.py:206-227)
    assert merge_consecutive_speaker_tags("[S1]a [S1]b [S2]c") == "[S1]ab[S2]c"
    assert merge_consecutive_speaker_tags("plain") == "plain"


def test_build_prefixed_text():
    out = build_prefixed_text("[S1]hello", {1: "[S1]prompt one.", 2: "[S2]two."}, [1, 2])
    assert out == "[S1]prompt one.[S2]two.[S1]hello"
