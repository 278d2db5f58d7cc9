"""Processor unit tests: template rendering, placeholder expansion, delay
alignment, left-pad semantics, merge, local-variant deltas."""
import numpy as np
import pytest

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer, SPECIAL_TOKENS
from mosstts_tpu.processing.delay_processor import (
    AUDIO_PLACEHOLDER,
    DelayProcessor,
)
from mosstts_tpu.processing.local_processor import LocalProcessor

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)


@pytest.fixture(scope="module")
def tok():
    return ByteFallbackTokenizer()


@pytest.fixture(scope="module")
def proc(tok):
    return DelayProcessor(tok, audio_tokenizer=None, config=CFG)


def test_tokenizer_roundtrip(tok):
    s = "Hello <|im_start|>user\n中文 <|audio_start|>x<|audio_end|>"
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    assert SPECIAL_TOKENS["<|audio_start|>"] in ids


def test_user_message_template(proc):
    msg = proc.build_user_message(text="hi", reference=["a.wav", None, "b.wav"])
    assert msg["role"] == "user"
    assert "<user_inst>" in msg["content"]
    assert msg["content"].count(AUDIO_PLACEHOLDER) == 2
    assert "[S1]" in msg["content"] and "[S3]" in msg["content"]
    assert msg["audio_codes_list"] == ["a.wav", "b.wav"]
    # all 8 control fields render
    for fieldname in ("Instruction", "Tokens", "Quality", "Sound Event",
                      "Ambient Sound", "Language", "Text"):
        assert fieldname in msg["content"]


def test_generation_grid_alignment(proc):
    codes = np.arange(12).reshape(3, 4) % CFG.audio_vocab_size
    conv = [
        proc.build_user_message(text="hello", reference=[codes]),
    ]
    out = proc(conv, mode="generation")
    ids, mask = out["input_ids"], out["attention_mask"]
    B, T, C = ids.shape
    assert B == 1 and C == 5
    assert mask.all()
    text = ids[0, :, 0]
    s = int(np.where(text == CFG.audio_start_token_id)[0][0])
    e = int(np.where(text == CFG.audio_end_token_id)[0][0])
    # user audio block: start + (3 + n_vq - 1) slots + end
    assert e - s - 1 == 3 + CFG.n_vq - 1
    assert (text[s + 1 : e] == CFG.audio_user_slot_token_id).all()
    # delay alignment: channel k holds codes[t, k] at row s+1+t+k
    for k in range(4):
        for t in range(3):
            assert ids[0, s + 1 + t + k, 1 + k] == codes[t, k]
    # everything outside the delayed block is pad
    assert (ids[0, :s + 1, 1:] == CFG.audio_pad_code).all()
    # generation prompt tail: ends with "<|im_start|>assistant\n"
    tail = proc.tokenizer.decode(list(text[-16:]))
    assert tail.endswith("<|im_start|>assistant\n")


def test_left_pad_batching(proc):
    conv_a = [proc.build_user_message(text="hi")]
    conv_b = [proc.build_user_message(text="a much longer sentence here")]
    out = proc([conv_a, conv_b], mode="generation")
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape[0] == 2
    pad_rows = ~mask[0]
    assert pad_rows.sum() > 0
    assert (ids[0, pad_rows, 0] == CFG.pad_token_id).all()
    assert (ids[0, pad_rows, 1:] == CFG.audio_pad_code).all()
    assert mask[1].all()


def test_continuation_truncates_delay_tail(proc):
    codes = (np.arange(20).reshape(5, 4) * 7) % CFG.audio_vocab_size
    conv = [
        proc.build_user_message(text="continue this"),
        proc.build_assistant_message([codes]),
    ]
    out = proc([conv], mode="continuation")
    text = out["input_ids"][0, :, 0]
    # the delay-flush tail is dropped: grid ends mid-audio (no audio_end row
    # survives after truncation of the last n_vq-1 rows)
    assert text[-1] != CFG.audio_end_token_id
    # last row should still be an assistant gen/delay slot
    assert text[-1] in (
        CFG.audio_assistant_gen_slot_token_id,
        CFG.audio_assistant_delay_slot_token_id,
    )


def test_merge_consecutive_placeholders(proc):
    c1 = np.ones((2, 4), np.int64)
    c2 = np.full((3, 4), 2, np.int64)
    content = f"x {AUDIO_PLACEHOLDER} {AUDIO_PLACEHOLDER} y"
    merged, codes = proc._merge_consecutive_placeholders(content, [c1, c2])
    assert merged.count(AUDIO_PLACEHOLDER) == 1
    assert codes[0].shape == (5, 4)


def test_decode_text_normalization(proc):
    # build a fake generated row: prefix + audio block + text
    t = proc.tokenizer
    gen_text = (
        "prefix!"
        + "<|audio_start|>" + "<|audio_gen_slot|>" * 3
        + "<|audio_delay_slot|>" * 3 + "<|audio_end|>"
        + " tail"
    )
    ids = np.asarray(t.encode(gen_text))
    parsed = proc._parse_text(0, ids)
    assert parsed == f"prefix!{AUDIO_PLACEHOLDER} tail"
    # empty audio block (no gen slot) is removed entirely
    gen_text2 = "a<|audio_start|><|audio_end|>b"
    parsed2 = proc._parse_text(0, np.asarray(t.encode(gen_text2)))
    assert parsed2 == "ab"


def test_local_processor_deltas(tok):
    lp = LocalProcessor(tok, audio_tokenizer=None, config=CFG)
    codes = np.arange(12).reshape(3, 4) % CFG.audio_vocab_size
    out = lp([[lp.build_user_message(text="hello", reference=[codes])]], mode="generation")
    ids = out["input_ids"]
    text = ids[0, :, 0]
    # trailing appended audio_start row
    assert text[-1] == CFG.audio_start_token_id
    assert (ids[0, -1, 1:] == CFG.audio_pad_code).all()
    s = int(np.where(text == CFG.audio_start_token_id)[0][0])
    e = int(np.where(text == CFG.audio_end_token_id)[0][0])
    # no delay tail: block is exactly len(codes) slots
    assert e - s - 1 == 3
    # time-synchronous: row s+1+t carries codes[t] on all channels
    for t_i in range(3):
        np.testing.assert_array_equal(ids[0, s + 1 + t_i, 1:], codes[t_i])
    with pytest.raises(RuntimeError):
        lp([[lp.build_user_message(text="x")]], mode="continuation")
