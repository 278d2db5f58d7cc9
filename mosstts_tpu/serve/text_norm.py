"""TTSD dialogue text utilities: CJK/EN normalization, speaker-tag handling.

Behavior parity with the reference TTSD app
(clis/moss_ttsd_app.py:125-227,236-244): punctuation folding, laughter
mapping, speaker-tag validation/merge, prompt-text prefixing.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

_REMOVE_CHARS = "【】《》（）『』「」" '"-_“”～~‘’'


def normalize_text(text: str) -> str:
    text = re.sub(r"\[(\d+)\]", r"[S\1]", text)
    segments = re.split(r"(?=\[S\d+\])", text.replace("\n", " "))
    processed = []
    for seg in segments:
        seg = seg.strip()
        if not seg:
            continue
        matched = re.match(r"^(\[S\d+\])\s*(.*)", seg)
        tag, content = matched.groups() if matched else ("", seg)

        content = re.sub(f"[{re.escape(_REMOVE_CHARS)}]", "", content)
        content = re.sub(r"哈{2,}", "[笑]", content)
        content = re.sub(r"\b(ha(\s*ha)+)\b", "[laugh]", content, flags=re.IGNORECASE)
        for dash in ("——", "……", "...", "⸺", "―", "—", "…"):
            content = content.replace(dash, "，")
        content = content.translate(
            str.maketrans({"；": "，", ";": ",", "：": "，", ":": ",", "、": "，"})
        )
        content = content.strip()
        content = re.sub(r"([，。？！,.?!])[，。？！,.?!]+", r"\1", content)
        if len(content) > 1:
            last_ch = "。" if content[-1] == "，" else ("." if content[-1] == "," else content[-1])
            body = content[:-1].replace("。", "，")
            content = body + last_ch
        processed.append({"tag": tag, "content": content})

    if not processed:
        return ""

    merged: List[str] = []
    cur_tag = processed[0]["tag"]
    cur_content = [processed[0]["content"]]
    for part in processed[1:]:
        if part["tag"] == cur_tag and cur_tag:
            cur_content.append(part["content"])
        else:
            merged.append(f"{cur_tag}{''.join(cur_content)}".strip())
            cur_tag = part["tag"]
            cur_content = [part["content"]]
    merged.append(f"{cur_tag}{''.join(cur_content)}".strip())
    return "".join(merged).replace("‘", "'").replace("’", "'")


def validate_dialogue_text(dialogue_text: str, speaker_count: int) -> str:
    text = (dialogue_text or "").strip()
    if not text:
        raise ValueError("Please enter dialogue text.")
    tags = re.findall(r"\[S(\d+)\]", text)
    if not tags:
        raise ValueError("Dialogue must include speaker tags like [S1], [S2], ...")
    max_tag = max(int(t) for t in tags)
    if max_tag > speaker_count:
        raise ValueError(
            f"Dialogue contains [S{max_tag}], but speaker count is set to {speaker_count}."
        )
    return text


def merge_consecutive_speaker_tags(text: str) -> str:
    segments = re.split(r"(?=\[S\d+\])", text)
    parts: List[str] = []
    cur_tag: Optional[str] = None
    for seg in segments:
        seg = seg.strip()
        if not seg:
            continue
        matched = re.match(r"^(\[S\d+\])\s*(.*)", seg, re.DOTALL)
        if not matched:
            parts.append(seg)
            continue
        tag, content = matched.groups()
        if tag == cur_tag:
            parts.append(content)
        else:
            cur_tag = tag
            parts.append(f"{tag}{content}")
    return "".join(parts)


def normalize_prompt_text(prompt_text: str, speaker_id: int) -> str:
    text = (prompt_text or "").strip()
    if not text:
        raise ValueError(f"S{speaker_id} prompt text is empty.")
    expected = f"[S{speaker_id}]"
    if not text.lstrip().startswith(expected):
        text = f"{expected} {text}"
    return text


def build_prefixed_text(dialogue_text: str, prompt_text_map: Dict[int, str],
                        cloned_speakers: List[int]) -> str:
    prefix = "".join(prompt_text_map[s] for s in cloned_speakers)
    return merge_consecutive_speaker_tags(prefix + dialogue_text)


# ---- duration estimation (clis/moss_tts_app.py:31-32,145-165) -------------
ZH_TOKENS_PER_CHAR = 3.098411951313033
EN_TOKENS_PER_CHAR = 0.8673376262755219
TOKENS_PER_SECOND = 12.5


def detect_text_language(text: str) -> str:
    zh = len(re.findall(r"[一-鿿]", text))
    en = len(re.findall(r"[A-Za-z]", text))
    if zh == 0 and en == 0:
        return "en"
    return "zh" if zh >= en else "en"


def estimate_duration_tokens(text: str):
    normalized = text or ""
    n = max(len(normalized), 1)
    lang = detect_text_language(normalized)
    factor = ZH_TOKENS_PER_CHAR if lang == "zh" else EN_TOKENS_PER_CHAR
    default_tokens = max(1, int(n * factor))
    min_tokens = max(1, int(default_tokens * 0.5))
    max_tokens = max(min_tokens, int(default_tokens * 1.5))
    return lang, default_tokens, min_tokens, max_tokens
