"""Prompt templating — pure string functions, unit-tested against the
reference templates.

  videoqa: "{prefix} Question: {q} Answer: [MASK]{suffix}" (+ " Subtitles: …")
           or FiB "{prefix} {q with '_____'->mask}"      (videoqa_dataset.py:69-78)
  mc:      "{prefix} Question: {q} Is it '{ai}'? [MASK]{suffix}"
           (+ " Subtitles: …")                            (mc_dataset.py:53-60)
  ar:      "Subtitles: {sub} … Question: {q} Answer: "    (videoqa_dataset_ar.py:43-51)
"""

from __future__ import annotations


def normalize_question(question: str, fib: bool = False) -> str:
    """Capitalize, strip, ensure trailing '?' (videoqa_dataset.py:104-106)."""
    q = str(question).capitalize().strip()
    if q and q[-1] != "?" and not fib:
        q = q + "?"
    return q


def videoqa_prompt(
    question: str,
    mask_token: str,
    prefix: str = "",
    suffix: str = ".",
    sub: str = "",
    fib: bool = False,
) -> str:
    if fib:
        text = f"{prefix} {question.replace('_____', mask_token)}"
    else:
        text = f"{prefix} Question: {question} Answer: {mask_token}{suffix}"
    if sub:
        text += f" Subtitles: {sub}"
    return text.strip()


def mc_prompt(
    question: str,
    candidate: str,
    mask_token: str,
    prefix: str = "",
    suffix: str = "",
    sub: str = "",
    use_context: bool = True,
) -> str:
    text = f"{prefix} Question: {question} Is it '{candidate}'? {mask_token}{suffix}"
    if use_context:
        text += f" Subtitles: {sub}"
    return text.strip()


def ar_prompt(
    question: str,
    prefix: str = "",
    sub: str = "",
    fib: bool = False,
) -> str:
    """Autoregressive prompt; subtitles are PREFIXED and the trailing space
    after 'Answer:' is stripped (videoqa_dataset_ar.py:43-52)."""
    if fib:
        text = f"{prefix} {question} Fill the blank: "
    else:
        text = f"{prefix} Question: {question} Answer: "
    text = text.strip()
    if sub:
        text = f"Subtitles: {sub} " + text
    return text


def window_subtitles(subs, start: float, end: float) -> str:
    """Join subtitle texts intersecting [start, end] (mc_dataset.py:44-51)."""
    texts = [x["text"] for x in subs if x["end"] >= start and x["start"] <= end]
    return " ".join(texts).capitalize().strip()
