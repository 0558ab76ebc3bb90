"""Tolerant JSON repair — stand-in for the ``jsonrepair`` dependency the
reference uses on Gemini-style string outputs
(/root/reference/src/extractors.ts:216-222).

Handles the malformed-JSON patterns LLMs actually emit: markdown code fences,
single-quoted strings, unquoted object keys, trailing commas, missing commas
between siblings, JS literals (NaN/undefined), and truncated documents
(brackets balanced at EOF).  Pure function; used inside the extract stage's
fallback path only.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"^\s*```(?:json)?\s*|\s*```\s*$", re.S)


def json_repair(text: str) -> str:
    """Return a best-effort valid-JSON string for ``text``.

    Raises ValueError when no JSON-looking payload can be recovered.
    """
    s = text.strip()
    s = _FENCE_RE.sub("", s).strip()

    # Fast path — already valid.
    try:
        json.loads(s)
        return s
    except Exception:
        pass

    # Cut to the first {/[ so prose prefixes don't break parsing.
    start = min(
        (i for i in (s.find("{"), s.find("[")) if i != -1),
        default=-1,
    )
    if start == -1:
        raise ValueError("no JSON payload found")
    s = s[start:]

    out: list[str] = []
    stack: list[str] = []
    i = 0
    n = len(s)
    in_string = False
    quote_char = ""

    def _last_significant() -> str:
        for ch in reversed(out):
            if not ch.isspace():
                return ch
        return ""

    while i < n:
        c = s[i]
        if in_string:
            if c == "\\" and i + 1 < n:
                out.append(c)
                out.append(s[i + 1])
                i += 2
                continue
            if c == quote_char:
                in_string = False
                out.append('"')
            elif c == '"':
                out.append('\\"')  # double quote inside single-quoted string
            elif c == "\n":
                out.append("\\n")  # unescaped newline in string
            else:
                out.append(c)
            i += 1
            continue

        if c in "\"'":
            prev = _last_significant()
            if prev not in ("", "{", "[", ",", ":"):
                # string starting where a comma was forgotten
                out.append(",")
            in_string = True
            quote_char = c
            out.append('"')
            i += 1
            continue
        if c in "{[":
            prev = _last_significant()
            if prev in ('"', "}", "]") or (prev.isdigit() if prev else False):
                out.append(",")
            stack.append("}" if c == "{" else "]")
            out.append(c)
            i += 1
            continue
        if c in "}]":
            prev = _last_significant()
            if prev == ",":
                # trailing comma — drop it
                for j in range(len(out) - 1, -1, -1):
                    if out[j] == ",":
                        out.pop(j)
                        break
                    if not out[j].isspace():
                        break
            if stack and stack[-1] == c:
                stack.pop()
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and s[i + 1] in "/*":
            # comments — skip to end of line / end of block
            if s[i + 1] == "/":
                nl = s.find("\n", i)
                i = n if nl == -1 else nl
            else:
                end = s.find("*/", i)
                i = n if end == -1 else end + 2
            continue
        if c.isalpha():
            m = re.match(r"[^\W\d][\w$]*", s[i:], re.UNICODE)
            if m is None:  # lone combining char etc. — drop it
                i += 1
                continue
            word = m.group(0)
            rest = s[i + len(word):]
            if word in ("true", "false", "null"):
                out.append(word)
            elif word in ("True", "False"):
                out.append(word.lower())
            elif word in ("None", "undefined"):
                out.append("null")
            elif word == "NaN":
                out.append("null")
            elif re.match(r"\s*:", rest):
                out.append(f'"{word}"')  # unquoted key
            else:
                out.append(f'"{word}"')  # bare-word value
            i += len(word)
            continue
        out.append(c)
        i += 1

    if in_string:
        out.append('"')
    while stack:
        # drop a dangling trailing comma before closing
        for j in range(len(out) - 1, -1, -1):
            if out[j] == ",":
                out.pop(j)
                break
            if not out[j].isspace():
                break
        out.append(stack.pop())

    repaired = "".join(out)
    json.loads(repaired)  # raises if still broken
    return repaired
