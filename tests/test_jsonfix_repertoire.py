"""jsonrepair 3.13.3-repertoire case table for engine/jsonfix.py (reference
uses jsonrepair at src/extractors.ts:219-221; the npm package is not
installable in the sandbox, so the table encodes its documented behaviors:
code fences, quote variants, concatenation, ellipsis, stray escapes, special
number forms, unicode whitespace, truncation)."""

import json

import pytest

from extractor_spark.engine.jsonfix import json_repair

CASES = [
    # string concatenation
    ('"a" + "b"', "ab"),
    ('{"msg": "hello " +\n  "world"}', {"msg": "hello world"}),
    ("{'a': 'x' + 'y' + 'z'}", {"a": "xyz"}),
    # ellipsis placeholders
    ("[1, 2, ...]", [1, 2]),
    ("[..., 3]", [3]),
    ('{"a": 1, ...}', {"a": 1}),
    # smart quotes
    ("{a: ‘hi’, b: “there”}", {"a": "hi", "b": "there"}),
    # stray escapes kept-char
    ('{"x": "a\\qb"}', {"x": "aqb"}),
    ('{"x": "he said \\"hi\\""}', {"x": 'he said "hi"'}),
    # special number forms
    ('{"n": 2.3e+}', {"n": 2.3}),
    ('{"n": .5}', {"n": 0.5}),
    ('{"n": 5.}', {"n": 5.0}),
    ('{"n": +3}', {"n": 3}),
    ('{"n": 1e5,}', {"n": 100000.0}),
    ('{"n": -.5}', {"n": -0.5}),
    # unicode whitespace between tokens
    ('{ "a": 1 }', {"a": 1}),
    # missing commas between values
    ('{"a": 1 "b": 2}', {"a": 1, "b": 2}),
    ('["x" "y" 3 4]', ["x", "y", 3, 4]),
    # the round-1 repertoire still holds
    ('```json\n{"a": 1}\n```', {"a": 1}),
    ("{'k': 'v',}", {"k": "v"}),
    ('{"a": True, "b": None, "c": NaN}', {"a": True, "b": None, "c": None}),
    ('{"a": [1, 2', {"a": [1, 2]}),
    ('{"a": "unterminated', {"a": "unterminated"}),
    ('{"a": 1 // comment\n}', {"a": 1}),
    ('prose first {"a": 1}', {"a": 1}),
]


@pytest.mark.parametrize("src,want", CASES, ids=[repr(c[0])[:40] for c in CASES])
def test_repair_case(src, want):
    assert json.loads(json_repair(src)) == want
