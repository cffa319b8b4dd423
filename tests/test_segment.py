"""st1 unit tests: hand-written expected blocks (mirrors the reference's
embedded structured test text, test_7_step_pipeline.py:25-65)."""

from legal_knowledge_graph_spark.operators.segment import clean_text, segment_text

SAMPLE = """# Copyright (c) 2024 John Smith
# Licensed under the MIT License.

import os
import sys

class FastLoader(AbstractLoader):
    def load_data(self, x):
        return x

def parse_config(data):
    return data

__version__ = "1.2.3"
# Last modified: 2024-01-15
"""


def test_block_types_and_order():
    blocks = segment_text("d", SAMPLE)
    types = [b["block_type"] for b in blocks]
    assert types == ["LICENSE", "IMPORTS", "CLASS", "FUNCTION", "CONFIG", "COMMENT"]
    ordinals = [b["block_ordinal"] for b in blocks]
    assert ordinals == list(range(6))


def test_adjacent_same_type_merges():
    blocks = segment_text("d", SAMPLE)
    imports = [b for b in blocks if b["block_type"] == "IMPORTS"][0]
    assert "import os" in imports["content"] and "import sys" in imports["content"]


def test_each_def_is_own_block():
    blocks = segment_text("d", "def a(x):\n    return x\n\ndef b(x):\n    return x\n")
    assert [b["block_type"] for b in blocks] == ["FUNCTION", "FUNCTION"]
    assert blocks[0]["title"].startswith("def a")
    assert blocks[1]["title"].startswith("def b")


def test_levels_and_parenting():
    blocks = segment_text("d", SAMPLE)
    cls = [b for b in blocks if b["block_type"] == "CLASS"][0]
    fn = [b for b in blocks if b["block_type"] == "FUNCTION"][0]
    assert cls["level"] == 1 and fn["level"] == 2
    # nearest preceding smaller level (parser.py:181-203 analog)
    assert fn["parent_id"] == cls["block_id"]


def test_positions_slice_back():
    blocks = segment_text("d", SAMPLE)
    text = clean_text(SAMPLE)
    for b in blocks:
        assert text[b["start_pos"]: b["end_pos"]] == b["content"]


def test_empty_and_unstructured():
    assert segment_text("d", "") == []
    assert segment_text("d", "   \n\n  ") == []
    blocks = segment_text("d", "hello world")
    assert len(blocks) == 1 and blocks[0]["block_type"] == "OTHER"


def test_clean_text_collapses_newlines():
    assert clean_text("a\n\n\n\nb") == "a\n\nb"
    # indentation preserved (it is syntax), trailing stripped
    assert clean_text("    def f():   \n") == "    def f():\n"


def test_block_ids_deterministic():
    a = segment_text("dock", SAMPLE)
    b = segment_text("dock", SAMPLE)
    assert [x["block_id"] for x in a] == [y["block_id"] for y in b]


def test_combined_section_pattern_equals_table_scan():
    """The single-alternation line classifier must agree with a sequential
    first-match-wins scan of SECTION_PATTERNS on every corpus line plus
    adversarial fixtures (the spec the combined regex is pinned to)."""
    from legal_knowledge_graph_spark.corpus import generate_corpus
    from legal_knowledge_graph_spark.operators.segment import _line_type
    from legal_knowledge_graph_spark.schema import SECTION_PATTERNS

    def spec(line):
        for btype, pat in SECTION_PATTERNS:
            if pat.match(line):
                return btype
        return None

    files, _gt, _gn = generate_corpus(120, seed=42)
    lines = []
    for _repo, _path, _sha, _lang, content in files:
        lines.extend((content or "").split("\n"))
    lines += [
        "  Copyright 2020 X", "\tdef test_a():", "class Foo:", "DEF X()",
        "licence: MIT", "LICENSED UNDER APACHE", "#comment", "## doc",
        "x = 1", "[section]", 'key: "v"', "import os", "   ", "", "\r",
        "COPYRIGHT (C) 2024", "// copyright 2020", "const f = async (",
        'it("works")', "describe(", "using System;", "#include <x>",
        "=====", '"""doc', "def test_x():", "func TestY(", "type T struct{",
    ]
    for ln in lines:
        assert _line_type(ln) == spec(ln), repr(ln)
