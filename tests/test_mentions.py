"""st2 unit tests: detector rules, pronoun/reference filtering."""

from legal_knowledge_graph_spark.operators.mentions import detect_mentions


def _by_type(ms, t):
    return [m for m in ms if m["entity_type"] == t]


def test_license_author_date():
    ms = detect_mentions(
        "LICENSE", "python",
        "# Copyright (c) 2024 John A. Smith\n# Licensed under the Apache-2.0.")
    lic = _by_type(ms, "License")
    assert [m["text"] for m in lic] == ["Apache-2.0"]
    assert [m["text"] for m in _by_type(ms, "Author")] == ["John A. Smith"]
    dates = _by_type(ms, "Date")
    assert dates[0]["text"] == "2024"
    assert dates[0]["attributes"]["ctx"] == "copyright"


def test_license_version_not_file_version():
    ms = detect_mentions(
        "LICENSE", "python", "# Licensed under the Apache License, Version 2.0.")
    assert not _by_type(ms, "Version")


def test_modules_by_lang():
    py = detect_mentions("IMPORTS", "python",
                         "import numpy as np\nfrom os import path")
    assert sorted(m["text"] for m in _by_type(py, "Module")) == ["numpy", "os"]
    js = detect_mentions(
        "IMPORTS", "javascript",
        "const m = require('lodash');\nimport helper from 'axios';")
    assert sorted(m["text"] for m in _by_type(js, "Module")) == ["axios", "lodash"]
    # python import pattern must NOT fire on js default imports
    assert "helper" not in [m["text"] for m in _by_type(js, "Module")]
    go = detect_mentions("IMPORTS", "go", 'import (\n    "fmt"\n    "strings"\n)')
    assert sorted(m["text"] for m in _by_type(go, "Module")) == ["fmt", "strings"]


def test_defs_methods_calls():
    ms = detect_mentions(
        "CLASS", "python",
        "class FastLoader(AbstractLoader):\n"
        "    def load_data(self, x):\n"
        "        self.cache = {}\n"
        "        return parse_config(x)\n")
    cls = _by_type(ms, "Class")
    assert {(m["text"], m["attributes"].get("role")) for m in cls} == {
        ("FastLoader", "def"), ("AbstractLoader", "base")}
    fns = _by_type(ms, "Function")
    roles = {(m["text"], m["attributes"].get("role")) for m in fns}
    assert ("load_data", "method") in roles
    assert ("parse_config", "call") in roles
    call = [m for m in fns if m["attributes"].get("role") == "call"][0]
    assert call["attributes"]["encl"] == "load_data"
    method = [m for m in fns if m["attributes"].get("role") == "method"][0]
    assert method["attributes"]["cls"] == "FastLoader"


def test_pronouns_never_emitted_and_short_refs_flagged():
    ms = detect_mentions(
        "FUNCTION", "python",
        "def caller(x):\n    a = it(x)\n    b = self.helper(x)\n    return pc(x)\n")
    fns = _by_type(ms, "Function")
    texts = {m["text"] for m in fns}
    assert "it" not in texts            # pronoun: dropped entirely
    assert "self.helper" not in texts   # pronoun-qualified: dropped
    pc = [m for m in fns if m["text"] == "pc"][0]
    assert pc["is_reference"] is True   # short ref: kept, flagged


def test_position_validity():
    content = "def parse_config(data):\n    return fetch_data(data)\n"
    ms = detect_mentions("FUNCTION", "python", content)
    for m in ms:
        assert content[m["start_pos"]: m["end_pos"]] == m["text"]


def test_no_calls_outside_code_blocks():
    ms = detect_mentions("LICENSE", "python", "# Copyright (c) 2024 Acme Corp.")
    assert not [m for m in ms if m["attributes"].get("role") == "call"]


def test_version_contexts():
    ms = detect_mentions(
        "CONFIG", "python",
        '__version__ = "1.2.3"\n# requires version >= 3.8\n# version 2.0.0 shipped')
    vs = {(m["text"], m["attributes"]["ctx"]) for m in _by_type(ms, "Version")}
    assert ("1.2.3", "has") in vs
    assert ("3.8", "requires") in vs
    assert ("2.0.0", "has") in vs


def test_date_modified_ctx():
    ms = detect_mentions("COMMENT", "python", "# Last modified: 2024-01-15")
    d = _by_type(ms, "Date")[0]
    assert d["attributes"]["ctx"] == "modified"
