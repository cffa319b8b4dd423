"""Closed rule tables + Spark StructTypes for the KG pipeline.

This module is the code-corpus re-instantiation of the reference's fixed
semantic tables (SURVEY.md §1.4). It is version-pinned: these tables ARE
the extraction semantics being graded, so they never change silently.

Reference parallels:
- BLOCK_TYPES        <- /root/reference/src/document_parser/rules.py:11-22
- SECTION_PATTERNS   <- /root/reference/src/document_parser/rules.py:25-79
- HIERARCHY_PATTERNS <- /root/reference/src/document_parser/rules.py:82-87
- BLOCK_TYPE_ALIASES <- /root/reference/src/document_parser/rules.py:158-165
- ENTITY_TYPES       <- /root/reference/src/knowledge_base/entities.py:109-119
- ENTITY_TYPE_ALIASES<- /root/reference/src/knowledge_base/entities.py:130-143
- PRONOUNS           <- /root/reference/src/langgraph_agents/ner_agent.py:288-292
- RELATION_TYPES     <- /root/reference/src/langgraph_agents/relation_norm_agent.py:41-65
- PREDICATE_ALIASES  <- /root/reference/src/langgraph_agents/relation_norm_agent.py:220-236
- DICTIONARY         <- /root/reference/src/normalization/dictionary.py:32-53
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Block types: closed enum of 10 with OTHER fallback (same discipline as the
# reference's 10 legal section types, rules.py:11-22).
# ---------------------------------------------------------------------------
BLOCK_TYPES = [
    "LICENSE",   # license / copyright header comment
    "HEADER",    # other leading comment / docstring header
    "IMPORTS",   # import / require / include section
    "CLASS",     # top-level class definition
    "FUNCTION",  # top-level function definition
    "DOC",       # documentation prose (markdown sections, docstrings)
    "CONFIG",    # key = value config blocks
    "TEST",      # test function/class blocks
    "COMMENT",   # standalone comment block
    "OTHER",     # fallback (rules.py:123)
]

# Raw/alias block-type spellings -> canonical (rules.py:158-165 analog).
BLOCK_TYPE_ALIASES = {
    "COPYRIGHT": "LICENSE",
    "IMPORT": "IMPORTS",
    "INCLUDE": "IMPORTS",
    "REQUIRE": "IMPORTS",
    "DEF": "FUNCTION",
    "FUNC": "FUNCTION",
    "METHOD": "FUNCTION",
    "DOCSTRING": "DOC",
    "MARKDOWN": "DOC",
    "SETTINGS": "CONFIG",
    "TESTS": "TEST",
}

# Section-start patterns, first match wins in declaration order
# (rules.py:106-123 first-match semantics). Applied per line.
# Order matters: TEST before FUNCTION/CLASS (a test is a specialized def).
SECTION_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("LICENSE", re.compile(
        r"^\s*(?:#|//|/\*|\*|--)?\s*"
        r"(?:Copyright|SPDX-License-Identifier|Licensed under|"
        r"(?:MIT|Apache|BSD|GPL|MPL|LGPL)\b.*Licen[cs]e|Licen[cs]e:)",
        re.IGNORECASE)),
    ("TEST", re.compile(
        r"^(?:def\s+test_\w+|class\s+Test\w+|func\s+Test\w+|"
        r"(?:it|test|describe)\s*\()")),
    ("CLASS", re.compile(
        r"^(?:class|interface|trait|struct)\s+[A-Za-z_]\w*|^type\s+[A-Za-z_]\w*\s+struct\b")),
    ("FUNCTION", re.compile(
        r"^(?:def|func|function)\s+[A-Za-z_]\w*|"
        r"^(?:export\s+)?(?:async\s+)?function\s+[A-Za-z_]\w*|"
        r"^(?:const|let|var)\s+[A-Za-z_]\w*\s*=\s*(?:async\s*)?\(")),
    ("IMPORTS", re.compile(
        r"^(?:import\s+\S|from\s+\S+\s+import\b|require\s*\(|#include\s|using\s+\S+;|"
        r"(?:const|let|var)\s+\w+\s*=\s*require\s*\(|"
        r'import\s*\()')),
    ("DOC", re.compile(r"^(?:#{2,4}\s+\S|=+\s*$|\"\"\"|''')")),
    ("CONFIG", re.compile(r"^\[[\w.-]+\]\s*$|^[\w.-]+\s*[:=]\s*[\"'\d\[{]")),
    ("COMMENT", re.compile(r"^\s*(?:#(?!#)|//|/\*|--)\s*\S")),
]

# Hierarchy-level patterns, index+1 = level, 0 = no level
# (rules.py:82-87 analog: 4 ordered numbering schemes -> indentation/nesting
# depth cues for code).
HIERARCHY_PATTERNS: list[re.Pattern] = [
    re.compile(r"^(?:class|interface|trait|struct)\s"),        # level 1
    re.compile(r"^(?:def|func|function)\s"),                   # level 2
    re.compile(r"^    (?:def|func|function)\s"),               # level 3 (method)
    re.compile(r"^        (?:def|func|function)\s"),           # level 4 (nested)
]

# ---------------------------------------------------------------------------
# Entity types: closed enum of 9 (entities.py:109-119 analog).
# ---------------------------------------------------------------------------
ENTITY_TYPES = [
    "File",      # <- Case      (the unit of extraction)
    "Repo",      # <- Court     (the venue)
    "Module",    # <- Evidence  (imported artifacts)
    "Function",  # <- Judge
    "Class",     # <- Party
    "License",   # <- Law
    "Author",    # <- LegalTerm (named persons/orgs)
    "Date",      # <- Date
    "Version",   # <- Amount (numeric-literal slot; "currency" ~ scheme)
]

# Alias spellings -> canonical type (entities.py:130-143 analog: unknown
# types pass through and are then rejected by the closed-enum filter,
# ner_agent.py:350-356).
ENTITY_TYPE_ALIASES = {
    "file": "File",
    "path": "File",
    "repository": "Repo",
    "repo": "Repo",
    "module": "Module",
    "import": "Module",
    "package": "Module",
    "function": "Function",
    "def": "Function",
    "method": "Function",
    "class": "Class",
    "type": "Class",
    "license": "License",
    "licence": "License",
    "author": "Author",
    "person": "Author",
    "copyright_holder": "Author",
    "date": "Date",
    "version": "Version",
    "semver": "Version",
}

# Types clustered by similarity in st3; File/Repo are structural — their
# name IS their identity (paths share too many tokens for similarity to be
# meaningful). Must stay in sync with the golden generator.
SIMILARITY_TYPES = frozenset(
    {"License", "Author", "Module", "Function", "Class", "Date", "Version"}
)

# Noise tokens the mention detector must NOT emit — the code-corpus analog
# of the 18-item Chinese pronoun set (ner_agent.py:288-292). Matched on the
# stripped, lowercased mention text.
PRONOUNS = frozenset({
    "self", "this", "cls", "it", "that", "me", "us", "them",
    "他", "她", "它", "其", "该", "此", "本", "上述",
    "super", "args", "kwargs", "null", "none", "true", "false",
})

# ---------------------------------------------------------------------------
# Predicates: closed set of 15 with (subject_type, object_type) signatures
# (relation_norm_agent.py:41-65 analog — same arity discipline, including
# a reversed-direction pair and two same-signature pairs, mirroring
# law_cited_by_case and case_amount/party_awarded_amount).
# ---------------------------------------------------------------------------
RELATION_TYPES: dict[str, tuple[str, str]] = {
    # File structure
    "file_in_repo":            ("File", "Repo"),
    "file_imports_module":     ("File", "Module"),
    "file_defines_function":   ("File", "Function"),
    "file_defines_class":      ("File", "Class"),
    "function_in_class":       ("Function", "Class"),
    "class_extends_class":     ("Class", "Class"),
    "function_calls_function": ("Function", "Function"),
    # Provenance / legal
    "file_has_license":        ("File", "License"),
    "license_covers_repo":     ("License", "Repo"),   # reversed-direction slot
    "file_authored_by":        ("File", "Author"),
    "author_contributed_to":   ("Author", "Repo"),
    # Dates (three same-signature predicates, like the reference's 3 dates)
    "file_copyright_date":     ("File", "Date"),
    "file_modified_date":      ("File", "Date"),
    # Versions (two same-signature, like case_amount/party_awarded_amount)
    "file_has_version":        ("File", "Version"),
    "file_requires_version":   ("File", "Version"),
}

# Predicate alias map + fuzzy containment fallback
# (relation_norm_agent.py:220-249 analog).
PREDICATE_ALIASES = {
    "in_repo": "file_in_repo",
    "belongs_to_repo": "file_in_repo",
    "imports": "file_imports_module",
    "requires": "file_imports_module",
    "defines_function": "file_defines_function",
    "declares_function": "file_defines_function",
    "defines_class": "file_defines_class",
    "declares_class": "file_defines_class",
    "method_of": "function_in_class",
    "extends": "class_extends_class",
    "inherits": "class_extends_class",
    "calls": "function_calls_function",
    "licensed_under": "file_has_license",
    "has_license": "file_has_license",
    "covers": "license_covers_repo",
    "authored_by": "file_authored_by",
    "written_by": "file_authored_by",
    "contributed_to": "author_contributed_to",
    "copyright_date": "file_copyright_date",
    "modified_date": "file_modified_date",
    "last_modified": "file_modified_date",
    "has_version": "file_has_version",
    "requires_version": "file_requires_version",
}

# ---------------------------------------------------------------------------
# Alias dictionary (dictionary.py:32-53 analog): canonical_name, aliases,
# entity_type, confidence. Broadcast-joined in st3. ~50 rows per FIXTURES §4.
# ---------------------------------------------------------------------------
DICTIONARY: list[tuple[str, list[str], str, float]] = [
    ("MIT License",
     ["MIT", "MIT Licence", "The MIT License", "mit-license", "MIT-style license"],
     "License", 0.95),
    ("Apache License 2.0",
     ["Apache-2.0", "Apache 2.0", "Apache License, Version 2.0", "ASL 2.0",
      "apache license version 2.0"],
     "License", 0.95),
    ("GNU General Public License v3.0",
     ["GPL-3.0", "GPLv3", "GPL v3", "GNU GPL v3.0", "gpl-3.0-or-later"],
     "License", 0.95),
    ("BSD 3-Clause License",
     ["BSD-3-Clause", "BSD 3-Clause", "New BSD License", "Modified BSD License"],
     "License", 0.95),
    ("Mozilla Public License 2.0",
     ["MPL-2.0", "MPL 2.0", "Mozilla Public License, v. 2.0"],
     "License", 0.95),
    ("ISC License", ["ISC", "ISC Licence"], "License", 0.95),
    ("John Smith", ["J. Smith", "jsmith", "John A. Smith", "Smith, John"],
     "Author", 0.9),
    ("Jane Doe", ["J. Doe", "jdoe", "Jane B. Doe", "Doe, Jane"], "Author", 0.9),
    ("Wei Zhang", ["W. Zhang", "wzhang", "Zhang Wei", "Zhang, Wei"], "Author", 0.9),
    ("Acme Corporation", ["Acme Corp", "Acme Corp.", "ACME", "Acme Inc."],
     "Author", 0.9),
    ("Globex Industries", ["Globex", "Globex Ind.", "Globex Industries LLC"],
     "Author", 0.9),
    ("numpy", ["np", "numpy.core", "numpy.linalg"], "Module", 0.85),
    ("pandas", ["pd", "pandas.core"], "Module", 0.85),
    ("requests", ["requests.api", "requests.sessions"], "Module", 0.85),
]


def dictionary_rows() -> list[tuple[str, str, str, float]]:
    """Flatten DICTIONARY to (alias, canonical_name, entity_type, confidence),
    including the identity row canonical->canonical
    (dictionary.py:96-115: both alias and canonical hit the map)."""
    rows = []
    for canonical, aliases, etype, conf in DICTIONARY:
        rows.append((canonical.lower(), canonical, etype, conf))
        for a in aliases:
            rows.append((a.lower(), canonical, etype, conf))
    return rows


# ---------------------------------------------------------------------------
# StructTypes for every stage table (SURVEY.md §1.1 table).
# ---------------------------------------------------------------------------
FILES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
])

# st0 output = FILES + doc_key + content_sha
INGEST_SCHEMA = T.StructType(
    FILES_SCHEMA.fields
    + [
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("content_sha", T.StringType(), False),
    ]
)

BLOCKS_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content_sha", T.StringType(), False),
    T.StructField("block_id", T.StringType(), False),
    T.StructField("block_ordinal", T.IntegerType(), False),
    T.StructField("block_type", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("start_pos", T.IntegerType(), False),
    T.StructField("end_pos", T.IntegerType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("parent_id", T.StringType(), True),
])

MENTIONS_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("content_sha", T.StringType(), False),
    T.StructField("block_id", T.StringType(), False),
    T.StructField("block_type", T.StringType(), False),
    T.StructField("mention_id", T.StringType(), False),
    T.StructField("entity_type", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("start_pos", T.IntegerType(), False),
    T.StructField("end_pos", T.IntegerType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("is_reference", T.BooleanType(), False),
    T.StructField("evidence", T.StringType(), True),
    T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
])

NODES_SCHEMA = T.StructType([
    T.StructField("entity_id", T.StringType(), False),
    T.StructField("entity_type", T.StringType(), False),
    T.StructField("canonical_name", T.StringType(), False),
    T.StructField("aliases", T.ArrayType(T.StringType()), False),
    T.StructField("original_names", T.ArrayType(T.StringType()), False),
    T.StructField("n_mentions", T.LongType(), False),
    T.StructField("block_type", T.StringType(), True),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("source_block_ids", T.ArrayType(T.StringType()), False),
])

TRIPLES_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("block_id", T.StringType(), False),
    T.StructField("content_sha", T.StringType(), False),
    T.StructField("subject", T.StringType(), False),       # mention surface text
    T.StructField("subject_type", T.StringType(), False),
    T.StructField("predicate", T.StringType(), False),
    T.StructField("object", T.StringType(), False),
    T.StructField("object_type", T.StringType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("evidence", T.StringType(), True),
])

EDGES_SCHEMA = T.StructType([
    T.StructField("edge_id", T.StringType(), False),
    T.StructField("subject_entity_id", T.StringType(), False),
    T.StructField("predicate", T.StringType(), False),
    T.StructField("object_entity_id", T.StringType(), False),
    T.StructField("subject_canonical", T.StringType(), False),
    T.StructField("object_canonical", T.StringType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("evidence", T.StringType(), True),
    T.StructField("source_block_id", T.StringType(), True),
    T.StructField("need_coref", T.BooleanType(), False),
    T.StructField("validation_passed", T.BooleanType(), False),
])
