"""st2 — entity-mention detection over blocks (the NER stage).

Deterministic vectorized replacement for the reference's per-block LLM NER
(/root/reference/src/langgraph_agents/ner_agent.py:97-394): a closed,
lang-keyed regex rule table finds the 9 entity types, validates positions
by construction (we extract *from* the text, ner_agent.py:358-371's repair
loop is unnecessary), normalizes types against the closed enum
(ner_agent.py:350-356), and flags pronoun-like references
(ner_agent.py:277-312).

Semantics of the pronoun analog (documented contract):
- tokens in schema.PRONOUNS are NOISE: never emitted at all;
- call references with text length <= 2 (e.g. ``pc``) are emitted with
  ``is_reference=True`` — excluded from entity canonicalization, kept as
  triple endpoints so the coref stage can resolve them (mirrors the
  reference flow where pronouns are filtered from entities but relations
  may still reference them -> need_coref,
  relation_norm_agent.py:300-326).

Executed as ``mapInPandas``; regexes compile once per executor at import.
A fused files->mentions path avoids materializing block content through a
shuffle/stage boundary at scale.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..schema import DICTIONARY, MENTIONS_SCHEMA, PRONOUNS
from .segment import segment_text

# --------------------------------------------------------------------------
# Pattern tables (compiled once per executor)
# --------------------------------------------------------------------------
_license_terms: list[str] = []
for _canonical, _aliases, _etype, _conf in DICTIONARY:
    if _etype == "License":
        _license_terms.append(_canonical)
        _license_terms.extend(_aliases)
_license_terms.sort(key=len, reverse=True)
LICENSE_RE = re.compile(
    r"(?<![\w-])(?:" + "|".join(re.escape(t) for t in _license_terms) + r")(?![\w-])",
    re.IGNORECASE,
)

COPYRIGHT_RE = re.compile(
    r"Copyright\s*(?:\(c\)|©)?\s*(\d{4})(?:\s*[-–]\s*\d{4})?,?\s+([^\n]+?)\s*$"
)
AT_AUTHOR_RE = re.compile(r"@author:?\s+(.+?)\s*$")
DATE_RE = re.compile(r"(?<![\d-])(\d{4}-\d{2}-\d{2})(?![\d-])")
VER_REQUIRES_RE = re.compile(r"requires\s+version\s*>=\s*v?(\d+(?:\.\d+)+)", re.IGNORECASE)
VER_DUNDER_RE = re.compile(r"__version__\s*=\s*[\"'](\d+(?:\.\d+)+)[\"']")
VER_WORD_RE = re.compile(r"\bversion\s+v?(\d+(?:\.\d+)+)\b", re.IGNORECASE)

MODULE_PATTERNS: dict[str, list[re.Pattern]] = {
    "python": [
        re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)(?:\s+as\s+\w+)?", re.MULTILINE),
        re.compile(r"^\s*from\s+([A-Za-z_][\w.]*)\s+import\b", re.MULTILINE),
    ],
    "javascript": [
        re.compile(r"require\(\s*['\"]([^'\"]+)['\"]"),
        re.compile(r"^\s*import\s+[\w{},*\s]+?\s+from\s+['\"]([^'\"]+)['\"]", re.MULTILINE),
    ],
    "go": [
        re.compile(r"^\s*import\s+\"([\w/.-]+)\"", re.MULTILINE),
    ],
}
GO_IMPORT_LINE_RE = re.compile(r"^\s*\"([\w/.-]+)\",?\s*$")

DEF_RE = re.compile(
    r"^(?:def|func)\s+([A-Za-z_]\w*)\s*\(|"
    r"^(?:export\s+)?(?:async\s+)?function\s+([A-Za-z_]\w*)\s*\("
)
METHOD_RE = re.compile(r"^\s+def\s+([A-Za-z_]\w*)\s*\(")
CLASS_RE = re.compile(
    r"^class\s+([A-Za-z_]\w*)\s*(?:\(\s*([A-Za-z_][\w.]*)\s*\))?\s*:|"
    r"^class\s+([A-Za-z_]\w*)(?:\s+extends\s+([A-Za-z_][\w.]*))?\s*\{"
)
CALL_RE = re.compile(r"([A-Za-z_][\w.]*)\s*\(")

# identifier-shaped words that precede "(" but are never call mentions
CALL_KEYWORDS = frozenset({
    "if", "for", "while", "return", "print", "assert", "require", "import",
    "def", "func", "function", "class", "with", "except", "raise", "switch",
    "catch", "new", "typeof", "len", "range", "str", "int", "float", "list",
    "dict", "set", "tuple", "type", "isinstance", "append", "join", "split",
    "get", "items", "keys", "values", "format", "open", "enumerate", "zip",
    "map", "filter", "sorted", "min", "max", "sum", "abs", "copyright",
    "describe", "main",
})

_CALL_BLOCKS = {"CLASS", "FUNCTION", "TEST"}


def _mention(etype, text, start, end, conf, is_ref=False, evidence=None, **attrs):
    return {
        "entity_type": etype, "text": text, "start_pos": start, "end_pos": end,
        "confidence": conf, "is_reference": is_ref, "evidence": evidence,
        "attributes": {k: v for k, v in attrs.items() if v is not None},
    }


def detect_mentions(block_type: str, lang: str, content: str) -> list[dict]:
    """Pure detection kernel for one block. Positions are offsets into the
    block content (reference positions are per-block, ner_agent.py:358)."""
    out: list[dict] = []
    if not content:
        return out

    # --- licenses / authors / dates / versions: scanned in any block ----
    for m in LICENSE_RE.finditer(content):
        line = content[content.rfind("\n", 0, m.start()) + 1:]
        line = line[: line.find("\n")] if "\n" in line else line
        out.append(_mention("License", m.group(0), m.start(), m.end(), 0.9,
                            evidence=line.strip()[:200]))
    for line, off in _lines(content):
        cm = COPYRIGHT_RE.search(line)
        if cm:
            out.append(_mention("Date", cm.group(1), off + cm.start(1),
                                off + cm.end(1), 0.9, ctx="copyright",
                                evidence=line.strip()[:200]))
            author = cm.group(2).rstrip(",;")
            if author and len(author) <= 60 and not author[0].isdigit():
                out.append(_mention("Author", author, off + cm.start(2),
                                    off + cm.start(2) + len(author), 0.9,
                                    evidence=line.strip()[:200]))
        am = AT_AUTHOR_RE.search(line)
        if am:
            out.append(_mention("Author", am.group(1), off + am.start(1),
                                off + am.end(1), 0.9, evidence=line.strip()[:200]))
        low = line.lower()
        ctx = "modified" if ("last modified" in low or "updated" in low) else None
        for dm in DATE_RE.finditer(line):
            out.append(_mention("Date", dm.group(1), off + dm.start(1),
                                off + dm.end(1), 0.9, ctx=ctx,
                                evidence=line.strip()[:200]))
        rm = VER_REQUIRES_RE.search(line)
        if rm:
            out.append(_mention("Version", rm.group(1), off + rm.start(1),
                                off + rm.end(1), 0.9, ctx="requires",
                                evidence=line.strip()[:200]))
        else:
            # a license name's own version ("Apache License, Version 2.0")
            # is not a file version
            vm = VER_DUNDER_RE.search(line) or (
                None if LICENSE_RE.search(line) else VER_WORD_RE.search(line))
            if vm:
                out.append(_mention("Version", vm.group(1), off + vm.start(1),
                                    off + vm.end(1), 0.9, ctx="has",
                                    evidence=line.strip()[:200]))

    # --- modules --------------------------------------------------------
    for pat in MODULE_PATTERNS.get(lang, MODULE_PATTERNS["python"]):
        for m in pat.finditer(content):
            out.append(_mention("Module", m.group(1), m.start(1), m.end(1),
                                0.95, role="import"))
    if lang == "go" and block_type == "IMPORTS":
        for line, off in _lines(content):
            gm = GO_IMPORT_LINE_RE.match(line)
            if gm:
                out.append(_mention("Module", gm.group(1), off + gm.start(1),
                                    off + gm.end(1), 0.95, role="import"))

    # --- defs / classes / calls (code blocks only) -----------------------
    if block_type in _CALL_BLOCKS:
        encl: str | None = None
        cls: str | None = None
        for line, off in _lines(content):
            decl_span: tuple[int, int] | None = None
            cm = CLASS_RE.match(line)
            dm = DEF_RE.match(line)
            mm = METHOD_RE.match(line) if cls is not None else None
            if cm:
                name = cm.group(1) or cm.group(3)
                base = cm.group(2) or cm.group(4)
                gi = 1 if cm.group(1) else 3
                cls, encl = name, None
                out.append(_mention("Class", name, off + cm.start(gi),
                                    off + cm.end(gi), 0.95, role="def",
                                    evidence=line.strip()[:200]))
                if base:
                    bi = 2 if cm.group(2) else 4
                    out.append(_mention("Class", base, off + cm.start(bi),
                                        off + cm.end(bi), 0.95, role="base",
                                        cls=name))
                decl_span = (cm.start(gi), cm.end(gi))
            elif dm:
                name = dm.group(1) or dm.group(2)
                gi = 1 if dm.group(1) else 2
                encl = name
                cls = None
                out.append(_mention("Function", name, off + dm.start(gi),
                                    off + dm.end(gi), 0.95, role="def",
                                    evidence=line.strip()[:200]))
                decl_span = (dm.start(gi), dm.end(gi))
            elif mm:
                name = mm.group(1)
                encl = name
                out.append(_mention("Function", name, off + mm.start(1),
                                    off + mm.end(1), 0.95, role="method",
                                    cls=cls, evidence=line.strip()[:200]))
                decl_span = (mm.start(1), mm.end(1))

            for m in CALL_RE.finditer(line):
                name = m.group(1)
                if decl_span and m.start(1) == decl_span[0]:
                    continue  # the declaration itself
                if name.lower() in CALL_KEYWORDS:
                    continue
                head = name.split(".", 1)[0].lower()
                if head in PRONOUNS or name.lower() in PRONOUNS:
                    continue  # noise, never emitted (pronoun filter)
                out.append(_mention(
                    "Function", name, off + m.start(1), off + m.end(1), 0.85,
                    is_ref=len(name) <= 2, role="call", encl=encl,
                    evidence=line.strip()[:200]))
    return out


def _lines(content: str):
    off = 0
    for line in content.split("\n"):
        yield line, off
        off += len(line) + 1


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------
_M_COLS = [f.name for f in MENTIONS_SCHEMA.fields]


def _rows_for_block(r, block_type, block_id, content, rows):
    for m in detect_mentions(block_type, r.lang, content):
        # composite id: unique by construction (one mention per
        # (block, type, start)), no per-mention hashing on the hot path
        mid = f"{block_id}:{m['entity_type']}:{m['start_pos']}"
        rows.append((
            r.doc_key, r.repo, r.path, r.content_sha, block_id, block_type,
            mid, m["entity_type"], m["text"], m["start_pos"], m["end_pos"],
            m["confidence"], m["is_reference"], m["evidence"], m["attributes"],
        ))


def _structural_rows(r, rows):
    """File and Repo are structural entities (identity = their name);
    emitted once per document against a pseudo-block."""
    fb = f"{r.doc_key}#file"
    fname = f"{r.repo}/{r.path}"
    for etype, text in (("File", fname), ("Repo", r.repo)):
        mid = f"{fb}:{etype}:0"
        rows.append((
            r.doc_key, r.repo, r.path, r.content_sha, fb, "FILE",
            mid, etype, text, 0, len(text), 1.0, False, None, {},
        ))


def mentions_from_files(ingested: DataFrame) -> DataFrame:
    """Fused st1+st2: files -> mentions without materializing blocks.
    Preferred at scale — block content never crosses a stage boundary."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                _structural_rows(r, rows)
                for b in segment_text(r.doc_key, r.content or ""):
                    _rows_for_block(r, b["block_type"], b["block_id"],
                                    b["content"], rows)
            yield pd.DataFrame(rows, columns=_M_COLS)

    from .type_norm import normalize_entity_types

    # F7: entity-type alias projection + closed-enum filter
    # (entities.py:128-143, ner_agent.py:350-356) — identity on this
    # extractor's canonical output, active for external mention sources
    return normalize_entity_types(ingested.mapInPandas(run, schema=MENTIONS_SCHEMA))


def mentions_from_blocks(blocks: DataFrame, ingested: DataFrame) -> DataFrame:
    """st2 over a materialized blocks table (checkpoint-resume path).
    Structural File/Repo mentions come from the ingest table."""

    def run_blocks(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                _rows_for_block(r, r.block_type, r.block_id, r.content, rows)
            yield pd.DataFrame(rows, columns=_M_COLS)

    def run_docs(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                _structural_rows(r, rows)
            yield pd.DataFrame(rows, columns=_M_COLS)

    from .type_norm import normalize_entity_types

    return normalize_entity_types(
        blocks.mapInPandas(run_blocks, schema=MENTIONS_SCHEMA).unionByName(
            ingested.mapInPandas(run_docs, schema=MENTIONS_SCHEMA)
        )
    )


def filter_pronouns(mentions: DataFrame) -> DataFrame:
    """F5 (ner_agent.py:277-312): drop pronoun/noise mentions and short
    unresolved references from the ENTITY stream. Triple emission (st4)
    uses the unfiltered stream so reference-like endpoints survive into
    need_coref."""
    return mentions.filter(
        (~F.lower(F.col("text")).isin(list(PRONOUNS))) & (~F.col("is_reference"))
    )
