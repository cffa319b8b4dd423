"""st4 — relation (subject, predicate, object) triple emission.

Deterministic replacement for the reference's per-block LLM relation
extraction (/root/reference/src/langgraph_agents/relation_agent.py:99-407):
a closed rule table maps mention roles/contexts to the 15 predicates in
schema.RELATION_TYPES. Entirely Catalyst column expressions — zero Python
in this stage; each rule is a narrow projection of the mentions table and
the union is whole-stage-codegen'd.

Dedup mirrors relation_agent.py:314-343: first occurrence per
(subject, predicate, object) within a document, made order-free by taking
the minimum (block_id, evidence) witness.

Triples reference SURFACE text; endpoint resolution to canonical entity
ids happens in st5 (edge_norm) so reference-like endpoints (``pc``) can
flow into need_coref exactly like the reference's pronoun endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def _file_col():
    return F.concat_ws("/", "repo", "path")


def _rule(m: DataFrame, cond, subj, styp: str, pred: str, obj, otyp: str,
          conf: float) -> DataFrame:
    return m.where(cond).select(
        "doc_key", "block_id", "content_sha",
        subj.alias("subject"), F.lit(styp).alias("subject_type"),
        F.lit(pred).alias("predicate"),
        obj.alias("object"), F.lit(otyp).alias("object_type"),
        F.lit(conf).alias("confidence"),
        F.coalesce(F.col("attributes")["evidence"], F.col("text")).alias("evidence"),
    )


def emit_triples(mentions: DataFrame) -> DataFrame:
    """mentions (unfiltered stream — includes is_reference rows) -> raw
    triples. See module docstring for the rule table."""
    m = mentions
    t = F.col("entity_type")
    role = F.col("attributes")["role"]
    ctx = F.col("attributes")["ctx"]
    cls = F.col("attributes")["cls"]
    encl = F.col("attributes")["encl"]
    text = F.col("text")

    rules = [
        # structural: one per document (File mention row)
        _rule(m, (t == "File"), text, "File", "file_in_repo",
              F.col("repo"), "Repo", 1.0),
        _rule(m, (t == "Module") & (role == "import"), _file_col(), "File",
              "file_imports_module", text, "Module", 0.95),
        _rule(m, (t == "Function") & (role == "def"), _file_col(), "File",
              "file_defines_function", text, "Function", 0.95),
        _rule(m, (t == "Function") & (role == "method") & cls.isNotNull(),
              text, "Function", "function_in_class", cls, "Class", 0.95),
        _rule(m, (t == "Class") & (role == "def"), _file_col(), "File",
              "file_defines_class", text, "Class", 0.95),
        _rule(m, (t == "Class") & (role == "base") & cls.isNotNull(),
              cls, "Class", "class_extends_class", text, "Class", 0.9),
        _rule(m, (t == "Function") & (role == "call") & encl.isNotNull(),
              encl, "Function", "function_calls_function", text, "Function", 0.85),
        _rule(m, t == "License", _file_col(), "File", "file_has_license",
              text, "License", 0.9),
        _rule(m, t == "License", text, "License", "license_covers_repo",
              F.col("repo"), "Repo", 0.85),
        _rule(m, t == "Author", _file_col(), "File", "file_authored_by",
              text, "Author", 0.9),
        _rule(m, t == "Author", text, "Author", "author_contributed_to",
              F.col("repo"), "Repo", 0.85),
        _rule(m, (t == "Date") & (ctx == "copyright"), _file_col(), "File",
              "file_copyright_date", text, "Date", 0.9),
        _rule(m, (t == "Date") & (ctx == "modified"), _file_col(), "File",
              "file_modified_date", text, "Date", 0.9),
        _rule(m, (t == "Version") & (ctx == "has"), _file_col(), "File",
              "file_has_version", text, "Version", 0.9),
        _rule(m, (t == "Version") & (ctx == "requires"), _file_col(), "File",
              "file_requires_version", text, "Version", 0.9),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return dedup_triples(out)


def dedup_triples(triples: DataFrame) -> DataFrame:
    """A3: first-occurrence (s,p,o) dedup per document
    (relation_agent.py:314-343), order-free: min (block_id, evidence)
    witness, max confidence."""
    return (
        triples.groupBy(
            "doc_key", "content_sha", "subject", "subject_type",
            "predicate", "object", "object_type")
        .agg(
            F.max("confidence").alias("confidence"),
            F.min(F.struct("block_id", "evidence")).alias("_w"),
        )
        .select(
            "doc_key", F.col("_w.block_id").alias("block_id"), "content_sha",
            "subject", "subject_type", "predicate", "object", "object_type",
            "confidence", F.col("_w.evidence").alias("evidence"),
        )
    )
