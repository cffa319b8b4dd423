"""st0 — ingest: deterministic doc keys + the per-row content invariant.

The input is the BASELINE.json input_hint table
(repo, path, commit, lang, content). We add:

- ``content_sha = sha2(content, 256)`` — the per-row invariant carried
  through every stage (BASELINE.json:15).
- ``doc_key = sha2(repo || path || commit)`` — deterministic
  content-derived identity replacing the reference's sequential counters
  (/root/reference/src/document_parser/parser.py:205-208; see SURVEY §1.3:
  order-dependent IDs are hostile to distributed execution).

Scale note: this stage is a narrow projection — no shuffle. Repartitioning
to bucket-by-repo happens once here so every downstream per-doc stage
inherits repo co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ingest(
    files: DataFrame, bucket_by_repo: int | None = None, salt: int = 16
) -> DataFrame:
    """Adds content_sha + doc_key; optionally repartitions on a SALTED
    repo key: pure repartition(N, repo) would map a mega-repo (100x
    median, FIXTURES §1) to one partition — the salt spreads each repo
    over up to `salt` partitions while keeping partial repo locality
    (north_rule: skew handled via salted repartitioning + AQE)."""
    out = files.withColumn(
        "content_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
    ).withColumn(
        "doc_key",
        F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256),
    )
    if bucket_by_repo:
        out = out.withColumn(
            "_salt", F.pmod(F.xxhash64("path"), F.lit(salt))
        ).repartition(bucket_by_repo, "repo", "_salt").drop("_salt")
    return out
