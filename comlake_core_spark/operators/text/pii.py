"""PII handling: destructive span redaction (pii_redact) and consistent
keyed pseudonymization (pseudonymize — the GDPR article-4(5) shape that
preserves joins and frequency analyses).  Both map-only codegen'd
regex/md5 expressions; patterns are RE2-and-Java-compatible so the same
regex runs in Spark, DuckDB, and any oracle engine."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Conservative RE2-and-Java-compatible patterns (no backrefs, no lookaround)
# so the same regex runs in Spark (java.util.regex), DuckDB (RE2), and any
# other engine a pipeline pairs this with.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # TPC-H-style international phone: 12-345-678-9012
    "phone": r"[0-9]{2}-[0-9]{3,4}-[0-9]{3,4}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Redact PII spans from a text column and report per-category match
    counts — the scrub step a training-data pipeline runs before anything
    leaves the lake. Categories apply in sorted-name order (deterministic:
    an email's digits must not first be half-eaten by the phone pattern —
    order is part of the contract).

    Scale shape: map-only — every regexp_replace / regexp_count is a
    codegen'd JVM expression over the single scan; no shuffle, no Python.
    """
    pats = dict(sorted((patterns or PII_PATTERNS).items()))
    red = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, token)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


# ---------------------------------------------------------------------------
# consistent pseudonymization
# ---------------------------------------------------------------------------


def pseudonymize(
    df: DataFrame,
    cols: dict[str, str],
    secret: str = "rotate-me",
    token_len: int = 12,
) -> DataFrame:
    """Consistent (deterministic) pseudonymization: replace each column in
    `cols` with a stable keyed token —

        token = md5(secret ':' domain ':' value)[:token_len]

    Same value → same token, so joins, group-bys, and frequency analyses
    still work on the pseudonymized tables; different `domain` strings
    keep columns un-linkable to each other (the same raw value in two
    domains yields different tokens); rotating `secret` re-keys the whole
    corpus.  This is the GDPR-article-4(5) 'pseudonymisation' shape —
    redaction (pii_redact) destroys analytic utility, pseudonymization
    preserves it while the secret stays out of band.  md5 keyed by
    concatenation is linkability protection against outsiders without the
    secret, not a MAC against adversaries who can query the oracle; for
    the latter swap in HMAC-SHA256 via `sha2` — the plan shape is
    identical.

    `cols` maps column name → domain string (use the same domain for the
    two SIDES of a foreign key — e.g. both customer.c_custkey and
    orders.o_custkey under domain 'custkey' — so referential integrity
    survives).

    NULL stays NULL — tokenizing it would (a) give every missing value
    ONE shared stable token, turning "was NULL" into a linkable
    equivalence class, and (b) make pseudonymized equi-joins MATCH on
    NULL keys where the raw join never did (concat_ws silently skips
    NULLs; the isNotNull guard restores SQL's NULL-propagating `||`
    semantics, which is also what the workload oracle computes).

    Map-only (codegen'd md5 over one scan); a join on the token hashes a
    high-entropy uniformly-distributed key, so the pseudonymized join is
    if anything BETTER-behaved under skew than the original."""
    out = df
    for c, domain in cols.items():
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(secret), F.lit(domain), F.col(c).cast("string")
                        )
                    ),
                    1,
                    token_len,
                ),
            ),
        )
    return out
