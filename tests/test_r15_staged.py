"""r15 STAGING: operators built after the r14 window froze ship as code +
pytest and register in r15 (the r7/r11/r12/r13/r14 staging pattern).

- ``perplexity_tiers_by_source`` (operators/text/tiers.py) — CCNet
  head/middle/tail perplexity tiers per source (Wenzek et al. 2020):
  rank every document within its source by the corpus-trained unigram
  fluency score and split into exact-integer thirds.  The per-source
  rank rides ONE global_row_number pass + an S-row offset join — no
  per-source window funnel.
- ``decontaminate_semantic`` (operators/similarity/decon.py) —
  embedding-space decontamination: for each train vector, the closest
  EVAL vector by cosine and a threshold flag — the contamination tier
  n-gram matching misses (paraphrases, near-copies).

The DuckDB oracles staged at the bottom are proven bit-exact here so the
r15 registration is copy-paste once CORRECTNESS_r14 lands.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import Decimal

from pyspark.sql import functions as F

from comlake_core_spark.operators.similarity.decon import semantic_decontaminate
from comlake_core_spark.operators.text.tiers import perplexity_tiers

SF_DIR = "/root/testdata/sf0.001"

DECON_MOD = 25
#: the eval set is the FIXED slice vec_id % 25 == 0 AND vec_id < 500 —
#: 20 vectors at every scale factor.  Fixed-size eval is the deployment
#: contract (a benchmark does not grow with the training corpus) and
#: what makes the operator's scaling LINEAR in the train side: the
#: first curve run used the unbounded % 25 predicate, so the builder's
#: copies grew BOTH sides and the 8x point tracked pair volume
#: (1.44/1.66/2.90/9.38 s) — a builder artifact, not the operator.
DECON_EVAL_MAX = 500
DECON_THRESHOLD = 0.35


# ---------------------------------------------------------------------------
# brute-force Python twins
# ---------------------------------------------------------------------------


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", s.strip(" ")) if t != ""]


def _py_tiers(rows):
    """rows: (doc_id, text, source).  Mirrors unigram_logprob's 9-decimal
    quantize + exact decimal sum, then per-source thirds."""
    vocab = Counter(t for _, text, _ in rows for t in _tok(text.lower()))
    total = float(sum(vocab.values()))
    scored = []
    for d, text, src in rows:
        ts = _tok(text.lower())
        if not ts:
            continue
        lp = sum(Decimal(str(round(math.log(vocab[t] / total), 9))) for t in ts)
        scored.append((d, src, len(ts), float(lp) / len(ts)))
    out = {}
    for src in {s for _, _, s in rows}:
        grp = sorted(
            (r for r in scored if r[1] == src), key=lambda r: (-r[3], r[0])
        )
        n = len(grp)
        for rk, (d, _, nt, alp) in enumerate(grp, 1):
            tier = "head" if 3 * rk <= n else ("middle" if 3 * rk <= 2 * n else "tail")
            out[d] = (src, nt, alp, rk, tier)
    return out


def _py_decon(rows, mod=DECON_MOD, evmax=DECON_EVAL_MAX, thr=DECON_THRESHOLD):
    """rows: (vec_id, [floats]).  Left-fold float arithmetic matches the
    engine's sequential-fold cosine."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    ev = [(i, v) for i, v in rows if i % mod == 0 and i < evmax]
    out = {}
    for i, v in rows:
        if i % mod == 0 and i < evmax:
            continue
        best = None
        for j, w in ev:
            c = dot(v, w) / (math.sqrt(dot(v, v)) * math.sqrt(dot(w, w)))
            if best is None or c > best[1] or (c == best[1] and j < best[0]):
                best = (j, c)
        out[i] = (best[0], best[1], best[1] >= thr)
    return out


TIER_DOCS = [
    # src A: 7 docs -> head 2 / middle 2 / tail 3 (3rk<=7, 3rk<=14)
    (1, "the the the the", "A"),          # all hot tokens: best score
    (2, "the the rare1", "A"),
    (3, "the rare2 rare3", "A"),
    (4, "rare4 rare5 rare6", "A"),
    (5, "the the the the", "A"),          # exact tie with doc 1 -> id order
    (6, "the", "A"),
    (7, "rare7", "A"),
    (8, "", "A"),                          # token-less: no tier row
    # src B: 1 doc -> 3*1 <= ... n=1 -> 3>1, 3>2 -> tail
    (9, "the solo", "B"),
    # src C: 2 docs -> rk1: 3>2 -> middle? 3*1<=2? no; 3*1<=4 yes -> middle
    (10, "the the", "C"),
    (11, "rare8", "C"),
]


def test_perplexity_tiers_matches_bruteforce(spark):
    df = spark.createDataFrame(TIER_DOCS, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (
            r["source"], r["n_tokens"], r["avg_logprob"], r["src_rank"], r["tier"]
        )
        for r in perplexity_tiers(df).collect()
    }
    assert got == _py_tiers(TIER_DOCS)
    # semantics pins, independent of the twin
    assert 8 not in got                       # token-less doc has no tier
    assert got[1][3] == 1 and got[5][3] == 2  # exact-tie docs rank by id
    assert got[9][4] == "tail"                # n=1 -> the single doc is tail
    assert got[10][4] == "middle" and got[11][4] == "tail"  # n=2 -> no head
    a_tiers = Counter(v[4] for d, v in got.items() if v[0] == "A")
    assert a_tiers == {"head": 2, "middle": 2, "tail": 3}


def test_perplexity_tiers_random_fixtures_match_twin(spark):
    import random

    rng = random.Random(1501)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        rows = []
        d = 0
        for s in range(rng.randrange(1, 4)):
            for _ in range(rng.randrange(1, 9)):
                d += 1
                rows.append(
                    (
                        trial * 100 + d,
                        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9))),
                        f"s{s}",
                    )
                )
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            r["doc_id"]: (
                r["source"], r["n_tokens"], r["avg_logprob"], r["src_rank"], r["tier"]
            )
            for r in perplexity_tiers(df).collect()
        }
        assert got == _py_tiers(rows), trial


def test_perplexity_tiers_partition_invariance(spark):
    df = spark.createDataFrame(TIER_DOCS, "doc_id long, text string, source string")
    a = sorted(tuple(r) for r in perplexity_tiers(df).collect())
    b = sorted(tuple(r) for r in perplexity_tiers(df.repartition(7)).collect())
    assert a == b


DECON_VECS = [
    (0, [1.0, 0.0, 0.0]),     # eval
    (25, [0.0, 1.0, 0.0]),    # eval
    (1, [1.0, 0.05, 0.0]),    # near eval 0 -> contaminated
    (2, [0.0, 0.9, 0.4]),     # closest to eval 25
    (3, [-1.0, 0.0, 0.0]),    # anti-parallel: max cosine 0 at best
    (4, [1.0, 1.0, 0.0]),     # equidistant-ish; eval 0 wins on value
]


def _eval_pred(d):
    return (F.col("vec_id") % DECON_MOD == 0) & (F.col("vec_id") < DECON_EVAL_MAX)


def test_semantic_decontaminate_matches_bruteforce(spark):
    df = spark.createDataFrame(DECON_VECS, "vec_id long, embedding array<float>")
    # cast to the engine's input dtype first, then compare against the
    # twin run on the SAME float32-rounded values
    rows = [(i, [float(F32(x)) for x in v]) for i, v in DECON_VECS]
    got = {
        r["vec_id"]: (r["best_eval_id"], r["max_eval_cosine"], r["contaminated"])
        for r in semantic_decontaminate(
            df, _eval_pred, DECON_THRESHOLD
        ).collect()
    }
    assert got == _py_decon(rows)
    assert got[1][0] == 0 and got[1][2] is True
    assert got[2][0] == 25 and got[2][2] is True
    assert got[3][2] is False
    assert 0 not in got and 25 not in got     # eval rows are not scored


def F32(x: float) -> float:
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def test_semantic_decontaminate_random_fixtures_match_twin(spark):
    import random

    rng = random.Random(1502)
    for trial in range(3):
        dim = rng.choice([4, 8])
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(rng.randrange(30, 60))
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        f32rows = [(i, [F32(x) for x in v]) for i, v in rows]
        got = {
            r["vec_id"]: (r["best_eval_id"], r["max_eval_cosine"], r["contaminated"])
            for r in semantic_decontaminate(
                df, _eval_pred, DECON_THRESHOLD
            ).collect()
        }
        assert got == _py_decon(f32rows), trial


# ---------------------------------------------------------------------------
# staged DuckDB oracles (r15 registration): bit-exact vs the Spark side on
# the real tables at two scales
# ---------------------------------------------------------------------------


def staged_tiers_sql() -> str:
    return r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), vocab AS (
  SELECT term, COUNT(*) AS c FROM tok2 GROUP BY term
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t FROM vocab
), scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(CAST(ROUND(ln(CAST(c AS DOUBLE) / t), 9)
                       AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS avg_logprob
  FROM tok2 JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY doc_id
), ranked AS (
  SELECT s.doc_id, d.source, s.n_tokens, s.avg_logprob,
         ROW_NUMBER() OVER (
           PARTITION BY d.source ORDER BY s.avg_logprob DESC, s.doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY d.source) AS n
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT doc_id, source, n_tokens, avg_logprob,
       CAST(rk AS BIGINT) AS src_rank,
       CASE WHEN rk * 3 <= n THEN 'head'
            WHEN rk * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS tier
FROM ranked
"""


def staged_decon_sql() -> str:
    return f"""
WITH ev AS (
  SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS ev
  FROM embeddings WHERE vec_id % {DECON_MOD} = 0 AND vec_id < {DECON_EVAL_MAX}
), tr AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv
  FROM embeddings WHERE NOT (vec_id % {DECON_MOD} = 0 AND vec_id < {DECON_EVAL_MAX})
), scored AS (
  SELECT t.vec_id, e.eval_id,
         list_dot_product(t.tv, e.ev)
           / (sqrt(list_dot_product(t.tv, t.tv))
              * sqrt(list_dot_product(e.ev, e.ev))) AS cos
  FROM tr t CROSS JOIN ev e
), best AS (
  SELECT vec_id, eval_id, cos,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY cos DESC, eval_id
         ) AS rn
  FROM scored
)
SELECT vec_id, CAST(eval_id AS BIGINT) AS best_eval_id,
       cos AS max_eval_cosine,
       cos >= {DECON_THRESHOLD} AS contaminated
FROM best WHERE rn = 1
"""


def _duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _check_both(spark, sf_dir):
    from comlake_core_spark.session import tables

    t = tables(spark, sf_dir, ["documents", "embeddings"])
    con = _duck(sf_dir)

    got = sorted(tuple(r) for r in perplexity_tiers(t["documents"]).collect())
    want = sorted(tuple(r) for r in con.sql(staged_tiers_sql()).fetchall())
    assert len(got) > 0
    assert got == want

    sd = semantic_decontaminate(
        t["embeddings"], _eval_pred, DECON_THRESHOLD
    )
    got_d = sorted(tuple(r) for r in sd.collect())
    want_d = sorted(tuple(r) for r in con.sql(staged_decon_sql()).fetchall())
    assert len(got_d) > 0
    assert got_d == want_d
    # the threshold must BIND but not saturate on the synthetic vectors
    flags = [r[3] for r in got_d]
    assert any(flags) and not all(flags), (
        "DECON_THRESHOLD must split the corpus (some contaminated, some clean)"
    )


def test_staged_oracles_bit_exact_sf0001(spark):
    _check_both(spark, "/root/testdata/sf0.001")


def test_staged_oracles_bit_exact_sf001(spark):
    _check_both(spark, "/root/testdata/sf0.01")


def test_tier_split_integer_invariants(spark):
    """Per source: ranks are 1..n dense, head count == floor(n/3),
    head+middle count == floor(2n/3) — the exact-integer thirds rule."""
    from comlake_core_spark.session import tables

    docs = tables(spark, SF_DIR, ["documents"])["documents"]
    rows = perplexity_tiers(docs).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, grp in by_src.items():
        n = len(grp)
        assert sorted(r["src_rank"] for r in grp) == list(range(1, n + 1)), src
        c = Counter(r["tier"] for r in grp)
        assert c["head"] == n // 3, src
        assert c["head"] + c["middle"] == (2 * n) // 3, src
