"""r7-bound operators: built + tested during the r6 registry freeze
(test_registry_frozen_for_r6), to be registered as workloads in r7.

Two-level IVF assignment (operators/similarity.ivf_assign_two_level):
the scaled-codebook kNN graph's missing asymptotic piece.  The flat
assignment scores every vector against a C-entry LITERAL codebook —
O(n·C) compute and an O(C) plan, which is itself quadratic once the
codebook scales with the corpus (C = n/bucket).  The hierarchical
coarse→fine route keeps every stage O(n·sqrt(C)).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.similarity import mutual_knn_graph
from comlake_core_spark.session import tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return tables(spark, SF_DIR)["embeddings"]


def _edges(df):
    return {
        (r["id_a"], r["id_b"], r["rank_ab"], r["rank_ba"]): r["cosine"]
        for r in df.collect()
    }


def test_two_level_full_coarse_probe_equals_flat(emb):
    """Probing every coarse bucket makes the fine candidate set complete,
    so home/probe — and therefore the whole mutual-kNN graph — must equal
    the flat literal-codebook assignment bit-for-bit (same seeded
    centroids, same tie-breaks, same sequential-fold dot products)."""
    kwargs = dict(
        k=4, candidate="ivf", n_probe=8, seed_hasher="md5", target_bucket_size=32
    )
    flat = _edges(mutual_knn_graph(emb, assignment="flat", **kwargs))
    two = _edges(
        mutual_knn_graph(emb, assignment="two_level", coarse_probe=None, **kwargs)
    )
    assert set(flat) == set(two)
    for key, cos_flat in flat.items():
        assert two[key] == cos_flat, key  # bitwise: identical fold order


def test_two_level_partial_coarse_probe_trades_recall(emb):
    """A partial coarse probe restricts fine candidates per vector — the
    graph stays valid (schema, cosine range, mutual ranks) and keeps most
    of the full assignment's edges on this data; deterministic, so the
    recall here is a fixed number, not a flaky bound."""
    kwargs = dict(
        k=4, candidate="ivf", n_probe=8, seed_hasher="md5", target_bucket_size=32
    )
    full = _edges(mutual_knn_graph(emb, assignment="two_level", coarse_probe=None, **kwargs))
    part_df = mutual_knn_graph(emb, assignment="two_level", coarse_probe=2, **kwargs)
    part = _edges(part_df)
    assert part_df.columns == ["id_a", "id_b", "cosine", "rank_ab", "rank_ba"]
    assert part, "partial probing must still produce mutual edges"
    for (a, b, rab, rba), cos in part.items():
        assert a < b and 1 <= rab <= 4 and 1 <= rba <= 4
        assert -1.0000001 <= cos <= 1.0000001
    pairs_full = {(a, b) for (a, b, _, _) in full}
    pairs_part = {(a, b) for (a, b, _, _) in part}
    recall = len(pairs_part & pairs_full) / len(pairs_full)
    assert recall >= 0.5, f"coarse_probe=2 recall collapsed: {recall:.2f}"


def test_two_level_plan_has_no_fine_literal(emb):
    """The point of the hierarchy: the FINE codebook must stay a joined
    DataFrame, never a collected literal.  The coarse literal is
    O(sqrt(C)) struct entries; with C≈16 at sf0.001 the coarse literal
    has ≤ 4+1 centroids, so any plan embedding ≥ C literal vectors
    betrays a flat collect.  Count literal array-of-struct centroid ids
    in the final plan text."""
    df = mutual_knn_graph(
        emb, k=4, candidate="ivf", n_probe=8, seed_hasher="md5",
        target_bucket_size=32, assignment="two_level", coarse_probe=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = emb.count()
    n_cent = max((n + 31) // 32, 8)
    import re

    # each literal codebook entry renders as "named_struct(cid, <int>" —
    # the flat path would embed n_cent of them, two-level ceil(sqrt)
    hits = len(re.findall(r"named_struct\(cid,", plan))
    assert hits <= 2 * int(n_cent**0.5 + 1), (hits, n_cent)


class TestDoremiDomainWeights:
    """DoReMi-lite (arXiv:2305.10429 Alg. 1 core) over the documents
    table: per-source weights from a quality-derived loss proxy."""

    @pytest.fixture(scope="class")
    def weights(self, spark):
        from comlake_core_spark.operators.sampling import doremi_domain_weights

        docs = tables(spark, SF_DIR)["documents"]
        # loss proxy: longer docs score "easier" (lower loss) — any
        # deterministic per-doc number works for the schedule
        loss = (1.0 / (1.0 + F.length("text") / 1000.0))
        df = doremi_domain_weights(docs, ["source"], loss, rounds=3, eta=2.0, smoothing=0.02)
        return {r["source"]: r.asDict() for r in df.collect()}

    def test_weights_are_a_smoothed_distribution(self, weights):
        k = len(weights)
        total = sum(w["weight"] for w in weights.values())
        assert abs(total - 1.0) < 1e-6 * k  # 9-grid rounding only
        for w in weights.values():
            assert w["weight"] >= 0.02 / k - 1e-9  # smoothing floor
            assert w["weight_q9"] == int(round(w["weight"] * 1e9))

    def test_harder_domains_gain_share(self, weights):
        # weight must be monotone in excess loss (same eta for all)
        by_excess = sorted(weights.values(), key=lambda w: w["excess"])
        ws = [w["weight"] for w in by_excess]
        assert ws == sorted(ws)
        assert by_excess[-1]["excess"] > 0.0  # some domain is above mean

    def test_deterministic_across_runs(self, spark, weights):
        from comlake_core_spark.operators.sampling import doremi_domain_weights

        docs = tables(spark, SF_DIR)["documents"]
        loss = (1.0 / (1.0 + F.length("text") / 1000.0))
        again = {
            r["source"]: r["weight_q9"]
            for r in doremi_domain_weights(
                docs, ["source"], loss, rounds=3, eta=2.0, smoothing=0.02
            ).collect()
        }
        assert again == {s: w["weight_q9"] for s, w in weights.items()}

    def test_zero_rounds_is_smoothless_uniform(self, spark):
        from comlake_core_spark.operators.sampling import doremi_domain_weights

        docs = tables(spark, SF_DIR)["documents"]
        df = doremi_domain_weights(docs, ["source"], F.lit(1.0), rounds=0)
        rows = df.collect()
        k = len(rows)
        for r in rows:
            assert abs(r["weight"] - 1.0 / k) < 1e-9


class TestKneserNeyTrigram:
    """Interpolated KN trigram LM vs an independent pure-Python reference
    computed with the same formulas (single discount, hard backoff on
    absent denominators, 9-grid quantization)."""

    TRAIN = [
        (0, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (4, "a cat ran on the mat"),
    ]
    SCORE = [
        (1, "the cat sat on the rug"),
        (3, "a dog sat on a mat"),
        (5, "zz yy xx"),          # fully unseen -> floors
        (7, "one two"),           # < 3 tokens -> no trigrams
    ]

    @staticmethod
    def _ref(train, score, D=0.75, q=9, floor=1e-9):
        import math
        from collections import Counter, defaultdict

        tri, big = Counter(), set()
        for _, t in train:
            ws = t.split()
            big.update(zip(ws, ws[1:]))
            tri.update(zip(ws, ws[1:], ws[2:]))
        c2tot, n1fw12 = Counter(), Counter()
        mid, midtot, n1fw_mid = Counter(), Counter(), Counter()
        for (a, b, c), n in tri.items():
            c2tot[(a, b)] += n
            n1fw12[(a, b)] += 1
            mid[(b, c)] += 1
        for (b, c), n in mid.items():
            midtot[b] += n
            n1fw_mid[b] += 1
        cont = Counter(b for _, b in big)
        n1all = len(big)
        out = defaultdict(lambda: [0, 0, 0.0])  # n, backoff, sum
        for did, t in score:
            ws = t.split()
            for a, b, c in zip(ws, ws[1:], ws[2:]):
                pcont = cont.get(c, 0) / n1all
                if midtot.get(b, 0) > 0:
                    p2 = (max(mid.get((b, c), 0) - D, 0) + D * n1fw_mid[b] * pcont) / midtot[b]
                else:
                    p2 = pcont
                if c2tot.get((a, b), 0) > 0:
                    p3 = (max(tri.get((a, b, c), 0) - D, 0) + D * n1fw12[(a, b)] * p2) / c2tot[(a, b)]
                    bo = 0
                else:
                    p3, bo = p2, 1
                p9 = round(p3, q)
                lp = round(math.log(max(p9, floor)), q)
                rec = out[did]
                rec[0] += 1
                rec[1] += bo
                rec[2] += lp
            if len(ws) >= 3:
                pass
        return {d: (n, bo, s / n) for d, (n, bo, s) in out.items()}

    @pytest.fixture(scope="class")
    def frames(self, spark):
        train = spark.createDataFrame(self.TRAIN, "doc_id long, text string")
        score = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        return train, score

    def test_matches_python_reference(self, spark, frames):
        from comlake_core_spark.operators.text.kneser_ney import kneser_ney_trigram_logprob

        train, score = frames
        got = {
            r["doc_id"]: (r["n_trigrams"], r["n_backoff_ctx"], r["avg_logprob"])
            for r in kneser_ney_trigram_logprob(score, train).collect()
        }
        want = self._ref(self.TRAIN, self.SCORE)
        assert set(got) == set(want)  # doc 7 (<3 tokens) absent from both
        for d in want:
            assert got[d][0] == want[d][0], d
            assert got[d][1] == want[d][1], d
            assert got[d][2] == pytest.approx(want[d][2], abs=2e-9), d

    def test_seen_context_probabilities_sum_to_one(self, spark, frames):
        """Σ_c P(c|a,b) over the train VOCAB must be ~1 for a context seen
        in training — the property that distinguishes real smoothing from
        an ad-hoc score (stupid backoff deliberately fails this)."""
        from comlake_core_spark.operators.text.kneser_ney import _kn_trigram_scores

        train, _ = frames
        vocab = sorted({w for _, t in self.TRAIN for w in t.split()})
        probes = spark.createDataFrame(
            [(i, f"sat on {w}") for i, w in enumerate(vocab)],
            "doc_id long, text string",
        )
        rows = _kn_trigram_scores(probes, train, "text", "doc_id", 0.75, 9, 1e-9).collect()
        total = sum(r["p"] for r in rows)
        assert total == pytest.approx(1.0, abs=1e-6)

    def test_continuation_beats_raw_frequency(self, spark):
        """KN's point: a word frequent only inside one collocation gets a
        LOW continuation weight.  'francisco' appears 3x (always after
        'san'); 'mat' appears 2x after two different words — Pcont must
        rank mat > francisco despite the raw counts saying otherwise."""
        from comlake_core_spark.operators.text.kneser_ney import _kn_trigram_scores

        train = spark.createDataFrame(
            [
                (0, "san francisco fog san francisco bay san francisco hills"),
                (2, "the mat was green a mat was found"),
            ],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [(0, "qq qq francisco"), (1, "qq qq mat")], "doc_id long, text string"
        )
        p = {
            r["w3"]: r["p"]
            for r in _kn_trigram_scores(probes, train, "text", "doc_id", 0.75, 9, 1e-9).collect()
        }
        assert p["mat"] > p["francisco"]

    def test_deterministic(self, spark, frames):
        from comlake_core_spark.operators.text.kneser_ney import kneser_ney_trigram_logprob

        train, score = frames
        a = sorted(map(tuple, kneser_ney_trigram_logprob(score, train).collect()))
        b = sorted(map(tuple, kneser_ney_trigram_logprob(score, train).collect()))
        assert a == b


class TestUnigramLmTokenizer:
    """SentencePiece-style unigram-LM training (Kudo 2018), hard-EM:
    Viterbi E-step over the word dictionary + count re-estimation."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "low lower lowest low low"),
                (1, "new newer newest new newer"),
                (2, "wide wider widest low new"),
            ],
            "doc_id long, text string",
        )

    def test_every_word_coverable_at_seed(self, spark, docs):
        from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train, unigram_viterbi_segment

        pieces = unigram_lm_train(docs, em_rounds=0, seed_vocab=20)
        seg = unigram_viterbi_segment(docs, pieces)
        words = {r["word"] for r in seg.collect()}
        expect = {w for _, t in docs.collect() for w in t.split()}
        assert words == expect  # single-char seeding guarantees coverage
        for r in seg.collect():
            assert "".join(r["pieces"]) == r["word"]

    def test_hard_em_loglikelihood_non_decreasing(self, spark, docs):
        from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train, unigram_viterbi_segment

        lls = []
        for rounds in (0, 1, 2):
            pieces = unigram_lm_train(docs, em_rounds=rounds, seed_vocab=40)
            seg = unigram_viterbi_segment(docs, pieces).collect()
            lls.append(sum(r["freq"] * r["score"] for r in seg))
        assert lls[1] >= lls[0] - 1e-6, lls
        assert lls[2] >= lls[1] - 1e-6, lls

    def test_em_prunes_unused_pieces(self, spark, docs):
        from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train

        seed = unigram_lm_train(docs, em_rounds=0, seed_vocab=60)
        trained = unigram_lm_train(docs, em_rounds=2, seed_vocab=60)
        assert trained.count() < seed.count()  # unused substrings fell out
        # surviving pieces are a subset of the seed vocabulary
        seed_set = {r["piece"] for r in seed.collect()}
        assert {r["piece"] for r in trained.collect()} <= seed_set

    def test_frequent_morphemes_become_pieces(self, spark, docs):
        from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train, unigram_viterbi_segment

        pieces = unigram_lm_train(docs, em_rounds=2, seed_vocab=60)
        seg = {r["word"]: r["pieces"] for r in unigram_viterbi_segment(docs, pieces).collect()}
        # 'low' and 'new' are frequent whole words -> single pieces
        assert seg["low"] == ["low"]
        assert seg["new"] == ["new"]

    def test_deterministic(self, spark, docs):
        from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train

        a = sorted(map(tuple, unigram_lm_train(docs, em_rounds=2).collect()))
        b = sorted(map(tuple, unigram_lm_train(docs, em_rounds=2).collect()))
        assert a == b


DOREMI_ORACLE = r"""
WITH d0 AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CAST(round(1.0/(1.0 + length(text)/1000.0), 9) AS DECIMAL(28,9))) AS lsum
  FROM documents GROUP BY source
), g AS (
  SELECT SUM(lsum) AS gsum, SUM(n_docs) AS gn, COUNT(*) AS k FROM d0
), base AS (
  SELECT source, n_docs,
         round(CAST(lsum AS DOUBLE)/n_docs, 9) AS mean_loss,
         GREATEST(round(round(CAST(lsum AS DOUBLE)/n_docs, 9)
                        - round(CAST(g.gsum AS DOUBLE)/g.gn, 9), 9), 0.0) AS excess,
         CAST(round(1.0/g.k, 9) AS DECIMAL(20,9)) AS w, g.k AS k
  FROM d0 CROSS JOIN g
), u1 AS (
  SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM base
), r1 AS (
  SELECT source, n_docs, mean_loss, excess, k,
         CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                    + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
  FROM u1 CROSS JOIN (SELECT SUM(u) AS z FROM u1) zz
), u2 AS (
  SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM r1
), r2 AS (
  SELECT source, n_docs, mean_loss, excess, k,
         CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                    + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
  FROM u2 CROSS JOIN (SELECT SUM(u) AS z FROM u2) zz
), u3 AS (
  SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM r2
), r3 AS (
  SELECT source, n_docs, mean_loss, excess, k,
         CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                    + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
  FROM u3 CROSS JOIN (SELECT SUM(u) AS z FROM u3) zz
)
SELECT source, n_docs, mean_loss, excess,
       CAST(w*1000000000 AS BIGINT) AS weight_q9, CAST(w AS DOUBLE) AS weight
FROM r3
"""


def test_doremi_duckdb_oracle_staged(spark):
    """Full value-hash oracle for the r7 doremi workload form, run here
    WITHOUT registering (registry frozen for r6): the unrolled 3-round
    SQL must reproduce the operator bit-for-bit on the driver tables."""
    import duckdb

    from comlake_core_spark.operators.sampling import doremi_domain_weights

    docs = tables(spark, SF_DIR)["documents"]
    loss = F.lit(1.0) / (F.lit(1.0) + F.length("text") / F.lit(1000.0))
    sdf = doremi_domain_weights(docs, ["source"], loss, rounds=3, eta=2.0, smoothing=0.02)
    got = {r["source"]: tuple(r)[1:] for r in sdf.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {r[0]: tuple(r)[1:] for r in con.sql(DOREMI_ORACLE).fetchall()}
    assert got == want


KN_ORACLE = r"""
WITH tr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ts
  FROM documents WHERE doc_id % 2 = 0
),
trt AS (
  SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT)+1] AS w2, ts[CAST(i AS INT)+2] AS w3
  FROM tr, LATERAL (SELECT unnest(range(1, len(ts)-1)) AS i) u
  WHERE len(ts) >= 3
),
c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM trt GROUP BY 1, 2, 3),
ctx AS (SELECT w1, w2, SUM(c3) AS c2tot, COUNT(*) AS n1fw12 FROM c3 GROUP BY 1, 2),
mid AS (SELECT w2, w3, COUNT(*) AS n1mid FROM c3 GROUP BY 1, 2),
midtot AS (SELECT w2, SUM(n1mid) AS n1mid_tot, COUNT(*) AS n1fw_mid FROM mid GROUP BY 1),
bg AS (
  SELECT DISTINCT ts[CAST(i AS INT)] AS a, ts[CAST(i AS INT)+1] AS b
  FROM tr, LATERAL (SELECT unnest(range(1, len(ts))) AS i) u
  WHERE len(ts) >= 2
),
cont AS (SELECT b, COUNT(*) AS n1bw FROM bg GROUP BY 1),
n1all AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n1all FROM bg),
sc AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ts
  FROM documents WHERE doc_id % 2 = 1
),
sct AS (
  SELECT doc_id, ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT)+1] AS w2, ts[CAST(i AS INT)+2] AS w3
  FROM sc, LATERAL (SELECT unnest(range(1, len(ts)-1)) AS i) u
  WHERE len(ts) >= 3
),
j AS (
  SELECT sct.doc_id, sct.w1, sct.w2, sct.w3,
         c3.c3, ctx.c2tot, ctx.n1fw12,
         mid.n1mid, midtot.n1mid_tot, midtot.n1fw_mid,
         cont.n1bw, n1all.n1all
  FROM sct
  LEFT JOIN c3 ON sct.w1 = c3.w1 AND sct.w2 = c3.w2 AND sct.w3 = c3.w3
  LEFT JOIN ctx ON sct.w1 = ctx.w1 AND sct.w2 = ctx.w2
  LEFT JOIN mid ON sct.w2 = mid.w2 AND sct.w3 = mid.w3
  LEFT JOIN midtot ON sct.w2 = midtot.w2
  LEFT JOIN cont ON sct.w3 = cont.b
  CROSS JOIN n1all
),
p2c AS (
  SELECT *,
    CASE WHEN COALESCE(n1mid_tot, 0) > 0 THEN
      (GREATEST(CAST(COALESCE(n1mid, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
       + CAST(0.75 AS DOUBLE) * CAST(n1fw_mid AS DOUBLE)
         * (CAST(COALESCE(n1bw, 0) AS DOUBLE) / n1all))
      / CAST(n1mid_tot AS DOUBLE)
    ELSE CAST(COALESCE(n1bw, 0) AS DOUBLE) / n1all END AS p2
  FROM j
),
p3c AS (
  SELECT doc_id,
    round(CASE WHEN COALESCE(c2tot, 0) > 0 THEN
      (GREATEST(CAST(COALESCE(c3, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
       + CAST(0.75 AS DOUBLE) * CAST(n1fw12 AS DOUBLE) * p2)
      / CAST(c2tot AS DOUBLE)
    ELSE p2 END, 9) AS p9,
    CASE WHEN COALESCE(c2tot, 0) = 0 THEN 1 ELSE 0 END AS bo
  FROM p2c
),
lp AS (
  SELECT doc_id, round(ln(GREATEST(p9, CAST(1e-9 AS DOUBLE))), 9) AS lp, bo FROM p3c
)
SELECT doc_id,
       COUNT(*) AS n_trigrams,
       CAST(SUM(bo) AS BIGINT) AS n_backoff_ctx,
       CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS avg_logprob
FROM lp GROUP BY doc_id
"""


def test_kneser_ney_duckdb_oracle_staged(spark):
    """Full value-hash oracle for the r7 KN workload form (even half
    trains, odd half is scored), run WITHOUT registering (registry
    frozen for r6): the SQL re-derivation of the trigram/continuation
    tables and the interpolation must match the operator bit-for-bit."""
    import duckdb

    from comlake_core_spark.operators.text.kneser_ney import kneser_ney_trigram_logprob

    docs = tables(spark, SF_DIR)["documents"]
    lm = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    sdf = kneser_ney_trigram_logprob(score, lm)
    got = {r["doc_id"]: tuple(r)[1:] for r in sdf.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {r[0]: tuple(r)[1:] for r in con.sql(KN_ORACLE).fetchall()}
    assert set(got) == set(want)
    bad = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not bad, f"{len(bad)} docs differ; first: {list(bad.items())[:2]}"


KNN2_ORACLE = r"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
), k_ AS (
  SELECT GREATEST(CAST(ceil(COUNT(*) / 32.0) AS BIGINT), 8) AS n_cent FROM c
), cent AS (
  SELECT cid, cv FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cid, cv
    FROM c
  ) CROSS JOIN k_ WHERE cid <= k_.n_cent
), c1_ AS (
  SELECT CAST(ceil(sqrt(n_cent)) AS BIGINT) AS c1 FROM k_
), coarse AS (
  SELECT ccid, list_transform(ccv, x -> x / sqrt(list_dot_product(ccv, ccv))) AS ccvec
  FROM (
    SELECT cid AS ccid, cv AS ccv,
           row_number() OVER (ORDER BY md5(CAST(cid AS VARCHAR)), cid) AS crn
    FROM cent
  ) CROSS JOIN c1_ WHERE crn <= c1_.c1
), centu AS (
  SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cvec, cv
  FROM cent
), fine AS (
  -- each fine centroid routed to its nearest coarse centroid (raw fine
  -- vector vs unit coarse, ties -> smaller coarse id)
  SELECT cid, cvec, ccid AS coarse FROM (
    SELECT centu.cid, centu.cvec, coarse.ccid, row_number() OVER (
      PARTITION BY centu.cid
      ORDER BY list_dot_product(centu.cv, coarse.ccvec) DESC, coarse.ccid ASC) AS rn
    FROM centu CROSS JOIN coarse
  ) WHERE rn = 1
), vprobe AS (
  -- each vector probes its 4 nearest coarse buckets
  SELECT vec_id, cv, ccid AS coarse FROM (
    SELECT c.vec_id, c.cv, coarse.ccid, row_number() OVER (
      PARTITION BY c.vec_id
      ORDER BY list_dot_product(c.cv, coarse.ccvec) DESC, coarse.ccid ASC) AS rn
    FROM c CROSS JOIN coarse
  ) WHERE rn <= 4
), ranked AS (
  -- fine candidates from probed coarse buckets, ranked per vector
  SELECT vec_id, cv, cid, row_number() OVER (
    PARTITION BY vec_id
    ORDER BY list_dot_product(cv, cvec) DESC, cid ASC) AS rn
  FROM vprobe JOIN fine USING (coarse)
), home AS (
  SELECT vec_id AS dst, cv, cid AS bucket FROM ranked WHERE rn = 1
), probe AS (
  SELECT vec_id AS src, cv AS qv, cid AS bucket FROM ranked WHERE rn <= 8
), scored AS (
  SELECT src, dst,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM home JOIN probe USING (bucket) WHERE src <> dst
), knn AS (
  SELECT *, row_number() OVER (
    PARTITION BY src ORDER BY cosine DESC, dst ASC) AS rn
  FROM scored
), kk AS (SELECT * FROM knn WHERE rn <= 4)
SELECT id_a, id_b, cosine, rank_ab, rank_ba FROM
  (SELECT src AS id_a, dst AS id_b, cosine, CAST(rn AS BIGINT) AS rank_ab
   FROM kk WHERE src < dst) f
  JOIN
  (SELECT dst AS id_a, src AS id_b, CAST(rn AS BIGINT) AS rank_ba
   FROM kk WHERE dst < src) r
  USING (id_a, id_b)
"""


def test_knn_two_level_duckdb_oracle_staged(spark, emb):
    """Full value-hash oracle for the r7 two-level kNN workload form
    (target_bucket_size=32, coarse_probe=4, n_probe=8, k=4), run WITHOUT
    registering: the SQL re-derives the coarse pick, the fine routing,
    the per-vector coarse probe, and the fine ranking — so the plan that
    is actually scale-safe at 100 TB is itself oracle-gated, not only
    its flat-assignment equivalence."""
    import duckdb

    from comlake_core_spark.operators.similarity import mutual_knn_graph

    sdf = mutual_knn_graph(
        emb, k=4, candidate="ivf", n_probe=8, seed_hasher="md5",
        target_bucket_size=32, assignment="two_level", coarse_probe=4,
    )
    got = {(r["id_a"], r["id_b"]): (r["cosine"], r["rank_ab"], r["rank_ba"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    want = {(r[0], r[1]): (r[2], r[3], r[4]) for r in con.sql(KNN2_ORACLE).fetchall()}
    assert set(got) == set(want)
    bad = {e: (got[e], want[e]) for e in got if got[e] != want[e]}
    assert not bad, f"{len(bad)} edges differ; first: {list(bad.items())[:2]}"


def test_doremi_single_corpus_scan(spark):
    """The round loop must run on the checkpointed O(domains) frame —
    without the cut, every round's Z total replayed the corpus aggregate
    (17 parquet scans in the 3-round executed plan when this was
    caught)."""
    from comlake_core_spark.operators.sampling import doremi_domain_weights

    docs = tables(spark, SF_DIR)["documents"]
    df = doremi_domain_weights(docs, ["source"], F.lit(1.0) / (F.lit(1.0) + F.length("text")), rounds=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0  # loop sees only the RDD cut


UNIGRAM_SEED_ORACLE = r"""
WITH words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS word
    FROM documents
  ) GROUP BY word
), sub AS (
  SELECT substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece, SUM(freq) AS count
  FROM words,
       LATERAL (SELECT unnest(range(1, length(word) + 1)) AS i) ii,
       LATERAL (SELECT unnest(range(1, least(4, length(word) - CAST(i AS INT) + 1) + 1)) AS l) ll
  GROUP BY 1
), ranked AS (
  SELECT piece, count, row_number() OVER (ORDER BY count DESC, piece) AS rn FROM sub
), seeds AS (
  SELECT piece, MAX(count) AS count FROM (
    SELECT piece, count FROM ranked WHERE rn <= 200
    UNION ALL
    SELECT piece, count FROM sub WHERE length(piece) = 1
  ) GROUP BY piece
), tot AS (SELECT CAST(SUM(count) AS DOUBLE) AS t FROM seeds)
SELECT piece, count, round(ln(count / t), 9) AS logp FROM seeds CROSS JOIN tot
"""


def test_unigram_seed_duckdb_oracle_staged(spark):
    """The unigram-LM SEED model (em_rounds=0) is fully SQL-expressible:
    substring counts over the word dictionary, (count desc, piece)
    top-200 ∪ all single chars, logp on the 9-grid.  Bit-exact vs the
    operator — the r7 registration plan gives the seed a full value-hash
    row and keeps the Viterbi-EM rounds pytest-gated (the DP is the one
    genuinely non-SQL step)."""
    import duckdb

    from comlake_core_spark.operators.text.unigram_lm import unigram_lm_train

    docs = tables(spark, SF_DIR)["documents"]
    sdf = unigram_lm_train(docs, em_rounds=0, seed_vocab=200, max_piece_len=4)
    got = {r["piece"]: (r["count"], r["logp"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {r[0]: (r[1], r[2]) for r in con.sql(UNIGRAM_SEED_ORACLE).fetchall()}
    assert set(got) == set(want)
    bad = {p: (got[p], want[p]) for p in got if got[p] != want[p]}
    assert not bad, f"{len(bad)} pieces differ; first: {list(bad.items())[:3]}"


def test_pretrain_pipeline_v2_composition(spark):
    """End-to-end shape for the r7 composed workload: KN-perplexity
    filter (even half trains the LM, odd half is scored) → DoReMi
    per-source weights from the KN loss → mixture quotas → chunk —
    every stage one of this round's operators plus existing machinery.
    Sanity invariants only here (each stage's oracle is staged
    separately); the point is that the stages COMPOSE on real tables."""
    from comlake_core_spark.operators.sampling import doremi_domain_weights, mixture_resample
    from comlake_core_spark.operators.text.chunking import chunk_documents
    from comlake_core_spark.operators.text.kneser_ney import kneser_ney_trigram_logprob

    docs = tables(spark, SF_DIR)["documents"]
    lm = docs.filter(F.col("doc_id") % 2 == 0)
    cand = docs.filter(F.col("doc_id") % 2 == 1)

    scored = kneser_ney_trigram_logprob(cand, lm)
    flagged = cand.join(scored, "doc_id").filter(F.col("avg_logprob") > -18.0)
    n_cand, n_kept = cand.count(), flagged.count()
    assert 0 < n_kept <= n_cand

    # negative avg_logprob as the DoReMi loss proxy: harder sources up-weight
    w = doremi_domain_weights(flagged, ["source"], -F.col("avg_logprob"), rounds=2)
    weights = {r["source"]: r["weight"] for r in w.collect()}
    assert abs(sum(weights.values()) - 1.0) < 1e-6 * len(weights)

    mix = mixture_resample(
        flagged.withColumn("n_tokens", F.size(F.split(F.trim(F.lower("text")), r"\s+"))),
        ["source"],
        target_docs=min(50, n_kept),
    )
    assert mix.agg(F.sum("quota")).first()[0] == min(50, n_kept)

    chunks = chunk_documents(flagged, chunk_chars=400, overlap=80)
    per_doc = chunks.groupBy("doc_id").count()
    assert per_doc.count() == n_kept  # every kept doc chunked, none lost
