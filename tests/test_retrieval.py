"""Invariant tests for BM25 retrieval and the IVF-bounded kNN graph."""

from __future__ import annotations

from collections import defaultdict

from lets_talk_cdc_change_feed_playground_spark.functions import retrieval_queries as R
from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import (
    TOPK_QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_bm25_ranking_invariants(spark):
    rows = R.docs_bm25_topk(spark, SF).collect()
    assert rows, "bm25 returned no rows"
    by_q = defaultdict(list)
    for r in rows:
        assert r["doc_id"] != r["query_id"], "query doc must not retrieve itself"
        assert 1 <= r["n_terms"] <= R.BM25_QTERMS
        assert r["score_micro"] > 0
        by_q[r["query_id"]].append(r)
    assert set(by_q) <= set(range(TOPK_QUERIES))
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_more_matched_terms_beats_superset_score(spark):
    # Within one query, a doc matching strictly more query terms at equal
    # per-term contribution can't be dominated arbitrarily — weak sanity:
    # the top-ranked doc matches at least as many terms as the median doc.
    rows = R.docs_bm25_topk(spark, SF).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert rs[0]["n_terms"] >= 1


def test_knn_graph_invariants(spark):
    rows = R.emb_knn_graph(spark, SF).collect()
    assert rows
    edges = {(r["src"], r["dst"]) for r in rows}
    by_src = defaultdict(list)
    for r in rows:
        assert r["src"] != r["dst"]
        assert -1.0000001 <= r["cosine"] <= 1.0000001
        by_src[r["src"]].append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r["rank"])
        assert len(rs) <= R.KNN_K
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cos = [r["cosine"] for r in rs]
        assert cos == sorted(cos, reverse=True)
    # reciprocal flag is exactly "reverse edge exists in the edge list"
    for r in rows:
        assert r["reciprocal"] == ((r["dst"], r["src"]) in edges)


def test_winnowing_pairs_are_symmetric_and_thresholded(spark):
    rows = R.docs_winnowing_overlap(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= R.WIN_MIN_SHARED
        assert 0 < r["overlap_bp"] <= 10000
        assert r["n_shared"] <= min(r["fps_a"], r["fps_b"])


def test_winnowing_shared_counts_match_recomputed_sets(spark):
    # n_shared must equal |fps_a ∩ fps_b ∩ non-boilerplate| recomputed from
    # the fingerprint frame directly (winnowing reports substring overlap,
    # NOT MinHash set-similarity — a token-shuffled near-dup shares few
    # contiguous runs, so the two detectors legitimately disagree)
    from collections import Counter

    fps = {r["doc_id"]: set(r["fps"]) for r in R._win_fps(spark, SF).collect()}
    counts = Counter(fp for s in fps.values() for fp in s)
    keep = {fp for fp, n in counts.items() if 2 <= n <= R.WIN_CAP}
    for r in R.docs_winnowing_overlap(spark, SF).collect():
        expect = len(fps[r["doc_a"]] & fps[r["doc_b"]] & keep)
        assert r["n_shared"] == expect


def test_index_shards_account_for_all_postings(spark):
    from pyspark.sql import functions as F
    from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import _docs_t

    rows = R.docs_index_shards(spark, SF).collect()
    assert 1 <= len(rows) <= R.IDX_SHARDS
    d = _docs_t(spark, SF)
    tok = d.select("doc_id", F.explode("toks").alias("term")).filter(
        (F.length("term") >= 3) & ~F.col("term").isin(*__import__(
            "lets_talk_cdc_change_feed_playground_spark.functions.textops",
            fromlist=["STOPWORDS"],
        ).STOPWORDS)
    )
    n_postings = tok.select("doc_id", "term").distinct().count()
    assert sum(r["n_postings"] for r in rows) == n_postings
    for r in rows:
        assert r["max_postings"] <= r["n_postings"]
        assert r["top_term"]


def test_ivf_balance_shares_sum(spark):
    rows = R.emb_ivf_balance(spark, SF).collect()
    total = sum(r["n_vectors"] for r in rows)
    assert total > 0
    for r in rows:
        assert r["split_into"] >= 1
        assert r["needs_split"] == (r["n_vectors"] * len(rows) > 2 * total) or len(rows) < 16
    # loads are shares of a balanced allocation: mean load == 10000 bp
    mean_bp = sum(r["load_bp"] for r in rows) / len(rows)
    assert 9000 <= mean_bp <= 11000


def test_nprobe_curve_monotone(spark):
    rows = sorted(R.emb_nprobe_curve(spark, SF).collect(), key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == list(R.NPROBE_LEVELS)
    for a, b in zip(rows, rows[1:]):
        assert a["n_candidates"] <= b["n_candidates"]  # more probes, more cost
        assert a["recall_bp"] <= b["recall_bp"]  # ...and no worse recall
    assert rows[-1]["recall_bp"] >= 5000  # probing half the cells finds most truth


def test_dedup_threshold_sweep_monotone(spark):
    rows = sorted(R.docs_dedup_threshold_sweep(spark, SF).collect(), key=lambda r: r["thr_bp"])
    assert [r["thr_bp"] for r in rows] == list(R.SWEEP_BP)
    cands = {r["n_candidates"] for r in rows}
    assert len(cands) == 1  # one shared candidate set across levels
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]  # higher threshold, fewer pairs
    for r in rows:
        assert 0 <= r["n_pairs"] <= r["n_candidates"]
        assert r["below_lsh_point"] == (r["thr_bp"] < 7100)


def test_corpus_drift_ranks_and_rates(spark):
    rows = sorted(R.docs_corpus_drift(spark, SF).collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    drifts = [r["drift_micro"] for r in rows]
    assert drifts == sorted(drifts, reverse=True)
    for r in rows:
        assert r["o1"] + r["o2"] > 0
        assert 0 <= r["rate_a_pm"] <= 1000 and 0 <= r["rate_b_pm"] <= 1000


def test_knn_triangles_invariants(spark, sf_dir):
    """Each triangle counted once at three nodes: the per-node total is
    divisible by 3; a node closes at most C(d,2) triangles; clustering
    is a valid [0,1] ratio and zero below degree 2."""
    from lets_talk_cdc_change_feed_playground_spark.functions.retrieval_queries import (
        emb_knn_triangles,
    )

    rows = emb_knn_triangles(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_triangles"] for r in rows) % 3 == 0
    for r in rows:
        d = r["degree"]
        assert r["n_triangles"] <= d * (d - 1) // 2
        assert 0.0 <= r["clustering"] <= 1.0
        if d < 2:
            assert r["clustering"] == 0.0 and r["n_triangles"] == 0
