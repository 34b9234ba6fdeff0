"""Invariants for the training-data curation queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import _docs_t
from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
    MIX_BUDGET,
    N_SHARDS,
    docs_domain_mix,
    docs_pack_sequences,
    docs_shard_assignment,
    emb_semantic_dedup,
)


def test_shard_positions_dense_and_complete(spark, sf_dir):
    rows = docs_shard_assignment(spark, sf_dir).collect()
    n_docs = _docs_t(spark, sf_dir).count()
    assert len(rows) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_pack_sequences_tile_the_token_stream(spark, sf_dir):
    rows = sorted(docs_pack_sequences(spark, sf_dir).collect(), key=lambda r: r.start_tok)
    expect_start = 0
    for r in rows:
        # docs tile the stream contiguously in shuffle order
        assert r.start_tok == expect_start
        assert r.n_tokens >= 1
        assert r.start_seq <= r.end_seq
        assert r.n_seqs_spanned == r.end_seq - r.start_seq + 1
        expect_start = r.start_tok + r.n_tokens
    total = sum(r.n_tokens for r in rows)
    assert expect_start == total


def test_domain_mix_accounting(spark, sf_dir):
    rows = docs_domain_mix(spark, sf_dir).collect()
    assert sum(r.share_bp for r in rows) <= 10000  # floor division loses remainders
    for r in rows:
        assert r.epochs_for_budget * r.n_tokens >= MIX_BUDGET
        assert (r.epochs_for_budget - 1) * r.n_tokens < MIX_BUDGET
        assert r.low_resource == (r.share_bp < 500)


def test_manifest_covers_corpus_and_detects_change(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        docs_dataset_manifest,
    )

    rows = docs_dataset_manifest(spark, sf_dir).collect()
    n_docs = _docs_t(spark, sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_docs
    # checksums are well-formed and (near-certainly) distinct across shards
    sums = [r.manifest_md5 for r in rows]
    assert all(len(s) == 32 for s in sums)
    assert len(set(sums)) == len(sums)


def test_dedup_audit_matches_member_methods(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import (
        docs_exact_dedup,
    )
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        docs_dedup_audit,
    )

    audit = {r.doc_id: r for r in docs_dedup_audit(spark, sf_dir).collect()}
    assert len(audit) == _docs_t(spark, sf_dir).count()
    # exact-cluster membership agrees with the exact dedup operator
    ex = docs_exact_dedup(spark, sf_dir).collect()
    by_hash: dict[str, int] = {}
    for r in ex:
        by_hash[r.content_hash] = by_hash.get(r.content_hash, 0) + 1
    for r in ex:
        assert audit[r.doc_id].dup_exact == (by_hash[r.content_hash] > 1)
    for r in audit.values():
        # exact duplicates hash-match, hence jaccard 1.0 and hamming 0: the
        # fuzzier families must flag every exact-cluster member too
        if r.dup_exact:
            assert r.dup_minhash and r.dup_simhash
        assert r.n_methods == int(r.dup_exact) + int(r.dup_minhash) + int(r.dup_simhash)
        assert r.consensus == (r.n_methods >= 2)


def test_pq_codes_and_error(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        PQ_K,
        PQ_M,
        emb_pq_quantize,
    )
    from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_table

    rows = emb_pq_quantize(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    for r in rows:
        for m in range(PQ_M):
            assert 0 <= r[f"code_{m}"] < PQ_K
        assert r.recon_err >= 0.0
    # quantization must lose information for most non-seed vectors
    assert sum(1 for r in rows if r.recon_err > 0) > n // 2


def test_matryoshka_recall_bounds(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import (
        TOPK,
        TOPK_QUERIES,
    )
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        emb_matryoshka_recall,
    )

    rows = emb_matryoshka_recall(spark, sf_dir).collect()
    assert len(rows) == TOPK_QUERIES
    for r in rows:
        assert 0 <= r.n_overlap <= TOPK
        assert abs(r.recall_at_k - r.n_overlap / TOPK) < 1e-12


def test_vocab_topk_ordered_and_covering(spark, sf_dir):
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        docs_vocab_topk,
    )

    rows = docs_vocab_topk(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r.rank)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    cum = 0
    for r in rows:
        cum += r.n
        assert r.cum_n == cum
        assert r.share_bp <= 10000


def test_semantic_dedup_leaders(spark, sf_dir):
    rows = emb_semantic_dedup(spark, sf_dir).collect()
    for r in rows:
        assert r.keeper_vec_id <= r.vec_id
        assert r.is_semantic_duplicate == (r.keeper_vec_id != r.vec_id)
    # self-consistency with the brute-force rule inside one cell: duplicates
    # must be strictly fewer than the corpus (centroid seeds keep themselves)
    dup = [r for r in rows if r.is_semantic_duplicate]
    assert len(dup) < len(rows)


def test_pq_adc_ranks_monotone(spark, sf_dir):
    """ADC distances must be non-decreasing down each query's ranking, and
    every (query, rank) slot filled exactly once."""
    from lets_talk_cdc_change_feed_playground_spark.functions.pipeline_queries import (
        TOPK,
        TOPK_QUERIES,
    )
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        emb_pq_adc_topk,
    )

    rows = emb_pq_adc_topk(spark, sf_dir).collect()
    assert len(rows) == TOPK * TOPK_QUERIES
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, TOPK + 1))
        assert all(a.adc_dist <= b.adc_dist for a, b in zip(rs, rs[1:]))
        assert all(r.neighbor_id != q for r in rs)


def test_quality_classifier_totals(spark):
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        docs_quality_classifier,
    )

    rows = docs_quality_classifier(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["score_min"] <= r["score_max"]
    # the linear scores genuinely straddle the decision boundary somewhere
    assert any(r["score_min"] < 0 for r in rows)
    assert any(r["score_max"] >= 0 for r in rows)


def test_temperature_resample_invariants(spark, sf_dir):
    """α=1/2 temperature mix: every doc gets full_epochs or full_epochs+1
    copies; the sqrt curve upsamples small strata (copies-per-token rate
    non-increasing in stratum size); realized tokens track the budget."""
    from lets_talk_cdc_change_feed_playground_spark.functions.training_queries import (
        MIX_BUDGET,
        docs_temperature_resample,
    )

    rows = docs_temperature_resample(spark, sf_dir).collect()
    assert rows
    strata = {}
    for r in rows:
        assert r["n_copies"] in (r["full_epochs"], r["full_epochs"] + 1)
        strata[(r["lang"], r["source"])] = (r["s_tokens"], r["budget_tokens"])
    # sqrt temperature upsamples small strata: the smallest stratum's
    # budget-per-token rate beats the largest's (strict monotonicity can
    # wobble between near-equal sizes from the integer floor/div, so pin
    # the endpoints, which differ enough to dominate the rounding)
    # an s_tokens=0 stratum (all-empty docs) is handled by the query's
    # guard, not by this rate comparison — exclude it so the endpoint
    # ratio below never divides by zero
    by_size = sorted(v for v in strata.values() if v[0] > 0)
    if by_size and by_size[-1][0] >= 2 * by_size[0][0]:
        assert by_size[0][1] / by_size[0][0] > by_size[-1][1] / by_size[-1][0]
    realized = sum(r["n_copies"] * r["n_tokens"] for r in rows)
    budget = sum(b for _, b in strata.values())
    assert budget <= MIX_BUDGET
    # fractional hash draw realizes each stratum's remainder to doc granularity
    slack = sum(s for s, _ in strata.values())
    assert abs(realized - budget) <= slack
