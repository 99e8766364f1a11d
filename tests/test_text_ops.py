"""Property tests for the chunking / relevance / scrub text operators —
invariants that hold for ANY input, complementing the value-hash oracle
(which only proves the one corpus).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_project_spark.plans.registry import all_specs
from tests.conftest import SF_ORACLE

SPECS = all_specs()


@pytest.fixture(scope="module")
def chunks(spark):
    df = SPECS["q_chunk_documents_overlap"].builder(spark, SF_ORACLE).cache()
    yield df
    df.unpersist()


def test_chunks_cover_every_token(spark, chunks):
    """Stride 24 < size 32 ⇒ chunk starts tile the token range with
    overlap: last chunk start + 32 ≥ n_tokens, and no gap between
    consecutive starts (24 < 32)."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.text import token_count

    docs = read_table(spark, SF_ORACLE, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    last = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    j = last.join(docs, "doc_id")
    uncovered = j.filter(F.col("last_idx") * 24 + 32 < F.col("n_tok")).count()
    assert uncovered == 0


def test_chunk_sizes_bounded_and_positive(chunks):
    bad = chunks.filter(
        (F.col("n_chunk_tokens") <= 0) | (F.col("n_chunk_tokens") > 32)
    ).count()
    assert bad == 0
    # a non-last chunk start s satisfies s*24 <= n-25, so it holds at
    # least stride+1 = 25 tokens (only the final chunk may be shorter)
    w_last = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    short_nonlast = (
        chunks.join(w_last, "doc_id")
        .filter((F.col("chunk_idx") < F.col("last_idx")) & (F.col("n_chunk_tokens") < 25))
        .count()
    )
    assert short_nonlast == 0


def test_bm25_zero_tf_docs_score_zero(spark):
    """A document containing none of the query terms must score 0."""
    df = SPECS["q_bm25_query_scores"].builder(spark, SF_ORACLE)
    from etl_project_spark.catalog import read_table

    docs = read_table(spark, SF_ORACLE, "documents")
    no_terms = docs.filter(
        ~F.lower(F.col("text")).rlike(r"\b(spark|fast|query)\b")
    ).select("doc_id")
    nonzero = df.join(no_terms, "doc_id").filter(F.col("bm25") != 0.0).count()
    assert nonzero == 0


def test_merge_partitions_base_and_changes(spark):
    """Merge actions partition the output: inserted+kept+updated row
    counts reconcile exactly with the base and changes cardinalities."""
    from etl_project_spark.catalog import read_table

    out = SPECS["q_merge_upsert_orders"].builder(spark, SF_ORACLE)
    counts = {r["merge_action"]: r["n"] for r in
              out.groupBy("merge_action").agg(F.count(F.lit(1)).alias("n")).collect()}
    o = read_table(spark, SF_ORACLE, "orders")
    n_base = o.count()
    n_upd = o.filter(F.col("o_orderkey") % 3 == 0).count()
    n_ins = o.filter(F.col("o_orderkey") % 1000 == 0).count()
    assert counts.get("updated", 0) == n_upd
    assert counts.get("inserted", 0) == n_ins
    assert counts.get("kept", 0) == n_base - n_upd


def test_pmi_survives_single_token_docs(spark, tmp_path):
    """ANSI-mode regression (ADVICE r7): a document whose normalized
    text has exactly one token made the bigram builder index t[1] out
    of bounds — sequence(0, size-2) = [0, -1] for size 1 — a hard
    INVALID_ARRAY_INDEX crash under Spark 4's default ANSI mode. The
    guard must drop such docs from the bigram branch ONLY (the oracle's
    generate_series(1, len-1) is empty for them), while multi-token
    docs keep producing PMI rows."""
    base = "alpha beta " * 6  # 'alpha beta' pair count 6 > _PMI_MIN_PAIR
    rows = [
        (1, "hello", "en", "web", 5),          # single token — the crasher
        (2, "  . ,  ", "en", "web", 7),        # tokenizes to one empty token
        (3, base, "en", "web", len(base)),
        (4, base, "en", "web", len(base)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from etl_project_spark.plans.text import q_pmi_collocations

    out = q_pmi_collocations(spark, str(tmp_path)).collect()  # must not raise
    pairs = {(r.w1, r.w2) for r in out}
    assert ("alpha", "beta") in pairs


def test_pack_sequences_oversized_doc_gets_own_bin(spark, tmp_path):
    """Next-fit edge cases the corpus never hits: a document longer
    than the 1024-token window must occupy a bin of its own (never
    merged into a prior bin; the next doc always opens fresh), and
    offsets are the running fill in doc_id order."""
    from etl_project_spark.plans.text import q_pack_sequences_nextfit

    rows = [
        (1, "w " * 600, "en", "s1", 1200),     # 600 tokens
        (2, "w " * 1500, "en", "s1", 3000),    # 1500 tokens: oversized
        (3, "w " * 10, "en", "s1", 20),
        (4, "w " * 10, "en", "s1", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.seq_idx, r.seq_offset)
        for r in q_pack_sequences_nextfit(spark, str(tmp_path)).collect()
    }
    # strings end with a trailing space; token_count trims, so "w "*n = n tokens
    assert got[1] == (600, 0, 0)
    assert got[2] == (1500, 1, 0)   # doesn't fit behind 600 -> new bin, alone
    assert got[3] == (10, 2, 0)     # oversized bin is full -> next opens fresh
    assert got[4] == (10, 2, 10)    # co-packs at running offset


def test_bpe_encode_words_cascade(spark):
    """The fixed-table BPE apply must cascade: merged pieces become
    operands of later merges ('st'+'and'+'ing' from 8 characters), and
    the greedy order must follow merge RANK, not position."""
    from tests.conftest import SF_ORACLE
    from etl_project_spark.plans.registry import all_specs

    rows = {
        r.word: r
        for r in all_specs()["q_bpe_encode_words"].builder(spark, SF_ORACLE).collect()
    }
    # independent recompute for every returned word
    from etl_project_spark.plans.text import _BPE_APPLY_MERGES

    rank = {p: i + 1 for i, p in enumerate(_BPE_APPLY_MERGES)}

    def ref(word):
        toks = list(word)
        while True:
            cand = [
                (rank[(toks[i], toks[i + 1])], i)
                for i in range(len(toks) - 1)
                if (toks[i], toks[i + 1]) in rank
            ]
            if not cand:
                return toks
            r = min(cand)[0]
            a, b = _BPE_APPLY_MERGES[r - 1]
            out = [toks[0]]
            for t in toks[1:]:
                if out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out

    assert rows
    for w, r in rows.items():
        want = ref(w)
        assert r.pieces.split("|") == want and r.n_pieces == len(want), w
    # canonical cascade example, direct kernel semantics
    assert ref("standing") == ["st", "and", "ing"]
    assert ref("the") == ["the"]


def test_hashed_linear_score_margin_bounds_and_feat_count(spark):
    """n_feats must be exactly 2*tokens - 1 (unigrams + bigrams), the
    margin must sit in [-1, 1), and keep must equal margin >= 0 —
    including at the integer-compare boundary."""
    from pyspark.sql import functions as F
    from etl_project_spark.catalog import read_table

    out = {r.doc_id: r for r in SPECS["q_hashed_linear_quality_score"]
           .builder(spark, SF_ORACLE).collect()}
    docs = read_table(spark, SF_ORACLE, "documents")
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
            ).alias("n"),
        ).collect()
    }
    assert set(out) == set(n_toks)
    for doc_id, r in out.items():
        assert r.n_feats == 2 * n_toks[doc_id] - 1, doc_id
        assert -1.0 <= r.margin < 1.0
        assert r.keep == (r.margin >= 0.0)
