"""Invariants of the batch-construction operators (queries/packing.py).

The DuckDB oracle already pins value equality; these pin the
SEMANTIC invariants a packed-dataset writer relies on, so a future
"optimization" that keeps both engines in agreement but breaks the
packing contract (e.g. dropping the -1 in the span arithmetic on
both sides) still fails loudly.
"""

from __future__ import annotations

from flink_realtime_edu_spark.queries import load_registry

REGISTRY = load_registry()
CTX = 2048
BUDGET = 20_000


def test_sequence_packing_invariants(spark, sf_dir):
    rows = REGISTRY["sequence_packing_chunks"].build(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            assert r.n_toks >= 1
            assert 0 <= r.start_offset < CTX
            # doc k starts exactly where the running token stream is
            assert r.start_chunk == cum // CTX
            assert r.start_offset == cum % CTX
            # span covers precisely the doc's token interval
            assert r.n_chunks_spanned == (cum + r.n_toks - 1) // CTX - cum // CTX + 1
            cum += r.n_toks


def test_doc_chunking_multi_chunk_against_python_reference(spark, tmp_path):
    """The testdata docs all fit one 256-token chunk, so the oracle
    never exercises the stride arithmetic; this pins multi-chunk
    behavior on synthetic long docs against a plain-python slicer."""
    import hashlib

    CHUNK, STRIDE = 256, 192
    texts = {
        1: " ".join(f"w{i}" for i in range(1000)),  # 5 chunks, short tail
    # boundary cases: exactly CHUNK, CHUNK+1, one stride step
        2: " ".join(f"w{i}" for i in range(CHUNK)),
        3: " ".join(f"w{i}" for i in range(CHUNK + 1)),
        4: " ".join(f"w{i}" for i in range(STRIDE + CHUNK)),
        5: "solo",
    }
    docs = spark.createDataFrame(
        [(k, v, "src0", "en") for k, v in texts.items()],
        "doc_id long, text string, source string, lang string",
    )
    d = str(tmp_path / "docs_sf")
    docs.write.parquet(f"{d}/documents.parquet")

    got = {
        (r.doc_id, r.chunk_id): (r.n_chunk_toks, r.chunk_md5)
        for r in REGISTRY["doc_chunking_windows"].build(spark, d).collect()
    }
    want = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 if n <= CHUNK else 1 + -(-(n - CHUNK) // STRIDE)
        for c in range(n_chunks):
            piece = toks[c * STRIDE : c * STRIDE + CHUNK]
            want[(doc_id, c)] = (
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    assert got == want


def test_sharded_cum_before_equals_naive_prefix_sum(spark):
    """The two-level sharded running sum must equal the naive
    single-window prefix sum EXACTLY — including on a pathologically
    skewed layout (one source holding almost everything, empty
    shards, single-doc sources). This is the equivalence the packing
    oracles rely on."""
    import random

    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.queries.packing import _sharded_cum_before

    rng = random.Random(42)
    rows = []
    # source A: 500 docs with gaps in doc_id space (empty shards)
    for i in range(500):
        rows.append((i * 7, "A", rng.randint(1, 300)))
    # source B: a single doc; source C: two docs in one shard
    rows.append((3, "B", 17))
    rows.extend([(1000, "C", 5), (1001, "C", 9)])
    df = spark.createDataFrame(rows, "doc_id long, source string, n_toks long")

    got = {
        (r.source, r.doc_id): r.cum_before
        for r in _sharded_cum_before(
            df, (F.col("doc_id") / 64).cast("bigint"), ["doc_id"]
        ).collect()
    }
    want = {}
    for source in {"A", "B", "C"}:
        cum = 0
        for doc_id, _, n in sorted(r for r in rows if r[1] == source):
            want[(source, doc_id)] = cum
            cum += n
    assert got == want


def test_token_budget_sample_invariants(spark, sf_dir):
    rows = REGISTRY["token_budget_sample"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_docs_kept <= r.n_docs_total
        assert r.tokens_kept <= BUDGET
        # a source with any doc under budget keeps at least one
        if r.n_docs_kept == 0:
            assert r.tokens_kept == 0


def test_bpe_encoder_roundtrip_and_compression(spark, sf_dir):
    """The learned-BPE encoder's vocabulary must be lossless (token
    concatenation reconstructs every word exactly) and actually
    compress (the learned merges produce multi-char tokens for the
    corpus's frequent pairs)."""
    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.queries.bpe import (
        _N_MERGES_APPLY,
        _learned_vocab,
    )

    vocab = _learned_vocab(spark, sf_dir, _N_MERGES_APPLY).persist()
    try:
        assert vocab.filter(F.concat_ws("", "toks") != F.col("w")).count() == 0
        assert vocab.filter(F.col("n_bpe") < F.length("w")).count() > 0
        # every token non-empty, counts consistent
        assert (
            vocab.filter(
                F.exists("toks", lambda t: F.length(t) == 0)
                | (F.size("toks") != F.col("n_bpe"))
            ).count()
            == 0
        )
    finally:
        vocab.unpersist()


def test_bpe_udf_encoder_matches_expression_chain(spark, sf_dir):
    """The pandas-UDF encoder (the 50k-merge production path) must
    produce byte-identical symbol strings to the chained-replace
    expression encoder on the learned merge table."""
    from pyspark.sql import functions as F

    from flink_realtime_edu_spark.queries.bpe import (
        _learn_merges,
        _word_symbols,
        bpe_apply_merges,
        bpe_encode_udf_vocab,
    )
    from flink_realtime_edu_spark.sources import load

    d = load(spark, sf_dir, "documents")
    sym = _word_symbols(d).persist()
    try:
        merges, _ = _learn_merges(sym, 8)
        table = [(l, r) for _, l, r, _ in merges]
        expr = sym.withColumn("symstr", bpe_apply_merges(F.col("symstr"), table))
        udf = bpe_encode_udf_vocab(sym, table)
        assert (
            expr.select("w", "symstr")
            .exceptAll(udf.select("w", "symstr"))
            .count()
            == 0
        )
        assert expr.count() == udf.count()
    finally:
        sym.unpersist()
