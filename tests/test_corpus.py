"""Unit fixtures for the corpus-curation operators (operators/corpus.py):
exact expected outputs on tiny literal frames — decontamination overlap
rule, packing arithmetic, mixture quotas, repetition signals."""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators import corpus


def test_decontaminate_ngram_overlap(spark):
    evald = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # shares the trigram "alpha beta gamma" -> contaminated
            (1, "zzz alpha beta gamma yyy"),
            # shares tokens but no full trigram -> clean
            (2, "alpha beta zzz gamma delta qqq"),
            # too short for any trigram -> clean
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    bad = sorted(
        r["doc_id"]
        for r in corpus.contaminated_doc_ids(docs, evald, "doc_id", "text", n=3).collect()
    )
    assert bad == [1]
    kept = sorted(
        r["doc_id"] for r in corpus.decontaminate(docs, evald, "doc_id", "text", n=3).collect()
    )
    assert kept == [2, 3]


def test_pack_sequences_chunk_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 60)], "doc_id long, n_tokens int"
    )
    got = {
        r["doc_id"]: (r["start_offset"], r["pack_id"])
        for r in corpus.pack_sequences(df, "doc_id", "n_tokens", budget=100).collect()
    }
    # offsets 0,60,120,180 with budget 100 -> packs 0,0,1,1
    assert got == {1: (0, 0), 2: (60, 0), 3: (120, 1), 4: (180, 1)}


def test_pack_sequences_partitioned_resets(spark):
    df = spark.createDataFrame(
        [(1, "a", 80), (2, "a", 80), (1, "b", 80)],
        "doc_id long, src string, n_tokens int",
    )
    got = {
        (r["src"], r["doc_id"]): r["pack_id"]
        for r in corpus.pack_sequences(
            df, "doc_id", "n_tokens", budget=50, partition_by="src"
        ).collect()
    }
    # src a: offsets 0,80 -> packs 0,1; src b restarts at offset 0 -> pack 0
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0}


def test_stratified_mixture_exact_quotas(spark):
    rows = [(i, "s0") for i in range(10)] + [(100 + i, "s1") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = corpus.stratified_mixture_sample(
        df, "doc_id", "src", {"s0": 0.5, "s1": 0.5}
    )
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # scale = min(10/0.5, 2/0.5) = 4 -> quota 2 per stratum (exact 50/50)
    assert counts == {"s0": 2, "s1": 2}
    # deterministic: same input -> identical selection
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in corpus.stratified_mixture_sample(
            df, "doc_id", "src", {"s0": 0.5, "s1": 0.5}
        ).collect()
    )
    assert a == b


def test_repetition_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_bigram_frac"], r["top_token_frac"])
        for r in corpus.repetition_stats(df, "doc_id", "text").collect()
    }
    # doc 1: bigrams [ab, ba, ab, ba] -> 2 distinct of 4 -> 0.5 dup;
    #        'a' appears 3 of 5 tokens
    assert got[1] == (5, 0.5, 0.6)
    # doc 2: all bigrams distinct, all tokens unique
    assert got[2] == (4, 0.0, 0.25)


def test_connected_components_long_chain_converges(spark):
    """A 12-node chain (diameter 11) must collapse to one cluster — the
    old fixed-5-round cap would have split it."""
    from oeem_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "key_a long, key_b long"
    )
    labels = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert set(labels) == set(range(1, 13))
    assert set(labels.values()) == {1}


def test_decontaminate_hashed_equals_exact(spark, sf_dir):
    from oeem_etl_spark.catalog import load_table
    from oeem_etl_spark.operators.corpus import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("source") == "src0")
    rest = docs.where(F.col("source") != "src0")
    exact = sorted(r["doc_id"] for r in decontaminate(rest, ev, "doc_id", "text").collect())
    hashed = sorted(
        r["doc_id"]
        for r in decontaminate(rest, ev, "doc_id", "text", hash_grams=True).collect()
    )
    assert exact == hashed


def test_pack_no_straddle_ffd(spark):
    from oeem_etl_spark.operators.corpus import pack_sequences_no_straddle

    rows = [
        ("s", 1, 60), ("s", 2, 50), ("s", 3, 40), ("s", 4, 30),
        ("s", 5, 150),  # oversize
        ("t", 6, 10),
    ]
    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tokens int")
    out = pack_sequences_no_straddle(df, "doc_id", "n_tokens", budget=100, partition_by="shard")
    got = {r["doc_id"]: (r["pack_id"], r["oversize"]) for r in out.collect()}
    # FFD order within shard s: 150(oversize, own pack 0), 60->pack1,
    # 50->pack2, 40->pack1 (60+40=100 fits), 30->pack2 (50+30=80)
    assert got[5] == (0, True)
    assert got[1] == (1, False) and got[3] == (1, False)
    assert got[2] == (2, False) and got[4] == (2, False)
    assert got[6] == (0, False)
    # no pack over budget (excluding oversize singletons)
    sums = {}
    for doc, (pack, over) in got.items():
        if not over:
            shard = "s" if doc <= 5 else "t"
            sums[(shard, pack)] = sums.get((shard, pack), 0) + dict(
                (r[1], r[2]) for r in rows
            )[doc]
    assert all(v <= 100 for v in sums.values()), sums


def test_chunk_documents_boundaries(spark):
    from oeem_etl_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                      # shorter than one chunk
            (2, " ".join(f"t{i}" for i in range(10))),  # exactly 2 chunks + tail
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, "doc_id", "text", chunk_tokens=6, stride=3).collect()
    }
    assert out[(1, 0)] == ("a b c", 3)
    assert (1, 1) not in out
    # doc 2 (10 tokens, chunk 6, stride 3): ceil((10-6)/3)+1 = 3 chunks
    assert out[(2, 0)] == ("t0 t1 t2 t3 t4 t5", 6)
    assert out[(2, 1)] == ("t3 t4 t5 t6 t7 t8", 6)
    assert out[(2, 2)] == ("t6 t7 t8 t9", 4)
    assert len([k for k in out if k[0] == 2]) == 3


def test_contamination_score_fractions(spark):
    evald = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # 3 trigrams, one of which ("alpha beta gamma") is banned
            (1, "zzz alpha beta gamma yyy"),
            # 4 trigrams, zero hits
            (2, "alpha beta zzz gamma delta qqq"),
            # too short for trigrams -> (0, 0, 0.0)
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["hit_frac"])
        for r in corpus.contamination_score(docs, evald, "doc_id", "text", n=3).collect()
    }
    assert rows[1] == (3, 1, round(1 / 3, 6))
    assert rows[2] == (4, 0, 0.0)
    assert rows[3] == (0, 0, 0.0)


def test_quality_quantile_gate_threshold(spark):
    # lang a token counts: 1,2,3,4 -> P25 = 1.75 -> keep counts >= 2
    # lang b token counts: 5,5 -> P25 = 5 -> keep both
    docs = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "a", "x y"),
            (3, "a", "x y z"),
            (4, "a", "x y z w"),
            (5, "b", "p q r s t"),
            (6, "b", "p q r s t"),
        ],
        "doc_id long, lang string, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in corpus.quality_quantile_gate(docs, "doc_id", "text", "lang", q=0.25).collect()
    )
    assert kept == [2, 3, 4, 5, 6]


def test_token_budget_select_prefix_rule(spark):
    docs = spark.createDataFrame(
        [(i, "s", 10) for i in range(1, 11)],
        "doc_id long, source string, n_tokens int",
    )
    out = corpus.token_budget_select(
        docs, "doc_id", "n_tokens", budget=35, partition_by="source"
    ).collect()
    # inclusive running total <= 35 with 10-token docs -> exactly 3 survive
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 30
    # survivors are the md5-order prefix, not doc_id order
    from pyspark.sql import functions as FF

    expected = [
        r["doc_id"]
        for r in docs.select(
            "doc_id", FF.md5(FF.col("doc_id").cast("string")).alias("h")
        )
        .orderBy("h", "doc_id")
        .limit(3)
        .collect()
    ]
    assert sorted(r["doc_id"] for r in out) == sorted(expected)


def test_importance_weights_pulls_target_like_docs(spark):
    # target docs speak "aa bb"; candidate 10 repeats target tokens,
    # candidate 11 shares none — 10 must outscore 11, and every token
    # count is small enough to hand-check the smoothed ratio sign.
    docs = spark.createDataFrame(
        [
            (1, "aa bb aa", True),
            (2, "aa bb", True),
            (10, "aa bb bb", False),
            (11, "zz yy zz", False),
        ],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r["doc_id"]: r["importance"]
        for r in corpus.importance_weights(docs, "doc_id", "text", F.col("tgt")).collect()
    }
    assert got[10] > 0 > got[11]
    assert got[1] > 0  # target docs score like the target by construction
    # n_tokens sanity
    n = {
        r["doc_id"]: r["n_tokens"]
        for r in corpus.importance_weights(docs, "doc_id", "text", F.col("tgt")).collect()
    }
    assert n == {1: 3, 2: 2, 10: 3, 11: 3}


def test_k_anonymity_audit_counts(spark):
    from oeem_etl_spark.operators.quality import k_anonymity_audit

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "grp string, quasi int")
    got = {
        r["grp"]: (
            r["n_classes"],
            r["n_unsafe_classes"],
            r["n_suppressed"],
            r["n_rows"],
            r["suppression_rate"],
        )
        for r in k_anonymity_audit(
            df, ["quasi"], k=3, report_by=["grp"]
        ).collect()
    }
    # grp a: classes {1:5, 2:2} -> one unsafe (2 rows); grp b: {1:1} unsafe
    assert got["a"] == (2, 1, 2, 7, round(2 / 7, 6))
    assert got["b"] == (1, 1, 1, 1, 1.0)
