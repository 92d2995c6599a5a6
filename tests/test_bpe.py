"""Unit tests for operators/bpe.py (BPE tokenizer training).

The load-bearing equivalence: bpe.merge_expr's fold must implement greedy
left-to-right non-overlapping pair merging — the same semantics as the
run-parity positional SQL in plans/corpus_queries._bpe_cte and as the
reference algorithm (Sennrich et al. 2016). A pure-Python reference here
pins both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators import bpe


# --- pure-Python reference -------------------------------------------------


def _ref_merge(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(word_freq: dict[str, int], n_merges: int):
    words = {w: [*w, bpe.END_MARK] for w in word_freq}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        if not counts:
            break
        (lft, rgt), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, lft, rgt, cnt))
        words = {w: _ref_merge(s, lft, rgt) for w, s in words.items()}
    return merges, words


# --- merge_expr vs reference ------------------------------------------------

MERGE_CASES = [
    # (symbols, left, right) — includes the overlap traps
    (["a", "b", "c"], "a", "b"),
    (["a", "a", "a"], "a", "a"),  # greedy: [aa, a]
    (["a", "a", "a", "a"], "a", "a"),  # [aa, aa]
    (["a", "a", "a", "a", "a"], "a", "a"),  # [aa, aa, a]
    (["x", "a", "b", "a", "b"], "a", "b"),  # both pairs merge
    (["a", "b", "b"], "b", "b"),  # second pair only
    (["ab", "c", "ab", "c"], "ab", "c"),  # multi-char symbols
    (["a"], "a", "a"),  # too short
    (["b", "a"], "a", "b"),  # no match
    (["a", "b", "a"], "b", "a"),  # match not at start
]


def test_merge_expr_matches_reference(spark):
    rows = [(i, syms) for i, (syms, _, _) in enumerate(MERGE_CASES)]
    df = spark.createDataFrame(rows, "id long, syms array<string>")
    for i, (syms, lft, rgt) in enumerate(MERGE_CASES):
        got = (
            df.where(F.col("id") == i)
            .select(bpe.merge_expr("syms", lft, rgt).alias("m"))
            .collect()[0]["m"]
        )
        assert got == _ref_merge(syms, lft, rgt), (syms, lft, rgt, got)


def test_merge_expr_long_run_parity(spark):
    # 30-symbol all-'a' run: greedy pairs from the left, odd tail survives.
    df = spark.createDataFrame([(["a"] * 30,)], "syms array<string>")
    got = df.select(bpe.merge_expr("syms", "a", "a").alias("m")).collect()[0]["m"]
    assert got == ["aa"] * 15
    df = spark.createDataFrame([(["a"] * 31,)], "syms array<string>")
    got = df.select(bpe.merge_expr("syms", "a", "a").alias("m")).collect()[0]["m"]
    assert got == ["aa"] * 15 + ["a"]


# --- end-to-end training vs reference ----------------------------------------


def test_bpe_train_matches_reference(spark):
    corpus = [
        "low low low low low",
        "lower lower newer newer newer newer",
        "newest newest newest widest widest",
        "new new new lowest",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    wf: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    ref_merges, ref_words = _ref_train(wf, 6)
    merges, words = bpe.bpe_train(docs, n_merges=6)
    assert merges == ref_merges
    got = {r["word"]: r["syms"] for r in words.collect()}
    assert got == ref_words


def test_bpe_top_words_bound_is_total_ordered(spark):
    # freq ties broken word-asc: 'aa' and 'bb' both freq 2 -> 'aa' kept.
    docs = spark.createDataFrame(
        [(0, "aa bb aa bb cc cc cc")], "doc_id long, text string"
    )
    kept = {r["word"] for r in bpe.word_freq(docs, top_words=2).collect()}
    assert kept == {"cc", "aa"}


def test_token_counts_oov_fallback(spark):
    docs = spark.createDataFrame([(0, "low low zzz")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "low low")], "doc_id long, text string")
    _, words = bpe.bpe_train(train, n_merges=2)
    # after 2 merges 'low' is <=2 symbols; 'zzz' is OOV -> len+1 = 4 tokens
    n_low = {r["word"]: len(r["syms"]) for r in words.collect()}["low"]
    out = bpe.token_counts(docs, words).collect()
    assert out[0]["bpe_tokens"] == 2 * n_low + 4


def test_merge_expr_randomized_parity(spark):
    # 300 seeded-random cases over a 3-symbol alphabet (maximizes runs and
    # overlap traps), all evaluated in ONE Spark job: per row its own
    # (left, right) pair is folded via a case-dispatched expression.
    import random

    rng = random.Random(20260815)
    alpha = ["a", "b", "ab"]
    cases = []
    for i in range(300):
        syms = [rng.choice(alpha) for _ in range(rng.randint(0, 12))]
        lft, rgt = rng.choice(alpha), rng.choice(alpha)
        cases.append((i, syms, lft, rgt))
    df = spark.createDataFrame(
        [(i, s, l, r) for i, s, l, r in cases],
        "id long, syms array<string>, lft string, rgt string",
    )
    # one merge_expr per distinct pair, dispatched by the row's pair
    expr = None
    for lft in alpha:
        for rgt in alpha:
            cond = (F.col("lft") == lft) & (F.col("rgt") == rgt)
            b = bpe.merge_expr("syms", lft, rgt)
            expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    got = {r["id"]: r["m"] for r in df.select("id", expr.alias("m")).collect()}
    for i, syms, lft, rgt in cases:
        assert got[i] == _ref_merge(syms, lft, rgt), (i, syms, lft, rgt, got[i])


def test_bpe_encode_applies_rules_to_unseen_words(spark):
    # train on a tiny corpus: round 1 merges ('o','</w>') (count 9 beats
    # l-o's 6), round 2 ('l','o</w>'). Then encode text containing a word
    # NEVER seen in training ('solo'): the trained rules must still fire
    # inside it — rule application, not vocabulary lookup — and word
    # order must be preserved in bpe_text.
    train = spark.createDataFrame(
        [(1, "lo lo lo lo go go"), (2, "lo lo go")],
        "doc_id long, text string",
    )
    merges, _ = bpe.bpe_train(train, n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("o", "</w>"), ("l", "o</w>")]

    target = spark.createDataFrame(
        [(10, "solo lo"), (11, ""), (12, "go")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bpe_text"], r["n_tokens"])
        for r in bpe.bpe_encode(target, merges).collect()
    }
    # 'solo' -> s o lo</w> (both rules fire at the tail); 'lo' -> lo</w>
    assert got[10] == ("s o lo</w> lo</w>", 4)
    assert got[11] == ("", 0)  # wordless docs keep a row (left join)
    assert got[12] == ("g o</w>", 2)  # rule 2 is l+o</w>, not g


def test_apply_merges_rejects_ambiguous_arity():
    """A (left, right, count) 3-tuple is NOT a documented merge-row shape
    — the old heuristic read it as (step, left, right) and applied wrong
    rules silently. Only 4-tuples, pairs, and left/right Rows/dicts are
    accepted."""
    import pytest

    from oeem_etl_spark.operators.bpe import apply_merges

    with pytest.raises(ValueError, match="arity"):
        apply_merges("syms", [("a", "b", 7)])


def test_apply_merges_accepts_documented_shapes(spark):
    """4-tuple (step,left,right,count), bare pair, and Row/dict with
    left/right fields all produce the same merge chain."""
    from pyspark.sql import Row

    from oeem_etl_spark.operators.bpe import apply_merges

    df = spark.createDataFrame([(["a", "b", "c"],)], "syms array<string>")
    expected = [["ab", "c"]]
    for merges in (
        [(1, "a", "b", 9)],
        [("a", "b")],
        [Row(step=1, left="a", right="b", count=9)],
        [{"left": "a", "right": "b"}],
    ):
        got = [r[0] for r in df.select(apply_merges("syms", merges)).collect()]
        assert got == expected, (merges, got)


def test_driver_rounds_match_distributed(spark):
    """r9 optimization: with a bounded vocabulary bpe_train runs the merge
    rounds driver-side (_train_rounds_py). Merges AND the final
    word->symbols table must be value-identical to the distributed
    per-round loop, including top_words truncation, max_word_len and a
    corpus that fully merges some words (the size<2 stop edge)."""
    corpus = [
        "lower lower lower newest newest wide wider",
        "newest newest newest widest widest a a a a",
        "new new new lowest supercalifragilistic",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    for kwargs in (
        {"top_words": 6},
        {"top_words": 200, "max_word_len": 10},
        {"top_words": 1},
    ):
        m_drv, w_drv = bpe.bpe_train(docs, n_merges=8, **kwargs)
        m_dist, w_dist = bpe.bpe_train(
            docs, n_merges=8, driver_rounds=False, **kwargs
        )
        assert m_drv == m_dist, kwargs
        got = {(r["word"], r["freq"]): r["syms"] for r in w_drv.collect()}
        ref = {(r["word"], r["freq"]): r["syms"] for r in w_dist.collect()}
        assert got == ref, kwargs
