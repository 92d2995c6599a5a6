"""Hostile-text queries (VERDICT r6 task #8): the corpus fixtures are
well-formed space-separated ASCII, but a real 100 TB crawl corpus leads
with empty strings, NUL-adjacent bytes, 4-byte UTF-8, combining marks,
fullwidth forms, and adversarial 100k-char single-token documents. Each
query here drives one of the paths that corpus stresses first — the
xxhash64 byte hash, the shingle→MinHash→LSH dedup pipeline, BPE
training's word extraction, exact-substring dedup's window/rebuild
machinery, and the tokenize/stats layer — over an inline hostile corpus
(A5-style in-memory source) with a full DuckDB value oracle.

Hostile strings never appear raw in a result: outputs are hashes,
lengths, and counts, so the driver's pandas canonicalization never has
to round-trip a NUL byte.

Engine notes proven by these oracles (and pinned in
tests/test_hostile_text.py):
- Spark and DuckDB agree on length/octet_length/split/regexp over NULs,
  4-byte UTF-8, combining marks, and 100k-char tokens (x5).
- plans/xxh64_sql.py reproduces F.xxhash64 on hostile bytes including
  the empty string and embedded NULs (x1).
- The minhash pipeline's [''] singleton-shingle convention extends to
  NULL/empty/whitespace-only docs unchanged (x2).
- BPE word extraction needs — and now has — a max_word_len guard
  (operators/bpe.py word_freq): an unguarded 100k-char word would ride
  every merge round as a vocabulary row whose WORD STRING is the
  per-round shuffle and window key (x3 trains with the guard on; the
  100k doc is in-corpus and harmless).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators import bpe, dedup
from oeem_etl_spark.plans import xxh64_sql
from oeem_etl_spark.plans.llm_queries import minhash_oracle_sql
from oeem_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# The hostile corpus. One list, shared verbatim by the Spark side
# (createDataFrame) and the oracle side (rendered to a VALUES table by
# _sql_text_lit — control bytes become chr(n) concatenations so the SQL
# text itself stays clean UTF-8 with no embedded NULs).
# ---------------------------------------------------------------------------

_GLOBE = "\U0001f30d"  # 4-byte UTF-8 code point

HOSTILE_DOCS: list[tuple[int, str | None]] = [
    (1, ""),  # empty string
    (2, " "),  # single space -> ['', ''] token split
    (3, "   "),  # whitespace-only
    (4, "\x00"),  # bare NUL byte
    (5, "a\x00b nul\x00mid token"),  # NUL-adjacent bytes inside tokens
    (6, f"{_GLOBE * 3} {_GLOBE} emoji {_GLOBE} text"),  # 4-byte UTF-8
    (7, "é combining é mark"),  # combining diacritics
    (8, "ｆｕｌｌwidth ＡＳＣＩＩ ascii"),
    (9, "x" * 100_000),  # 100k-char single-token document
    (10, ("tok " * 30).strip()),  # long repetition (shared with 14)
    (11, "the quick brown fox jumps over the lazy dog again and again"),
    (12, "the quick brown fox jumps over the lazy dog again and again"),
    (13, "the quick brown fox jumps over the lazy dog again und again"),
    (14, ("tok " * 20).strip() + " tail"),  # cross-doc duplicated windows
    (15, None),  # NULL text
]

# x1/x2 cap: the xxh64 SQL unroll is sized max_len=96 bytes; doc 9 is
# filtered out BY BYTE LENGTH on both sides (the loud error() guard in
# xxh64_bytes_cte would otherwise fire — never a wrong hash).
_XXH_MAX_BYTES = 96


def _sql_text_lit(s: str | None) -> str:
    """Render a Python string as a DuckDB VARCHAR expression. Control
    bytes and quotes go through chr(n) so the emitted SQL is printable
    UTF-8 (a raw NUL inside a SQL literal is rejected by the parser)."""
    if s is None:
        return "CAST(NULL AS VARCHAR)"
    parts: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ord(ch) < 32 or ch == "'":
            if buf:
                parts.append("'" + "".join(buf) + "'")
                buf = []
            parts.append(f"chr({ord(ch)})")
        else:
            buf.append(ch)
    if buf:
        parts.append("'" + "".join(buf) + "'")
    return " || ".join(parts) if parts else "''"


def _docs_values() -> str:
    return ", ".join(f"({i}, {_sql_text_lit(s)})" for i, s in HOSTILE_DOCS)


_DOCS_CTE = f"hdocs(doc_id, text) AS (VALUES {_docs_values()}),\n    "


def _hostile_df(spark):
    return spark.createDataFrame(HOSTILE_DOCS, "doc_id int, text string")


# ---------------------------------------------------------------------------
# x1: xxhash64 over hostile bytes
# ---------------------------------------------------------------------------


@query(
    "x1_hostile_xxh64",
    sql=f"""
    WITH {_DOCS_CTE}nn AS (
      SELECT * FROM hdocs
      WHERE text IS NOT NULL AND octet_length(encode(text)) <= {_XXH_MAX_BYTES}
    ),
    {xxh64_sql.xxh64_bytes_cte('nn', 'text', prefix='hx', max_len=_XXH_MAX_BYTES)}
    SELECT doc_id, hx_xxh AS xxh FROM hxf
    UNION ALL
    -- Spark's xxhash64 skips NULL children: the hash of a single NULL
    -- argument is the untouched seed, 42.
    SELECT doc_id, 42 AS xxh FROM hdocs WHERE text IS NULL
    ORDER BY doc_id
    """,
    tier="T1",
    survey="H6,A5,B6",
)
def x1_hostile_xxh64(spark, sf_dir):
    """F.xxhash64 parity on hostile bytes: empty string, bare and embedded
    NULs, 4-byte UTF-8, combining marks, fullwidth forms, and a NULL row
    (hash = seed 42). The oracle recomputes Spark's XXH64 bit-for-bit
    from the UTF-8 bytes (plans/xxh64_sql.py); the 100k-char doc is
    byte-length-filtered on both sides — the SQL unroll's max_len guard
    errors loudly rather than hash wrong."""
    return (
        _hostile_df(spark)
        .where(
            F.col("text").isNull()
            | (F.octet_length("text") <= _XXH_MAX_BYTES)
        )
        .select("doc_id", F.xxhash64("text").alias("xxh"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x2: the full MinHash/LSH dedup pipeline on hostile text
# ---------------------------------------------------------------------------


@query(
    "x2_hostile_minhash_dedup",
    sql=minhash_oracle_sql(
        docs_src="hd",
        num_perm=16,
        bands=4,
        shingle_k=3,
        threshold=0.5,
        pre_ctes=_DOCS_CTE
        + f"""hd AS (
      SELECT * FROM hdocs
      WHERE text IS NULL OR octet_length(encode(text)) <= {_XXH_MAX_BYTES}
    ),
    """,
        shingle_max_len=96,
    )
    + """
    SELECT d.doc_id FROM hd d ANTI JOIN doomed USING (doc_id)
    ORDER BY doc_id
    """,
    tier="T2",
    survey="L2,A5,B6",
)
def x2_hostile_minhash_dedup(spark, sf_dir):
    """dedup.minhash_lsh_dedup end-to-end on the hostile corpus (16 perms,
    4 bands, k=3 shingles, threshold 0.5): NUL-bearing shingles hash
    through xxhash64 like any other bytes; empty/whitespace/NULL docs
    collapse to the [''] or ['','']-style singleton shingle sets and
    dedup among themselves; the identical docs 11/12 and the near-dup 13
    cluster (Jaccard 7/13 >= 0.5) leaving the smallest doc_id. The 100k
    doc is byte-filtered as in x1. Oracle: the parametrized l2 unroll —
    shingle xxh64 -> permutation mins -> band buckets -> candidates ->
    exact Jaccard -> recursive-CTE components."""
    docs = _hostile_df(spark).where(
        F.col("text").isNull() | (F.octet_length("text") <= _XXH_MAX_BYTES)
    )
    out = dedup.minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        threshold=0.5,
        num_perm=16,
        bands=4,
        shingle_k=3,
        persist_intermediate=False,
    )
    return out.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# x3: BPE training with the adversarial-word guard
# ---------------------------------------------------------------------------

_X3_MERGES = 4
_X3_TOP_WORDS = 40
_X3_MAX_WORD = 64

from oeem_etl_spark.plans.corpus_queries import _bpe_cte  # noqa: E402

_X3_MERGE_UNION = " UNION ALL ".join(
    f"SELECT CAST({i} AS INTEGER) AS step, l AS left_sym, r AS right_sym,"
    f" l || r AS merged, cnt AS pair_count FROM b{i}"
    for i in range(1, _X3_MERGES + 1)
)


@query(
    "x3_hostile_bpe_train",
    sql=f"""
    {_bpe_cte(n_merges=_X3_MERGES, top_words=_X3_TOP_WORDS, src='hdocs',
              max_word_len=_X3_MAX_WORD, pre_ctes=_DOCS_CTE)}
    SELECT step, left_sym, right_sym, merged, pair_count
    FROM ({_X3_MERGE_UNION}) ORDER BY step
    """,
    tier="T2",
    survey="L13,L5,A5,H2",
)
def x3_hostile_bpe_train(spark, sf_dir):
    """BPE training over the hostile corpus with the max_word_len guard
    (operators/bpe.py word_freq — the production cap a crawl corpus
    needs; cf. WordPiece's max_input_chars_per_word): the 100k-char
    'x'*100000 word is extracted by [a-z]+ on both engines and then
    dropped by the 64-char cap instead of riding every merge round as a
    100k-symbol vocabulary row keyed by a 100 kB string. NUL/emoji/
    fullwidth text exercises regexp_extract_all parity; training runs 4
    unrolled merge rounds, oracle-checked including pair counts."""
    docs = _hostile_df(spark)
    merges, _ = bpe.bpe_train(
        docs,
        n_merges=_X3_MERGES,
        top_words=_X3_TOP_WORDS,
        max_word_len=_X3_MAX_WORD,
    )
    return spark.createDataFrame(
        [(s, lft, rgt, lft + rgt, cnt) for s, lft, rgt, cnt in merges],
        "step int, left_sym string, right_sym string, merged string,"
        " pair_count bigint",
    ).orderBy("step")


# ---------------------------------------------------------------------------
# x4: exact-substring dedup + byte-exact rebuild proof
# ---------------------------------------------------------------------------

_X4_WINDOW = 3


@query(
    "x4_hostile_substring_dedup",
    # l62b's rebuild-proof shape at window=3 over the hostile corpus;
    # text pre-coalesced to '' on both sides (the operator contract is
    # non-null text; the NULL row documents the required guard).
    sql=f"""
    WITH {_DOCS_CTE}w AS (
      SELECT doc_id, str_split(COALESCE(text, ''), ' ') AS words FROM hdocs
    ), win AS (
      SELECT doc_id, i - 1 AS s, i + {_X4_WINDOW - 2} AS e,
             array_to_string(list_slice(words, i, i + {_X4_WINDOW - 1}), ' ') AS gram
      FROM w, UNNEST(range(1, len(words) - {_X4_WINDOW - 2})) AS t(i)
    ), canon AS (
      SELECT gram, MIN(doc_id) AS canon_doc, COUNT(DISTINCT doc_id) AS nd
      FROM win GROUP BY gram
    ), dropw AS (
      SELECT win.doc_id, win.s, win.e
      FROM win JOIN canon USING (gram)
      WHERE canon.nd >= 2 AND win.doc_id <> canon.canon_doc
    ), isl AS (
      SELECT doc_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s) AS island
      FROM (
        SELECT doc_id, s, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pmax
        FROM dropw)
    ), merged AS (
      SELECT doc_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM isl GROUP BY doc_id, island
    ), pos AS (
      SELECT doc_id, UNNEST(range(ms, me + 1)) AS p FROM merged
    ), tok AS (
      SELECT w.doc_id, w.words[t.i] AS word, t.i - 1 AS p
      FROM w, UNNEST(range(1, len(w.words) + 1)) AS t(i)
    ), kept AS (
      SELECT tok.doc_id,
             COALESCE(string_agg(tok.word, ' ' ORDER BY tok.p)
                      FILTER (WHERE pos.p IS NULL), '') AS text_deduped,
             COUNT(*) FILTER (WHERE pos.p IS NULL) AS kept_words,
             COUNT(*) FILTER (WHERE pos.p IS NOT NULL) AS dup_words
      FROM tok LEFT JOIN pos ON tok.doc_id = pos.doc_id AND tok.p = pos.p
      GROUP BY tok.doc_id
    )
    SELECT doc_id, md5(text_deduped) AS text_md5, kept_words, dup_words
    FROM kept ORDER BY doc_id
    """,
    tier="T2",
    survey="L1,H8,A5,H6",
)
def x4_hostile_substring_dedup(spark, sf_dir):
    """dedup.substring_dedup rebuild proof (l62b's md5-of-rewritten-text
    shape) at window=3 over the hostile corpus: duplicated 3-word spans
    across docs 10/14 and 11/12/13 are cut from every non-canonical
    copy; NUL-bearing and 4-byte-UTF-8 tokens survive untouched; the
    100k-char doc has one token (< window) and rebuilds byte-exactly;
    the NULL row is pre-coalesced to '' (the operator contract is
    non-null text — this query documents the guard)."""
    docs = _hostile_df(spark).select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    out = dedup.substring_dedup(
        docs, "doc_id", "text", window=_X4_WINDOW, min_docs=2,
        hash_windows=False,
    )
    return out.select(
        "doc_id",
        F.md5("text_deduped").alias("text_md5"),
        (F.col("n_words") - F.col("dup_words")).alias("kept_words"),
        "dup_words",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# x5: tokenize / stats layer on hostile text
# ---------------------------------------------------------------------------


@query(
    "x5_hostile_text_stats",
    sql=f"""
    WITH {_DOCS_CTE.rstrip().rstrip(',')}
    SELECT doc_id,
           length(text) AS n_chars,
           octet_length(encode(text)) AS n_bytes,
           len(string_split(text, ' ')) AS n_split,
           len(regexp_extract_all(lower(text), '[a-z]+')) AS n_ascii_words,
           length(text) - length(replace(text, chr(0), '')) AS n_nul,
           CASE WHEN text IS NULL THEN NULL
                WHEN trim(text) = '' THEN 1 ELSE 0 END AS ws_only
    FROM hdocs ORDER BY doc_id
    """,
    tier="T1",
    survey="L7,L5,B6,A5,H1",
)
def x5_hostile_text_stats(spark, sf_dir):
    """Tokenize/stats parity on every hostile doc including the 100k-char
    token and the NULL row: code-point length vs byte length (4-byte
    UTF-8 and combining marks diverge), split cardinality on empty /
    multi-space strings (Spark split and DuckDB string_split agree:
    '' -> [''], '   ' -> 4 empties), ASCII word extraction, NUL count,
    whitespace-only flag. NULL text propagates NULL everywhere."""
    # size() wrapped in a null guard: under ANSI-off (hostile-config
    # re-certification) legacy size(NULL) returns -1, not NULL — the
    # guard keeps the NULL row's stats NULL in BOTH configs.
    def nsize(c):
        return F.when(F.col("text").isNull(), F.lit(None).cast("int")).otherwise(
            F.size(c)
        )

    return (
        _hostile_df(spark)
        .select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.octet_length("text").alias("n_bytes"),
            nsize(F.split("text", " ")).alias("n_split"),
            nsize(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
            ).alias("n_ascii_words"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "\x00", ""))
            ).alias("n_nul"),
            F.when(F.col("text").isNull(), F.lit(None).cast("int"))
            .when(F.trim("text") == "", 1)
            .otherwise(0)
            .alias("ws_only"),
        )
        .orderBy("doc_id")
    )
