"""DuckDB-SQL code generators that reproduce Spark's ``xxhash64`` —
bit-for-bit — so oracle queries can value-check pipelines whose Spark
side hashes with the engine-native XXH64 family (CMS cells, MinHash
shingle hashes, LSH band buckets).

Spark's ``F.xxhash64(c1, c2, ...)`` is standard XXH64 (Collet) chained
over the children: ``h = 42; for c in children: h = XXH64(bytes(c), h)``
where a BIGINT/INT child contributes its 8 little-endian bytes via the
hashLong fast path and a STRING child contributes its UTF-8 bytes via
the full block algorithm.  Both paths are re-expressed here as pure
DuckDB SQL: all 64-bit wraparound arithmetic runs on HUGEINT; a 64x64
multiply mod 2^64 splits each operand into 32-bit halves so no
intermediate exceeds 2^96 (HUGEINT holds 2^127); byte access goes
through ``hex(encode(s))`` so multi-byte UTF-8 matches Spark's
UTF8String bytes exactly; the 32-byte stripe loop and the 8-byte /
1-byte tails are unrolled straight-line to a declared ``max_len`` bound
with per-row CASE guards (see xxh64_bytes_cte for why no lambdas).

Verified against ``F.xxhash64`` in tests/test_xxh64_sql.py on empty /
1..40-byte / multi-byte-UTF-8 / exactly-31/32/33-byte strings and on
the long fast path with arbitrary seeds.

This is the machinery that promoted l2 / l31b / i10 from rows-only to
full DuckDB oracles (tools/rows_only_manifest.json history).
"""

from __future__ import annotations

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64
M32 = 1 << 32
SPARK_SEED = 42


def mul(a: str, b: str) -> str:
    """(a*b) mod 2^64 with 32-bit-split operands (HUGEINT-safe)."""
    return (
        f"((({a})%{M32})*(({b})%{M32}) + (((({a})%{M32})*(({b})//{M32})"
        f" + (({a})//{M32})*(({b})%{M32}))%{M32})*{M32}) % {M64}"
    )


def rotl(x: str, n: int) -> str:
    """rotate-left by n of a value already reduced mod 2^64."""
    return f"((({x})*{1 << n})%{M64} + ({x})//{1 << (64 - n)})"


def xor(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT))"
        f" AS HUGEINT)"
    )


def to_signed(u: str) -> str:
    """unsigned [0, 2^64) HUGEINT expression -> signed BIGINT."""
    return (
        f"CAST(CASE WHEN ({u}) >= {1 << 63} THEN ({u}) - {M64}"
        f" ELSE ({u}) END AS BIGINT)"
    )


def _round(acc: str, w: str) -> str:
    """XXH64 round: rotl31(acc + w*P2) * P1  (all mod 2^64)."""
    return mul(rotl(f"(({acc}) + {mul(w, str(P2))}) % {M64}", 31), str(P1))


def _round0(w: str) -> str:
    """round(0, w) = rotl31(w*P2) * P1."""
    return mul(rotl(mul(w, str(P2)), 31), str(P1))


def _merge_round(h: str, v: str) -> str:
    """(h XOR round0(v)) * P1 + P4."""
    return f"({mul(xor(h, _round0(v)), str(P1))} + {P4}) % {M64}"


def _avalanche_ctes(prefix: str, h: str, keep: str) -> str:
    """CTE tail applying the XXH64 avalanche to unsigned expr ``h``;
    emits {prefix}a..{prefix}f with columns {prefix}_u (unsigned
    HUGEINT) and {prefix}_xxh (signed BIGINT). ``keep`` is the FROM
    source."""
    p = prefix
    return f"""{p}a AS (SELECT *, {xor(h, f'(({h})//{1 << 33})')} AS {p}_t1 FROM {keep}),
    {p}b AS (SELECT *, {mul(f'{p}_t1', str(P2))} AS {p}_t2 FROM {p}a),
    {p}c AS (SELECT *, {xor(f'{p}_t2', f'({p}_t2//{1 << 29})')} AS {p}_t3 FROM {p}b),
    {p}d AS (SELECT *, {mul(f'{p}_t3', str(P3))} AS {p}_t4 FROM {p}c),
    {p}e AS (SELECT *, {xor(f'{p}_t4', f'({p}_t4//{1 << 32})')} AS {p}_u FROM {p}d),
    {p}f AS (SELECT * EXCLUDE ({p}_t1, {p}_t2, {p}_t3, {p}_t4),
             {to_signed(f'{p}_u')} AS {p}_xxh FROM {p}e)"""


def _py_rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) % M64


def py_xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """Pure-python twin of Spark's hashInt — the path an IntegerType
    child (e.g. ``F.lit(42 + i)``) takes in a chained xxhash64. The int
    contributes its 4 LE bytes as one XXH64 4-byte tail step. Returns
    unsigned."""
    h = (seed + P5 + 4) % M64
    h ^= ((value % M32) * P1) % M64
    h = (_py_rotl(h, 23) * P2 + P3) % M64
    return py_avalanche(h)


def py_xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Pure-python twin of Spark's hashLong (reference / constant
    folding). Returns unsigned."""
    v = value % M64
    k1 = (_py_rotl((v * P2) % M64, 31) * P1) % M64
    h = ((seed + P5 + 8) % M64) ^ k1
    h = (_py_rotl(h, 27) * P1 + P4) % M64
    return py_avalanche(h)


def py_avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) % M64
    h ^= h >> 29
    h = (h * P3) % M64
    h ^= h >> 32
    return h


def py_xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Pure-python standard XXH64 over bytes (reference for tests).
    Matches Spark's hashUnsafeBytes. Returns unsigned."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) % M64
        v2 = (seed + P2) % M64
        v3 = seed % M64
        v4 = (seed - P1) % M64
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                w = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                nv = (_py_rotl((v + w * P2) % M64, 31) * P1) % M64
                if i == 0:
                    v1 = nv
                elif i == 1:
                    v2 = nv
                elif i == 2:
                    v3 = nv
                else:
                    v4 = nv
            off += 32
        h = (
            _py_rotl(v1, 1) + _py_rotl(v2, 7) + _py_rotl(v3, 12) + _py_rotl(v4, 18)
        ) % M64
        for v in (v1, v2, v3, v4):
            r = (_py_rotl((v * P2) % M64, 31) * P1) % M64
            h = ((h ^ r) * P1 + P4) % M64
    else:
        h = (seed + P5) % M64
    h = (h + n) % M64
    while off + 8 <= n:
        w = int.from_bytes(data[off : off + 8], "little")
        r = (_py_rotl((w * P2) % M64, 31) * P1) % M64
        h = (_py_rotl(h ^ r, 27) * P1 + P4) % M64
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off : off + 4], "little")
        h = (_py_rotl(h ^ ((w * P1) % M64), 23) * P2 + P3) % M64
        off += 4
    while off < n:
        h = (_py_rotl(h ^ ((data[off] * P5) % M64), 11) * P1) % M64
        off += 1
    return py_avalanche(h)


def xxh64_bytes_cte(src: str, col: str, prefix: str = "bx",
                    seed: int = SPARK_SEED, max_len: int = 64) -> str:
    """CTE chain computing Spark's ``xxhash64(<string col>)`` (seed 42
    unless chained) over the UTF-8 bytes of ``col`` for every row of
    ``src``.  The final CTE ``{prefix}f`` carries all ``src`` columns
    plus ``{prefix}_u`` (unsigned HUGEINT, for chaining) and
    ``{prefix}_xxh`` (signed BIGINT — the value F.xxhash64 returns).

    STRAIGHT-LINE SCALAR SQL, deliberately: an earlier formulation
    folded the 32-byte stripes and tails with list_transform/list_reduce
    lambdas, and DuckDB 1.0.0 intermittently fails ("Out of Memory:
    failed to allocate block" with GBs free, occasionally a segfault)
    executing that shape over ~100k rows under many threads — a
    process-state bug, not real memory pressure.  This version uses no
    lambdas and no lists: bytes are hex-pair lookups at computed substr
    positions, the stripe loop and the 8-byte/4-byte/1-byte tails are
    unrolled to the ``max_len`` bound with per-row CASE guards (an
    unprocessed stage passes its accumulator through unchanged).  It is
    also ~5x faster on the same corpus.

    ``max_len`` bounds the unroll (stages scale ~max_len/32); an input
    longer than ``max_len`` raises a DuckDB error() — loud, never a
    wrong hash.  The byte-length boundary cases (empty string, every
    tail-combination, exact stripe multiples, multi-byte UTF-8) are
    pinned against F.xxhash64 in tests/test_xxh64_sql.py."""
    p = prefix
    hexd = "0123456789abcdef"

    def B(i: str) -> str:
        """byte value (HUGEINT) at 0-based byte index expr ``i``."""
        return (
            f"CAST((strpos('{hexd}', substr({p}_hx, 2*({i})+1, 1)) - 1) * 16"
            f" + (strpos('{hexd}', substr({p}_hx, 2*({i})+2, 1)) - 1)"
            f" AS HUGEINT)"
        )

    def W8(j: str) -> str:
        """little-endian 8-byte word at word-index expr ``j``."""
        return " + ".join(f"{B(f'8*({j})+{k}')}*{1 << (8 * k)}" for k in range(8))

    iv = [
        (seed + P1 + P2) % M64,
        (seed + P2) % M64,
        seed % M64,
        (seed - P1) % M64,
    ]
    parts = [
        f"""{p}0 AS (
      SELECT *, lower(hex(encode({col}))) AS {p}_hx,
             CASE WHEN octet_length(encode({col})) > {max_len}
                  THEN CAST(error('xxh64_bytes_cte: input exceeds max_len={max_len}') AS BIGINT)
                  ELSE CAST(octet_length(encode({col})) AS BIGINT) END AS {p}_n
      FROM {src}
    )"""
    ]
    helpers: list[str] = [f"{p}_hx"]
    prev = f"{p}0"
    lanes = [f"CAST({v} AS HUGEINT)" for v in iv]
    ns_max = max_len // 32
    for st in range(ns_max):
        guard = f"{p}_n >= {32 * (st + 1)}"
        wc = f"{p}w{st}"
        wcols = ", ".join(
            f"CASE WHEN {guard} THEN {W8(str(4 * st + k))}"
            f" ELSE CAST(0 AS HUGEINT) END AS {wc}_{k}"
            for k in range(4)
        )
        parts.append(f"{wc} AS (SELECT *, {wcols} FROM {prev})")
        helpers += [f"{wc}_{k}" for k in range(4)]
        prev = wc
        lc = f"{p}l{st}"
        lcols = ", ".join(
            f"CASE WHEN {guard} THEN {_round(lanes[k], f'{wc}_{k}')}"
            f" ELSE {lanes[k]} END AS {lc}_v{k}"
            for k in range(4)
        )
        parts.append(f"{lc} AS (SELECT *, {lcols} FROM {prev})")
        lanes = [f"{lc}_v{k}" for k in range(4)]
        helpers += [f"{lc}_v{k}" for k in range(4)]
        prev = lc
    if ns_max:
        mg = f"({rotl(lanes[0], 1)} + {rotl(lanes[1], 7)} + {rotl(lanes[2], 12)} + {rotl(lanes[3], 18)}) % {M64}"
        parts.append(f"{p}m0 AS (SELECT *, {mg} AS {p}_mg0 FROM {prev})")
        helpers.append(f"{p}_mg0")
        prev = f"{p}m0"
        for k in range(4):
            parts.append(
                f"{p}m{k + 1} AS (SELECT *, "
                f"{_merge_round(f'{p}_mg{k}', lanes[k])} AS {p}_mg{k + 1}"
                f" FROM {prev})"
            )
            helpers.append(f"{p}_mg{k + 1}")
            prev = f"{p}m{k + 1}"
        h0 = (
            f"CASE WHEN {p}_n >= 32 THEN {p}_mg4"
            f" ELSE CAST({(seed + P5) % M64} AS HUGEINT) END"
        )
    else:
        h0 = f"CAST({(seed + P5) % M64} AS HUGEINT)"
    parts.append(f"{p}h1 AS (SELECT *, (({h0}) + {p}_n) % {M64} AS {p}_h1 FROM {prev})")
    helpers.append(f"{p}_h1")
    prev = f"{p}h1"
    h = f"{p}_h1"
    for t in range(3):
        guard = f"{p}_n//8 > 4*({p}_n//32) + {t}"
        wname = f"{p}_tw{t}"
        parts.append(
            f"{p}tw{t} AS (SELECT *, CASE WHEN {guard}"
            f" THEN {W8(f'4*({p}_n//32)+{t}')}"
            f" ELSE CAST(0 AS HUGEINT) END AS {wname} FROM {prev})"
        )
        step = f"({mul(rotl(xor(h, _round0(wname)), 27), str(P1))} + {P4}) % {M64}"
        parts.append(
            f"{p}th{t} AS (SELECT *, CASE WHEN {guard} THEN {step}"
            f" ELSE {h} END AS {p}_h2{t} FROM {p}tw{t})"
        )
        helpers += [wname, f"{p}_h2{t}"]
        prev = f"{p}th{t}"
        h = f"{p}_h2{t}"
    w4 = " + ".join(f"{B(f'({p}_n//8)*8+{k}')}*{1 << (8 * k)}" for k in range(4))
    parts.append(
        f"{p}f4 AS (SELECT *, CASE WHEN {p}_n % 8 >= 4 THEN {w4}"
        f" ELSE CAST(0 AS HUGEINT) END AS {p}_w4 FROM {prev})"
    )
    step4 = (
        f"({mul(rotl(xor(h, f'({p}_w4*{P1})%{M64}'), 23), str(P2))}"
        f" + {P3}) % {M64}"
    )
    parts.append(
        f"{p}h3 AS (SELECT *, CASE WHEN {p}_n % 8 >= 4 THEN {step4}"
        f" ELSE {h} END AS {p}_h3 FROM {p}f4)"
    )
    helpers += [f"{p}_w4", f"{p}_h3"]
    prev = f"{p}h3"
    h = f"{p}_h3"
    boff = f"({p}_n//8)*8 + CASE WHEN {p}_n % 8 >= 4 THEN 4 ELSE 0 END"
    for t in range(3):
        guard = f"({boff}) + {t} < {p}_n"
        bname = f"{p}_by{t}"
        parts.append(
            f"{p}by{t} AS (SELECT *, CASE WHEN {guard}"
            f" THEN {B(f'({boff}) + {t}')}"
            f" ELSE CAST(0 AS HUGEINT) END AS {bname} FROM {prev})"
        )
        stepb = mul(rotl(xor(h, f"({bname}*{P5})%{M64}"), 11), str(P1))
        parts.append(
            f"{p}hb{t} AS (SELECT *, CASE WHEN {guard} THEN {stepb}"
            f" ELSE {h} END AS {p}_h4{t} FROM {p}by{t})"
        )
        helpers += [bname, f"{p}_h4{t}"]
        prev = f"{p}hb{t}"
        h = f"{p}_h4{t}"
    keep_h = h
    helpers.remove(keep_h)
    parts.append(
        f"{p}9 AS (SELECT * EXCLUDE ({', '.join(helpers)}) FROM {prev})"
    )
    parts.append(_avalanche_ctes(prefix, keep_h, f"{p}9"))
    return ",\n    ".join(parts)


def cms_cells_cte(src: str, col: str, depth: int = 4, width: int = 1024,
                  seed: int = SPARK_SEED, prefix: str = "cm") -> str:
    """CTE chain reproducing operators/sketch.py ``_cells``: for every
    row of ``src``, the ``depth`` (r, bucket) count-min targets of the
    string ``col`` — bucket = pmod(xxhash64(col, lit(seed+i)), width),
    where the chained hash is hashInt(seed+i, hashBytes(col, 42)) (an
    INT literal child takes the 4-byte path; see hashint_const_ctes).
    Final CTE ``{prefix}tb`` carries all ``src`` columns plus (r,
    bucket).  Feed ``src`` DISTINCT values and join occurrences back —
    the hash chain is ~40 CTE stages, so run it once per value."""
    p = prefix
    parts = [xxh64_bytes_cte(src, col, prefix=f"{p}b")]
    prev = f"{p}bf"
    for i in range(depth):
        parts.append(hashint_const_ctes(prev, seed + i, f"{p}b_u", f"{p}h{i}"))
        prev = f"{p}h{i}f"
    case = " ".join(f"WHEN {i} THEN {p}h{i}_xxh" for i in range(depth))
    vals = ",".join(f"({i})" for i in range(depth))
    parts.append(
        f"""{p}tb AS (
      SELECT *, ((CASE d.r {case} END % {width}) + {width}) % {width} AS bucket
      FROM {prev} CROSS JOIN (VALUES {vals}) d(r)
    )"""
    )
    return ",\n    ".join(parts)


def hashint_const_ctes(src: str, value: int, seed_col: str,
                       prefix: str) -> str:
    """CTE chain for Spark's chained ``xxhash64(<str>, lit(value))``
    where ``value`` is an INT literal (Spark widens nothing: an
    IntegerType child contributes 4 bytes via hashInt).  ``seed_col``
    is the per-row unsigned chaining hash (e.g. {p}_u from
    xxh64_bytes_cte).  The constant's k1 folds to a literal.  Final CTE
    ``{prefix}f`` adds {prefix}_u / {prefix}_xxh."""
    p = prefix
    k1 = ((value % M32) * P1) % M64
    h1 = xor(f"(({seed_col}) + {(P5 + 4) % M64}) % {M64}", str(k1))
    h2 = f"({mul(rotl(h1, 23), str(P2))} + {P3}) % {M64}"
    return f"""{p}0 AS (SELECT *, {h2} AS {p}_h FROM {src}),
    {_avalanche_ctes(prefix, f'{p}_h', f'{p}0')}"""


def hashlong_const_ctes(src: str, value: int, seed_col: str,
                        prefix: str) -> str:
    """CTE chain for Spark's chained ``xxhash64(<str>, lit(value))``
    where ``value`` is a LONG literal: hashLong of the CONSTANT
    ``value`` seeded by the per-row unsigned hash in column ``seed_col``
    (e.g. the {p}_u output of xxh64_bytes_cte).  The constant's
    round-hash k1 folds to a literal.  Final CTE ``{prefix}f`` adds
    {prefix}_u / {prefix}_xxh."""
    p = prefix
    v = value % M64
    k1 = (_py_rotl((v * P2) % M64, 31) * P1) % M64
    h1 = xor(f"(({seed_col}) + {(P5 + 8) % M64}) % {M64}", str(k1))
    h2 = f"({mul(rotl(h1, 27), str(P1))} + {P4}) % {M64}"
    return f"""{p}0 AS (SELECT *, {h2} AS {p}_h FROM {src}),
    {_avalanche_ctes(prefix, f'{p}_h', f'{p}0')}"""


def xxh64_long_cte(src: str, key: str, prefix: str = "lx",
                   seed: int = SPARK_SEED) -> str:
    """CTE chain reproducing Spark's ``xxhash64(<bigint col>)`` for every
    row of ``src`` — the hashLong fast path (one round + avalanche) over
    the key's 8 little-endian bytes, constant seed.  The prefix-free
    original of this chain lives in plans/llm_queries._xxh64_long_cte
    (the l29b promotion); this form adds a prefix so several long-key
    chains can coexist in one oracle.  Final CTE ``{prefix}f`` adds
    {prefix}_u / {prefix}_xxh."""
    p = prefix
    u = (
        f"CAST(CASE WHEN {key} < 0 THEN CAST({key} AS HUGEINT) + {M64}"
        f" ELSE CAST({key} AS HUGEINT) END AS HUGEINT)"
    )
    k1 = mul(rotl(mul(u, str(P2)), 31), str(P1))
    h1 = xor(f"CAST({(seed + P5 + 8) % M64} AS HUGEINT)", k1)
    h2 = f"({mul(rotl(h1, 27), str(P1))} + {P4}) % {M64}"
    return f"""{p}0 AS (SELECT *, {h2} AS {p}_h FROM {src}),
    {_avalanche_ctes(prefix, f'{p}_h', f'{p}0')}"""
