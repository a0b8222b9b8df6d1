"""Portable xxHash64 — the r15-evaluated (and rejected) hash co-change.

VERDICT r14 item 1 proposed swapping the dedup/selection tier's
md5-derived hashes to Spark's built-in ``xxhash64`` as an
engine+oracle co-change. This module is the oracle half of that
evaluation: a bit-exact XXH64 (Collet's public spec; the exact
variant ``org.apache.spark.sql.catalyst.expressions.XxHash64``
evaluates, seed chaining included) as DuckDB ``CREATE MACRO``
statements over UBIGINT/HUGEINT modular arithmetic, plus the Python
reference used to pre-compute Spark's multi-argument seed chains.

The co-change was implemented end-to-end, verified correct (the
first six affected registered queries passed the full oracle
hash-compare at sf0.01 under the swap), and then REVERTED on
measurement (OPTIMIZATION_r15.md §1):

* Engine side: the swap bought only ~1.05-1.10x on the isolated
  signature / word-3-gram / simhash pipelines at sf0.1 — the
  tokenization and per-element lambda machinery dominates those
  pipelines, not the digest (the r14 estimate of 2-5x on per-row
  hash cost does not reproduce).
* Oracle side: DuckDB's integer arithmetic is overflow-checked, so a
  wrapping 64-bit multiply must be emulated through a 32-bit split
  over HUGEINT — measured 0.76 µs per multiply, making the macro
  ~200x slower than DuckDB's native md5 (30 µs vs 0.14 µs per hash).
  The dedup-family oracles went from seconds to 90-155 s EACH at
  sf0.01, which would add tens of minutes to every driver verify and
  full pytest run.

The macro itself is kept, fully validated, as the committed evidence
for that decision: ``tests/test_xxh64_parity.py`` pins Python
reference == DuckDB macro == Spark ``xxhash64`` over adversarial
vectors (every tail/stripe code path) and over every string class the
real corpus hashes, including the 2-arg seed-chaining forms. Byte
access uses ``ascii(s[i])`` — character == byte — exact for ASCII
inputs (the shipped corpus is ASCII at every SF).

``oracle_prelude()`` returns the macro statements; the driver's
``con.execute(sql)`` runs multi-statement SQL and returns the final
SELECT, so a future oracle could carry the prelude inline if the
economics ever change (e.g. a DuckDB with native wrapping arithmetic
or xxhash).
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """Spark XxHash64 over one IntegerType value (4-byte path)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """XXH64 over a byte string — Spark's hashUnsafeBytes."""
    n = len(b)
    off = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        while off <= n - 32:
            for lane in range(4):
                k = int.from_bytes(
                    b[off + 8 * lane: off + 8 * lane + 8], "little"
                )
                v[lane] = (_rotl((v[lane] + k * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (
            _rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)
        ) & _M
        for lane in range(4):
            h ^= (_rotl((v[lane] * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off <= n - 8:
        k = int.from_bytes(b[off: off + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off <= n - 4:
        k = int.from_bytes(b[off: off + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (b[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def int_chain_seed(i: int, seed: int = 42) -> int:
    """The running seed after Spark's ``xxhash64(<int literal i>, ...)``
    consumes its first argument — lets the oracle replace the 2-arg
    call with a 1-arg macro call at a precomputed constant seed."""
    return hash_int(i, seed)


def str_chain_seed(s: str, seed: int = 42) -> int:
    """Same, for a string-literal first argument."""
    return hash_bytes(s.encode("utf-8"), seed)


_P1S = f"{_P1}::UBIGINT"
_P2S = f"{_P2}::UBIGINT"
_P3S = f"{_P3}::UBIGINT"
_P4S = f"{_P4}::UBIGINT"
_P5S = f"{_P5}::UBIGINT"
_M64 = "18446744073709551616::HUGEINT"


def _let(val: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``val`` once, reference it as ``var``
    (single-element list_transform — without it each chained hashing
    step would textually duplicate the whole upstream expression)."""
    return f"list_transform([{val}], {var} -> {body})[1]"


def _prelude_statements() -> list[str]:
    stmts = [
        # 64-bit wrapping add/multiply/rotate over UBIGINT. DuckDB's
        # UBIGINT arithmetic is overflow-checked, so wraparound goes
        # through HUGEINT mod 2^64; multiply splits into 32-bit halves
        # (each partial product fits UBIGINT, the recombination fits
        # HUGEINT).
        "CREATE OR REPLACE MACRO xxh_add(a, b) AS "
        f"CAST(((a::HUGEINT + b::HUGEINT) % {_M64}) AS UBIGINT)",
        "CREATE OR REPLACE MACRO xxh_mul(a, b) AS "
        "CAST(((((a & 4294967295::UBIGINT) * (b & 4294967295::UBIGINT))::HUGEINT"
        " + ((((a >> 32) * (b & 4294967295::UBIGINT))::HUGEINT"
        "    + ((a & 4294967295::UBIGINT) * (b >> 32))::HUGEINT)"
        "   % 4294967296::HUGEINT) * 4294967296::HUGEINT)"
        f" % {_M64}) AS UBIGINT)",
        "CREATE OR REPLACE MACRO xxh_rot(x, r) AS "
        f"(CAST(((x::HUGEINT * (1::HUGEINT << r)) % {_M64}) AS UBIGINT)"
        " | (x >> (64 - r)))",
        # round(acc, k) = rot31(acc + k*P2) * P1
        "CREATE OR REPLACE MACRO xxh_round(acc, k) AS "
        f"xxh_mul(xxh_rot(xxh_add(acc, xxh_mul(k, {_P2S})), 31), {_P1S})",
        # final avalanche
        "CREATE OR REPLACE MACRO xxh_fmix(h0) AS "
        + _let(
            "xor(h0, h0 >> 33)",
            "f1",
            _let(
                f"xxh_mul(f1, {_P2S})",
                "m1",
                _let(
                    "xor(m1, m1 >> 29)",
                    "f2",
                    _let(f"xxh_mul(f2, {_P3S})", "m2", "xor(m2, m2 >> 32)"),
                ),
            ),
        ),
        # byte k of an ASCII string (1-based); past-the-end -> '' -> 0,
        # safe because every read is length-guarded
        "CREATE OR REPLACE MACRO xxh_b(s, i) AS "
        "CAST(ascii(s[CAST(i AS BIGINT)]) AS UBIGINT)",
        # little-endian 8- and 4-byte reads
        "CREATE OR REPLACE MACRO xxh_read8(s, o) AS "
        "(xxh_b(s, o) | (xxh_b(s, o + 1) << 8) | (xxh_b(s, o + 2) << 16)"
        " | (xxh_b(s, o + 3) << 24) | (xxh_b(s, o + 4) << 32)"
        " | (xxh_b(s, o + 5) << 40) | (xxh_b(s, o + 6) << 48)"
        " | (xxh_b(s, o + 7) << 56))",
        "CREATE OR REPLACE MACRO xxh_read4(s, o) AS "
        "(xxh_b(s, o) | (xxh_b(s, o + 1) << 8) | (xxh_b(s, o + 2) << 16)"
        " | (xxh_b(s, o + 3) << 24))",
    ]
    # The full hash, UBIGINT out. Stages: ≥32-byte stripes folded over
    # 4 lane accumulators (list_reduce; the prepended element is the
    # initial accumulator), +length, ≤3 trailing 8-byte chunks
    # (list_reduce), one optional 4-byte chunk, trailing bytes
    # (list_reduce), avalanche.
    stripes = (
        "list_reduce(list_prepend("
        f"[xxh_add(xxh_add(sd, {_P1S}), {_P2S}), xxh_add(sd, {_P2S}), sd,"
        f" xxh_add(sd, {(1 << 64) - _P1}::UBIGINT)],"
        " list_transform(generate_series(0, (n // 32) - 1), t ->"
        " [xxh_read8(s, 32*t + 1), xxh_read8(s, 32*t + 9),"
        "  xxh_read8(s, 32*t + 17), xxh_read8(s, 32*t + 25)])),"
        " (a, st) -> [xxh_round(a[1], st[1]), xxh_round(a[2], st[2]),"
        "             xxh_round(a[3], st[3]), xxh_round(a[4], st[4])])"
    )
    merged = _let(
        stripes,
        "vs",
        _let(
            "xxh_add(xxh_add(xxh_rot(vs[1], 1), xxh_rot(vs[2], 7)),"
            " xxh_add(xxh_rot(vs[3], 12), xxh_rot(vs[4], 18)))",
            "m0",
            _let(
                f"xxh_add(xxh_mul(xor(m0, xxh_round(0::UBIGINT, vs[1])), {_P1S}), {_P4S})",
                "g1",
                _let(
                    f"xxh_add(xxh_mul(xor(g1, xxh_round(0::UBIGINT, vs[2])), {_P1S}), {_P4S})",
                    "g2",
                    _let(
                        f"xxh_add(xxh_mul(xor(g2, xxh_round(0::UBIGINT, vs[3])), {_P1S}), {_P4S})",
                        "g3",
                        f"xxh_add(xxh_mul(xor(g3, xxh_round(0::UBIGINT, vs[4])), {_P1S}), {_P4S})",
                    ),
                ),
            ),
        ),
    )
    chunks8 = (
        "list_reduce(list_prepend(h1,"
        " list_transform(generate_series(0, ((n - o0) // 8) - 1), t ->"
        " xxh_read8(s, o0 + 8*t + 1))),"
        " (a, k) -> xxh_add(xxh_mul(xxh_rot(xor(a, xxh_round(0::UBIGINT, k)),"
        f" 27), {_P1S}), {_P4S}))"
    )
    chunk4 = (
        "CASE WHEN (n - o1) >= 4 THEN "
        f"xxh_add(xxh_mul(xxh_rot(xor(h2, xxh_mul(xxh_read4(s, o1 + 1), {_P1S})),"
        f" 23), {_P2S}), {_P3S})"
        " ELSE h2 END"
    )
    tail = (
        "list_reduce(list_prepend(h3,"
        " list_transform(generate_series(o2 + 1, n), i -> xxh_b(s, i))),"
        f" (a, b) -> xxh_mul(xxh_rot(xor(a, xxh_mul(b, {_P5S})), 11), {_P1S}))"
    )
    body = _let(
        "CAST(length(s) AS BIGINT)",
        "n",
        _let(
            f"CASE WHEN n >= 32 THEN {merged} ELSE xxh_add(sd, {_P5S}) END",
            "h0",
            _let(
                "xxh_add(h0, CAST(n AS UBIGINT))",
                "h1",
                _let(
                    "CASE WHEN n >= 32 THEN 32 * (n // 32) ELSE 0 END",
                    "o0",
                    _let(
                        chunks8,
                        "h2",
                        _let(
                            "o0 + 8 * ((n - o0) // 8)",
                            "o1",
                            _let(
                                chunk4,
                                "h3",
                                _let(
                                    "CASE WHEN (n - o1) >= 4 THEN o1 + 4 ELSE o1 END",
                                    "o2",
                                    _let(tail, "h4", "xxh_fmix(h4)"),
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        ),
    )
    stmts.append(f"CREATE OR REPLACE MACRO xxh_str(s, sd) AS {body}")
    # Two's-complement view matching Spark's BIGINT xxhash64 output.
    stmts.append(
        "CREATE OR REPLACE MACRO xxh_str_s(s, sd) AS "
        "CAST(CASE WHEN xxh_str(s, sd) >= 9223372036854775808::UBIGINT "
        "THEN xxh_str(s, sd)::HUGEINT - 18446744073709551616::HUGEINT "
        "ELSE xxh_str(s, sd)::HUGEINT END AS BIGINT)"
    )
    return stmts


_PRELUDE: str | None = None


def oracle_prelude() -> str:
    """The multi-statement macro prelude, built once per process."""
    global _PRELUDE
    if _PRELUDE is None:
        _PRELUDE = ";\n".join(_prelude_statements()) + ";\n"
    return _PRELUDE


def with_prelude(sql: str) -> str:
    """Prepend the macro prelude to an oracle that calls xxh_* macros
    (idempotent; no-op for oracles that don't)."""
    if "xxh_" in sql and "CREATE OR REPLACE MACRO xxh_add" not in sql:
        return oracle_prelude() + sql
    return sql
