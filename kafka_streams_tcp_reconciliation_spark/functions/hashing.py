"""Deterministic cross-engine hashing primitives.

The driver's correctness gate compares every query against a DuckDB oracle
by value-hash (SURVEY.md §5.2), so any operator built on hashing (MinHash,
SimHash, fingerprinting) needs a hash function that evaluates to the SAME
integers in Spark SQL and in DuckDB SQL. Built-in hashes disagree across
engines (Spark ``hash``=Murmur3, ``xxhash64``=xxHash64; DuckDB ``hash`` is
its own), so we define a polynomial rolling hash over character codes:

    h(s) = fold(acc, c in s: (acc * BASE + ascii(c)) mod P),  P = 1e9+7

evaluated with each engine's higher-order list functions — pure int64
arithmetic, no overflow (acc < P ≈ 2^30, acc*BASE + 255 < 2^38), verified
byte-identical across engines. Everything here returns SQL *strings*: one
Spark-dialect, one DuckDB-dialect, generated from the same constants so the
pair cannot drift.

All expressions stay JVM-side in Spark (whole-stage codegen covers
``aggregate``/``transform`` lambdas) — no Python UDFs in any hash path.

Caveat — ranking by the RAW hash of a SEQUENTIAL integer id: the char
fold is length-dominant and near-monotone on consecutive ids ("99" <
"100" < "101" …), so ORDER BY h(CAST(id AS STRING)) largely reproduces
id order (this silently degraded hash-rank reservoir sampling to
first-K-by-id). Reduced uses (``h % m``) are unaffected: within each
aligned id block the residues form a spread, permutation-like lattice
(for base 31, h("..tu") % 100 walks 31·t+u — an exact permutation of
0..99 per 100-block), i.e. low-discrepancy systematic stratification —
exactly right for split/bucket/sample-order uses. When you need ranking
DECORRELATED from id order, use the affine scramble on the integer id
instead (see plans/pipeline._SAMPLE_HASH): ((id % P) · a + b) % P, pure
int64, overflow-safe for any id.
"""

from __future__ import annotations

MOD = 1_000_000_007
BASE_A = 31
BASE_B = 131

# Universal-hash family h_k(x) = (a_k * x + b_k) mod MOD with fixed,
# deterministically generated odd multipliers (Knuth multiplicative
# constants) — embedded as literals into both dialects.
_KNUTH = 2_654_435_761


def hash_params(n: int) -> list[tuple[int, int]]:
    """n (a, b) pairs for the universal family, deterministic."""
    out = []
    for k in range(n):
        a = ((2 * k + 1) * _KNUTH + 1_013_904_223) % MOD
        b = ((k + 1) * 2_246_822_519 + 374_761_393) % MOD
        out.append((a if a != 0 else 1, b))
    return out


def safe_seq1(m: str) -> str:
    """Spark SQL: ascending index sequence ``[1..m]`` that is EMPTY when
    ``m`` < 1 and NULL when ``m`` is NULL.

    A bare ``sequence(1, m)`` DESCENDS for m <= 0 (``sequence(1, 0)`` is
    ``[1, 0]``), feeding downstream ``slice``/``substring`` a zero or
    negative index — ``slice`` throws (killing the whole job on ONE short
    document) and ``substring`` silently reads from the string's END.
    DuckDB's ``range(1, m+1)`` is empty for m < 1, so the guard is also
    what keeps gram/shingle builders oracle-exact on degenerate inputs
    (empty text, docs shorter than the gram width).

    Type contract: ``m`` must be an INT- or BIGINT-typed expression
    (every current call site is length/size arithmetic, which is INT).
    The NULL branch hard-codes ARRAY<INT>; for a BIGINT ``m`` the
    sequence branch produces array<bigint> and correctness then relies
    on Catalyst's implicit if-branch widening to array<bigint>. Don't
    pass fractional/decimal expressions — cast to INT first."""
    return (
        f"if(({m}) IS NULL, CAST(NULL AS ARRAY<INT>),"
        f" slice(sequence(1, greatest({m}, 1)), 1, greatest({m}, 0)))"
    )


def spark_poly_hash(col: str, base: int = BASE_A, mod: int = MOD) -> str:
    """Spark SQL: polynomial hash of string expression ``col``.

    Lambda variables are deliberately obscure (``ph_i``/``ph_a``/``ph_x``)
    so callers can nest these builders inside their own lambdas without
    variable capture (``col`` may reference an outer lambda's variable).
    """
    return (
        f"aggregate(transform({safe_seq1(f'length({col})')},"
        f" ph_i -> ascii(substring({col}, ph_i, 1))),"
        f" CAST(0 AS BIGINT), (ph_a, ph_x) -> (ph_a * {base} + ph_x) % {mod})"
    )


def duck_poly_hash(col: str, base: int = BASE_A, mod: int = MOD) -> str:
    """DuckDB SQL: same polynomial hash (verified identical to Spark's).

    NULL input caveat: the two dialects DISAGREE on a NULL ``col`` —
    Spark's hash NULL-propagates (safe_seq1 → NULL array → NULL), but
    DuckDB's ``range(1, NULL)`` is an EMPTY list, so this expression
    folds to the seed **0**. Callers hashing a nullable column must
    either filter NULLs first (what every text-hashing query does) or
    branch on ``col IS NULL`` explicitly in BOTH dialects — a coalesce
    around the hash is NOT equivalent (found by the null-injection sweep
    on dedup_canonical_by_priority's source priority, round 10)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, length({col})+1),"
        f" ph_i -> ascii(substring({col}, ph_i, 1)))),"
        f" (ph_a, ph_x) -> (ph_a * {base} + ph_x) % {mod})"
    )


def spark_hash64(col: str) -> str:
    """Spark SQL: ~60-bit hash by combining two independent polynomial
    hashes (bases 31 and 131): h1 + h2 * 2^30. Used where single-mod-P
    bits are too few (SimHash bit sampling)."""
    h1 = spark_poly_hash(col, BASE_A)
    h2 = spark_poly_hash(col, BASE_B)
    return f"(({h1}) + ({h2}) * CAST(1073741824 AS BIGINT))"


def duck_hash64(col: str) -> str:
    h1 = duck_poly_hash(col, BASE_A)
    h2 = duck_poly_hash(col, BASE_B)
    return f"(({h1}) + ({h2}) * CAST(1073741824 AS BIGINT))"
