"""Mergeable sketches for crawl-scale cardinality and frequency.

HyperLogLog (Flajolet/Fusy/Gandouet/Meunier, AofA 2007) and Count-Min
(Cormode & Muthukrishnan, J. Algorithms 2005) recast as pure Catalyst
aggregations — the two telemetry primitives a 10^10-URL frontier needs
that the reference gets "for free" from exact in-memory Python sets
(reference break_checker.py:1319-1421 tracks visited/extracted via
``set``/``len``; at 100 TB that becomes a distinct-count and a
heavy-hitter problem):

* ``hll_registers`` / ``hll_estimate`` — per-key distinct-count
  sketch. The shuffle after the map-side ``max`` combine carries at
  most ``m = 2**p`` (key, register, rho) rows per key regardless of
  input size, so distinct-URLs-per-host over a 100 TB crawl never
  shuffles raw URLs. Registers merge associatively: unioning two
  register tables and re-taking ``max(rho)`` equals the sketch of the
  unioned inputs (property pinned by test), which is what lets daily
  sketches roll up into monthly ones without touching the raw data.
* ``cms_table`` / ``cms_lookup`` — a d×w counter matrix over
  md5-derived row hashes. ``count`` partial-aggregates map-side, so
  the shuffle carries at most d·w rows total; the counter table is
  then broadcast for lookups (≤ d·w rows by construction — the
  defining property of the sketch). Estimates are deterministic
  overestimates (min over the d rows).

Both families derive their hashes from md5 hex prefixes rather than
xxhash64 so the DuckDB oracle can rebuild the exact registers and
counters — determinism beats speed under the correctness gate, the
same trade the MinHash family in dedup.py documents. Swap the hash
for production throughput; every downstream shape is hash-agnostic.

Float discipline for the hash gate: every non-integer quantity in the
HLL estimator is either dyadic-exact (``sum(1/2^rho)`` — each term and
the ≤ m-term sum are exactly representable doubles) or a single
libm ``ln`` rounded to 4 decimals on both sides, so Spark and DuckDB
agree bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 10  # 2**10 = 1024 registers: ~3.25% standard error
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _hex_word(h: Column, start: int) -> Column:
    """8 hex chars of an md5 column as an unsigned 32-bit value (long)."""
    return F.conv(F.substring(h, start, 8), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str, p: int = HLL_P
) -> DataFrame:
    """Per-key HLL register table: (*key_cols, reg, rho).

    reg = first 32-bit md5 word mod m; rho = 1 + leading-zero count of
    the second 32-bit word (33 when the word is 0). Identical values
    collapse to identical (reg, rho), so the ``max`` aggregation is
    insensitive to duplication — the whole point of the sketch.
    """
    m = 1 << p
    h = F.md5(F.col(value_col).cast("string"))
    # 33 - bit_length(w): bin() drops leading zeros, so the remaining
    # length IS the bit length; lpad pins the w=0 edge to length 0.
    staged = df.select(
        *key_cols,
        (_hex_word(h, 1) % m).alias("reg"),
        _hex_word(h, 9).alias("_w"),
    ).withColumn(
        "rho",
        F.lit(33)
        - F.length(F.expr("trim(LEADING '0' FROM lpad(bin(_w), 32, '0'))")),
    )
    return staged.groupBy(*key_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (same key/p): union + re-max.

    This is the roll-up path: per-day sketches → per-month sketch
    without revisiting raw data.
    """
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c not in ("rho",)]
    return merged.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, key_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per key: (*key_cols, n_zero_regs, hll_estimate).

    Standard HLL estimator with the small-range (linear counting)
    correction: E = alpha_m * m^2 / Z; if E <= 2.5m and V > 0 then
    E = m * ln(m / V), V = count of never-touched registers.
    """
    m = 1 << p
    # evaluated in Python IEEE doubles; the oracle spells out the same
    # operation sequence so both sides land on the identical double
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    agg = registers.groupBy(*key_cols).agg(
        # 1/2^rho via integer shift then one exact division — dyadic,
        # bit-identical across engines (no pow/exp libm involved)
        F.sum(F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), rho)")).alias(
            "_z1"
        ),
        (F.lit(m) - F.count(F.lit(1))).alias("n_zero_regs"),
    )
    raw = F.lit(alpha_m2) / (F.col("_z1") + F.col("n_zero_regs").cast("double"))
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero_regs") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero_regs")),
    ).otherwise(raw)
    return agg.select(
        *key_cols,
        "n_zero_regs",
        F.round(corrected, 4).alias("hll_estimate"),
    )


def _cms_buckets(value: Column, d: int, w: int) -> Column:
    """Array of d bucket indices for one value (row i seeds ``i:``)."""
    return F.array(
        *[
            _hex_word(F.md5(F.concat(F.lit(f"{i}:"), value)), 1) % w
            for i in range(d)
        ]
    )


def cms_table(
    df: DataFrame, value_col: str, d: int = CMS_DEPTH, w: int = CMS_WIDTH
) -> DataFrame:
    """Count-Min counter table: (row_i, bucket, cnt), ≤ d·w rows.

    The posexplode multiplies rows d× BEFORE the aggregation, but the
    partial count combines map-side, so the shuffle still carries at
    most d·w rows per input partition — constant in input size.
    """
    v = F.col(value_col).cast("string")
    return (
        df.select(F.posexplode(_cms_buckets(v, d, w)).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    table: DataFrame,
    keys: DataFrame,
    value_col: str,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for each key row: (value_col, cms_estimate).

    The counter table is ≤ d·w rows by construction, so broadcasting
    it is always safe — lookups never shuffle the key side.
    """
    v = F.col(value_col).cast("string")
    probes = keys.select(
        value_col, F.posexplode(_cms_buckets(v, d, w)).alias("row_i", "bucket")
    )
    return (
        probes.join(F.broadcast(table), ["row_i", "bucket"], "inner")
        .groupBy(value_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
