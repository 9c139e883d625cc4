"""Join utilities for scale-hostile join shapes (SURVEY §7.4 toolbox).

Three deterministic rewrites of joins that melt down at 100 TB if
expressed naively, each row-identical to the plain join it replaces:

* `salted_join` — hot-key skew. AQE's skew-join splitting
  (`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles
  most skew at runtime, but it only splits the PROBE side of a
  sort-merge join. When one key dominates a shuffle so badly that a
  single task owns it end-to-end, explicit salting spreads the fact
  side's hot key over N sub-keys and replicates the dimension side N
  times, so the join work for one key lands on N tasks.
* `range_bin_join` — point-in-interval predicates. Catalyst plans
  `l.ts BETWEEN r.lo AND r.hi` as a broadcast-nested-loop (or worse,
  cartesian) join because there is no equality to hash on; binning
  manufactures one (the Databricks range-join-hint technique, done by
  hand): each point lands in exactly one fixed-width bin, each interval
  explodes into the bins it covers, and the join becomes a plain
  shuffled equi-join on (keys…, bin) + a residual BETWEEN filter.
* `bloom_prefilter_join` — shuffling a huge probe side to meet a
  selective build side. A deterministic Bloom bitmap of the build keys
  (the runtime-filter / DPP idea, as an explicit operator) is built as
  a ≤ m/64-row (word_index, bits) relation and broadcast; the probe
  side drops definitely-unmatched rows BEFORE its shuffle, paying k
  in-memory hash probes per row instead of shipping the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_cols: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, salted into `salts` sub-keys.

    `salt_cols` are fact-side columns whose hash spreads rows of a hot
    join key across tasks (use the fact's primary key: deterministic and
    uniform). The dim side is replicated `salts` times — keep it the
    smaller relation. Result is row-identical to the plain join: every
    fact row meets every matching dim row exactly once, because each
    fact row carries ONE salt value and the dim carries ALL of them.
    """
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"{_SALT} column already present")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salts))
    )
    dim_s = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return fact_s.join(dim_s, on=[*on, _SALT], how=how).drop(_SALT)


_BIN = "__bin"


def range_bin_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    on: list[str] | None = None,
    bin_width: int = 3_600_000_000,
) -> DataFrame:
    """Inner-join `left` rows to the `right` intervals containing them:
    ``left.point BETWEEN right.lo AND right.hi`` (AND equality on `on`),
    planned as a hash-partitioned EQUI-join instead of the
    nested-loop/cartesian Catalyst produces for a bare range predicate.

    `point`, `lo`, `hi` name integer columns (use `unix_micros(ts)` for
    timestamps; `bin_width` defaults to one hour in microseconds). Each
    left row computes its single bin `point div bin_width`; each right
    interval explodes into the `(hi - lo) / bin_width + 1` bins it
    covers (keep bin_width within ~1-2 orders of magnitude of the
    typical interval length — the explode factor is the knob). Because
    a point lies in exactly ONE bin and an interval emits each covered
    bin ONCE, every matching (left, right) pair meets exactly once: no
    post-join dedup, row-identical to the plain range join.

    At 100 TB this is the difference between a shuffle on
    (keys…, bin) — partitionable, AQE-splittable, skew-saltable — and a
    broadcast-nested-loop join that compares every left row against
    every right interval per key.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    on = list(on or [])
    for df in (left, right):
        if _BIN in df.columns:
            raise ValueError(f"{_BIN} column already present")
    lhs = left.withColumn(_BIN, F.expr(f"{point} div {bin_width}L"))
    rhs = right.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.expr(f"{lo} div {bin_width}L"),
                F.expr(f"{hi} div {bin_width}L"),
            )
        ),
    )
    return (
        lhs.join(rhs, on=[*on, _BIN], how="inner")
        .where(F.col(point).between(F.col(lo), F.col(hi)))
        .drop(_BIN)
    )


def bloom_bitmap(
    small: DataFrame, on: list[str], m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Deterministic Bloom filter of `small`'s `on`-key set as a sparse
    ``(__widx, __word)`` relation (word_index → 64 bits), at most
    ``m_bits / 64`` rows regardless of key cardinality — that bound is
    the whole point: an exact distinct-key set can exceed broadcast
    limits, the bitmap cannot. Bit positions are
    ``pmod(xxhash64(keys…, seed_i), m_bits)`` for seeds 0..k-1, so the
    same keys always light the same bits (replayable in a pytest from
    the formula). One shuffle of the SMALL side into ≤ m_bits/64
    groups; the big side is untouched here.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    pos = small.select(*on).na.drop().select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(*[F.col(c) for c in on], F.lit(i)),
                        F.lit(m_bits),
                    )
                    for i in range(k)
                ]
            )
        ).alias("__pos")
    )
    return pos.groupBy(F.expr("__pos div 64").alias("__widx")).agg(
        F.expr(
            "bit_or(shiftleft(cast(1 as bigint),"
            " cast(__pos % 64 as int)))"
        ).alias("__word")
    )


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, pre-filtering `big` through a
    broadcast Bloom bitmap of `small`'s keys so rows that CANNOT match
    never enter the join's shuffle (Spark's runtime-filter /
    dynamic-partition-pruning idea as an explicit, deterministic
    operator — `bloom_filter_agg` itself is not in the public registry).

    Probe = k broadcast hash-join lookups of the ≤ m_bits/64-row word
    table plus a bitwise test, all JVM-side, zero added shuffles on
    `big`. False positives only cost the probe row a ride to the real
    join (which then drops it) — the result is row-identical to the
    plain join; expected FP rate is (1 - e^(-k·n/m))^k. Only join kinds
    where dropping non-matching probe rows is sound are allowed:
    inner and left_semi.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom prefilter is unsound for how={how!r}")
    words = bloom_bitmap(small, on, m_bits=m_bits, k=k)
    return bloom_prefilter(big, words, on, m_bits=m_bits, k=k).join(
        small, on=on, how=how
    )


def bloom_prefilter(
    big: DataFrame,
    words: DataFrame,
    on: list[str],
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """`big` minus the rows whose `on`-keys definitely miss the
    `bloom_bitmap(...)` relation `words` (same m_bits/k as the build).
    May keep false positives, never drops a true match. Exposed so the
    prune rate is measurable and the filter reusable across several
    joins against the same build side."""
    filtered = big
    keep = F.lit(True)
    for i in range(k):
        widx, word, p = f"__widx_{i}", f"__word_{i}", f"__p_{i}"
        filtered = filtered.withColumn(
            p,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in on], F.lit(i)),
                F.lit(m_bits),
            ),
        ).join(
            F.broadcast(
                words.select(
                    F.col("__widx").alias(widx), F.col("__word").alias(word)
                )
            ),
            F.expr(f"{p} div 64") == F.col(widx),
            "left",
        )
        keep = keep & F.expr(
            f"({word} & shiftleft(cast(1 as bigint),"
            f" cast({p} % 64 as int))) != 0"
        )
    return filtered.where(keep).drop(
        *[c for i in range(k) for c in (f"__widx_{i}", f"__word_{i}", f"__p_{i}")]
    )
