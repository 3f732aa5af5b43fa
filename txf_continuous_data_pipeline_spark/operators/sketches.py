"""Frequency / membership sketches in columnar (table) form.

Production engines treat sketches as opaque binary blobs; here each
sketch IS a small DataFrame of counters or bit positions built from the
engine-wide h60 hash family (operators/dedup.h60) — which makes every
cell value reproducible in ANSI SQL, so even the sketches carry full
value-level oracles (the same property that made the MinHash lanes and
SimHash votes hash-checkable). Row-oriented sketch state also merges
for free: union + groupBy-sum IS the sketch merge.

The streaming twin of the frequency sketch is the Misra-Gries
heavy-hitter fold (streaming/stateful.py), which bounds per-key state;
Count-Min bounds TOTAL state (d*w counters regardless of key count) and
answers point queries with one-sided error: est >= true, and
est <= true + 2N/w with probability 1 - (1/2)^d (Cormode & Muthukrishnan
2005).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h60


def _key_str(col):
    """Sketch key canonicalization: NULL hashes as a reserved NUL-byte
    marker instead of propagating (concat of NULL is NULL, which would
    land in unmatchable NULL buckets - count-min would then
    UNDERestimate null keys and bloom would report false negatives for
    a stored null). A real key cannot contain NUL in these datasets;
    oracle SQL for null-bearing keys must apply the same coalesce."""
    return F.coalesce(col.cast("string"), F.lit("\x00"))


def _lane(col, lane: int):
    """Per-lane hash: h60 over a lane-salted key ("L{i}:" prefix). No
    arithmetic means no int64 overflow under ANSI mode (an affine mix
    of a 60-bit value overflows at multiplier 9), and the SQL mirror is
    just h60 of the same concatenation."""
    return h60(F.concat(F.lit(f"L{lane}:"), _key_str(col)))


def count_min_build(
    df: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch of `key_col` occurrences as a (lane, bucket,
    n) table — depth*width counters total, one groupBy over an
    exploded (lane, bucket) projection. Empty buckets are absent
    (semantically zero). Merging sketches across shards/batches =
    unionByName + groupBy(lane, bucket).sum — no custom state."""
    k = F.col(key_col)
    lanes = F.array(
        *[
            F.struct(
                F.lit(lane).alias("lane"),
                (_lane(k, lane) % F.lit(width)).cast("int").alias("bucket"),
            )
            for lane in range(depth)
        ]
    )
    return (
        df.select(F.explode(lanes).alias("_lb"))
        .groupBy(
            F.col("_lb.lane").alias("lane"),
            F.col("_lb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key's frequency from a count_min_build
    sketch: min over the key's depth counters (absent counter = 0).
    The sketch is depth*width rows at most — always broadcastable, so
    the key side never shuffles."""
    k = F.col(key_col)
    lanes = F.array(
        *[
            F.struct(
                F.lit(lane).alias("lane"),
                (_lane(k, lane) % F.lit(width)).cast("int").alias("bucket"),
            )
            for lane in range(depth)
        ]
    )
    probed = keys.select(
        F.col(key_col), F.explode(lanes).alias("_lb")
    ).select(
        key_col,
        F.col("_lb.lane").alias("lane"),
        F.col("_lb.bucket").alias("bucket"),
    )
    return (
        probed.join(F.broadcast(sketch), ["lane", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
    )


def bloom_build(
    df: DataFrame,
    *,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 4096,
) -> DataFrame:
    """Bloom filter as a table of SET bit positions (distinct ints in
    [0, n_bits)) — the columnar form of the bit array. Build is one
    explode + distinct; merge across shards is a union + distinct."""
    k = F.col(key_col)
    bits = F.array(
        *[
            (_lane(k, lane) % F.lit(n_bits)).cast("int")
            for lane in range(n_hashes)
        ]
    )
    return (
        df.select(F.explode(bits).alias("bit")).distinct()
    )


def bloom_contains(
    bloom: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    n_hashes: int = 5,
    n_bits: int = 4096,
) -> DataFrame:
    """Membership probe: a key 'may be present' iff ALL its bit
    positions are set — no false negatives, false-positive rate
    ~ (1 - e^(-kn/m))^k. The bit table (<= n_bits rows) broadcasts;
    the probe side aggregates a hit count per key."""
    # dedupe probe keys FIRST: a duplicated key would contribute
    # 2*n_hashes matched rows and fail the == n_hashes test below -
    # a false negative on a true member (fact-side probe frames carry
    # duplicates by nature)
    k = F.col(key_col)
    bits = F.array(
        *[
            (_lane(k, lane) % F.lit(n_bits)).cast("int")
            for lane in range(n_hashes)
        ]
    )
    probed = keys.select(key_col).distinct().select(
        F.col(key_col), F.explode(bits).alias("bit")
    )
    marked = probed.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(key_col).agg(
        (F.count(F.when(F.col("_set").isNotNull(), 1)) == F.lit(n_hashes))
        .alias("may_contain")
    )


def hll_build(
    df: DataFrame,
    *,
    key_col: str,
    p: int = 9,
) -> DataFrame:
    """HyperLogLog register table from the h60 family: bucket = low p
    bits of h60(key), register = position of the highest set bit in
    the remaining 60-p bits (rho = (60-p) - bitlength(w) + 1, with the
    all-zeros window taking the max rho). One groupBy(bucket).max —
    and because rho derives from integer/bin-string ops (no floating
    log2, whose libm rounding could differ across engines), EVERY
    register value is reproducible in oracle SQL. This makes the
    engine's approximate-distinct family value-checkable end to end,
    unlike the built-in HLL++ sketch (approx_count_distinct), which is
    rows-only forever.

    Merge across shards/batches = unionByName + groupBy(bucket).max —
    the HLL merge IS max, no custom state.
    """
    wbits = 60 - p
    h = h60(_key_str(F.col(key_col)))
    bucket = (h % F.lit(1 << p)).cast("int")
    w = F.shiftright(h, p)
    rho = F.when(w == F.lit(0), F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(sketch: DataFrame, *, p: int = 9) -> DataFrame:
    """Cardinality estimate from an hll_build register table: the
    classic alpha_m * m^2 / sum(2^-rho) harmonic mean with the
    small-range linear-counting correction (empty buckets are absent
    rows = register 0). One driver-free aggregate -> 1-row frame."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.agg(
        # coalesce: an EMPTY register table (empty input) must estimate
        # 0 via linear counting, not propagate NULL through the math
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("_s") + (F.lit(m) - F.col("_nz"))  # absent buckets: 2^-0
    )
    zeros = F.lit(m) - F.col("_nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(F.round(est).cast("long").alias("n_distinct_est"))


def bottomk_quantile_sketch(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    id_cols: "list[str]",
    k: int = 4096,
    quantiles: "tuple[float, ...]" = (0.50, 0.90, 0.99),
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Mergeable bottom-k quantile sketch (r11 verdict #2: the
    value-checkable replacement for the opaque Greenwald-Khanna
    approx_percentile). Per group, RETAIN the k rows whose h60 over
    the salted row identity ("QS:" || id_cols joined by ':') is
    smallest - a deterministic uniform sample, because h60 rank is
    independent of the value. Compaction IS "keep the k smallest
    hashes", so merging two sketches = union + keep k smallest + sum
    the exact counts: associative, partition-invariant, and - unlike
    KLL, whose compaction depends on arrival order - every retained
    item is re-derivable in ANSI SQL (row_number over h60), which
    upgrades the quantile lane from rows-only to a full value oracle.
    Rank error of the q-quantile from a k-sample is
    ~ n*sqrt(q(1-q)/k) (binomial), vs n/accuracy for GK: k=4096 gives
    <= ~0.8% rank error at p50 - the trade for checkability, pinned
    against the exact percentiles in tests/test_mining.py.

    Scale shape: a naive per-group bottom-k is a full window sort of
    the fact table. Instead a first map-side-combined count pass sizes
    a per-group hash THRESHOLD admitting ~prefilter_margin*k expected
    rows, the fact scan filters on it (scan-side projection, no
    shuffle), and only the ~margin*k survivors per group pay the
    window sort. The filter changes nothing: it keeps every true
    bottom-k row unless fewer than k of n uniform hashes land under a
    threshold whose expectation is margin*k - a Chernoff tail below
    e^-1000 at k=4096, and deterministically verified against the
    unfiltered form in tests (the threshold is data-dependent only
    through the exact group count, so the result is a pure function
    of the input).

    Output: one row per group - group_col, n_rows (exact), n_retained,
    retained_h_lo / retained_h_hi (BIGINT checksums over the retained
    set's hashes - the low and high 30 bits summed separately, so the
    oracle checks the WHOLE retained set, not just the order
    statistics; each half is <= 4096 * 2^30 < 2^42, safely inside
    float64's 2^53 exact-integer range, because the r12 driver
    rotation proved a single >2^53 DECIMAL(38,0) sum gets corrupted
    asymmetrically by any float coercion in a comparison harness),
    and one p{q}_sketch column per requested
    quantile (the lower empirical quantile of the sample: 1-indexed
    rank greatest(1, ceil(q * n_retained)), value-then-hash ordered so
    ties break identically on every engine)."""
    from pyspark.sql import Window

    ident = F.concat_ws(
        ":", F.lit("QS"), *[F.col(c).cast("string") for c in id_cols]
    )
    h = h60(ident)
    val = F.col(value_col)
    hashed = df.select(
        F.col(group_col), val.alias("_v"), h.alias("_h")
    )
    counts = hashed.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    # double threshold: only a FILTER margin (any ulp slop is absorbed
    # by prefilter_margin), never part of the retained-set definition
    thr = F.least(
        F.lit(float(1 << 60)),
        F.lit(float(prefilter_margin * k) * float(1 << 60))
        / F.col("n_rows").cast("double"),
    )
    survivors = hashed.join(
        F.broadcast(counts.select(group_col, thr.alias("_thr"))),
        group_col,
    ).where(F.col("_h").cast("double") < F.col("_thr"))
    w_h = Window.partitionBy(group_col).orderBy("_h", "_v")
    retained = (
        survivors.withColumn("rn", F.row_number().over(w_h))
        .where(F.col("rn") <= k)
        .drop("rn", "_thr")
    )
    w_v = Window.partitionBy(group_col).orderBy("_v", "_h")
    ranked = retained.withColumn(
        "vr", F.row_number().over(w_v)
    ).withColumn(
        "_ns",
        F.count(F.lit(1)).over(Window.partitionBy(group_col)),
    )
    stats = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.sum(F.col("_h").bitwiseAND(F.lit((1 << 30) - 1)))
        .cast("long")
        .alias("retained_h_lo"),
        F.sum(F.shiftright(F.col("_h"), 30)).cast("long").alias("retained_h_hi"),
        *[
            F.max(
                F.when(
                    F.col("vr")
                    == F.greatest(
                        F.lit(1),
                        F.ceil(
                            F.lit(float(q)) * F.col("_ns")
                        ).cast("int"),
                    ),
                    F.col("_v"),
                )
            ).alias(f"p{int(round(q * 100))}_sketch")
            for q in quantiles
        ],
    )
    return stats.join(F.broadcast(counts), group_col)
