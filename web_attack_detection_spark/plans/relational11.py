"""Behavioral sequence analytics: Markov transition matrices over
per-user event streams.

The transition matrix P(next event type | current event type) is the
workhorse behavioral model in attack detection — bots and scripted
attacks have sharply different transition structure from humans
(e.g. error->error loops, view->purchase never). It composes with
ml_anomaly_zscore (value outliers) and ml_psi_drift (distribution
drift) into the monitoring triptych: values, distributions,
SEQUENCES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_attack_detection_spark.io.sources import load_table
from web_attack_detection_spark.plans.registry import register

# Ordering within a user is (ts, event_id) — event_id breaks timestamp
# ties deterministically, so the lag pairing is engine-identical.
_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
row_tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type,
       CAST(t.n AS BIGINT) AS n,
       ROUND(t.n / (1.0 * r.tot), 6) AS p
FROM trans t JOIN row_tot r USING (from_type)
"""


@register(
    "rel_markov_transitions",
    _MARKOV_ORACLE,
    doc="per-user event-type Markov transition matrix (lag window + row-normalize)",
)
def rel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: within
    each user's event stream (ordered by ts with event_id tie-break),
    pair every event with its predecessor via one lag window, count
    (from, to) transitions, and row-normalize into conditional
    probabilities. One window partitioned BY USER (shuffles on
    user_id, sorts only within each user's slice — no global sort),
    one groupBy over |types|^2 = 25 cells with map-side combine, and
    the row totals broadcast back. Counts exact BIGINT; each
    probability is one division + round. At 100 TB this is the
    sessionized shape: the window partition key becomes (user_id,
    session_id) from rel_sessionize and nothing else changes."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_tot = trans.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    return trans.join(F.broadcast(row_tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / (1.0 * F.col("tot")), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# sequence motifs: most frequent event-type trigrams across user streams
# ---------------------------------------------------------------------------

_MOTIFS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS p1,
         LAG(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT p2 || '>' || p1 || '>' || event_type AS motif, COUNT(*) AS n
  FROM seq WHERE p2 IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT motif, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY n DESC, motif ASC) AS rank
  FROM tri
)
SELECT motif, n, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 15
"""


@register(
    "rel_sequence_motifs",
    _MOTIFS_ORACLE,
    doc="top-15 event-type trigram motifs over per-user ordered streams",
)
def rel_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 sequence mining on top of rel_markov_transitions'
    ordering: the most frequent event-type TRIGRAMS across all user
    streams — the signature patterns a rules engine turns into
    detections (error>error>error = brute force; view>view>purchase =
    normal funnel). Two lags in ONE window pass (same partition/sort,
    zero extra shuffle vs the Markov matrix), a groupBy over at most
    |types|^3 = 125 cells, and a 15-row deterministic top-k
    (count desc, motif asc). Counts exact BIGINT throughout."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    tri = seq.groupBy(
        F.concat_ws(">", "p2", "p1", "event_type").alias("motif")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rw = Window.orderBy(F.col("n").desc(), F.col("motif").asc())
    return (
        tri.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= 15)
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on the daily error-rate series
# ---------------------------------------------------------------------------

# Deviation of day d from the global rate, cross-multiplied to stay
# integer: dev_d = err_d * N - n_d * E  (E = total errors, N = total
# events). CUSUM_t = sum_{d<=t} dev_d; the changepoint estimate is
# argmax |CUSUM| (largest-|value| day, earliest-day tie-break).
_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N, CAST(SUM(n_err) AS BIGINT) AS E FROM daily),
cusum AS (
  SELECT d.day, d.n, d.n_err,
         CAST(SUM(d.n_err * t.N - d.n * t.E) OVER (
           ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cusum_num,
         t.N AS tot_n
  FROM daily d, tot t
),
flagged AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(cusum_num) DESC, day ASC) AS rk
  FROM cusum
)
SELECT strftime(day, '%Y-%m-%d') AS day, n, n_err,
       ROUND(cusum_num / (1.0 * tot_n * tot_n), 6) AS cusum,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
FROM flagged
"""


@register(
    "rel_changepoint_cusum",
    _CUSUM_ORACLE,
    doc="CUSUM changepoint detection on the daily error rate, integer-exact",
)
def rel_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """When did the attack start? CUSUM changepoint detection over
    the daily error-rate series: accumulate each day's deviation from
    the global error rate and flag the day where |CUSUM| peaks — the
    classic sequential changepoint estimator, here as two windows
    over a |days|-row aggregate. The deviation is cross-multiplied
    (err_d*N - n_d*E) so the running sum is exact BIGINT and the
    argmax (earliest-day tie-break) is integer-decided; the reported
    cusum column is normalized by N^2 in one final division. Scale:
    everything after the daily groupBy (map-side combine on ~365 keys
    per year) touches O(days) rows — the detector costs one scan
    regardless of corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )
    # Spark resolution is case-insensitive: a totals column named "N"
    # would collide with daily's "n" after the crossJoin, so the
    # broadcast side uses tot_n / tot_e.
    tot = daily.agg(
        F.sum("n").cast("long").alias("tot_n"),
        F.sum("n_err").cast("long").alias("tot_e"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        "n_err",
        F.sum(F.col("n_err") * F.col("tot_n") - F.col("n") * F.col("tot_e"))
        .over(w)
        .cast("long")
        .alias("cusum_num"),
        "tot_n",
    )
    rw = Window.orderBy(F.abs(F.col("cusum_num")).desc(), F.col("day").asc())
    return (
        cusum.withColumn("rk", F.row_number().over(rw))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "n_err",
            F.round(
                F.col("cusum_num") / (1.0 * F.col("tot_n") * F.col("tot_n")), 6
            ).alias("cusum"),
            F.when(F.col("rk") == 1, 1).otherwise(0).cast("long").alias("is_changepoint"),
        )
    )


# ---------------------------------------------------------------------------
# robust outliers: median absolute deviation, exact in cents
# ---------------------------------------------------------------------------

# Money quantized to BIGINT cents first; both medians are the element
# at ceil(n/2) of the sorted group (rel_percentile_disc's pinned
# rule), so the outlier test |vc - med| > 3*mad is pure integer
# comparison — no float threshold can flip a boundary row.
_MAD_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
r1 AS (
  SELECT event_type, vc,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type, vc AS med_c, n
  FROM r1 WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
),
dev AS (
  SELECT v.event_type, ABS(v.vc - m.med_c) AS d, m.med_c, m.n
  FROM v JOIN med m USING (event_type)
),
r2 AS (
  SELECT event_type, d, med_c, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM dev
),
mad AS (
  SELECT event_type, d AS mad_c
  FROM r2 WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
)
SELECT d.event_type,
       CAST(MAX(d.n) AS BIGINT) AS n,
       ROUND(MAX(d.med_c) / 100.0, 2) AS median_value,
       ROUND(MAX(ma.mad_c) / 100.0, 2) AS mad_value,
       CAST(SUM(CASE WHEN d.d > 3 * ma.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad ma USING (event_type)
GROUP BY d.event_type
"""


@register(
    "rel_mad_outliers",
    _MAD_ORACLE,
    doc="median-absolute-deviation outlier census per event type, integer-exact",
)
def rel_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: the MAD outlier rule |x - median| >
    3*MAD, the estimator that doesn't break when the outliers
    themselves inflate the spread (ml_anomaly_zscore's mean/stddev
    do). Values quantize to BIGINT cents, both medians use the pinned
    element-at-ceil(n/2) rank rule, and the outlier predicate is an
    integer comparison — engine-identical down to boundary rows.
    Plan: two ranked windows per group plus one broadcast-back join;
    at 100 TB the same medians come from a pre-aggregated cents
    histogram (the value domain is small) with identical downstream
    arithmetic."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    w1 = Window.partitionBy("event_type").orderBy("vc")
    cw = Window.partitionBy("event_type")
    r1 = v.select(
        "event_type",
        "vc",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    med = r1.filter(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long")).select(
        "event_type", F.col("vc").alias("med_c"), "n"
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("vc") - F.col("med_c")).alias("d"), "med_c", "n"
    )
    w2 = Window.partitionBy("event_type").orderBy("d")
    r2 = dev.withColumn("rn", F.row_number().over(w2))
    mad = r2.filter(F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long")).select(
        "event_type", F.col("d").alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("med_c") / 100.0, 2).alias("median_value"),
            F.round(F.max("mad_c") / 100.0, 2).alias("mad_value"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing as an exact integer recurrence
# ---------------------------------------------------------------------------

# ewma_1 = x_1; ewma_t = floor((3*ewma_{t-1} + x_t) / 4)  (alpha=1/4).
# A true sequential recurrence — NOT expressible as a window sum —
# kept engine-exact by staying in integers: floor division each step
# means no float error can accumulate across the series. DuckDB walks
# it with a recursive CTE; Spark folds the ordered series with the
# aggregate() higher-order function (the series is O(days), one row
# per day — the fold is driver-free and stays in the JVM).
_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
),
ew AS (
  SELECT rn, day, x, x AS ewma FROM idx WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day, d.x, (3 * e.ewma + d.x) // 4
  FROM ew e JOIN idx d ON d.rn = e.rn + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, x AS n_err,
       CAST(ewma AS BIGINT) AS ewma,
       CAST(CASE WHEN 2 * x > 3 * ewma THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM ew
"""


@register(
    "rel_ewma_recursive",
    _EWMA_ORACLE,
    doc="integer EWMA recurrence over the daily error series (recursive CTE vs fold)",
)
def rel_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing of the daily error count —
    the monitor baseline that CUSUM's global-rate assumption can't
    give you. The recurrence ewma_t = floor((3*ewma_{t-1} + x_t)/4)
    is inherently sequential (each value depends on the previous
    OUTPUT, not a window of inputs), the class of computation that
    breaks naive SQL translation; it stays engine-exact because every
    step is integer floor arithmetic. Spark folds the day-ordered
    series with aggregate() over a collected O(days) array — the
    heavy distributed work is the daily groupBy; the fold itself
    touches ~365 values per year and runs as one JVM expression.
    Spike flag: x_t > 1.5x its smoothed level, cross-multiplied."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.col("ts")).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("x")
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("ser")
    )
    folded = series.select(
        F.col("ser"),
        F.aggregate(
            F.col("ser"),
            F.array().cast("array<bigint>"),
            lambda acc, it: F.concat(
                acc,
                F.array(
                    F.when(F.size(acc) == 0, it["x"]).otherwise(
                        ((F.lit(3) * F.element_at(acc, -1) + it["x"]) / 4).cast(
                            "long"
                        )
                    )
                ),
            ),
        ).alias("ewmas"),
    )
    rows = folded.select(
        F.posexplode(F.arrays_zip(F.col("ser"), F.col("ewmas"))).alias("i", "z")
    ).select(
        F.col("z.ser.day").alias("day"),
        F.col("z.ser.x").alias("n_err"),
        F.col("z.ewmas").alias("ewma"),
    )
    return rows.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_err",
        F.col("ewma").cast("long"),
        F.when(2 * F.col("n_err") > 3 * F.col("ewma"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_spike"),
    )


# ---------------------------------------------------------------------------
# half-sample confidence interval for the error rate (deterministic)
# ---------------------------------------------------------------------------

# B = 16 half-samples; membership of user u in replicate b is bit b of
# the Knuth-hashed user id — pinned integer arithmetic, so the same
# users land in the same replicates in every engine. Each replicate
# rate is floor-scaled to BIGINT micro-units BEFORE the moment sums,
# so mean and variance numerators are exact integers; only sqrt and
# the final rounding touch floats (on identical inputs).
_HALF_CI_B = 16

_HALF_CI_ORACLE = f"""
WITH h AS (
  SELECT event_type, user_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
         (user_id * 2654435761) % 4294967296 AS hu
  FROM events
),
mem AS (
  SELECT e.event_type, b.b, e.is_err
  FROM h e, (SELECT UNNEST(range(0, {_HALF_CI_B})) AS b) b
  WHERE ((hu >> CAST(b.b AS INTEGER)) & 1) = 1
),
reps AS (
  SELECT event_type, b,
         CAST(SUM(is_err) * 1000000 // COUNT(*) AS BIGINT) AS r_scaled
  FROM mem GROUP BY event_type, b
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(r_scaled) AS BIGINT) AS s1,
         CAST(SUM(r_scaled * r_scaled) AS BIGINT) AS s2
  FROM reps GROUP BY event_type
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(is_err) AS BIGINT) AS n_err
  FROM h GROUP BY event_type
)
SELECT t.event_type, t.n,
       ROUND(t.n_err / (1.0 * t.n), 6) AS rate,
       ROUND((m.s1 / (1.0 * m.nb)
              - 2 * sqrt((m.nb * m.s2 - m.s1 * m.s1) / (1.0 * m.nb * m.nb)))
             / 1000000.0, 6) AS ci_lo,
       ROUND((m.s1 / (1.0 * m.nb)
              + 2 * sqrt((m.nb * m.s2 - m.s1 * m.s1) / (1.0 * m.nb * m.nb)))
             / 1000000.0, 6) AS ci_hi
FROM tot t JOIN mom m USING (event_type)
"""


@register(
    "rel_halfsample_ci",
    _HALF_CI_ORACLE,
    doc="deterministic half-sample CI for per-type error rates (16 hash-bit replicates)",
)
def rel_halfsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How sure are we about that error rate? A resampling confidence
    interval WITHOUT randomness: replicate b contains the users whose
    Knuth-hash bit b is set (16 deterministic half-samples — the
    random-group/half-sample method survey statisticians used before
    the bootstrap, and the only resampling scheme that is bit-exact
    across engines and reruns). Each replicate's rate floor-scales to
    integer micro-units before the moment sums, so the across-replicate
    mean and variance numerators are exact BIGINT; the interval is
    mean +/- 2 sd. Scale: the membership explode is x16 map-side on a
    projected two-column stream, then everything is two tiny groupBys
    — and replicate moments merge across partitions/days like any
    sketch. A user-level resample (all of a user's events move
    together) is the clustered-bootstrap analogue a correlated event
    stream needs."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        ((F.col("user_id") * 2654435761) % 4294967296).alias("hu"),
    )
    b = spark.range(_HALF_CI_B).select(F.col("id").cast("int").alias("b"))
    mem = e.crossJoin(F.broadcast(b)).filter(F.expr("(hu >> b) & 1 = 1"))
    reps = mem.groupBy("event_type", "b").agg(
        F.floor(F.sum("is_err") * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("r_scaled")
    )
    mom = reps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("r_scaled").cast("long").alias("s1"),
        F.sum(F.col("r_scaled") * F.col("r_scaled")).cast("long").alias("s2"),
    )
    tot = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_err").cast("long").alias("n_err"),
    )
    sd = F.sqrt(
        (F.col("nb") * F.col("s2") - F.col("s1") * F.col("s1"))
        / (1.0 * F.col("nb") * F.col("nb"))
    )
    mean = F.col("s1") / (1.0 * F.col("nb"))
    return tot.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "n",
        F.round(F.col("n_err") / (1.0 * F.col("n")), 6).alias("rate"),
        F.round((mean - 2 * sd) / 1000000.0, 6).alias("ci_lo"),
        F.round((mean + 2 * sd) / 1000000.0, 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit of order totals
# ---------------------------------------------------------------------------

# Benford probabilities log10(1+1/d) pinned as 1e6-scaled literals
# (they sum to exactly 1_000_000), so no engine evaluates a log —
# both sides compare against the same nine integers. Digits come from
# exact cents (x100 never changes the leading digit); the chi-squared
# numerator squares ~1e10 values, hence DECIMAL(38,0)/HUGEINT.
_BENFORD_P = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(LEFT(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1)
              AS BIGINT) AS digit
  FROM orders
),
obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM obs),
terms AS (
  SELECT o.digit, o.n, t.nn,
         CAST({_BENFORD_CASE_SQL} AS BIGINT) AS p_scaled
  FROM obs o, tot t
)
SELECT digit, n,
       (nn * p_scaled // 10000) / 100.0 AS expected_n,
       ROUND(CAST(CAST(n AS HUGEINT) * 1000000 - CAST(nn AS HUGEINT) * p_scaled AS HUGEINT)
             * CAST(CAST(n AS HUGEINT) * 1000000 - CAST(nn AS HUGEINT) * p_scaled AS HUGEINT)
             / (1000000.0 * nn * p_scaled * 1000000.0), 6) AS chi2_term
FROM terms
"""


@register(
    "rel_benford_digits",
    _BENFORD_ORACLE,
    doc="Benford first-digit audit of order totals with pinned log10 literals",
)
def rel_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forensic accountant's screen: does the first digit of
    order totals follow Benford's law? Fabricated amounts don't. The
    nine expected frequencies are PINNED 1e6-scaled integer literals
    (summing to exactly 1e6) — neither engine evaluates log10, so the
    expectation is identical by construction; digits come from exact
    cents (scaling by 100 preserves the leading digit and dodges the
    cast-rounding divergence between engines); expected counts use
    integer FLOOR division to hundredths — a ROUND here landed on an
    exact .5 boundary that the two engines break differently. Each
    digit's
    chi-squared term keeps its numerator in DECIMAL(38,0) — (n*1e6 -
    N*p)^2 reaches ~1e20 — with ONE final division. One groupBy over
    nine cells; the audit costs a single scan at any scale."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("nn"))
    p_map = F.create_map(
        *[F.lit(x) for kv in _BENFORD_P.items() for x in kv]
    )
    dec = "decimal(38,0)"
    terms = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        "nn",
        p_map[F.col("digit")].cast("long").alias("p_scaled"),
    )
    num = (
        F.col("n").cast(dec) * 1000000 - F.col("nn").cast(dec) * F.col("p_scaled")
    ).cast(dec)
    return terms.select(
        "digit",
        "n",
        (
            F.floor(F.col("nn") * F.col("p_scaled") / 10000).cast("long") / 100.0
        ).alias("expected_n"),
        F.round(
            (num * num)
            / (1000000.0 * F.col("nn") * F.col("p_scaled") * 1000000.0),
            6,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# largest-remainder (Hamilton) allocation of a fixed sample budget
# ---------------------------------------------------------------------------

_LR_SLOTS = 10000

_LR_ORACLE = f"""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM counts),
quota AS (
  SELECT c.event_type, c.n,
         CAST({_LR_SLOTS} * c.n // t.nn AS BIGINT) AS base,
         CAST(({_LR_SLOTS} * c.n) % t.nn AS BIGINT) AS rem
  FROM counts c, tot t
),
leftover AS (
  SELECT CAST({_LR_SLOTS} - SUM(base) AS BIGINT) AS l FROM quota
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type ASC) AS rk
  FROM quota
)
SELECT r.event_type, r.n, r.base,
       CAST(CASE WHEN r.rk <= lo.l THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(r.base + CASE WHEN r.rk <= lo.l THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked r, leftover lo
"""


@register(
    "rel_largest_remainder",
    _LR_ORACLE,
    doc=f"Hamilton largest-remainder allocation of {_LR_SLOTS} slots across event types",
)
def rel_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a FIXED sample budget across strata so the total
    comes out exact: floor quotas first, then the leftover slots go
    to the largest remainders (Hamilton's method — the apportionment
    rule every quota sampler, shard balancer, and survey design
    reimplements). Rounding each stratum independently would over- or
    under-shoot the budget; here base = slots*n//N and remainder
    ranking are pure integer ops, so the allocation sums to exactly
    {_LR_SLOTS} in every engine. Composes with pipe_mixture_schedule
    (which needs per-source integer quotas). Plan note: the audit
    counts several exchanges here, but every one after the first
    groupBy moves a |types|-row (five-row) relation — quota, leftover
    scalar, remainder ranking; only the initial count scans data."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("nn"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        F.floor(_LR_SLOTS * F.col("n") / F.col("nn")).cast("long").alias("base"),
        ((_LR_SLOTS * F.col("n")) % F.col("nn")).cast("long").alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(_LR_SLOTS) - F.sum("base")).cast("long").alias("l")
    )
    rw = Window.orderBy(F.col("rem").desc(), F.col("event_type").asc())
    ranked = quota.withColumn("rk", F.row_number().over(rw))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "event_type",
        "n",
        "base",
        F.when(F.col("rk") <= F.col("l"), 1).otherwise(0).cast("long").alias("extra"),
        (
            F.col("base") + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# forecast-baseline evaluation: seasonal-naive vs naive-1 (MASE)
# ---------------------------------------------------------------------------

# Forecast for day t is the value 7 days back (seasonal naive); the
# benchmark denominator is the one-step naive walk. MASE = MAE_s/MAE_1
# stays a ratio of two exact BIGINT absolute-error sums (counts
# cancel via cross-multiplication into the final division).
_MASE_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
lagged AS (
  SELECT day, n,
         LAG(n, 7) OVER (ORDER BY day) AS n_wk,
         LAG(n, 1) OVER (ORDER BY day) AS n_1
  FROM daily
),
scored AS (SELECT * FROM lagged WHERE n_wk IS NOT NULL AND n_1 IS NOT NULL),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(ABS(n - n_wk)) AS BIGINT) AS ae_seasonal,
         CAST(SUM(ABS(n - n_1)) AS BIGINT) AS ae_naive
  FROM scored
)
SELECT n_days, ae_seasonal, ae_naive,
       ROUND(ae_seasonal / (1.0 * n_days), 6) AS mae_seasonal,
       ROUND(ae_seasonal / (1.0 * ae_naive), 6) AS mase
FROM agg
"""


@register(
    "rel_seasonal_naive_mase",
    _MASE_ORACLE,
    doc="seasonal-naive forecast eval: MASE from exact absolute-error sums",
)
def rel_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before any forecasting model ships, it must beat the
    seasonal-naive baseline — and MASE (mean absolute scaled error,
    seasonal-naive MAE over one-step-naive MAE) is the scale-free
    score that comparison uses. Two lag windows over the O(days)
    daily aggregate, absolute-error sums exact BIGINT, one final
    division — so the score a model must beat is engine-identical.
    MASE < 1 would mean weekly seasonality carries real signal in
    the event stream."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "n",
        F.lag("n", 7).over(w).alias("n_wk"),
        F.lag("n", 1).over(w).alias("n_1"),
    ).filter(F.col("n_wk").isNotNull() & F.col("n_1").isNotNull())
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("n") - F.col("n_wk"))).cast("long").alias("ae_seasonal"),
        F.sum(F.abs(F.col("n") - F.col("n_1"))).cast("long").alias("ae_naive"),
    )
    return agg.select(
        "n_days",
        "ae_seasonal",
        "ae_naive",
        F.round(F.col("ae_seasonal") / (1.0 * F.col("n_days")), 6).alias(
            "mae_seasonal"
        ),
        F.round(F.col("ae_seasonal") / (1.0 * F.col("ae_naive")), 6).alias("mase"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON_ORACLE = """
WITH classes AS (
  SELECT CAST(user_id % 100 AS BIGINT) AS user_bucket,
         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM events GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(SUM(class_size) AS BIGINT) AS nn FROM classes)
SELECT class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       ROUND(SUM(class_size) / (1.0 * MAX(t.nn)), 6) AS row_share,
       CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS BIGINT) AS below_k5
FROM classes, tot t
GROUP BY class_size
"""


@register(
    "rel_k_anonymity",
    _K_ANON_ORACLE,
    doc="k-anonymity audit: equivalence-class size census over quasi-identifiers",
)
def rel_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can this dataset be released? The k-anonymity census: group by
    the quasi-identifier tuple (user bucket, day, event type), then
    histogram the equivalence-class sizes — rows in classes smaller
    than k (flagged at k=5) are re-identifiable and must be
    suppressed or generalized before release. The class census is the
    SAME aggregate a suppression pass would consume, and it pairs
    with text_pii_redact (column-level scrubbing) to cover both
    halves of the privacy gate. Two map-side-combinable groupBys; the
    histogram is O(distinct sizes) regardless of corpus scale."""
    e = load_table(spark, sf_dir, "events")
    classes = e.groupBy(
        (F.col("user_id") % 100).cast("long").alias("user_bucket"),
        F.to_date(F.col("ts")).alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    tot = classes.agg(F.sum("class_size").cast("long").alias("nn"))
    return (
        classes.crossJoin(F.broadcast(tot))
        .groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.round(F.sum("class_size") / (1.0 * F.max("nn")), 6).alias("row_share"),
        )
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            "row_share",
            F.when(F.col("class_size") < 5, 1).otherwise(0).cast("long").alias(
                "below_k5"
            ),
        )
    )


# ---------------------------------------------------------------------------
# lag-k autocorrelation of the daily event-count series
# ---------------------------------------------------------------------------

# Pearson r between (x_t, x_{t-k}) for k = 1..7 in ONE window pass
# (seven lags share the sort). All moment sums are exact BIGINT;
# sqrt runs on identical integers in both engines, then ROUND(,6).
_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT k.k, d1.x AS x, d0.x AS y
  FROM daily d1
  CROSS JOIN (SELECT UNNEST(range(1, 8)) AS k) k
  JOIN daily d0 ON d0.day = d1.day - CAST(k.k AS INTEGER)
),
mom AS (
  SELECT k,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY k
)
SELECT CAST(k AS BIGINT) AS lag, n,
       ROUND((n * sxy - sx * sy) /
             sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                  * CAST((n * syy - sy * sy) AS DOUBLE)), 6) AS autocorr
FROM mom
"""


@register(
    "rel_autocorrelation",
    _AUTOCORR_ORACLE,
    doc="lag 1..7 autocorrelation of daily counts, exact moment sums, one window pass",
)
def rel_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seasonality diagnostic read before choosing any forecast
    window: Pearson autocorrelation of the daily event count at lags
    1-7 (a weekly cycle shows as a lag-7 peak — the signal
    rel_seasonal_naive_mase then scores). The seven lag pairings are
    one equi-join of the O(days) daily aggregate against itself on
    shifted dates (lag() takes only literal offsets, so the join IS
    the variable-lag formulation), every moment sum is exact
    BIGINT via the cross-multiplied Pearson form (rel_correlation's
    identity), and sqrt sees identical integers in both engines."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    ks = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    d1 = daily.crossJoin(F.broadcast(ks))
    d0 = daily.select(F.col("day").alias("day0"), F.col("x").alias("y"))
    pairs = d1.join(
        d0, F.date_sub(F.col("day"), F.col("k")) == F.col("day0")
    ).select("k", "x", "y")
    mom = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return mom.select(
        F.col("k").cast("long").alias("lag"),
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("autocorr"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the above/below-median daily sequence
# ---------------------------------------------------------------------------

# The day sequence becomes a binary above/below-discrete-median
# string; R = observed runs. Under randomness E[R] = 2*n1*n0/n + 1,
# Var[R] = 2*n1*n0*(2*n1*n0 - n) / (n^2 * (n-1)). Significance at
# |z| > 1.96 cross-multiplies (exactly, in DECIMAL(38,0)) to:
#   25^2 * (R*n - 2*n1*n0 - n)^2 * n^2 * (n-1)
#     > 49^2 * n * 2*n1*n0 * (2*n1*n0 - n) * n^2 / n ... folded below
# using z^2 = (R - E)^2 / Var and 1.96 = 49/25.
_RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
ranked AS (
  SELECT day, x,
         ROW_NUMBER() OVER (ORDER BY x, day) AS rn,
         COUNT(*) OVER () AS n
  FROM daily
),
med AS (SELECT x AS med_x FROM ranked WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
seq AS (
  SELECT d.day, CASE WHEN d.x > m.med_x THEN 1 ELSE 0 END AS hi
  FROM daily d, med m
),
runs AS (
  SELECT hi,
         CASE WHEN LAG(hi) OVER (ORDER BY day) IS NULL
                OR LAG(hi) OVER (ORDER BY day) <> hi
              THEN 1 ELSE 0 END AS starts
  FROM seq
),
stat AS (
  SELECT CAST(SUM(starts) AS BIGINT) AS r,
         CAST(SUM(hi) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(hi) AS BIGINT) AS n0,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM runs
)
SELECT r AS n_runs, n1 AS n_above, n0 AS n_below,
       ROUND((2.0 * n1 * n0) / n + 1, 6) AS expected_runs,
       CAST(CASE WHEN
         625 * CAST(r * n - 2 * n1 * n0 - n AS HUGEINT)
             * (r * n - 2 * n1 * n0 - n) * (n - 1)
         > 2401 * CAST(2 * n1 * n0 AS HUGEINT) * (2 * n1 * n0 - n)
       THEN 1 ELSE 0 END AS BIGINT) AS nonrandom
FROM stat
"""


@register(
    "rel_runs_test",
    _RUNS_ORACLE,
    doc="Wald-Wolfowitz runs test on daily counts, significance integer-decided",
)
def rel_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the daily series random noise or does it trend/cluster? The
    Wald-Wolfowitz runs test: binarize each day against the discrete
    median (pinned ceil(n/2) rule), count runs of consecutive
    same-side days, and compare to the expectation under randomness.
    The |z| > 1.96 call cross-multiplies into one DECIMAL(38,0)
    inequality (z^2 numerator and variance numerator cleared of all
    divisions; 1.96 = 49/25), so the verdict is integer-decided —
    too few runs means clustering (an incident), too many means
    oscillation (a flapping alert). O(days) after the daily
    groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date(F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    rw = Window.orderBy("x", "day")
    cw = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = daily.select(
        "day", "x", F.row_number().over(rw).alias("rn"), F.count(F.lit(1)).over(cw).alias("n")
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long")
    ).select(F.col("x").alias("med_x"))
    seq = daily.crossJoin(F.broadcast(med)).select(
        "day", F.when(F.col("x") > F.col("med_x"), 1).otherwise(0).alias("hi")
    )
    sw = Window.orderBy("day")
    runs = seq.select(
        "hi",
        F.when(
            F.lag("hi").over(sw).isNull() | (F.lag("hi").over(sw) != F.col("hi")), 1
        )
        .otherwise(0)
        .alias("starts"),
    )
    stat = runs.agg(
        F.sum("starts").cast("long").alias("r"),
        F.sum("hi").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("hi")).cast("long").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    dec = "decimal(38,0)"
    dev = (
        F.col("r") * F.col("n") - 2 * F.col("n1") * F.col("n0") - F.col("n")
    ).cast(dec)
    lhs = F.lit(625).cast(dec) * dev * dev * (F.col("n") - 1).cast(dec)
    rhs = (
        F.lit(2401).cast(dec)
        * (2 * F.col("n1") * F.col("n0")).cast(dec)
        * (2 * F.col("n1") * F.col("n0") - F.col("n")).cast(dec)
    )
    return stat.select(
        F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"),
        F.col("n0").alias("n_below"),
        F.round((2.0 * F.col("n1") * F.col("n0")) / F.col("n") + 1, 6).alias(
            "expected_runs"
        ),
        F.when(lhs > rhs, 1).otherwise(0).cast("long").alias("nonrandom"),
    )
