"""Adaptive revisit scheduling — freshness maintenance for a recrawl
loop (Cho & Garcia-Molina revisit-policy family, multiplicative-backoff
form).

The reference scrapes on a fixed external cadence (its Lambda cron);
the engine already supports explicit re-queues (crawler.request_recrawl
→ the wave-stamped recrawl table). This module supplies the POLICY:
from each URL's fetch history (content signature per fetch), derive the
next revisit time — volatile pages come back fast, stable pages back
off exponentially.

Semantics (integer-exact, so the q61 oracle mirrors it bit-for-bit):

- a fetch "changed" iff its signature differs from the previous fetch's
  (the first fetch counts as changed),
- tail_streak = number of consecutive unchanged fetches at the END of
  the history,
- next_interval_s = min_interval_s              if tail_streak == 0
                  = clamp(base_s << min(tail_streak − 1, 20),
                          min_interval_s, max_interval_s)  otherwise
  (shift, not pow: integer arithmetic is immune to float drift and the
  20-shift cap keeps it in range),
- next_fetch_epoch = unix_seconds(last fetch) + next_interval_s.

Scale shape: one window pass per entity (lag + max-over-partition share
the same hash partitioning) and one groupBy — two shuffles on the URL
key total, both partial-aggregated. The output joins back onto the
frontier exactly like reprioritize_frontier's ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    history: DataFrame,
    base_s: int = 86_400,
    min_s: int = 3_600,
    max_s: int = 30 * 86_400,
    id_col: str = "url",
    ts_col: str = "fetch_ts",
    sig_col: str = "content_sig",
) -> DataFrame:
    """Per entity: (id, n_fetches, tail_streak, next_interval_s,
    next_fetch_epoch) from its fetch/change history."""
    # sig joins the ORDER BY as a deterministic tiebreak: duplicate
    # (entity, ts) fetches would otherwise order by engine whim and
    # flip the changed flags vs the oracle (the q50 tiebreak rule)
    wk = Window.partitionBy(id_col).orderBy(ts_col, sig_col)
    prev = F.lag(F.col(sig_col)).over(wk)
    marked = history.select(
        F.col(id_col).alias("entity"),
        F.col(ts_col).alias("ts"),
        (prev.isNull() | (F.col(sig_col) != prev)).alias("changed"),
    ).withColumn(
        "last_change_ts", F.max(F.when(F.col("changed"), F.col("ts"))).over(
            Window.partitionBy("entity")
        )
    )
    agg = marked.groupBy("entity").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.max("ts").alias("last_ts"),
        F.sum(
            F.when(F.col("ts") > F.col("last_change_ts"), 1).otherwise(0)
        ).cast("long").alias("tail_streak"),
    )
    # SQL form: the Python F.shiftleft only takes a LITERAL bit count;
    # bigint base — 86400 << 20 overflows int32
    backoff = F.expr(
        f"shiftleft(cast({int(base_s)} as bigint), "
        "cast(least(tail_streak - 1, 20) as int))"
    )
    interval = F.when(F.col("tail_streak") == 0, F.lit(int(min_s))).otherwise(
        F.least(F.greatest(backoff, F.lit(int(min_s))), F.lit(int(max_s)))
    )
    return agg.select(
        "entity",
        "n_fetches",
        "tail_streak",
        interval.cast("long").alias("next_interval_s"),
        (F.unix_timestamp("last_ts") + interval).cast("long").alias(
            "next_fetch_epoch"
        ),
    )
