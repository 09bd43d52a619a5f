"""The crawl wave loop: iterative BSP over snapshot-versioned tables.

Replaces the reference's sequential handler loop (app/main.py:13–64) with:

    seeds → frontier (append-only enqueue log)
    repeat per wave:
        pending  = frontier ⟕̸ fetch_log           (anti-join: not yet fetched)
        popped   = top-k per host by the ordering law (priority.pop_wave)
        fetched  = mapInPandas fetch w/ politeness (fetch.fetch_wave)
        parsed   = vectorized family parsers       (parse.parse_wave)
        append records / pages-text / fetch_log
        children = discovered URLs, deduped against everything enqueued
                   (exact anti-join or Bloom fast path) → append to frontier
        commit wave marker

State design: the frontier is an *append-only enqueue log*; "pending" is
derived (frontier ANTI fetch_log), so no table is ever rewritten in place
— every wave is a set of appends plus one wave-marker commit. A killed job
resumes by rolling back any table snapshot newer than the last committed
wave marker (resume()); re-fetching never happens because fetch_log is the
source of truth for "done" (north rule: resumable mid-frontier).

Shuffle budget per wave: one hash shuffle for the per-host window pop, one
repartition(salted_part) for fetch — matching SURVEY.md §4.4's "exactly
two shuffles per wave".
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..functions import urlkit
from ..catalog import SnapshotCatalog
from ..parsers.parse import parse_wave
from .fetch import fetch_wave
from .priority import pop_wave, seeds_to_frontier
from .seen import filter_unseen_bloom, filter_unseen_exact

WAVES_SCHEMA = (
    "wave int, popped long, ok long, failed long, records long, "
    "children long, wall_s double"
)


@dataclass
class WaveStats:
    wave: int
    popped: int
    ok: int
    failed: int
    records: int
    children: int
    wall_s: float


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        fetcher_factory,
        per_host_k: int = 4,
        num_parts: int = 32,
        salt: int = 1,
        rate_per_host: float = 10.0,
        seen_mode: str = "exact",
        simulated_clock: bool = True,
        bloom_expected_n: int = 100_000,
        bloom_fpp: float = 1e-4,
        host_budget: int | None = None,
        wave_budget: int | None = None,
        domain_budget: int | None = None,
    ):
        self.spark = spark
        self.cat = catalog
        self.fetcher_factory = fetcher_factory
        self.per_host_k = per_host_k
        self.num_parts = num_parts
        self.salt = salt
        self.rate_per_host = rate_per_host
        assert seen_mode in ("exact", "bloom")
        self.seen_mode = seen_mode
        self.simulated_clock = simulated_clock
        self.BLOOM_EXPECTED_N = bloom_expected_n
        self.BLOOM_FPP = bloom_fpp
        self.host_budget = host_budget
        # global per-wave fetch budget: with it set, frontier priority
        # (e.g. PageRank host-rank feedback) decides which hosts make
        # the wave, not just fetch order — see priority.pop_wave
        self.wave_budget = wave_budget
        # fairness mode: the budget apportions across registered domains
        # (Hamilton quotas over pending pools) before any global cut, so
        # one mega-registrant cannot eat a budgeted wave
        self.domain_budget = domain_budget

    # -- state ---------------------------------------------------------------
    def bootstrap(self, seeds: DataFrame) -> None:
        frontier = seeds_to_frontier(seeds)
        self.cat.write("frontier", frontier, mode="overwrite", wave=0)
        if self.seen_mode == "bloom":
            self._bloom_add(frontier.select("url"), wave=0, reset=True)

    # -- persistent Bloom seen-set --------------------------------------------
    # The Bloom filter is incrementally maintained in the seen_bloom table
    # (one merged bitset row per wave, wave-stamped): each wave ORs in only
    # the NEWLY enqueued URLs instead of rebuilding from the full frontier —
    # at 10^10-URL scale a rebuild would be a full-table scan per wave.
    def _bloom_load(self):
        from .seen import BloomFilter

        if not self.cat.exists("seen_bloom"):
            return None
        row = (
            self.cat.read(self.spark, "seen_bloom")
            .orderBy(F.col("wave").desc())
            .first()
        )
        if row is None:
            return None
        return BloomFilter.from_bytes(row.m, row.k, bytes(row.bitset))

    def _bloom_add(self, urls: DataFrame, wave: int, reset: bool = False):
        from .seen import BloomFilter, bloom_from_df

        fresh = bloom_from_df(
            urls, expected_n=self.BLOOM_EXPECTED_N, fpp=self.BLOOM_FPP
        )
        current = None if reset else self._bloom_load()
        merged = fresh if current is None else current.merge(fresh)
        row = self.spark.createDataFrame(
            [(wave, merged.m, merged.k, merged.to_bytes())],
            "wave int, m long, k int, bitset binary",
        )
        self.cat.write("seen_bloom", row, mode="overwrite", wave=wave)
        return merged

    def frontier(self) -> DataFrame:
        return self.cat.read(self.spark, "frontier", schema=schemas.FRONTIER)

    def fetch_log(self) -> DataFrame:
        return self.cat.read(self.spark, "fetch_log", schema=schemas.FETCH_LOG)

    def pending(self) -> DataFrame:
        """frontier ⟕̸ done. A URL is done once fetched — UNLESS a
        re-crawl was requested after its latest fetch: requests live in
        the wave-stamped `recrawl` table, and a fetch from a LATER wave
        than the newest request satisfies it (each request triggers
        exactly one refetch, idempotently across resume). The recrawl
        table is a refresh batch (≪ frontier), so the extra join is
        broadcast-sized at any scale."""
        done = self.fetch_log().select("url", "wave")
        if self.cat.exists("recrawl"):
            req = (
                self.cat.read(self.spark, "recrawl")
                .groupBy("url")
                .agg(F.max("wave").alias("__req_w"))
            )
            done = (
                done.groupBy("url")
                .agg(F.max("wave").alias("__f_w"))
                .join(F.broadcast(req), "url", "left")
                .filter(F.col("__req_w").isNull() | (F.col("__f_w") > F.col("__req_w")))
            )
        pending = filter_unseen_exact(self.frontier(), done.select("url"))
        if self.host_budget is not None:
            # per-host crawl budget (wave-granular: within a wave the pop
            # is already bounded by per_host_k, so total fetches per host
            # stay ≤ budget + per_host_k − 1): hosts that have spent their
            # budget of successful fetches stop enqueuing. One aggregate
            # over fetch_log — at scale this shares the compacted log the
            # anti-join reads anyway.
            exhausted = (
                self.fetch_log()
                .filter(F.col("status") == 200)
                .groupBy(urlkit.host(F.col("url")).alias("host"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") >= self.host_budget)
                .select("host")
            )
            pending = pending.join(exhausted, "host", "left_anti")
        return pending

    def set_host_priorities(self, ranks: DataFrame) -> None:
        """Persist host-level priorities (pagerank_micro output:
        (node, rank_micro)) as the ``host_rank`` table. run_wave applies
        them LAZILY at pop time via a broadcast join
        (graph.reprioritize_frontier) — rank refreshes never rewrite the
        frontier. At a 10^10-row frontier a rewrite per refresh is a
        full-table pass (measured 101.7 s at just 4M rows, BENCH.md);
        the lazy form is host-count-sized state plus one broadcast join
        the pop stage already pays two shuffles around. The eager
        overwrite (reprioritize + cat.write mode=overwrite) remains
        valid when a materialized priority column is wanted."""
        self.cat.write(
            "host_rank",
            ranks.select("node", "rank_micro"),
            mode="overwrite",
            wave=self.last_committed_wave(),
        )

    def request_recrawl(self, urls: DataFrame) -> None:
        """Schedule already-fetched URLs for one refetch on the next
        wave(s): appends them to the `recrawl` table stamped with the
        last committed wave, so pending() re-opens them until a newer
        fetch lands. (The cuckoo seen-set variant is the matching
        library piece when enqueue-dedup must also forget — see
        frontier/seen.py:unsee_urls.)"""
        marker = urls.select("url").withColumn(
            "wave", F.lit(self.last_committed_wave())
        )
        self.cat.write("recrawl", marker, wave=self.last_committed_wave())

    def last_committed_wave(self) -> int:
        w = self.cat.last_wave("waves")
        return w if w is not None else 0

    def resume(self) -> int:
        """Roll back any partial wave so all tables agree with the last
        committed wave marker; returns the next wave id to run."""
        last = self.last_committed_wave()
        for table in ("records", "pages", "fetch_log", "frontier", "seen_bloom", "recrawl"):
            snaps = [
                s["id"]
                for s in self.cat.snapshots(table)
                if s.get("wave") is not None and s["wave"] <= last
            ]
            if self.cat.snapshots(table):
                self.cat.rollback(table, max(snaps) if snaps else 0)
        return last + 1

    # -- one wave ------------------------------------------------------------
    def run_wave(self, wave: int) -> WaveStats:
        t0 = time.monotonic()
        pending = self.pending()
        if self.cat.exists("host_rank"):
            from ..operators.graph import reprioritize_frontier

            pending = reprioritize_frontier(
                pending, self.cat.read(self.spark, "host_rank")
            )
        popped = pop_wave(
            pending, self.per_host_k, self.num_parts, self.salt,
            wave_budget=self.wave_budget,
            domain_budget=self.domain_budget,
        ).withColumn("wave", F.lit(wave))

        # robots gate (north rule; absent in the reference, default-allow
        # to preserve crawl parity). Denied URLs are logged, not refetched;
        # Crawl-delay rides the gate's broadcast join onto the wave as a
        # per-row rate_override column (req/s) — the robots table is never
        # collected driver-side (10^8 hosts ≈ 10 GB at target scale).
        allowed = None
        denied = None
        if self.cat.exists("robots"):
            from .robots import robots_gate

            robots = self.cat.read(self.spark, "robots", schema=schemas.ROBOTS)
            allowed = (
                robots_gate(popped, robots, default_allow=True)
                .withColumn(
                    "rate_override",
                    F.when(F.col("crawl_delay") > 0, 1.0 / F.col("crawl_delay")),
                )
                .drop("crawl_delay")
                .cache()
            )
            # denied rows ride the wave's single fetch_log write below —
            # a standalone emptiness probe would add one Spark action per
            # wave even with zero denials
            denied = popped.join(allowed.select("url"), "url", "left_anti")
            popped = allowed

        fetched = fetch_wave(
            popped,
            self.fetcher_factory,
            num_parts=self.num_parts,
            rate_per_host=self.rate_per_host,
            salt=self.salt,
            simulated_clock=self.simulated_clock,
        )
        parsed = parse_wave(fetched).cache()

        # ONE wall-clock per wave, fixed driver-side: F.current_timestamp()
        # is per-action, and the wave runs several actions — records and
        # pages must share the same run_ts (the reference calls timenow()
        # once per parse, ga_scraper.py:212–214)
        from datetime import datetime, timezone

        wave_ts = datetime.now(timezone.utc).replace(tzinfo=None, microsecond=0)
        run_ts = F.lit(wave_ts).cast("timestamp")

        # ONE action over the cached parse output yields every per-kind
        # count the wave needs (records/pages emptiness gates + ok/failed
        # stats) — three separate counting jobs otherwise dominate the
        # per-wave fixed cost at small wave sizes.
        kind_stats = (
            parsed.groupBy("kind", (F.col("status") == 200).alias("ok"))
            .count()
            .collect()
        )
        n_records = sum(r["count"] for r in kind_stats if r["kind"] == "record")
        n_pages = sum(r["count"] for r in kind_stats if r["kind"] == "text")
        ok = sum(
            r["count"] for r in kind_stats if r["kind"] in ("error", "text") and r["ok"]
        )
        failed = sum(
            r["count"] for r in kind_stats if r["kind"] in ("error", "text") and not r["ok"]
        )

        # records PARTITIONED BY (state, layout) — the engine analog of
        # the reference's {state}/layout_{id}/ CSV path (app/main.py:29)
        records = parsed.filter(F.col("kind") == "record").select(
            "url", "state", "layout", "emc", "level", "data",
            F.lit(None).cast("string").alias("text"),
            run_ts.alias("run_ts"), F.col("wave"),
        )

        # pages partition spec (bucket(16, url), days(warc_ts)) per
        # FIXTURES.md §1.1 — month/day filters (O24) prune files
        pages = parsed.filter(F.col("kind") == "text").select(
            "url", run_ts.alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.col("text"), F.lit("en").alias("lang"),
            F.pmod(F.xxhash64("url"), F.lit(16)).cast("string").alias("url_bucket"),
            F.date_format(run_ts, "yyyy-MM-dd").alias("warc_day"),
        )

        log = parsed.filter(F.col("kind").isin("error", "text")).select(
            "url", "wave", run_ts.alias("ts"), "status", "reason",
            F.lit(None).cast("long").alias("bytes"),
            F.lit(None).cast("int").alias("partition_id"),
            "emc", "state", "layout",
        )
        if denied is not None:
            log = log.unionByName(
                denied.select(
                    "url", F.lit(wave).alias("wave"), run_ts.alias("ts"),
                    F.lit(451).alias("status"),
                    F.lit("robots disallow").alias("reason"),
                    F.lit(None).cast("long").alias("bytes"),
                    F.lit(None).cast("int").alias("partition_id"),
                    "emc", "state", "layout",
                )
            )

        # The three table commits are independent (different tables →
        # different manifests; all read the CACHED parse output) and each
        # is a separate Spark job whose scheduling gaps dominate the
        # per-wave fixed cost at small wave sizes — submit them
        # concurrently (Spark supports multi-threaded action submission;
        # the FAIR/FIFO scheduler interleaves their tasks). Crash safety
        # is unchanged: every snapshot is wave-stamped and resume() rolls
        # back anything newer than the last committed wave marker, which
        # is still written LAST, sequentially.
        from concurrent.futures import ThreadPoolExecutor

        writes = [lambda: self.cat.write("fetch_log", log, wave=wave)]
        if n_records:
            writes.append(
                lambda: self.cat.write(
                    "records", records, wave=wave, partition_by=["state", "layout"]
                )
            )
        if n_pages:
            writes.append(
                lambda: self.cat.write(
                    "pages", pages, wave=wave, partition_by=["url_bucket", "warc_day"]
                )
            )
        # children: keep first discovery per URL (visited semantics), then
        # drop anything already enqueued — exact anti-join or Bloom. This
        # chain touches only frontier/seen_bloom, so it rides the same
        # concurrent pool as the three table commits above (it is usually
        # the wave's longest tail: window + anti-join + write + bloom OR).
        def child_chain() -> int:
            disc = parsed.filter(F.col("kind") == "child")
            w_first = Window.partitionBy("child_url").orderBy(
                "event_seq", "seed_seq", "depth", "child_seq", "child_rank"
            )
            children = (
                disc.withColumn("rn", F.row_number().over(w_first))
                .filter(F.col("rn") == 1)
                .select(
                    F.col("child_url").alias("url"),
                    urlkit.host(F.col("child_url")).alias("host"),
                    F.lit(0).alias("salted_part"),
                    F.lit(0.0).alias("priority"),
                    (F.col("depth") + 1).alias("depth"),
                    "event_seq", "seed_seq",
                    F.col("child_rank").alias("child_seq"),
                    "state", "layout", "emc", "family",
                    F.lit("pending").alias("status"),
                    F.lit(wave).alias("wave"),
                )
            )
            if self.seen_mode == "exact":
                fresh = filter_unseen_exact(children, self.frontier().select("url"))
            else:
                bloom = self._bloom_load()
                if bloom is None:  # e.g. bootstrapped before bloom mode existed
                    bloom = self._bloom_add(self.frontier().select("url"), wave=wave - 1, reset=True)
                fresh = filter_unseen_bloom(children, bloom)
            fresh = fresh.cache()
            n = fresh.count()
            try:
                if n:
                    self.cat.write("frontier", fresh, wave=wave)
                    if self.seen_mode == "bloom":
                        self._bloom_add(fresh.select("url"), wave=wave)
            finally:
                fresh.unpersist()
            return n

        try:
            with ThreadPoolExecutor(max_workers=len(writes) + 1) as pool:
                child_fut = pool.submit(child_chain)
                for fut in [pool.submit(w) for w in writes]:
                    fut.result()  # propagate the first failure, wave aborts
                n_children = child_fut.result()

            n_popped = ok + failed
            wall = time.monotonic() - t0
            ws = WaveStats(wave, n_popped, ok, failed, n_records, n_children, wall)
            marker = self.spark.createDataFrame(
                [(wave, n_popped, ok, failed, n_records, n_children, wall)], WAVES_SCHEMA
            )
            self.cat.write("waves", marker, wave=wave)  # the wave commit point
        finally:
            # an aborted wave (resume() pattern) must not pin cached
            # DataFrames in the session for its lifetime
            parsed.unpersist()
            if allowed is not None:
                allowed.unpersist()
        return ws

    def compact(self) -> None:
        """Long-crawl maintenance: rewrite every table's live state as one
        snapshot (Iceberg rewrite_data_files analog). Appends are one
        snapshot per wave per table, so a 10^4-wave crawl would otherwise
        union 10^4 snapshot dirs per read — compaction keeps the read-side
        union shallow and the `pending` anti-join scanning one compacted
        fetch_log instead of the whole append history. Safe at any wave
        boundary: compact() stamps the snapshot with the table's last
        committed wave, so resume() keeps it."""
        for table in ("records", "pages", "fetch_log", "frontier", "waves", "recrawl"):
            if self.cat.exists(table):
                self.cat.compact(self.spark, table)

    def run(self, max_waves: int = 10) -> list[WaveStats]:
        out = []
        wave = self.last_committed_wave() + 1 if self.cat.exists("waves") else 1
        for w in range(wave, wave + max_waves):
            if self.pending().limit(1).count() == 0:
                break
            out.append(self.run_wave(w))
        return out
