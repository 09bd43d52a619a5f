"""Per-query isolation bench (optimization guide §1.4) — NOT the driver
metric. bench.py stays the frozen measurement; this harness exists so a
single query can be timed and its plan captured without paying for the
whole suite.

Methodology mirrors bench.py's headline protocol exactly:
- same session factory (get_spark, local[$SPARK_GRAFT_CPUS], shuffle
  partitions default 32),
- DataFrames built ONCE (driver-side work such as k-means collects and
  localCheckpoints happens at construction, as in bench.py),
- each pass materializes via the noop sink, per-query best across
  passes is reported (floors are monotone under additive noise).

Usage:
    python bench_extra.py q93_semdedup q19_ngram_jaccard   # time those
    python bench_extra.py --all                            # whole suite
    python bench_extra.py --explain plans/r08 --suffix before q19_ngram_jaccard
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_EXTRA_PASSES (3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--passes", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_EXTRA_PASSES", "3")))
    ap.add_argument("--explain", metavar="DIR",
                    help="write <name>_<suffix>.txt explain('formatted') files")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--no-time", action="store_true",
                    help="only capture plans, skip timing passes")
    args = ap.parse_args()

    import bench  # frozen — reused only for the query name lists
    import __spark_entry__ as entrymod
    from outage_data_scraper_spark.session import get_spark

    names = args.names or []
    if args.all:
        names = bench.HEADLINE + bench.EXTENDED
    if not names:
        ap.error("give query names or --all")

    qs = entrymod.queries()
    for n in names:
        if n not in qs:
            ap.error(f"unknown query {n}")

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]")
    # same warmup bench.py does: one materialization to absorb
    # codegen JIT + shuffle-file setup before anything is timed
    _noop(qs[bench.HEADLINE[0]](spark, SF_DIR))

    t_build: dict[str, float] = {}
    dfs = {}
    for n in names:
        t0 = time.monotonic()
        dfs[n] = qs[n](spark, SF_DIR)
        t_build[n] = round(time.monotonic() - t0, 3)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        import contextlib
        import io

        for n in names:
            path = os.path.join(args.explain, f"{n}_{args.suffix}.txt")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                dfs[n].explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)

    best = {n: float("inf") for n in names}
    samples: dict[str, list[float]] = {n: [] for n in names}
    if not args.no_time:
        for _ in range(args.passes):
            for n in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{n}")
                t0 = time.monotonic()
                _noop(dfs[n])
                w = time.monotonic() - t0
                samples[n].append(round(w, 3))
                best[n] = min(best[n], w)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": SF_DIR,
        "passes": args.passes,
        "best": {n: round(best[n], 3) for n in names},
        "build_s": t_build,
        "samples": samples,
        "total_best": round(sum(best[n] for n in names), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
