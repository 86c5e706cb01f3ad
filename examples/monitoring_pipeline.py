"""Continuous-validation monitoring stack: the four always-on stream
monitors composed over ONE restartable event stream.

An ingest pipeline that feeds a 100 TB corpus needs its validation to be
*continuous* — not a nightly batch audit — and every monitor here keeps
state bounded BY CONSTRUCTION (by the check list, the sketch geometry,
or the bucket count), never by the stream:

1. **streaming_expectations** — the one-pass Deequ-style quality suite
   (q168 machinery) as cumulative per-check violation counters; state is
   one counter row.
2. **streaming_count_min** — count-min sketch over event types: the
   heavy-hitter / frequency monitor; state is the d×w cell grid.
3. **streaming_hll** — HyperLogLog over user ids: the cardinality
   monitor (distinct users so far); state is 2^p registers.
4. **checksum_drift_monitor** — per-bucket stream-vs-reference checksum
   compare: the continuous form of the q28 dirty-bucket diff; per-batch
   work is O(touched buckets).

All four read the SAME parquet-directory source with separate
checkpoints; the run drains two micro-batch rounds with a FULL RESTART
in between (fresh query objects reload sketch/counter state from their
checkpoints), then replays every monitor's final state against its
batch twin over the at-rest table — stream/batch equivalence is what
makes the monitors trustworthy: the always-on numbers are, provably,
the numbers the nightly audit would have produced.

Run: ``python examples/monitoring_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.operators.diff import bucket_summary
from sparkdiff.operators.expectations import (
    accepted_values,
    expectation_report,
    in_range,
    not_null,
)
from sparkdiff.operators.sketch import (
    cms_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)
from sparkdiff.session import get_spark, load_table
from sparkdiff.streaming.validate import (
    checksum_drift_monitor,
    streaming_count_min,
    streaming_expectations,
    streaming_hll,
)

CHECKS_FACTORY = lambda: [  # noqa: E731 — flag Columns are single-use
    not_null("event_id"),
    not_null("user_id"),
    in_range("value", 0.0, 1_000_000.0),
    # "error" deliberately NOT accepted: the suite should be SHOWING a
    # live violation counter, not an all-green wall
    accepted_values("event_type", ["click", "view", "purchase", "signup"]),
]
CMS_KW = dict(d=3, w=256, salt="mon-cms-")
HLL_KW = dict(p=8, salt="mon-hll-")
DRIFT_COLS = ["event_type", "value"]
N_BUCKETS = 64


def main(sf_dir: str) -> None:
    spark = get_spark("monitoring-example", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="monitoring_")
    src = os.path.join(work, "incoming")

    events = load_table(spark, sf_dir, "events")
    # the reference the drift monitor certifies the stream against: the
    # at-rest table with a few buckets deliberately perturbed, so some
    # buckets MUST report dirty (and exactly those must be reported)
    reference = events.withColumn(
        "value",
        F.when(
            F.col("event_id") % 37 == 0, F.col("value") + 1.0
        ).otherwise(F.col("value")),
    )

    # latest update-mode values win: each dict converges to final state
    expectation_state: dict[str, tuple] = {}
    cms_state: dict[tuple, int] = {}
    hll_state: dict[int, int] = {}
    dirty_state: dict[int, tuple] = {}

    def build_queries():
        """One source, four monitors, separate checkpoints — called
        fresh per round so the restart exercises checkpoint recovery."""
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def sink(state_df, record, name, mode="update"):
            def handle(batch_df, _bid):
                for r in batch_df.collect():
                    record(r)

            return (
                state_df.writeStream.outputMode(mode)
                .foreachBatch(handle)
                .option(
                    "checkpointLocation", os.path.join(work, f"ckpt_{name}")
                )
                .trigger(availableNow=True)
                .start()
            )

        qs = [
            sink(
                streaming_expectations(stream, CHECKS_FACTORY()),
                lambda r: expectation_state.__setitem__(
                    r.check, (r.n_rows, r.n_violations, r.ok)
                ),
                "expect",
            ),
            sink(
                streaming_count_min(
                    stream.select(F.col("event_type").alias("token")),
                    **CMS_KW,
                ),
                lambda r: cms_state.__setitem__((r.r, r.b), r.cnt),
                "cms",
            ),
            sink(
                streaming_hll(
                    stream.select(F.col("user_id").cast("string").alias("token")),
                    **HLL_KW,
                ),
                lambda r: hll_state.__setitem__(r.bucket, r.reg),
                "hll",
            ),
        ]
        def track_drift(df, _bid):
            # include_clean delivers every TOUCHED bucket with is_dirty:
            # dirty buckets enter the alert set, converged ones leave it
            for r in df.collect():
                if r.is_dirty:
                    dirty_state[r.bucket] = (
                        r.n, r.checksum, r.ref_n, r.ref_checksum
                    )
                else:
                    dirty_state.pop(r.bucket, None)

        qs.append(
            checksum_drift_monitor(
                stream.drop("ts"),
                reference.drop("ts"),
                "event_id",
                DRIFT_COLS,
                track_drift,
                n_buckets=N_BUCKETS,
                include_clean=True,
            )
            .option("checkpointLocation", os.path.join(work, "ckpt_drift"))
            .start()
        )
        return qs

    def drain():
        for q in build_queries():
            # awaitTermination returns False on timeout; proceeding with a
            # half-drained monitor would surface as a misleading batch-twin
            # divergence, so fail loudly here instead.
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(f"monitor query {q.name!r} did not finish in 300s")

    # round 1: first half of the events arrives
    first = events.filter(F.col("event_id") % 2 == 0)
    first.coalesce(1).write.mode("append").parquet(src)
    drain()
    mid_users = hll_estimate(
        spark.createDataFrame(
            list(hll_state.items()), "bucket: long, reg: long"
        ),
        p=HLL_KW["p"],
    ).collect()[0]
    print(
        f"after round 1: {len(dirty_state)} dirty buckets so far, "
        f"~{mid_users.hll_ndv} distinct users"
    )

    # round 2 — RESTART: fresh queries recover counters/sketch state
    # from their checkpoints, then absorb the second half
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()

    # ---- batch twins over the at-rest table: the monitors' final
    # state must equal the one-shot audit of everything ingested ------
    failures = []

    batch_expect = {
        r.check: (r.n_rows, r.n_violations, r.ok)
        for r in expectation_report(events, CHECKS_FACTORY()).collect()
    }
    if expectation_state != batch_expect:
        failures.append("expectations diverge from batch report")

    batch_cms = {
        (r.r, r.b): r.cnt
        for r in count_min_sketch(
            events.select(F.col("event_type").alias("token")), **CMS_KW
        ).collect()
    }
    if cms_state != batch_cms:
        failures.append("count-min cells diverge from batch sketch")

    batch_hll = {
        r.bucket: r.reg
        for r in hll_registers(
            events.select(F.col("user_id").cast("string").alias("token")),
            **HLL_KW,
        ).collect()
    }
    if hll_state != batch_hll:
        failures.append("HLL registers diverge from batch sketch")

    def summ(df):
        return {
            r.bucket: (r.n, r.checksum)
            for r in bucket_summary(
                df.drop("ts"),
                "event_id",
                DRIFT_COLS,
                n_buckets=N_BUCKETS,
                distinct_pks=False,
            ).collect()
        }

    s_side, r_side = summ(events), summ(reference)
    expected_dirty = {b for b in s_side if s_side[b] != r_side.get(b)}
    if set(dirty_state) != expected_dirty:
        failures.append("dirty-bucket set diverges from batch compare")

    print(f"expectation suite: {len(expectation_state)} checks, "
          f"violations={ {c: v[1] for c, v in expectation_state.items()} }")
    est = cms_estimate(
        spark.createDataFrame(
            [(r, b, c) for (r, b), c in cms_state.items()],
            "r: long, b: long, cnt: long",
        ),
        events.select(F.col("event_type").alias("token")).distinct(),
        d=CMS_KW["d"],
        w=CMS_KW["w"],
        salt=CMS_KW["salt"],
    ).collect()
    print("event-type frequencies (CMS upper bounds): "
          + ", ".join(f"{r.token}<={r.cms_est}" for r in sorted(
              est, key=lambda r: -r.cms_est)))
    final_users = hll_estimate(
        spark.createDataFrame(
            list(hll_state.items()), "bucket: long, reg: long"
        ),
        p=HLL_KW["p"],
    ).collect()[0]
    print(f"distinct users so far: ~{final_users.hll_ndv}")
    print(f"drift monitor: {len(dirty_state)} dirty buckets "
          f"(expected {len(expected_dirty)} from the perturbed reference)")

    if failures:
        raise SystemExit("batch-twin check FAILED: " + "; ".join(failures))
    print("all four monitors match their batch twins after the restart")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
