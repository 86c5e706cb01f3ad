"""Product-analytics pipeline over the event stream: one session
composing the round-3 event operators end-to-end — sessionize →
conversion funnel → last-touch attribution → weekly retention → RFM
segmentation → seasonal-anomaly screen → peak concurrency.

Every stage is a registered, oracle-checked query (q29, q91, q115,
q84, q105, q116, q98), so this pipeline is the "analytics warehouse
daily report" a user of the engine would schedule; stages share the
session (and Spark reuses the shuffled event scans across them where
plans line up).

Run: ``python examples/event_analytics_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.queries import QUERIES
from sparkdiff.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("event-analytics-pipeline", cpus=8)

    sessions = QUERIES["q29_sessionize"](spark, sf_dir)
    n_users = sessions.count()
    tot = sessions.agg(
        F.sum("n_sessions").alias("s"), F.sum("n_events").alias("e")
    ).collect()[0]
    print(f"sessions: {tot['s']} across {n_users} users ({tot['e']} events)")

    funnel = QUERIES["q91_event_funnel"](spark, sf_dir).orderBy("stage")
    for r in funnel.collect():
        print(
            f"funnel {r['stage']}: {r['n_users']} users"
            f" ({r['conversion']:.2%})"
        )

    attrib = QUERIES["q115_attribution"](spark, sf_dir).orderBy(
        F.desc("n_conversions"), "touch_type"
    )
    top = attrib.collect()
    print(
        "attribution: "
        + ", ".join(f"{r['touch_type']}={r['n_conversions']}" for r in top)
    )

    cohorts = QUERIES["q84_retention_cohorts"](spark, sf_dir)
    week1 = cohorts.filter(F.col("week_offset") == 1)
    n_cohorts = week1.count()
    print(f"retention: {n_cohorts} cohorts with a week-1 row")

    rfm = QUERIES["q105_rfm_segments"](spark, sf_dir)
    champions = rfm.filter(
        (F.col("r_score") >= 4) & (F.col("f_score") >= 4)
    ).count()
    print(f"rfm: {rfm.count()} purchasers, {champions} champions (R>=4,F>=4)")

    anomalies = QUERIES["q116_seasonal_anomaly"](spark, sf_dir).count()
    print(f"seasonal anomalies: {anomalies} (day,hour,type) cells > 2x baseline")

    peak = QUERIES["q98_peak_concurrency"](spark, sf_dir).collect()[0]
    print(f"peak concurrency: {peak['concurrent']} sessions at {peak['m']}")

    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
