#!/usr/bin/env python3
"""Product/log analytics walkthrough: the event-stream operator tier
over a small self-contained fixture. Run from the repo root:

    python examples/event_analytics.py

Stages (each is one declarative plan; see PLANS.md for the shuffle
budget of each):

  1. sessionize             gap-based sessions (lag + cumsum islands)
  2. funnel_steps           ordered signup->view->click->purchase
                            funnel on ONE sorted pass
  3. cohort_retention       first-seen-day cohorts x day offsets
  4. event_transitions      Markov bigram counts + probabilities
  5. fill_gaps /            densified per-user daily series,
     interpolate_gaps       zero-filled and linearly interpolated
  6. last_touch_attribution conversions credited to the latest
                            preceding touch
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    from cordon_spark.operators.events import (
        cohort_retention,
        event_transitions,
        fill_gaps,
        funnel_steps,
        interpolate_gaps,
        last_touch_attribution,
        sessionize,
    )
    from cordon_spark.session import get_spark

    spark = get_spark("event_analytics_example", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # A tiny deterministic clickstream: three users, two days.
    rows = [
        # u1: full funnel day 1, returns day 2
        (1, "2026-01-01 09:00:00", 1, "signup", 0.0),
        (2, "2026-01-01 09:05:00", 1, "view", 1.0),
        (3, "2026-01-01 09:06:00", 1, "click", 2.0),
        (4, "2026-01-01 09:10:00", 1, "purchase", 30.0),
        (5, "2026-01-02 18:00:00", 1, "view", 1.0),
        # u2: clicks BEFORE viewing (funnel must not credit the click),
        # two sessions via a >30min gap
        (6, "2026-01-01 10:00:00", 2, "signup", 0.0),
        (7, "2026-01-01 10:02:00", 2, "click", 2.0),
        (8, "2026-01-01 11:30:00", 2, "view", 1.0),
        # u3: joins day 2 only
        (9, "2026-01-02 12:00:00", 3, "signup", 0.0),
        (10, "2026-01-02 12:01:00", 3, "view", 1.0),
        (11, "2026-01-02 12:02:00", 3, "purchase", 12.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    print("== sessions (gap > 30 min splits) ==")
    sessionize(events).orderBy("user_id", "session_id").show()

    print("== funnel (ordered, strictly-after semantics) ==")
    funnel_steps(events).show()

    print("== cohort retention (epoch-day cohorts) ==")
    cohort_retention(events).orderBy("cohort_day", "day_offset").show()

    print("== event transitions (per-src probabilities, e4) ==")
    event_transitions(events).orderBy("src_type", "dst_type").show()

    print("== fill_gaps (dense daily axis, zero-filled) ==")
    fill_gaps(events).orderBy("user_id", "bucket").show()

    print("== interpolate_gaps (linear fill of the value series) ==")
    interpolate_gaps(events).orderBy("user_id", "bucket").show()

    print("== last-touch attribution (purchase credits) ==")
    last_touch_attribution(events).show()

    spark.stop()


if __name__ == "__main__":
    main()
