"""Per-round environment probe for transformWithStateInPandas (the one
COVERAGE.md PARTIAL: its state-server wire protocol needs ``protobuf``
inside Spark's Python worker, which this container lacks and cannot
install — no network, pip resolves no index).

Run by tools/round_close.sh each round; writes TWS_PROBE.json with
either ``{"status": "blocked", "reason": "no protobuf"}`` or — the
first time the environment gains the dependency — actually executes the
operator end-to-end against the sf0.001 events replay and records
``{"status": "executed", "rows": N}``, flipping the PARTIAL to proven
automatically (round-6 verdict #7).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TWS_PROBE.json")


def main() -> int:
    try:
        import google.protobuf  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    if not have_protobuf:
        record = {
            "status": "blocked",
            "reason": "no protobuf (state-server wire protocol dependency; "
            "container has no network, pip cannot resolve any index)",
            "tested_instead": "logic contract vs fake handle + plan analysis "
            "(tests/test_streaming.py:397-445)",
        }
        with open(OUT, "w") as fh:
            json.dump(record, fh, indent=1)
        print(json.dumps(record))
        return 0

    # protobuf exists: execute the operator for real and record it
    from watsondedupe_spark import streaming as S
    from watsondedupe_spark.queries.events import _stage_events_stream_dir
    from watsondedupe_spark.session import get_spark

    spark = get_spark("tws-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        sdf = S.stateful_user_profile_tws(
            S.stream_from_dir(spark, _stage_events_stream_dir("/root/testdata/sf0.001"))
        )
        with S.state_partitions(spark, 8):
            q = S.run_to_memory(sdf, "tws_probe_sink", "update")
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = spark.table("tws_probe_sink").count()
        record = {"status": "executed", "rows": int(rows)}
    except Exception as e:  # record the failure mode rather than crash the runbook
        record = {"status": "failed", "error": f"{type(e).__name__}: {e}"[:300]}
    finally:
        spark.stop()
    with open(OUT, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    return 0 if record["status"] == "executed" else 1


if __name__ == "__main__":
    sys.exit(main())
