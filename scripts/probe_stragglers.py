"""r16: sample the status tracker while a query runs — if the active
task count sits at 1-2 for long stretches on local[32], the query is
straggler-bound and more cores cannot help (guide §2.5/§2.6).

    python scripts/probe_stragglers.py <sf_dir> <query>
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from training_flink_sql_cc_src_spark.registry import all_queries
from training_flink_sql_cc_src_spark.session import get_spark


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    spark = get_spark("probe-stragglers")
    spark.sparkContext.setLogLevel("ERROR")
    from training_flink_sql_cc_src_spark.queries.llm_dedup import _token_sketch

    _token_sketch(spark, sf_dir)
    fn = all_queries()[name]
    samples: list[tuple[float, int, str]] = []
    stop = threading.Event()
    tracker = spark.sparkContext.statusTracker()

    def poll():
        t0 = time.time()
        while not stop.is_set():
            try:
                sids = tracker.getActiveStageIds()
                active = 0
                parts = []
                for sid in sids:
                    info = tracker.getStageInfo(sid)
                    if info:
                        active += info.numActiveTasks
                        parts.append(
                            f"s{sid}:{info.numCompletedTasks}/{info.numTasks}"
                        )
                samples.append((time.time() - t0, active, " ".join(parts)))
            except Exception:
                pass
            time.sleep(0.5)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    stop.set()
    th.join(timeout=2)
    print(f"wall: {wall:.1f}s")
    lowpar = sum(1 for _, a, _ in samples if 0 < a <= 4) * 0.5
    print(f"seconds with <=4 active tasks: {lowpar:.1f}")
    for t, a, p in samples:
        print(f"{t:7.1f}s active={a:3d}  {p}")


if __name__ == "__main__":
    main()
