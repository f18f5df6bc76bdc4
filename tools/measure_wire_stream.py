"""Measure `streaming.source.wire_stream` decode throughput at a given
scale: render REAL binlog wire files from the dataset's CDC stream into a
relay directory (the write side, timed separately), then tail the
directory with the Structured Streaming source and count decoded frame
rows (the read side — the number PERF_R8 cites).

Usage: python tools/measure_wire_stream.py [sf_dir] [rotate_rows]
Prints one JSON line: {"write_s":…, "read_s":…, "rows":…, "rows_per_s":…,
"files":…}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.stress_sf1"
    rotate = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    from polardbx_cdc_spark.session import get_spark
    from polardbx_cdc_spark.streaming import pipeline, source

    spark = get_spark("wire-stream-bench")
    work = tempfile.mkdtemp(prefix="wirestream_")
    try:
        out, ckpt, wire = (os.path.join(work, d) for d in ("sink", "ckpt", "wire"))
        t0 = time.perf_counter()
        q, sink = pipeline.run_binlog_pipeline(
            source.cdc_stream(spark, sf_dir), out, ckpt,
            rotate_rows=rotate, frame_txns=True, wire_dir=wire,
        )
        q.awaitTermination(600)
        sink.flush()
        write_s = time.perf_counter() - t0
        n_files = len([f for f in os.listdir(wire) if f.startswith("binlog.")])

        # read side: one availableNow pass over the rendered relay dir
        def read_once() -> tuple[float, int]:
            rd = os.path.join(work, f"read_{time.monotonic_ns()}")
            t1 = time.perf_counter()
            frames = source.wire_stream(spark, wire)
            rq = (
                frames.writeStream.format("parquet")
                .option("path", rd)
                .option("checkpointLocation", rd + "_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            rq.awaitTermination(600)
            rows = spark.read.parquet(rd).count()
            return time.perf_counter() - t1, rows

        read_once()  # warm-up: streaming plan codegen is a first-run cost
        best, rows = min((read_once() for _ in range(2)), key=lambda t: t[0])
        print(json.dumps({
            "sf_dir": sf_dir,
            "write_s": round(write_s, 2),
            "read_s": round(best, 2),
            "rows": rows,
            "rows_per_s": round(rows / best, 1) if best else None,
            "files": n_files,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
