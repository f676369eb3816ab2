"""One-off calibration: measure the quiet-session cost of (a) the
canonical null drain (memory sink, /dev/shm source) and (b) the new
FILE-WRITE drain (parquet sink + real checkpoint dir on the default
tmp filesystem — the same unit the sink/stateful gate floors live in).

Run on an idle box; prints per-sample timings + medians.  The medians
become _STREAM_SENTINEL_REF / _STREAM_FILE_SENTINEL_REF in bench.py.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pql_spark.sources import build_session  # noqa: E402
from pql_spark.streaming import run_available_now  # noqa: E402


def main() -> None:
    spark = build_session("file_sentinel_calib")
    spark.sparkContext.setLogLevel("ERROR")
    # standard bench warmup
    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores, 1, cores).mapInPandas(lambda it: it, "id long").count()

    shm = Path("/dev/shm")
    src = Path(tempfile.mkdtemp(prefix="pql_calib_",
                                dir=str(shm) if shm.is_dir() else None))
    spark.createDataFrame([(1,)], "id long").write.parquet(str(src / "one"))
    schema = spark.read.parquet(str(src / "one")).schema

    def null_drain() -> None:
        s = spark.readStream.schema(schema).parquet(str(src / "one"))
        run_available_now(s.select("id"), "append")

    def file_drain() -> None:
        d = Path(tempfile.mkdtemp(prefix="pql_fsent_"))  # default tmp fs
        try:
            s = spark.readStream.schema(schema).parquet(str(src / "one"))
            q = (
                s.select("id")
                .writeStream.format("parquet")
                .option("path", str(d / "out"))
                .option("checkpointLocation", str(d / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            spark.read.parquet(str(d / "out")).count()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for name, fn in [("null", null_drain), ("file", file_drain)]:
        fn()  # warm
        runs = []
        for _ in range(7):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        runs_s = sorted(runs)
        print(f"{name}: samples={runs} median={runs_s[3]} "
              f"min={runs_s[0]} max={runs_s[-1]}")

    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
