"""Spill/memory headroom for the 100 TB story (VERDICT r02 next-round #8).

The heavyweight window/agg queries must run with a deliberately CONSTRAINED
driver (2g heap, local mode = driver and executors share it), shuffle
partitions forced high and scan partitions forced tiny — the configuration
that makes any accidental driver-side materialization or whole-table
broadcast blow up immediately instead of hiding in a 128 GiB dev box.

Runs in a subprocess because driver memory is fixed at JVM launch.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

_SCRIPT = r"""
import sys
sys.path.insert(0, @REPO@)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "200")
    .config("spark.sql.files.maxPartitionBytes", "262144")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("headroom")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from weather_data_pipeline_spark.plans.queries import REGISTRY

for name in @QUERIES@:
    n = REGISTRY[name].spark(spark, @SF@).count()
    print(f"OK {name} rows={n}", flush=True)
spark.stop()
print("HEADROOM_PASS")
"""


def test_heavy_queries_run_within_2g_driver(sf_dir):
    queries = [
        "feature_pipeline_weather",  # 70-col window pipeline
        "passage_dedup_documents",  # md5-keyed shuffle + window
        "cosine_near_dup_embeddings",  # block-pair matmul (no driver collect)
        "minhash_lsh_candidates_documents",
    ]
    # derive the repo root from this file, not a hardcoded path — the
    # subprocess must import THIS checkout wherever it lives
    repo_root = str(Path(__file__).resolve().parents[1])
    script = (
        _SCRIPT.replace("@REPO@", repr(repo_root))
        .replace("@QUERIES@", repr(queries))
        .replace("@SF@", repr(sf_dir))
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "HEADROOM_PASS" in proc.stdout, proc.stdout[-2000:]
