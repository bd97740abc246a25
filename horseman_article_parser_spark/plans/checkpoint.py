"""Crawl checkpoint store: snapshot-committed parquet state.

Layout (Iceberg-shaped: immutable data files + an atomically-replaced
manifest pointer; on a cluster this directory IS an Iceberg warehouse —
the parquet layout and commit protocol map 1:1 onto Iceberg snapshots,
which this container cannot run for lack of the runtime jars):

    store/
      manifest.json        # {"last_round": N} — atomic commit pointer
      pending/round=N/     # pending frontier snapshot after round N
      waves/round=N/       # the scheduled wave of round N (ordered)
      results/round=N/     # extracted article structs
      metrics/round=N/     # per-host + per-partition lineage metrics
      bloom/, exact_seen/  # seen-filter state (its own manifests)

Exact resume (north rule): a crashed round never bumped the manifest,
so rerunning it regenerates byte-identical outputs (every stage is a
deterministic function of committed state) and then commits.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CrawlStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ paths

    def path(self, kind: str, round_no: int) -> str:
        return os.path.join(self.root, kind, f"round={round_no}")

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    # ----------------------------------------------------------- commit

    def last_round(self) -> int:
        """Last committed round; -1 = seeded only, -2 = empty store."""
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)["last_round"]
        except FileNotFoundError:
            return -2

    def commit_round(self, round_no: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump({"last_round": round_no}, f)
        os.replace(tmp, self._manifest_path())

    # --------------------------------------------------------------- io

    def write(self, df: DataFrame, kind: str, round_no: int) -> None:
        df.write.mode("overwrite").parquet(self.path(kind, round_no))

    def read(self, spark: SparkSession, kind: str, round_no: int) -> DataFrame:
        return spark.read.parquet(self.path(kind, round_no))

    def exists(self, kind: str, round_no: int) -> bool:
        return os.path.exists(self.path(kind, round_no))
