"""S5 HTTP probe (HEAD→GET fallback preflight).

Behavior parity with the reference's httpProbe
(/root/reference/scripts/batch-sample-run.js:34-57): a cheap HEAD
status check before the expensive full fetch; sites that 405 on HEAD
fall back to a short GET. In this engine the probe is a pluggable
`probe_fn(url) -> status` (the sandbox replaces live HTTP with
deterministic synthetic responses, SURVEY §7.3), and the wave stage is
a mapInPandas pass with the same bounded thread-pool overlap the fetch
kernel uses — probes are pure RTT, so overlapping them is the whole
point.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PROBE_OK_STATUSES = range(200, 400)
HEAD_FALLBACK_STATUS = 405  # sites that reject HEAD still get a GET


def probe_ok(status: int) -> bool:
    """Fetch-worthy? ok statuses, or 405 (HEAD rejected → GET anyway)."""
    return status in PROBE_OK_STATUSES or status == HEAD_FALLBACK_STATUS


def probe_urls(
    frontier: DataFrame,
    probe_fn: Callable[[str], int],
    url_col: str = "url",
    concurrency: int = 8,
) -> DataFrame:
    """Add (status int, ok boolean) probe columns; rows keep all input
    columns so the caller filters `ok` before the fetch wave."""
    out_schema = T.StructType(
        list(frontier.schema.fields)
        + [T.StructField("status", T.IntegerType()),
           T.StructField("ok", T.BooleanType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            if not len(pdf):
                continue
            urls = list(pdf[url_col])
            if concurrency > 1 and len(urls) > 1:
                with ThreadPoolExecutor(
                    max_workers=min(concurrency, len(urls))
                ) as ex:
                    statuses = list(ex.map(probe_fn, urls))
            else:
                statuses = [probe_fn(u) for u in urls]
            pdf = pdf.copy()
            pdf["status"] = statuses
            pdf["ok"] = [probe_ok(s) for s in statuses]
            yield pdf

    return frontier.mapInPandas(run, schema=out_schema)
