"""Web-page corpus source (A1/A2/E7, SURVEY.md §2.A).

The reference's two submission streams (/root/reference/app.py:58-115,
127-177) map to Parquet directory reads; this module is the single place
that owns the read so every pipeline gets the same pruning/TTL behavior:

- column pruning pushed into the Parquet scan (``columns=``) — a read that
  loads all columns for a two-column transform never leaves storage;
- the B9 TTL admission predicate (database.py:312-323) applied at the read,
  batch-wise on the timestamp column, before anything heavier runs;
- multiple input directories union into one logical stream (E7,
  app.py:55-56: top-scanner + new-scanner feed one table).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(paths, columns=None, ttl_cutoff_us: int | None = None):  # noqa: ANN001
    """One or more Parquet page directories -> a single pages Dataset.

    ``paths`` may be a str, a list of str (unioned, E7), or an existing
    Dataset (passed through so pipelines accept pre-built streams).
    """
    import ray.data as rd

    if hasattr(paths, "map_batches"):  # already a Dataset
        ds = paths
    else:
        if isinstance(paths, str):
            paths = [paths]
        parts = [rd.read_parquet(p, columns=columns) for p in paths]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)

    if ttl_cutoff_us is not None:
        cutoff = pa.scalar(ttl_cutoff_us, pa.timestamp("us"))
        ds = ds.map_batches(
            lambda t: t.filter(pc.greater_equal(t["warc_ts"], cutoff)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return ds
