"""Hot-label fan-out pin for embedding_dup_pairs (round-4 VERDICT item 3).

ALL vectors share ONE label — the pathological blocking-key case where the
old groupby(label) shape ran the whole quadratic scan in one task. The
exchange is now keyed by (label, tile_i, tile_j); this pins:

1. recall is EXACTLY preserved: tiny-tile run (many cells) == single-cell
   run == brute-force O(n²) cosine scan, planted dup pairs included;
2. the work genuinely fans out: the tile assignment puts the label's rows
   in >1 tile, so >1 (ci, cj) cell group exists — each cell is its own
   map_groups task by construction of the groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _one_label_dir(tmp_path, n: int = 60, dim: int = 16) -> str:
    rng = np.random.default_rng(7)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    # plant near-dups: vector i+1 := vector i for every 10th i (exact copy
    # => cosine 1.0 > 0.99 regardless of normalization)
    for i in range(0, n - 1, 10):
        base[i + 1] = base[i]
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    d = tmp_path / "sf_onelabel"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


def test_hot_label_tile_fanout_identical_pairs(ray_session, tmp_path):
    from repostcheckerbot_ray.pipelines import embedding_ops

    d = _one_label_dir(tmp_path)

    def run(tile: int) -> pd.DataFrame:
        return (embedding_ops.embedding_dup_pairs(d, tile=tile).to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    single = run(10**9)   # one cell: the old groupby(label) shape
    fanned = run(8)       # ceil(120/8) = 15 tiles -> 120 cells
    pd.testing.assert_frame_equal(single, fanned)

    # brute-force oracle over embeddings ∪ id-shifted copy
    t = pq.read_table(f"{d}/embeddings.parquet")
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    vids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    allm = np.vstack([m, m])
    allv = np.r_[vids, vids + embedding_ops.COPY_SHIFT]
    sims = allm @ allm.T
    ai, bi = np.nonzero(sims > 0.99)
    keep = allv[ai] < allv[bi]
    want = (pd.DataFrame({"id_a": np.minimum(allv[ai[keep]], allv[bi[keep]]),
                          "id_b": np.maximum(allv[ai[keep]], allv[bi[keep]])})
            .drop_duplicates().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    assert len(want) > 0, "planted dups must produce pairs"
    pd.testing.assert_frame_equal(fanned, want)

    # the fan-out is real: rows hash into >1 tile at tile=8, so the
    # planted pairs were found across multiple independent cell groups
    n_rows = 2 * len(vids)
    T = -(-n_rows // 8)
    h = pd.util.hash_array(allv.astype(np.int64), categorize=False)
    tiles = (h % np.uint64(T)).astype(np.int64)
    assert len(np.unique(tiles)) > 1
