"""Correctness pins for corpus ops whose driver check is rows-only.

- simhash_dedup_clusters: pinned against a brute-force O(n²) Hamming pass
  over the SAME simhash values (the reference's full-table fuzzy scan shape,
  /root/reference/database.py:389-405) — proves the 16-bit-band blocked scan
  loses nothing at Hamming ≤ 3 on this corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def test_simhash_clusters_match_bruteforce(ray_session):
    from repostcheckerbot_ray.functions.fingerprint import (
        shingle_hashes,
        simhash64,
        token_hash_array,
    )
    from repostcheckerbot_ray.functions.scoring import hamming64_matrix
    from repostcheckerbot_ray.pipelines import corpus_ops
    from repostcheckerbot_ray.state.union_find import components_from_edges

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    cache: dict = {}
    sims = np.array(
        [simhash64(shingle_hashes(token_hash_array(t.lower().split(), cache)))
         for t in docs["text"].to_pylist()],
        dtype=np.uint64,
    )
    ham = hamming64_matrix(sims, sims)
    ai, bi = np.nonzero(np.triu(ham <= 3, k=1))
    edges = [(min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ai, bi)]
    assert edges, "corpus must contain simhash near-dups for this pin to bite"
    want = components_from_edges(edges)

    got_df = corpus_ops.simhash_dedup_clusters(SF).to_pandas()
    got = dict(zip(got_df["doc_id"], got_df["cluster_id"]))
    for d in ids:
        assert got[d] == want.get(d, d), f"doc {d}: {got[d]} != {want.get(d, d)}"


def test_part_count_invariance(ray_session, monkeypatch):
    """The exchange part count is a pure performance knob (sized to input
    and cluster): forcing different P must produce IDENTICAL results for
    the part-keyed operators (band dedup, sessionization, temporal joins).
    This is the determinism contract that lets part counts scale with the
    cluster at 100 TB without re-validating outputs."""
    import pandas as pd

    from repostcheckerbot_ray.pipelines import corpus_ops

    SF = "/root/testdata/sf0.001"

    def run_all():
        out = {}
        out["minhash"] = corpus_ops.minhash_dedup_clusters(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        out["sessions"] = corpus_ops.session_counts(SF).to_pandas() \
            .sort_values(["user_id", "session_id"]).reset_index(drop=True)
        out["range"] = corpus_ops.range_join_events(SF).to_pandas() \
            .sort_values(["left_event_id", "right_event_id"]).reset_index(drop=True)
        out["contam"] = corpus_ops.contamination_check(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return out

    results = {}
    for p in (5, 17):  # deliberately odd, small, different
        monkeypatch.setattr(corpus_ops, "_n_parts", lambda n_rows=None, _p=p: _p)
        results[p] = run_all()
    for key in results[5]:
        pd.testing.assert_frame_equal(results[5][key], results[17][key])


def test_simhash_identical_sketch_blowup(ray_session, tmp_path):
    """Round-3 ADVICE regression: >max_block (256) docs with IDENTICAL
    simhash (boilerplate corpus) used to shard with coinciding boundaries
    across all 4 bands, splitting one true cluster. The rep-dedup-by-sketch
    rule must keep the whole family in ONE cluster at any size, and must
    not merge distinct families."""
    import pyarrow as pa

    from repostcheckerbot_ray.pipelines import corpus_ops

    n_a, n_b = 600, 300  # both far above max_block
    texts = (["the same boilerplate text repeated verbatim"] * n_a
             + ["a completely different second family of text"] * n_b)
    t = pa.table({
        "doc_id": pa.array(range(n_a + n_b), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = corpus_ops.simhash_dedup_clusters(str(d)).to_pandas()
    cl = dict(zip(got["doc_id"], got["cluster_id"]))
    assert all(cl[i] == 0 for i in range(n_a)), "family A split"
    assert all(cl[i] == n_a for i in range(n_a, n_a + n_b)), "family B split"


def test_length_quantiles_sketch_error_bound(ray_session):
    """The mergeable log-bucket sketch must land within its documented
    relative error of the EXACT discrete quantiles (γ=1.02 ⇒ one bucket ⇒
    ≤ ~2% value error, plus the off-by-one-bucket boundary case)."""
    from repostcheckerbot_ray.pipelines import corpus_ops

    exact = corpus_ops.source_length_quantiles(SF).to_pandas().set_index("source")
    got = corpus_ops.length_quantiles_sketch(SF).to_pandas().set_index("source")
    assert set(got.index) == set(exact.index)
    for src in exact.index:
        assert int(got.loc[src, "n_docs"]) == int(exact.loc[src, "n_docs"])
        for col in ("p50_chars", "p90_chars"):
            e = float(exact.loc[src, col])
            a = float(got.loc[src, col])
            assert abs(a - e) <= max(2.0, 0.025 * e), (src, col, a, e)


def test_regex_tokenizer_matches_str_split():
    """The engine tokenizes text columns with RE2 over the EXPLICIT
    isspace() codepoint class (textnorm.WS_REGEX_CLASS / NONWS_RUN_REGEX —
    Arrow's utf8_split_whitespace was observed returning nondeterministic
    results for non-ASCII whitespace inside Ray workers on this host, so
    the property-table kernels are banned from oracled paths). This pins
    the RE2 class's token extraction and token count EQUAL to Python
    str.split() over the full Unicode range."""
    import sys

    import pyarrow as pa
    import pyarrow.compute as pc

    from repostcheckerbot_ray.functions.textnorm import (
        NONWS_RUN_REGEX,
        WS_REGEX_CLASS,
        _WHITESPACE_CODEPOINTS,
    )

    cps = [c for c in range(sys.maxunicode + 1) if not 0xD800 <= c <= 0xDFFF]
    texts = [f"a{chr(c)}b" for c in cps]
    arr = pa.array(texts, pa.string())
    # RE2 split on the class ⇔ the codepoint is whitespace
    n_parts = pc.list_value_length(
        pc.split_pattern_regex(arr, WS_REGEX_CLASS + "+")).to_numpy()
    re2_ws = {c for c, n in zip(cps, n_parts) if n == 2}
    assert re2_ws == set(_WHITESPACE_CODEPOINTS)
    # non-ws-run COUNT == len(str.split()) on boundary/empty/all-ws shapes
    edge = ["", " ", "\xa0", "\xa0a", "a\xa0", " a  b ", "　x　",
            "a", "nel\x85nel", "\t\n a   b "]
    got = pc.count_substring_regex(
        pa.array(edge, pa.string()), NONWS_RUN_REGEX).to_pylist()
    assert got == [len(s.split()) for s in edge]
