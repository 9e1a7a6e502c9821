"""Unit tests for the pure operator library (SURVEY.md section 5.1)."""

from __future__ import annotations

import sys
from difflib import SequenceMatcher

import numpy as np
import pytest

from repostcheckerbot_ray.functions import fingerprint as fp
from repostcheckerbot_ray.functions import scoring, textstats
from repostcheckerbot_ray.functions.extract import ReusableExtractor, extract_text
from repostcheckerbot_ray.functions.textnorm import (
    TEXT_SENTINELS,
    canonicalize,
    canonicalize_oracle,
    is_valid_text,
    normalize_url,
    tokenize,
)


# --- B7 canonicalizer --------------------------------------------------------
def test_canonicalize_matches_oracle_on_goldens():
    goldens = [
        "hello  world\n",
        " a\tb\r\nc ",
        "​ not a space (zero-width)",
        "\xa0nbsp em-space　ideographic",
        "\x1c\x1d\x1e\x1f file seps are isspace in python",
        "",
        "nochange",
    ]
    for s in goldens:
        assert canonicalize(s) == canonicalize_oracle(s)


def test_canonicalize_whole_bmp_agreement():
    # every codepoint below 0x3002 plus the supplementary sample round-trips
    s = "".join(map(chr, range(0x3002))) + "\U0001f600"
    assert canonicalize(s) == canonicalize_oracle(s)


def test_canonicalize_exact_semantics():
    # database.py:45-46: strip every isspace char, nothing else
    assert canonicalize("a b\nc") == "abc"
    assert canonicalize("​") == "​"  # zero-width space is NOT isspace


# --- B2 sentinel predicate ---------------------------------------------------
def test_text_validity_predicate():
    for s in TEXT_SENTINELS:
        assert not is_valid_text(s)
    assert not is_valid_text(None)
    assert is_valid_text("actual content")
    assert is_valid_text(" ")  # whitespace-only is "valid" per the reference


# --- B6 url normalizer -------------------------------------------------------
def test_normalize_url():
    assert (
        normalize_url("https://youtube.com/watch?v=x&feature=youtu.be")
        == "https://youtube.com/watch?v=x"
    )
    assert normalize_url("HTTPS://Example.COM/Path#frag") == "https://example.com/Path"


# --- extraction --------------------------------------------------------------
def test_extract_strips_script_style_and_decodes_entities():
    html = (
        b"<html><head><title>T</title><style>body{x:1}</style></head>"
        b"<body><p>Hello &amp; bye</p><script>var a=1;</script>"
        b"<div>tail</div></body></html>"
    )
    assert extract_text(html) == "THello & byetail"


def test_extract_nested_skip_and_charrefs():
    assert extract_text(b"<div><script>a<style>b</style>c</script>ok</div>") == "ok"
    assert extract_text(b"<p>&#x200B;</p>") == "​"
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_reusable_extractor_is_stateless_across_docs():
    ex = ReusableExtractor()
    a = ex.extract(b"<p>one</p>")
    b = ex.extract(b"<script>junk</script><p>two</p>")
    c = ex.extract(b"<p>one</p>")
    assert (a, b) == ("one", "two")
    assert a == c


# --- F1-F4 scoring -----------------------------------------------------------
def test_seq_ratio_matches_reference_semantics():
    a, b = "the quick brown fox", "the quick brown cat"
    assert scoring.seq_ratio(a, b) == SequenceMatcher(None, a, b).ratio()
    # database.py:396 predicate at default threshold 5 -> ratio > 0.5
    assert scoring.text_match(0.51)
    assert not scoring.text_match(0.5)
    assert scoring.text_pct(0.8) == pytest.approx(80.0)


def test_hamming_and_pct():
    assert scoring.hamming64(0b1011, 0b0010) == 2
    assert scoring.hamming64(0, 2**64 - 1) == 64
    assert scoring.hamming_match(4) and not scoring.hamming_match(5)
    assert scoring.hamming_pct(2) == pytest.approx((5 - 2) / 5 * 100)


def test_hamming64_matrix_agrees_with_scalar():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 2**63, 5, dtype=np.uint64)
    b = rng.randint(0, 2**63, 7, dtype=np.uint64)
    m = scoring.hamming64_matrix(a, b)
    for i in range(5):
        for j in range(7):
            assert m[i, j] == scoring.hamming64(int(a[i]), int(b[j]))


def test_chunk_list_distance_min_mean():
    # E2 (database.py:215-227): per-a-chunk min vs b, then mean
    a = np.array([0b0000, 0b1111], dtype=np.uint64)
    b = np.array([0b0001, 0b1110], dtype=np.uint64)
    assert scoring.chunk_list_distance(a, b) == pytest.approx(1.0)
    assert scoring.chunk_list_distance(np.empty(0, np.uint64), b) == 64.0


def test_ratio_upper_bound_is_sound():
    for a, b in [("abc", "abcdef"), ("xy", "xy"), ("", "abc"), ("aaaa", "bbbb")]:
        assert SequenceMatcher(None, a, b).ratio() <= scoring.ratio_upper_bound(len(a), len(b)) + 1e-12


# --- fingerprints ------------------------------------------------------------
def test_minhash_jaccard_estimate():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 2**63, 200, dtype=np.uint64)
    variant = base.copy()
    variant[:40] = rng.randint(0, 2**63, 40, dtype=np.uint64)  # J ~ 160/240
    s1 = fp.minhash_signature(base)
    s2 = fp.minhash_signature(variant)
    est = (s1 == s2).mean()
    true_j = 160 / 240
    assert abs(est - true_j) < 0.15


def test_band_keys_collide_iff_band_equal():
    rng = np.random.RandomState(4)
    sig = rng.randint(0, 2**63, fp.NUM_PERMS, dtype=np.uint64)
    sig2 = sig.copy()
    sig2[fp.ROWS_PER_BAND :] = rng.randint(0, 2**63, fp.NUM_PERMS - fp.ROWS_PER_BAND, dtype=np.uint64)
    k1, k2 = fp.band_keys(sig), fp.band_keys(sig2)
    assert k1[0] == k2[0]          # identical first band -> same key
    assert (k1[1:] != k2[1:]).all()  # perturbed bands -> different keys


def test_simhash_locality():
    rng = np.random.RandomState(5)
    sh = rng.randint(0, 2**63, 300, dtype=np.uint64)
    near = sh.copy()
    near[:15] = rng.randint(0, 2**63, 15, dtype=np.uint64)
    far = rng.randint(0, 2**63, 300, dtype=np.uint64)
    h, hn, hf = fp.simhash64(sh), fp.simhash64(near), fp.simhash64(far)
    assert scoring.hamming64(h, hn) < scoring.hamming64(h, hf)
    assert scoring.hamming64(h, hn) <= 16


def test_payload_hash_locality_and_determinism():
    rng = np.random.RandomState(6)
    data = bytes(rng.randint(0, 256, 2048, dtype=np.uint8))
    flipped = bytearray(data)
    flipped[100] ^= 0x01
    d_near = scoring.hamming64(fp.payload_hash64(data), fp.payload_hash64(bytes(flipped)))
    other = bytes(rng.randint(0, 256, 2048, dtype=np.uint8))
    d_far = scoring.hamming64(fp.payload_hash64(data), fp.payload_hash64(other))
    assert d_near < d_far
    assert fp.payload_hash64(data) == fp.payload_hash64(data)


def test_simhash_band_pigeonhole():
    v = 0x0123456789ABCDEF
    w = v ^ 0b10110  # 4 flipped bits < 8 bands -> at least one band equal
    assert set(fp.simhash_band_keys_64(v)) & set(fp.simhash_band_keys_64(w))


def test_shingles_and_short_docs():
    th = fp.token_hash_array(["a", "b", "c", "d"])
    sh = fp.shingle_hashes(th, k=3)
    assert len(sh) == 2
    assert len(fp.shingle_hashes(fp.token_hash_array(["a"]), k=3)) == 1
    assert len(fp.shingle_hashes(np.empty(0, np.uint64))) == 0
    cache: dict = {}
    assert (fp.token_hash_array(["a", "b", "a"], cache) == fp.token_hash_array(["a", "b", "a"])).all()


def test_tokenize():
    assert tokenize("Foo  BAR\nbaz") == ["foo", "bar", "baz"]


# --- textstats ---------------------------------------------------------------
def test_textstats():
    lang, conf = textstats.lang_id(tokenize("the cat and the dog are in the house"))
    assert lang == "en" and conf > 0.5
    assert textstats.lang_id([]) == ("und", 0.0)
    assert textstats.token_count_whitespace("a b  c") == 3
    assert textstats.token_count_bpeish("ab12, cd") == 4  # ab | 12 | , | cd
    f = textstats.quality_features("the cat sat")
    assert f["n_tokens"] == 3 and f["n_stopwords"] == 1
    assert 0.0 <= textstats.quality_score(f) <= 1.0
    assert textstats.doc_fingerprint("a  b\nc") == textstats.doc_fingerprint("a b c")
    assert textstats.doc_fingerprint("a b c") != textstats.doc_fingerprint("c b a")


# --- union-find --------------------------------------------------------------
def test_union_find_components_deterministic():
    from repostcheckerbot_ray.state.union_find import components_from_edges

    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    comp = components_from_edges(edges)
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # order-independence
    assert components_from_edges(reversed(edges)) == comp


def test_whitespace_constant_matches_full_scan():
    """The pinned whitespace codepoint list must equal the authoritative
    full-unicode isspace() scan (textnorm startup optimization)."""
    from repostcheckerbot_ray.functions.textnorm import (
        _whitespace_chars,
        _whitespace_chars_full_scan,
    )

    assert _whitespace_chars() == _whitespace_chars_full_scan()


def test_fingerprint_text_many_bit_identical_to_per_doc():
    """The batched text-fingerprint path must match the per-doc chain exactly
    (token_hash_array -> shingle_hashes -> simhash64 / band_keys(minhash)),
    including short (<k tokens), single-token, repeated-token, unicode and
    empty documents, with and without a shared cache."""
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(50)] + ["naïve", "日本語", "x"]
    docs = []
    for n in [0, 1, 2, 3, 5, 17, 64, 301]:
        docs.append([vocab[j] for j in rng.randint(0, len(vocab), size=n)])
    docs.append(["same"] * 10)
    docs.append([])  # second empty, not adjacent to the first

    for cache in (None, {}):
        lens, sim, bk = fp.fingerprint_text_many(docs, cache)
        for i, toks in enumerate(docs):
            th = fp.token_hash_array(toks, dict(cache) if cache is not None else None)
            sh = fp.shingle_hashes(th)
            assert lens[i] == len(toks)
            assert int(sim[i]) == fp.simhash64(sh)
            expect_bk = fp.band_keys(fp.minhash_signature(sh))
            np.testing.assert_array_equal(bk[i], expect_bk)

    # empty batch
    lens, sim, bk = fp.fingerprint_text_many([], {})
    assert len(lens) == 0 and len(sim) == 0 and bk.shape == (0, fp.NUM_BANDS)


def test_bpeish_count_three_engine_parity_incl_unicode_ws():
    """token_count_bpeish (Python re, ASCII \\s), Arrow's RE2
    count_substring_regex and DuckDB's RE2 regexp_extract_all must agree on
    inputs containing Unicode whitespace (NBSP is a symbol token in all
    three — the \\s classes are pinned ASCII on purpose)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    for s in ["a\u00a0b ab12, cd", "", "   ", "na\u00efve caf\u00e9 \u2615 12a", "a\u00a0\u2009b"]:
        py = textstats.token_count_bpeish(s)
        ar = pc.count_substring_regex(pa.array([s]), textstats.BPEISH_PATTERN)[0].as_py()
        dk = duckdb.sql(
            "SELECT len(regexp_extract_all(?, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))",
            params=[s]).fetchone()[0]
        assert py == ar == dk, (s, py, ar, dk)


def test_fingerprint_text_many_property_random_docs():
    """Property check (seeded Hypothesis): for ANY batch of token lists —
    unicode tokens, repeats, empties, short docs — the batched path equals
    the per-doc chain exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(min_size=1, max_size=8).filter(lambda s: not any(c.isspace() for c in s))
    doc = st.lists(token, min_size=0, max_size=40)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(doc, min_size=0, max_size=12))
    def check(docs):
        lens, sim, bk = fp.fingerprint_text_many(docs, {})
        for i, toks in enumerate(docs):
            sh = fp.shingle_hashes(fp.token_hash_array(toks))
            assert lens[i] == len(toks)
            assert int(sim[i]) == fp.simhash64(sh)
            np.testing.assert_array_equal(
                bk[i], fp.band_keys(fp.minhash_signature(sh)))

    check()


def test_text_in_image_flag():
    """sub_settings[8] BOT_TEXT_IN_IMAGE (/root/reference/config.py:18):
    with the flag ON (engine default) an image post with extractable text
    joins the text band/simhash channel; with it OFF the post is matched on
    payload hashes only. Result-affecting -> must flip the config hash."""
    import pyarrow as pa

    from repostcheckerbot_ray.pipelines.repost import RepostConfig
    from repostcheckerbot_ray.stages.fingerprint_stage import FingerprintBatcher

    batch = pa.table(
        {
            "url": pa.array(["http://img.example/x.png"], pa.string()),
            "warc_ts": pa.array([1_000_000], pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body>embedded caption words here for ocr "
                 b"matching channel</body></html>"], pa.binary()),
            "text": pa.array([""], pa.string()),  # invalid -> payload path
            "lang": pa.array(["en"], pa.string()),
        }
    )
    on = FingerprintBatcher(num_parts=4, text_in_image=True)(batch)
    off = FingerprintBatcher(num_parts=4, text_in_image=False)(batch)
    assert on["modality"][0].as_py() == "payload"
    assert off["modality"][0].as_py() == "payload"
    # payload channel identical either way
    assert on["payload_hash"][0].as_py() == off["payload_hash"][0].as_py()
    assert on["content_hash"][0].as_py() == off["content_hash"][0].as_py()
    # text channel only with the flag on
    assert len(on["band_keys"][0].as_py()) > 0
    assert on["n_tokens"][0].as_py() > 0
    assert off["band_keys"][0].as_py() == []
    assert off["n_tokens"][0].as_py() == 0
    assert off["simhash"][0].as_py() == 0
    # text_norm (the byte-identity invariant) is flag-independent
    assert on["text_norm"][0].as_py() == off["text_norm"][0].as_py() != ""
    # checkpoint invalidation: the flag is in the config hash
    assert (RepostConfig(text_in_image=True).hash()
            != RepostConfig(text_in_image=False).hash())
