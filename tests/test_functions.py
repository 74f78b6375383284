"""Training-data-pipeline ops: dedup, similarity, text stats, multimodal
plumbing — vs pure-python/numpy oracles."""

from __future__ import annotations

import hashlib
import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from jgtextrank_spark.functions.dedup import (
    embedding_near_dup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from jgtextrank_spark.functions.multimodal import (
    FEATURE_DIM,
    fake_image_features,
    media_metadata,
)
from jgtextrank_spark.functions.similarity import cosine_topk, lsh_topk
from jgtextrank_spark.functions.textstats import (
    fingerprint,
    lang_id,
    token_count,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _mkdocs(spark, rng_seed=3, n=30, dup_groups=3):
    rng = random.Random(rng_seed)
    docs = []
    for i in range(n):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(25))))
    # exact duplicates
    for g in range(dup_groups):
        docs.append((n + 2 * g, docs[g][1]))
        docs.append((n + 2 * g + 1, docs[g][1]))
    # near duplicate: one word changed
    toks = docs[0][1].split()
    toks[5] = "OMEGA"
    docs.append((999, " ".join(toks)))
    return spark.createDataFrame(docs, "doc_id long, text string")


def _jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(spark):
    docs = _mkdocs(spark)
    got = {
        r["fp"]: (r["canonical_doc"], r["n_docs"])
        for r in exact_duplicates(docs).collect()
    }
    # 3 dup groups of 3 docs each (original + two copies)
    assert len(got) == 3
    assert all(n == 3 for _, n in got.values())
    assert {c for c, _ in got.values()} == {0, 1, 2}


def test_ngram_jaccard_exact(spark):
    docs = _mkdocs(spark)
    rows = ngram_jaccard_pairs(docs, threshold=0.3).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    # brute-force oracle
    ids = sorted(texts)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _jaccard(texts[a], texts[b])
            if round(j, 6) >= 0.3:
                want[(a, b)] = round(j, 6)
    assert got == want
    assert (0, 999) in got  # the near-dup pair survives


def test_minhash_candidates_superset_of_high_jaccard(spark):
    docs = _mkdocs(spark)
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, verify_threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.95).collect()
    }
    # exact duplicates (jaccard 1.0) always share every band
    assert exact <= verified


def test_simhash_properties(spark):
    docs = _mkdocs(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    # identical docs -> identical signatures
    assert sigs[0] == sigs[30] == sigs[31]
    # near-dup -> small hamming distance
    ham = bin(sigs[0] ^ sigs[999]).count("1")
    assert ham <= 12
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=12).collect()
    }
    assert pairs[(0, 30)] == 0
    assert (0, 999) in pairs


def _mkemb(spark, n=40, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.randn(dim).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def test_cosine_topk_exact(spark):
    emb, vecs = _mkemb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk(emb, queries, k=3).collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for q in range(5):
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-round(sims[q, i], 6), i),
        )[:3]
        got_q = sorted(
            [r for r in got if r["q_id"] == q], key=lambda r: r["rank"]
        )
        assert [r["n_id"] for r in got_q] == order
        for r in got_q:
            assert abs(r["cosine"] - sims[q, r["n_id"]]) < 1e-5


def test_lsh_topk_finds_near_duplicate(spark):
    emb, _ = _mkemb(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    got = lsh_topk(emb, queries, k=3, bucket_dims=4).collect()
    assert got, "lsh returned nothing"
    assert got[0]["n_id"] == 1  # the planted near-dup shares the bucket


def test_ivf_topk_recall(spark):
    """IVF-flat: deterministic index, planted near-dup recovered, and
    recall@3 vs the exact ranking stays useful at n_probe=2/8 lists."""
    from jgtextrank_spark.functions.similarity import ivf_topk

    emb, _ = _mkemb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=3).collect()
    got = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2).collect()
    assert got
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["n_id"])
    # planted near-dup of vec 0 is vec 1 — near-identical vectors share
    # the nearest coarse centroid, so IVF must recover it
    assert 1 in by_q[0]
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["q_id"], set()).add(r["n_id"])
    hits = sum(
        len(by_q.get(q, set()) & s) for q, s in exact_by_q.items()
    )
    total = sum(len(s) for s in exact_by_q.values())
    assert hits / total >= 0.5  # approximate, but not useless
    # determinism: identical re-run
    again = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in got}


def test_ivf_kmeans_refinement_recall(spark):
    """Lloyd refinement (kmeans_iters>0): still deterministic, still
    recovers the planted near-dup, and recall@k vs the exact oracle does
    not drop below the seeded-sample index (measured, per VERDICT r2)."""
    from jgtextrank_spark.functions.similarity import ivf_topk

    emb, _ = _mkemb(spark, n=60)
    queries = emb.filter(F.col("vec_id") < 8)
    exact_by_q = {}
    for r in cosine_topk(emb, queries, k=3).collect():
        exact_by_q.setdefault(r["q_id"], set()).add(r["n_id"])

    def recall(iters):
        got = ivf_topk(
            emb, queries, k=3, n_centroids=8, n_probe=2,
            kmeans_iters=iters,
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["n_id"])
        hits = sum(
            len(by_q.get(q, set()) & s) for q, s in exact_by_q.items()
        )
        return by_q, hits / sum(len(s) for s in exact_by_q.values())

    by_q0, r0 = recall(0)
    by_q2, r2 = recall(2)
    assert 1 in by_q2[0]  # planted near-dup still recovered
    assert r2 >= r0  # refinement must not cost recall on this corpus
    assert r2 >= 0.5
    # determinism of the refined index: identical re-run
    a = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2,
                 kmeans_iters=2).collect()
    b = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2,
                 kmeans_iters=2).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    # shuffle-join probe path (broadcast_probes=False) gives identical
    # results to the broadcast path
    c = ivf_topk(emb, queries, k=3, n_centroids=8, n_probe=2,
                 kmeans_iters=2, broadcast_probes=False).collect()
    assert {tuple(r) for r in c} == {tuple(r) for r in a}


def test_embedding_near_dup(spark):
    emb, vecs = _mkemb(spark)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert (0, 1) in got
    assert got[(0, 1)] > 0.99


def test_textstats_basics(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox is near the lazy dog of doom"),
         (2, "zzz qqq"),
         (3, "")],
        "doc_id long, text string",
    )
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert tc == {1: 11, 2: 2, 3: 0}
    li = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert li[1] == "en" and li[2] == "und" and li[3] == "und"
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    import hashlib as h

    assert fp[1] == h.md5(
        b"the quick brown fox is near the lazy dog of doom"
    ).hexdigest()


def test_multimodal_plumbing(spark):
    rows = [
        ("a", bytes([0x89]) + b"PNG----payload"),
        ("b", b"\xff\xd8\xff jpeg-ish"),
        ("c", b"plain bytes"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    meta = {r["doc_id"]: r for r in media_metadata(df).collect()}
    assert meta["a"]["media_type"] == "image/png"
    assert meta["b"]["media_type"] == "image/jpeg"
    assert meta["c"]["media_type"] == "application/octet-stream"
    assert meta["d"]["media_type"] == "unknown"
    assert meta["a"]["n_bytes"] == len(rows[0][1])

    feats = {r["doc_id"]: r["feature"] for r in fake_image_features(df).collect()}
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    # deterministic: same bytes -> same features
    want = hashlib.md5(rows[2][1]).digest()
    assert feats["c"][0] == pytest.approx((want[0] - 127.5) / 127.5)


def test_decode_stub_raises(spark):
    from jgtextrank_spark.functions.multimodal import decode_images

    df = spark.createDataFrame(
        [("a", b"xx")], "doc_id string, payload binary"
    )
    with pytest.raises(Exception, match="image decode requires"):
        decode_images(df).collect()


def test_resize_frames_audio_plumbing(spark):
    """Resize / frame-sample / audio-feature Arrow plumbing: fixed-width
    outputs, deterministic kernels, 1->N frame fan-out, real-kernel
    stub raises."""
    from jgtextrank_spark.functions.multimodal import (
        audio_features,
        resize_images,
        sample_frames,
    )

    df = spark.createDataFrame(
        [("a", b"img-bytes"), ("b", None)], "doc_id string, payload binary"
    )
    px = {r["doc_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert len(px["a"]["pixels"]) == 16 and len(px["b"]["pixels"]) == 16
    assert (px["a"]["height"], px["a"]["width"]) == (4, 4)
    px2 = {r["doc_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert px2["a"]["pixels"] == px["a"]["pixels"]  # deterministic

    frames = sample_frames(df, n_frames=3).collect()
    assert len(frames) == 6  # 2 docs x 3 frames
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], set()).add(r["frame_idx"])
        assert len(r["feature"]) == 16
    assert by_doc == {"a": {0, 1, 2}, "b": {0, 1, 2}}
    # frames of the same doc differ (salted per index)
    f_a = {r["frame_idx"]: r["feature"] for r in frames if r["doc_id"] == "a"}
    assert f_a[0] != f_a[1]

    au = {r["doc_id"]: r for r in audio_features(df, n_coeffs=13).collect()}
    assert len(au["a"]["coeffs"]) == 13 and au["b"]["n_bytes"] == 0

    with pytest.raises(Exception, match="image decode requires"):
        resize_images(df, kernel="real").collect()


# ------------------------------------------------------- curation operators
def _py_ngrams(text, n):
    toks = [t for t in text.split(" ") if t != ""]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_repetition_signals(spark):
    """Gopher-style repetition heuristics vs a pure-python mirror:
    duplicate-line fraction, modal-bigram share, repeated-trigram
    occurrence share."""
    from collections import Counter

    from jgtextrank_spark.functions.curation import repetition_signals

    docs = [
        (1, "a b\nc d\na b\n\ne f"),   # one duplicated line of four
        (2, "x y x y x y x"),          # fully degenerate loop
        (3, "one two three four"),     # all grams distinct
        (4, "solo"),                   # no grams at all
        (5, ""),                       # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for doc_id, text in docs:
        lines = [s for s in text.split("\n") if s != ""]
        dup_line = (
            1.0 - len(set(lines)) / len(lines) if len(lines) > 1 else 0.0
        )
        g2, g3 = Counter(_py_ngrams(text, 2)), Counter(_py_ngrams(text, 3))
        top2 = max(g2.values()) / sum(g2.values()) if g2 else 0.0
        dup3 = (
            sum(c for c in g3.values() if c > 1) / sum(g3.values())
            if g3
            else 0.0
        )
        r = got[doc_id]
        assert r["n_lines"] == len(lines)
        assert abs(r["dup_line_frac"] - dup_line) < 1e-6, (doc_id, r)
        assert abs(r["top_bigram_frac"] - top2) < 1e-6, (doc_id, r)
        assert abs(r["dup_trigram_frac"] - dup3) < 1e-6, (doc_id, r)


def test_pii_scrub(spark):
    """Email/phone/IPv4 detection + redaction; emails redacted before the
    phone pass; counts from the original text."""
    from jgtextrank_spark.functions.curation import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co or c.d+e@f-g.org now"),
            (2, "call 415-555-1234 or 415.555.9999 thanks"),
            (3, "host 10.0.0.1 and 192.168.254.7, port 80"),
            (4, "mixed: u1@ex.org 650 555 0000 at 127.0.0.1"),
            (5, "clean text, no pii at all; 100% sure"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (2, 0, 0)
    assert got[1]["clean_text"] == "mail <EMAIL> or <EMAIL> now"
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 2, 0)
    assert got[2]["clean_text"] == "call <PHONE> or <PHONE> thanks"
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 2)
    assert got[3]["clean_text"] == "host <IP> and <IP>, port 80"
    assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ips"]) == (1, 1, 1)
    assert got[4]["clean_text"] == "mixed: <EMAIL> <PHONE> at <IP>"
    assert (got[5]["n_emails"], got[5]["n_phones"], got[5]["n_ips"]) == (0, 0, 0)
    assert got[5]["clean_text"] == "clean text, no pii at all; 100% sure"


def test_decontaminate(spark):
    """n-gram benchmark-overlap contamination check: exact-match docs and
    superstring docs flagged, clean docs not; a gram repeated inside one
    doc counts once; short docs (< n tokens) are handled."""
    from jgtextrank_spark.functions.curation import decontaminate

    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "so the quick brown fox jumps high"),      # contains 3-grams
            (2, "the quick brown dog sits"),               # shares only 2 of 3
            (3, "quick brown fox quick brown fox"),        # repeated gram
            (4, "totally unrelated text here now"),
            (5, "fox"),                                    # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3).collect()
    }
    # bench 3-grams: {the quick brown, quick brown fox, brown fox jumps}
    assert got[1] == (3, True)
    assert got[2] == (1, True)   # "the quick brown" present
    assert got[3] == (1, True)   # distinct-per-doc: counted once
    assert got[4] == (0, False)
    assert got[5] == (0, False)


def test_remove_boilerplate_lines(spark):
    """CCNet-style line filter: corpus-frequent lines dropped, unique
    body lines kept in order; all-boilerplate and empty docs yield ''."""
    from jgtextrank_spark.functions.curation import (
        frequent_lines,
        remove_boilerplate_lines,
    )

    nav = "NAV home about"
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\nunique body one\nsecond line one"),
            (2, f"{nav}\nunique body two"),
            (3, f"{nav}\nunique body three"),
            (4, nav),              # all boilerplate
            (5, ""),               # empty
            (6, f"a\n{nav}\nz"),   # kept lines must stay ordered a,z
        ],
        "doc_id int, text string",
    )
    fl = {r["line"]: r["n"] for r in frequent_lines(docs, 3).collect()}
    assert fl == {nav: 5}
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in remove_boilerplate_lines(docs, 3).collect()
    }
    assert got == {
        1: ("unique body one\nsecond line one", 2, 1),
        2: ("unique body two", 1, 1),
        3: ("unique body three", 1, 1),
        4: ("", 0, 1),
        5: ("", 0, 0),
        6: ("a\nz", 2, 1),
    }


def test_remove_boilerplate_threshold_boundary(spark):
    """min_count is inclusive: a line on exactly the threshold drops."""
    from jgtextrank_spark.functions.curation import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "dup\nx"), (2, "dup\ny"), (3, "solo\nz")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(docs, 2).collect()
    }
    assert got == {1: "x", 2: "y", 3: "solo\nz"}


def test_paragraph_dedup_vs_python(spark):
    """Corpus-wide first-occurrence paragraph dedup vs a direct Python
    replay: normalized (ws-collapsed, lowercased) paragraph seen-set in
    (doc_id, pos) order; blanks always pass; all-dup docs come back
    empty."""
    import re

    from jgtextrank_spark.functions.dedup import paragraph_dedup

    docs = [
        (0, "Breaking news today.\nSubscribe to our newsletter!\n\nBody A."),
        (1, "subscribe TO our   newsletter!\nBody B.\nBody B."),
        (2, "Subscribe to our newsletter!"),   # -> fully deduped
        (3, ""),                                # blank doc
        (4, "Body A.\n \nFresh tail."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df).collect()
    }

    seen, want = set(), {}
    for doc_id, text in docs:
        kept, n_paras, n_kept = [], 0, 0
        for para in text.split("\n"):
            if para.strip() == "":
                kept.append(para)
                continue
            n_paras += 1
            key = re.sub(r"\s+", " ", para).strip().lower()
            if key not in seen:
                seen.add(key)
                kept.append(para)
                n_kept += 1
        want[doc_id] = ("\n".join(kept), n_paras, n_kept)
    assert got == want


def test_fix_mojibake(spark):
    """Round-trip repair of UTF-8-read-as-Latin-1 corruption; clean text
    and unrepairable mixes pass through untouched."""
    from jgtextrank_spark.functions.curation import fix_mojibake

    orig = "café … naïve élan"
    moji = orig.encode("utf-8").decode("latin-1")
    mixed = "→ arrow with " + "é".encode("utf-8").decode("latin-1")
    rows = [
        (0, moji),          # repairable
        (1, "plain ascii"), # no markers
        (2, "Ã la carte"),  # genuine Latin-1 (marker lead, no follower)
        (3, mixed),         # >U+00FF char present: repair would corrupt
        (4, ""),
        (5, "caf\u00e9\u00a9x"),  # marker-shaped Latin-1 whose bytes are
                                   # NOT valid UTF-8: is_valid_utf8 gate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_fixed"], r["was_mojibake"])
        for r in fix_mojibake(df).collect()
    }
    assert got[0] == (orig, True)
    assert got[1] == ("plain ascii", False)
    assert got[2] == ("Ã la carte", False)
    assert got[3] == (mixed, False)
    assert got[4] == ("", False)
    assert got[5] == ("caf\u00e9\u00a9x", False)


# ----------------------------------------------------------- readability/H
def test_readability_vs_python(spark):
    import re

    from jgtextrank_spark.functions.textstats import readability

    texts = [
        (0, "The cat sat. The dog ran! Did it?"),
        (1, "word"),
        (2, ""),
        (3, "No terminal punctuation here at all"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in readability(df).collect()}
    for doc_id, text in texts:
        w = len([t for t in text.split(" ") if t])
        s = max(1, len(re.findall(r"[.!?]+", text)))
        sy = len(re.findall(r"[aeiouy]+", text.lower()))
        g = got[doc_id]
        assert (g["n_words"], g["n_sentences"], g["n_syllables"]) == (w, s, sy)
        if w == 0:
            assert g["flesch"] is None
        else:
            want = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
            assert g["flesch"] == pytest.approx(want, abs=1e-6)


def test_word_entropy_vs_python(spark):
    from collections import Counter

    from jgtextrank_spark.functions.textstats import word_entropy

    texts = [
        (0, "a a a a"),              # entropy 0
        (1, "a b c d"),              # entropy 2 bits
        (2, "The the THE cat"),      # case-folded: {the:3, cat:1}
        (3, ""),                     # empty -> 0.0
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy"] for r in word_entropy(df).collect()}
    for doc_id, text in texts:
        toks = [t.lower() for t in text.split(" ") if t]
        if not toks:
            want = 0.0
        else:
            n = len(toks)
            want = -sum(
                (c / n) * math.log2(c / n) for c in Counter(toks).values()
            )
        assert got[doc_id] == pytest.approx(want, abs=1e-6), doc_id
    assert got[0] == 0.0 and got[1] == pytest.approx(2.0)


# ----------------------------------------------------------------- packing
def test_pack_concat_chunk_offsets_contiguous(spark):
    from jgtextrank_spark.functions.packing import pack_concat_chunk

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    out = pack_concat_chunk(docs, context_len=10, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 40
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_off"] == off
            assert r["end_off"] == off + r["n_tokens"]
            assert r["first_chunk"] == r["start_off"] // 10
            assert r["last_chunk"] == max(r["end_off"] - 1, r["start_off"]) // 10
            off = r["end_off"]


def test_pack_greedy_first_fit_invariants(spark):
    from jgtextrank_spark.functions.packing import pack_greedy

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(
            [4, 9, 2, 15, 7, 1, 10, 10, 3, 5, 0, 8]
        )],
        "doc_id long, text string",
    )
    out = pack_greedy(docs, context_len=10, n_shards=2).collect()
    assert len(out) == 12
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        bin_id, fill = 0, 0
        for r in rows:
            take = min(r["n_tokens"], 10)
            if fill + take > 10 and r is not rows[0]:
                bin_id, fill = bin_id + 1, 0
            assert (r["bin_id"], r["bin_off"]) == (bin_id, fill), r
            assert r["truncated"] == (r["n_tokens"] > 10)
            fill += take
        # every bin is within capacity
        caps = {}
        for r in rows:
            caps[r["bin_id"]] = caps.get(r["bin_id"], 0) + min(
                r["n_tokens"], 10
            )
        assert all(v <= 10 for v in caps.values())


# ------------------------------------------------------------ feature hash
def test_feature_hash_vectors_exact(spark):
    import hashlib

    from jgtextrank_spark.functions.search import feature_hash_vectors

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "cat mat"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    out = feature_hash_vectors(docs, n_features=64).collect()
    got = {(r["doc_id"], r["idx"]): r["value"] for r in out}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % 64

    def sign(g):
        return 1 if int(hashlib.md5(f"sign:{g}".encode()).hexdigest()[0], 16) < 8 else -1

    expected = {}
    for doc_id, text in [(1, "the cat sat on the mat"), (2, "cat mat"),
                         (3, ""), (4, "solo")]:
        toks = [t for t in text.split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            k = (doc_id, bucket(g))
            expected[k] = expected.get(k, 0) + sign(g)
    assert got == expected
    # doc 3 is empty: contributes no rows
    assert not any(d == 3 for d, _ in got)


# -------------------------------------------------------------------- PQ
def test_pq_topk_recall_and_refinement(spark):
    from pyspark.sql import functions as F

    from jgtextrank_spark.functions.similarity import cosine_topk, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    norm = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x as double) / "
            "sqrt(aggregate(embedding, cast(0.0 as double), "
            "(a, y) -> a + cast(y as double)*cast(y as double))))"
        ).alias("embedding"),
    )
    q = norm.filter(F.col("vec_id") < 10)
    exact = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=10
        ).collect()
    }

    def recall(iters):
        got = {
            (r["q_id"], r["n_id"])
            for r in pq_topk(
                norm, q, k=10, m_subvectors=16, n_codes=32,
                kmeans_iters=iters,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r0 >= 0.25  # quantized scan finds a solid share of the truth
    assert r2 > r0     # Lloyd refinement lifts recall on the same data

    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(norm, q, m_subvectors=7)


def test_ivfpq_topk_subset_and_recall(spark):
    from pyspark.sql import functions as F

    from jgtextrank_spark.functions.similarity import (
        cosine_topk,
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    got = ivfpq_topk(
        emb, q, k=10, n_centroids=16, n_probe=16,
        m_subvectors=16, n_codes=32,
    ).collect()
    # probing ALL lists makes IVF-PQ degenerate to plain PQ: same result
    pq = pq_topk(emb, q, k=10, m_subvectors=16, n_codes=32).collect()
    assert {
        (r["q_id"], r["n_id"], r["adc_d2"], r["rank"]) for r in got
    } == {(r["q_id"], r["n_id"], r["adc_d2"], r["rank"]) for r in pq}

    # restricted probing still finds a solid share of the exact truth
    restricted = {
        (r["q_id"], r["n_id"])
        for r in ivfpq_topk(
            emb, q, k=10, n_centroids=16, n_probe=4,
            m_subvectors=16, n_codes=32,
        ).collect()
    }
    exact = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk(emb, q, k=10).collect()
    }
    assert len(restricted & exact) / len(exact) >= 0.2


# ------------------------------------------------------------------ DSIR
def test_dsir_weights_select_target_like_docs(spark):
    from pyspark.sql import functions as F

    from jgtextrank_spark.functions.lm import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    w = dsir_weights(docs, docs.filter(F.col("lang") == "en"))
    means = {
        r["lang"]: r["m"]
        for r in w.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("avg_log_ratio").alias("m"))
        .collect()
    }
    # the target language scores strictly above every other language
    assert all(means["en"] > v for k, v in means.items() if k != "en")
    # weights exist for every document
    assert w.count() == docs.count()
    # length-normalized and raw statistics agree in sign direction
    row = w.filter(F.col("n_feats") > 0).first()
    assert (row["log_weight"] > 0) == (row["avg_log_ratio"] > 0) or (
        abs(row["avg_log_ratio"]) < 1e-9
    )


def test_dedup_keep_best_policy(spark):
    from jgtextrank_spark.functions.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "@@ the quick brown fox ## jumps $$ over %%"),
            (3, "completely unrelated text about graphs and spark"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in dedup_keep_best(docs, pairs).collect()}
    # doc 1 (clean) beats doc 2 (symbol-laden) in the shared cluster
    assert out[1]["keep"] and not out[2]["keep"]
    assert out[1]["canonical_doc"] == out[2]["canonical_doc"] == 1
    assert out[1]["cluster_size"] == 2
    # singleton kept
    assert out[3]["keep"] and out[3]["cluster_size"] == 1


def test_bpe_train_matches_reference_algorithm(spark):
    """bpe_train vs an in-test transcription of the classic algorithm
    (Sennrich et al. 2016 get_stats/merge_vocab): overlapping pair
    counts, (count DESC, pair ASC) tie-break, greedy left-to-right
    non-overlapping merges — including the (x, x) run cases ('aaa',
    'banana') where the overlap semantics actually bite."""
    import collections

    from jgtextrank_spark.functions.bpe import bpe_train

    def ref_bpe(texts, merges):
        vocab = collections.Counter()
        for t in texts:
            for w in t.split():
                vocab[tuple(list(w) + ["</w>"])] += 1
        rules = []
        for rank in range(1, merges + 1):
            stats = collections.Counter()
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += f
            if not stats:
                break
            (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
            rules.append((rank, l, r, l + r, c))
            new = collections.Counter()
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new[tuple(out)] += f
            vocab = new
        return rules

    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "aaa aa a banana bandana",
        "low new wide aaa",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in bpe_train(docs, merges=10).orderBy("rank").collect()
    ]
    assert got == ref_bpe(texts, 10)

    # early stop: a fully mergeable micro-corpus runs out of pairs
    tiny = spark.createDataFrame([("ab ab",)], "text string")
    rules = bpe_train(tiny, merges=50).collect()
    assert 0 < len(rules) < 50


def test_bpe_apply_segments_vocabulary(spark):
    """bpe_apply: rank-order one-pass merges reproduce the reference
    segmentation; applying a table trained on one corpus to UNSEEN
    words segments them with the learned units."""
    from jgtextrank_spark.functions.bpe import bpe_apply, bpe_train

    train = spark.createDataFrame(
        [("low low low lower lowest newest newer new",)], "text string"
    )
    rules = bpe_train(train, merges=6)
    got = {
        r["word"]: list(r["tokens"])
        for r in bpe_apply(train, rules).collect()
    }
    # identity with the training evolution: the most frequent word is
    # fully merged first
    assert got["low"] == ["low</w>"] or got["low"][0].startswith("lo")
    # unseen word: learned units apply, unknown chars stay single
    unseen = spark.createDataFrame([("lowly",)], "text string")
    seg = {
        r["word"]: list(r["tokens"])
        for r in bpe_apply(unseen, rules).collect()
    }
    toks = seg["lowly"]
    assert "".join(toks) == "lowly</w>"  # lossless
    assert toks[0] in ("low", "lo")  # learned prefix unit reused
