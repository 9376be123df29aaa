"""Unit tests for training-data pipeline operators (dedup/similarity/
multimodal plumbing). Cross-engine value parity is separately pinned by
tests/test_driver_contract.py; these check operator semantics."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.pipeline import decontam, dedup, mix, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "the quick brown fox"),          # exact dup of 0
        (2, "quick brown fox the"),           # permuted (same token set)
        (3, "a completely different text"),
        (4, "the quick brown foxes jump"),    # near-dup-ish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dedup.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["cnt"] == 2 and groups[0]["keep_id"] == 0
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 4
    assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3, 4}


def test_fingerprint_catches_permutation(docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[2]
    assert fp[0] != fp[3]


def test_minhash_identical_for_same_token_set(docs):
    sig = {r["doc_id"]: (r["sig0"], r["sig1"]) for r in dedup.minhash_signatures(docs).collect()}
    assert sig[0] == sig[1] == sig[2]
    assert sig[0] != sig[3]


def test_minhash_candidates_find_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_candidates(docs).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.jaccard_pairs(docs, 0.99).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs
    # candidate-restricted verification
    cand = dedup.minhash_candidates(docs)
    verified = dedup.jaccard_pairs(docs, 0.99, candidates=cand)
    assert {(r["id_a"], r["id_b"]) for r in verified.collect()} <= set(pairs)


def test_simhash_close_for_near_dups(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(docs).collect()}
    assert sh[0] == sh[1] == sh[2]  # same token multiset -> identical simhash
    # statistical property needs long docs: near-dup (5% tokens changed) must
    # be closer in hamming distance than a disjoint-vocabulary doc
    base = [f"tok{i:03d}" for i in range(100)]
    near = base[:95] + [f"alt{i}" for i in range(5)]
    far = [f"other{i:03d}" for i in range(100)]
    big = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(near)), (2, " ".join(far))],
        "doc_id long, text string",
    )
    sh2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(big).collect()}
    ham_near = bin(sh2[0] ^ sh2[1]).count("1")
    ham_far = bin(sh2[0] ^ sh2[2]).count("1")
    assert ham_near < ham_far


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog is here with food"),
        (1, "der hund und die katze ist mit"),
        (2, "el perro la casa de es con"),
        (3, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_guess"] for r in textstats.lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "es", 3: "und"}


def test_token_stats(docs):
    row = {r["doc_id"]: r for r in textstats.token_stats(docs).collect()}[0]
    assert row["n_tokens"] == 4 and row["n_distinct"] == 4
    assert row["bpe_ish_tokens"] == 1 + 2 + 2 + 1


def test_cosine_and_lsh_topk(spark):
    import math

    rows = [(i, [math.cos(i * 0.3), math.sin(i * 0.3)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.0]
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=5).collect()]
    assert exact[0] == 0  # vec 0 == the query direction
    approx = [r["vec_id"] for r in similarity.lsh_bucketed_topk(emb, q, k=5, n_planes=4).collect()]
    assert set(approx) <= set(range(50)) and len(approx) > 0
    # recall against exact on the probed bucket is a subset relation
    assert exact[0] in approx or len(approx) >= 1


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows[:5]:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] > 0 and len(r["digest"]) == 64
    # deterministic: same payload -> same feature
    again = {r["media_id"]: tuple(r["feature"]) for r in multimodal.extract_features(media).collect()}
    first = {r["media_id"]: tuple(r["feature"]) for r in rows}
    assert again == first


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=9)
    frames = multimodal.frame_sample_plan(media, every_ms=250)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in per)  # 0,250,500,750,1000


def test_ivf_topk(spark):
    """IVF coarse-quantized ANN: full-probe == brute force exactly; partial
    probe returns a subset ranked identically within its lists."""
    from lucene_kmp_spark.pipeline import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(v) for v in emb.limit(1).collect()[0]["embedding"]]
    cents = sim.ivf_train_centroids(emb, n_lists=8, iters=1)
    assert len(cents) == 8

    brute = [(r["vec_id"], round(r["cosine"], 6)) for r in sim.cosine_topk(emb, qvec, 10).collect()]
    full_probe = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in sim.ivf_topk(emb, qvec, cents, 10, n_probe=8).collect()
    ]
    assert full_probe == brute

    part = [r["vec_id"] for r in sim.ivf_topk(emb, qvec, cents, 10, n_probe=4).collect()]
    # the query's own vector lives in a probed list -> top-1 must be found
    assert part and part[0] == brute[0][0]
    overlap = len(set(part) & {d for d, _ in brute})
    # near-random synthetic embeddings: measured recall@10 is 6/10 at
    # half-probe — assert a stable floor
    assert overlap >= 5, f"recall@10 too low: {overlap}/10"


def test_ivf_write_assigned_partition_pruning(spark, tmp_path):
    """Write-time IVF: _list persisted as a partition column; a probe filters
    on it so Catalyst prunes whole directories — scan bytes ~ n_probe/n_lists
    — and results are identical to the on-the-fly assignment path."""
    import glob

    from lucene_kmp_spark.pipeline import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(v) for v in emb.limit(1).collect()[0]["embedding"]]
    cents = sim.ivf_train_centroids(emb, n_lists=8, iters=1)
    path = str(tmp_path / "ivf")
    sim.ivf_write_assigned(emb, cents, path)

    # one directory per list — the physical pruning unit
    dirs = sorted(glob.glob(f"{path}/_list=*"))
    assert len(dirs) >= 2

    assigned = spark.read.parquet(path)
    on_the_fly = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in sim.ivf_topk(emb, qvec, cents, 10, n_probe=2).collect()
    ]
    pruned = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in sim.ivf_topk(assigned, qvec, cents, 10, n_probe=2).collect()
    ]
    assert pruned == on_the_fly

    # the probe plan must prune on the partition column (no full-scan assign)
    probe_lists = sim.nearest_lists(qvec, cents, 2)
    probe = assigned.filter(assigned["_list"].isin(probe_lists))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_list" in plan.split("PartitionFilters")[1][:200]
    # scan-bytes proxy: the probe reads only the probed lists' rows
    total = assigned.count()
    probed = probe.count()
    assert 0 < probed < total


def test_lsh_write_bucketed_reuses_partition(spark, tmp_path):
    from lucene_kmp_spark.pipeline import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(v) for v in emb.limit(1).collect()[0]["embedding"]]
    path = str(tmp_path / "lsh")
    sim.lsh_write_bucketed(emb, path, n_planes=4)
    bucketed = spark.read.parquet(path)

    fly = [(r["vec_id"], round(r["cosine"], 6))
           for r in sim.lsh_bucketed_topk(emb, qvec, 10, n_planes=4).collect()]
    pre = [(r["vec_id"], round(r["cosine"], 6))
           for r in sim.lsh_bucketed_topk(bucketed, qvec, 10, n_planes=4).collect()]
    assert pre == fly and len(pre) > 0


def test_near_dup_clusters_and_canonical(spark):
    # components: {0,1,2} via chain 0-1, 1-2 (tests propagation past one
    # hop), {5,6}, isolated 9 appears only with nodes=
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.near_dup_clusters(pairs).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (0, 1, 2, 5, 6, 9)], "doc_id long, text string"
    )
    with_iso = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.near_dup_clusters(pairs, nodes=docs.select("doc_id")).collect()
    }
    assert (9, 9) in with_iso and len(with_iso) == 6

    kept = {r["doc_id"] for r in dedup.dedup_canonical(docs, pairs).collect()}
    assert kept == {0, 5, 9}


def test_near_dup_clusters_long_chain(spark):
    # a 12-node path graph: worst-case diameter for min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.near_dup_clusters(pairs).collect()
    }
    assert got == {(i, 0) for i in range(12)}


def test_split_by_hash_deterministic_and_exhaustive(spark):
    d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s = mix.split_by_hash(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000          # every row lands somewhere
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # membership depends only on the row's own id: same ids again -> same splits
    again = mix.split_by_hash(d.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, again.collect()))


def test_stratified_sample_respects_fractions(spark):
    d = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "doc_id long, source string"
    )
    kept = mix.stratified_sample(d, {"a": 1.0, "b": 0.0}, strata_col="source")
    got = {r["source"] for r in kept.select("source").distinct().collect()}
    assert got == {"a"} and kept.count() == 1000


def test_take_token_budget_two_phase_equals_window(spark):
    rows = [(i, "g%d" % (i % 3), "w " * (1 + i % 7)) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for budget in (5, 37, 100, 10_000):
        fast = sorted(r["doc_id"] for r in mix.take_token_budget(d, budget, n_buckets=8).collect())
        exact = sorted(
            r["doc_id"] for r in mix.take_token_budget(d, budget, exact_window=True).collect()
        )
        assert fast == exact, budget


def test_decontaminate_drops_ngram_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),     # contains eval 5-gram
            (1, "one two three four five six"),
            (2, "alpha beta gamma delta epsilon other tail"),  # shares the 5-gram too
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta epsilon yy")], "doc_id long, text string"
    )
    hits = {r["doc_id"]: r["hits"] for r in decontam.contaminated_docs(corpus, ev, n=5).collect()}
    assert set(hits) == {0, 2} and all(v >= 1 for v in hits.values())
    clean = {r["doc_id"] for r in decontam.decontaminate(corpus, ev, n=5).collect()}
    assert clean == {1}
    # docs shorter than n produce no grams and are never flagged
    assert decontam.contaminated_docs(corpus, ev, n=50).count() == 0


def test_repetition_signals_golden(spark):
    d = spark.createDataFrame(
        [
            (0, "a a a a"),            # fully repetitive
            (1, "a b c d"),            # no repetition
            (2, "a b a b a b"),        # periodic: top 2-gram 'a b' = 3/5
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in textstats.repetition_signals(d).collect()}
    assert r[0]["dup_word_frac"] == 0.75 and r[0]["top_2gram_frac"] == 1.0
    assert r[1]["dup_word_frac"] == 0.0 and r[1]["dup_3gram_frac"] == 0.0
    assert r[2]["top_2gram_frac"] == 0.6 and r[2]["dup_3gram_frac"] == 0.5


def test_curate_composes_stages(spark):
    from lucene_kmp_spark.pipeline import curate

    corpus = spark.createDataFrame(
        [
            # passes quality (stopwords + distinct + length)
            (0, "the quick brown fox jumps over the lazy dog with a bone"),
            (1, "the quick brown fox jumps over the lazy dog with a bone"),  # exact dup of 0
            (2, "zz zz zz zz"),  # fails quality (no stopwords, low distinct)
            (3, "it is a truth universally acknowledged that a single man wants a wife"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "prefix truth universally acknowledged that a suffix")],
        "doc_id long, text string",
    )
    out = curate.curate(corpus, ev, min_quality=0.5, ngram=5)
    kept = {r["doc_id"] for r in out.collect()}
    # 2 fails quality; 3 contaminated (shares the 5-gram); 1 deduped into 0
    assert kept == {0}
    assert set(out.columns) >= {"doc_id", "text", "split"}


def test_media_container_probe_roundtrip(spark):
    """Library-free container probe: synthesized REAL png/jpeg/gif/wav bytes
    round-trip through the distributed probe to the exact header metadata;
    garbage and truncated payloads degrade to 'unknown' without crashing."""
    from lucene_kmp_spark.pipeline.multimodal import (
        build_png,
        probe_bytes,
        probe_media,
        synth_containers,
    )

    src = spark.range(200).withColumnRenamed("id", "doc_id")
    media = synth_containers(spark, src)
    got = {r["media_id"]: r.asDict() for r in probe_media(media).collect()}
    assert len(got) == 200
    for i in range(200):
        r = got[i]
        k = i % 4
        w, h = 1 + (i * 7) % 4000, 1 + (i * 11) % 3000
        if k == 3:
            rate = 8000 + (i % 5) * 8000
            assert r["container"] == "wav"
            assert r["sample_rate"] == rate and r["channels"] == 1 + i % 2
            assert r["duration_ms"] == (1000 + i % 5000) * 1000 // rate
            assert r["width"] is None and r["height"] is None
        else:
            assert r["container"] == ("png", "jpeg", "gif")[k]
            assert (r["width"], r["height"]) == (w, h), i
            assert r["sample_rate"] is None
    # robustness rows through the same distributed path
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 1, 2], "payload": [b"garbage", b"", build_png(5, 5)[:10]]}
        )
    )
    rows = {r["media_id"]: r["container"] for r in probe_media(bad).collect()}
    assert rows == {0: "unknown", 1: "unknown", 2: "unknown"}
    # scalar prober agrees with the distributed one (same function)
    assert probe_bytes(build_png(7, 9))[:3] == ("png", 7, 9)


def test_bigram_lm_cross_entropy(spark):
    """Bigram-LM perplexity quality filter vs an independent scalar model:
    add-alpha smoothed cross-entropy per doc, fluent docs scoring lower than
    shuffled-noise docs built from the same vocabulary."""
    import math
    from collections import Counter

    from lucene_kmp_spark.pipeline.textstats import bigram_lm_counts, lm_cross_entropy

    texts = {
        0: "the cat sat on the mat and the dog sat on the rug",
        1: "the cat sat on the rug",
        2: "rug the on mat dog sat the cat and on the",  # shuffled
        3: "qq zx qq zx qq",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    uni, bi, vocab = bigram_lm_counts(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in lm_cross_entropy(docs, uni, bi, vocab).collect()
    }

    toks = {d: t.split() for d, t in texts.items()}
    u = Counter(w for t in toks.values() for w in t)
    b = Counter((t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1))
    a = 0.1
    for d, t in toks.items():
        lps = [
            math.log2(b[(t[i], t[i + 1])] + a) - math.log2(u[t[i]] + a * len(u))
            for i in range(len(t) - 1)
        ]
        want = -sum(lps) / len(lps)
        assert got[d][0] == len(t) - 1
        assert abs(got[d][1] - want) < 1e-9, (d, got[d][1], want)
    # fluent text scores better (lower bits/token) than its shuffled version
    assert got[0][1] < got[2][1]


def test_remove_duplicate_spans(spark):
    """Span-level exact dedup (Lee et al.): later occurrences of any
    duplicated k-token window are stripped; first occurrence (min doc_id,
    start) survives; fully-stripped docs stay with empty text. Verified
    against an independent scalar implementation on a random corpus."""
    import random as _r

    from lucene_kmp_spark.pipeline.dedup import remove_duplicate_spans

    rnd = _r.Random(99)
    vocab = [f"w{j}" for j in range(30)]
    base = [rnd.choice(vocab) for _ in range(40)]
    texts = {}
    for d in range(25):
        t = [rnd.choice(vocab) for _ in range(rnd.randint(3, 30))]
        if d % 3 == 0:  # splice in a shared chunk to force duplicates
            at = rnd.randint(0, len(t))
            t = t[:at] + base[5:20] + t[at:]
        texts[d] = " ".join(t)
    texts[25] = " ".join(base[5:13])  # exactly one duplicated window long
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    K = 8
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text"])
        for r in remove_duplicate_spans(docs, k=K, key="text").collect()
    }

    # independent scalar model
    from collections import defaultdict

    occ = defaultdict(list)
    toks = {d: t.split() for d, t in texts.items()}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - K + 1):
            occ[" ".join(t[i : i + K])].append((d, i))
    removed = defaultdict(set)
    for key, places in occ.items():
        for (d, i) in sorted(places)[1:]:
            removed[d].update(range(i, i + K))
    for d, t in toks.items():
        keep = [w for i, w in enumerate(t) if i not in removed[d]]
        want = (len(t), len(removed[d]), " ".join(keep))
        assert got[d] == want, (d, got[d], want)
    # hash-keyed variant removes the same token counts
    h = {
        r["doc_id"]: r["n_removed"]
        for r in remove_duplicate_spans(docs, k=K).collect()
    }
    assert h == {d: len(v) for d, v in ((d, removed[d]) for d in toks)}


def test_bpe_train_and_encode(spark):
    """Real BPE (Sennrich): merges learned from distributed word counts match
    the hand-derivable sequence on the paper-style corpus; encoding applies
    by rank; invariants (full-merge words become 1 token, zero merges =
    chars+1, counts shrink monotonically with more merges)."""
    from lucene_kmp_spark.pipeline.bpe import (
        _encode_word,
        bpe_encode_counts,
        train_bpe,
    )

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(0, corpus)], "doc_id long, text string")
    merges = train_bpe(docs, n_merges=10, min_pair_freq=2)
    # classic derivation: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7) ...
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")
    assert merges[4] == ("lo", "w")
    ranks = {p: i for i, p in enumerate(merges)}
    # frequent in-corpus words merge to ONE token; unseen words compose the
    # learned subwords (greatest -> ... + est</w>; lowest -> low + est</w>)
    assert _encode_word("newest", ranks) == ["newest</w>"]
    assert _encode_word("greatest", ranks)[-1] == "est</w>"
    low_est = _encode_word("lowest", ranks)
    assert low_est[0] == "low" and low_est[-1] == "est</w>"

    # encode invariants over a second corpus
    docs2 = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "newest widest"), (2, "zzz")],
        "doc_id long, text string",
    )
    enc = {
        r["doc_id"]: (r["n_words"], r["bpe_tokens"])
        for r in bpe_encode_counts(docs2, merges).collect()
    }
    assert enc[0][0] == 3 and enc[2][0] == 1
    none_enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_counts(docs2, []).collect()
    }
    # zero merges: every word = chars + end marker
    assert none_enc[2] == 4
    assert all(enc[d][1] <= none_enc[d] for d in enc)
    # more merges never increase the count
    half = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode_counts(docs2, merges[:3]).collect()}
    assert all(enc[d][1] <= half[d] for d in enc)


def test_bpe_cap_identical_merges(spark):
    """The driver-memory cut (min_word_freq + max_words pushed into Spark
    before the collect) must not change the learned merges when the cap
    covers the effective vocabulary — and a cap far below the vocabulary
    still learns from the most frequent words only."""
    from lucene_kmp_spark.pipeline.bpe import train_bpe

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + [chr(0x4E00 + i) for i in range(30)]  # inert singleton tail: each a
        # distinct 1-char word, so its only pair (char, </w>) has count 1
        # and can never reach min_pair_freq (the URL/typo-tail analog)
    )
    docs = spark.createDataFrame([(0, corpus)], "doc_id long, text string")
    uncapped = train_bpe(docs, n_merges=8, min_pair_freq=2, max_words=None)
    capped = train_bpe(docs, n_merges=8, min_pair_freq=2, min_word_freq=2, max_words=4)
    # the 4 frequent words ARE the effective vocabulary for min_pair_freq=2
    # merges on this corpus — the singleton tail never wins a merge
    assert capped == uncapped
    # cap below the frequent set changes the result deterministically
    top2 = train_bpe(docs, n_merges=8, min_pair_freq=2, max_words=2)
    assert top2[0] == ("e", "s")  # newest(6)+widest(3) still dominate


def test_all_pairs_guard(spark, monkeypatch):
    """The bare quadratic forms refuse large inputs unless explicitly
    forced; the candidate/bucket paths are untouched."""
    import pytest as _pytest

    from lucene_kmp_spark.pipeline import _guards, dedup, similarity

    monkeypatch.setattr(_guards, "ALL_PAIRS_ROW_LIMIT", 5)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma w%d" % i) for i in range(8)], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="all-pairs"):
        dedup.jaccard_pairs(docs, 0.5).collect()
    assert dedup.jaccard_pairs(docs, 0.5, allow_all_pairs=True).count() >= 0
    cand = dedup.minhash_candidates(docs)
    assert dedup.jaccard_pairs(docs, 0.5, candidates=cand).count() >= 0

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="all-pairs"):
        similarity.cosine_near_dup_pairs(vecs, 0.9).collect()
    assert similarity.cosine_near_dup_pairs(vecs, 0.9, allow_all_pairs=True).count() >= 0
    assert similarity.lsh_near_dup_pairs(vecs, 0.9).count() >= 0


def test_matmul_verify_bit_identical_to_lr_kernel(spark):
    """ADVICE r4 guard: the per-bucket matmul verify kernel must emit the
    SAME pair set with BIT-IDENTICAL cosines as the left-to-right join
    kernel (``_pair_cosine``) the oracles were validated against — on a
    dense fixture engineered to put many pairs at/near the threshold."""
    import numpy as np

    from lucene_kmp_spark.pipeline.similarity import (
        _bucket_pairs_matmul,
        _pair_cosine,
    )

    rng = np.random.RandomState(7)
    rows = []
    base = rng.randn(4, 16)
    for i in range(240):
        # clustered perturbations => dup-dense buckets, cosines spread
        # through [0.2, 1.0] with a thick band near the 0.4 threshold
        v = base[i % 4] + rng.randn(16) * (0.4 + 2.5 * (i % 7) / 7.0)
        rows.append((i, [float(x) for x in v], i % 3))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, _bucket int"
    )
    lr = {
        (r.id_a, r.id_b): r.cosine
        for r in _pair_cosine(df, 0.4, "embedding", "vec_id", "_bucket").collect()
    }
    mm = {
        (r.id_a, r.id_b): r.cosine
        for r in _bucket_pairs_matmul(df, 0.4, "embedding", "vec_id", "_bucket").collect()
    }
    assert set(lr) == set(mm)
    assert len(lr) > 200  # the fixture really is dense
    for key, c in lr.items():
        assert mm[key] == c, (key, mm[key], c)  # exact float equality


def test_matmul_verify_lr_identity_property(spark):
    """Property form of the matmul/LR bit-identity guard: random dims,
    thresholds and bucket layouts (seeded, deterministic) — every drawn
    configuration must produce an identical pair set with exactly equal
    cosines across the two kernels."""
    import numpy as np

    from lucene_kmp_spark.pipeline.similarity import (
        _bucket_pairs_matmul,
        _pair_cosine,
    )

    for seed, dim, thr, nbuck in ((11, 8, 0.2, 2), (23, 33, 0.5, 4),
                                  (37, 96, 0.75, 1)):
        rng = np.random.RandomState(seed)
        base = rng.randn(3, dim)
        rows = [
            (i,
             [float(x) for x in base[i % 3] + rng.randn(dim) * (0.3 + (i % 5))],
             i % nbuck)
            for i in range(120)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, _bucket int"
        )
        lr = {
            (r.id_a, r.id_b): r.cosine
            for r in _pair_cosine(df, thr, "embedding", "vec_id", "_bucket").collect()
        }
        mm = {
            (r.id_a, r.id_b): r.cosine
            for r in _bucket_pairs_matmul(
                df, thr, "embedding", "vec_id", "_bucket").collect()
        }
        assert lr == mm, (seed, dim, thr, len(set(lr) ^ set(mm)))
        assert lr, (seed, dim, thr)  # each config produces real pairs
