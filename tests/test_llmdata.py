"""Property tests for the approximate LLM-data operators."""

from __future__ import annotations

from tests.conftest import SF_DIR
from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import dedup


def test_minhash_lsh_recall_vs_exact(spark):
    """Every LSH-reported pair must be a true >=threshold pair, and
    recall of strong pairs (jaccard >= 0.5) should be high."""
    docs = io.load(spark, SF_DIR, "documents")
    exact = {
        (r.da, r.db): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2, block_col=None).collect()
    }
    approx = {
        (r.da, r.db): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    # Precision: every reported pair is a true pair (same verified jaccard).
    for pair, j in approx.items():
        assert pair in exact, f"LSH reported non-pair {pair}"
        assert abs(exact[pair] - j) < 1e-9
    # Recall on strong pairs.
    strong = {p for p, j in exact.items() if j >= 0.5}
    if strong:
        found = sum(1 for p in strong if p in approx)
        assert found / len(strong) >= 0.8, (found, len(strong))


def test_minhash_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """An adversarial corpus where one signature bucket holds every
    doc (identical boilerplate) must not explode quadratically: the
    cap drops the degenerate buckets before the self-join, while
    distinct near-dup pairs still surface through their own buckets."""
    from pyspark.sql import functions as F

    boiler = [(i, "the same boilerplate text repeated for every single doc", "en")
              for i in range(200)]
    near = [
        (1000, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota", "en"),
    ]
    docs = spark.createDataFrame(boiler + near, ["doc_id", "text", "lang"])

    capped = dedup.minhash_lsh_pairs(docs, max_bucket_size=64).collect()
    pairs = {(r.da, r.db) for r in capped}
    # The 200-wide boilerplate buckets are dropped: no C(200,2) blowup.
    assert len(pairs) <= 10, len(pairs)
    assert (1000, 1001) in pairs
    # Uncapped, the same corpus produces the quadratic pair set.
    uncapped = dedup.minhash_lsh_pairs(docs, max_bucket_size=None)
    assert uncapped.count() == 200 * 199 // 2 + 1


def test_duplicate_clusters_connected_components(spark):
    """A chain a-b, b-c plus an island d-e must yield two clusters
    labeled by their minimum member id; transitivity crosses pairs
    that were never directly compared."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "da long, db long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_keep_canonical_survivor_selection(spark):
    """Chain 1-2, 2-3 and island 10-11 in a corpus of 6 docs: keep the
    cluster minima (1, 10) and the unpaired docs (5, 99)."""
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 5, 99)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "da long, db long"
    )
    got = {r.doc_id: r.kept for r in dedup.keep_canonical(docs, pairs).collect()}
    assert got == {1: True, 2: False, 3: False, 10: True, 11: False,
                   5: True, 99: True}


def test_length_quantiles_exact_interpolation(spark):
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(1, "en", "a" * 10), (2, "en", "a" * 20), (3, "en", "a" * 30),
         (4, "de", "a" * 7)],
        ["doc_id", "lang", "text"],
    )
    got = {r.lang: r for r in text_fns.length_quantiles(docs).collect()}
    # interpolating median of (10, 20, 30) = 20; p90 = 10 + 0.8*(30-20)? no:
    # quantile_cont at 0.9 over 3 points -> rank 1.8 -> 20 + 0.8*10 = 28.
    assert got["en"].n_docs == 3 and got["en"].p50 == 20.0
    assert got["en"].p90 == 28.0
    assert got["de"].p50 == 7.0 and got["de"].p99 == 7.0


def test_repetition_features_flags_boilerplate(spark):
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [
            (1, "a b c d e " * 10),          # same 5-gram repeated
            (2, " ".join(f"w{i}" for i in range(50))),  # all distinct
            (3, "too short"),                 # < n tokens -> 0 grams
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in text_fns.repetition_features(docs).collect()}
    # 50 tokens of a 5-word cycle -> 46 grams, 5 distinct -> 0.8913
    assert got[1].rep_ratio > 0.85
    assert got[2].rep_ratio == 0.0
    assert got[3].n_grams == 0 and got[3].rep_ratio == 0.0


def test_pii_signal_counts_planted_tokens(spark):
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(7, "plain words"), (11, "plain words"), (13, "plain words"),
         (5, "plain words")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in text_fns.pii_signal_counts(docs).collect()}
    assert got[7].n_emails == 1 and got[7].first_email == "user7@example.com"
    assert got[11].n_urls == 1
    assert got[13].n_digit_runs == 1
    assert (got[5].n_emails, got[5].n_urls, got[5].n_digit_runs) == (0, 0, 0)


def test_kmeans_assign_matches_numpy_reference(spark):
    """The distributed Lloyd's loop must reproduce a straightforward
    single-node numpy implementation of the same spec exactly (same
    seeds, same fixed rounds, same rounded-cosine tie-break)."""
    import numpy as np

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries import llmdata
    from tests.conftest import SF_DIR

    rows = io.load(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    X = {
        r.vec_id: (lambda v: v / np.linalg.norm(v))(
            np.array(r.embedding, dtype=float)
        )
        for r in rows
    }
    cents = {s: X[s] for s in llmdata.KMEANS_SEED_IDS}
    for _ in range(llmdata.KMEANS_ITERS):
        assign = {
            i: max(cents, key=lambda c: (round(v @ cents[c], 6), -c))
            for i, v in X.items()
        }
        cents = {}
        for c in sorted(set(assign.values())):
            m = np.mean([X[i] for i in X if assign[i] == c], axis=0)
            cents[c] = m / np.linalg.norm(m)
    want = {
        i: max(cents, key=lambda c: (round(v @ cents[c], 6), -c))
        for i, v in X.items()
    }
    got = {
        r.vec_id: r.cell
        for r in similarity.kmeans_assign(
            io.load(spark, SF_DIR, "embeddings"),
            llmdata.KMEANS_SEED_IDS,
            n_iter=llmdata.KMEANS_ITERS,
        ).collect()
    }
    assert got == want
    assert len(set(got.values())) > 1  # it actually partitioned


def test_embedding_cosine_bucketed_precision_and_recall(spark):
    """The banded cosine-dedup must report only true >=threshold pairs
    (exact verify), with usable recall vs the all-pairs baseline even
    at this deliberately loose threshold (0.45 ~ 63 degrees — far
    below any real near-dup bar, the worst case for sign-bit LSH)."""
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import DEDUP_PLANE_IDS

    emb = io.load(spark, SF_DIR, "embeddings")
    exact = {
        (r.ia, r.ib): r.cos_sim
        for r in similarity.embedding_cosine_dups(emb).collect()
    }
    approx = {
        (r.ia, r.ib): r.cos_sim
        for r in similarity.embedding_cosine_dups_bucketed(
            emb, DEDUP_PLANE_IDS
        ).collect()
    }
    for pair, c in approx.items():
        assert pair in exact and abs(exact[pair] - c) < 1e-9, pair
    if exact:
        recall = sum(1 for p in exact if p in approx) / len(exact)
        assert recall >= 0.5, (recall, len(exact))


def test_shingles_short_and_empty_docs(spark):
    """Docs with fewer than n tokens shingle to an empty array instead
    of crashing (sequence(1,0) is descending; slice(toks,0,n) throws
    INVALID_PARAMETER_VALUE.START — regression pin for ADVICE r01)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "one", "en"), (3, "just two", "en"),
         (4, "now three tokens", "en"), (5, "a b   c  d", "en")],
        ["doc_id", "text", "lang"],
    )
    sh = {r.doc_id: r.sh for r in
          docs.select("doc_id", dedup.shingles_col(3).alias("sh")).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == []
    assert sh[4] == ["now three tokens"]
    assert sh[5] == ["a b c", "b c d"]  # multi-space tokenization
    # Downstream shingle consumers must tolerate short docs too.
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0


def test_simhash_similar_docs_close(spark):
    """Near-identical docs should have near-identical simhashes."""
    docs = io.load(spark, SF_DIR, "documents")
    sigs = {r.doc_id: (r.simhash_hi, r.simhash_lo)
            for r in dedup.simhash_signatures(docs).collect()}
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()

    def hamming(a, b):
        return bin((a[0] ^ b[0]) & 0xFFFFFFFF).count("1") + bin(
            (a[1] ^ b[1]) & 0xFFFFFFFF
        ).count("1")

    for r in pairs:
        d = hamming(sigs[r.da], sigs[r.db])
        assert d <= 16, f"jaccard {r.jaccard} pair {r.da},{r.db} hamming {d}"


def test_corpus_selection_reasons_and_mix(spark):
    """The capstone selection must apply rules in declared order and
    produce a mixed verdict set on the synthetic corpus."""
    from ts_data_pipeline_spark.queries import llmdata
    from tests.conftest import SF_DIR

    rows = llmdata.corpus_selection(spark, SF_DIR).collect()
    assert len(rows) == 500
    reasons = {r.reject_reason for r in rows}
    assert "ok" in reasons and ("too_short" in reasons or "too_long" in reasons)
    for r in rows:
        assert r.selected == (r.reject_reason == "ok")


def test_skew_report_heavy_hitters(spark):
    from ts_data_pipeline_spark.operators import skew

    df = spark.createDataFrame(
        [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5, "k string"
    )
    got = skew.skew_report(df, "k", top_n=2).collect()
    assert [(r.key, r.n, r.rank) for r in got] == [("hot", 80, 1), ("warm", 15, 2)]
    assert abs(got[0].share - 0.8) < 1e-9


def test_incremental_dedup_batch_and_streaming(spark, tmp_path):
    """Ingest dedup: docs whose digest already exists in the corpus
    are dropped, in-batch repeats collapse to one, and the same
    operator runs unchanged as a stream-static join."""
    import datetime as dt

    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [("known text",)], ["text"]
    ).select(F.md5("text").alias("digest"))

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    batch = spark.createDataFrame(
        [(1, "known text", t0), (2, "fresh text", t0),
         (3, "fresh text", t0), (4, "other text", t0)],
        ["doc_id", "text", "ts"],
    )
    got = sorted(
        r.text for r in dedup.incremental_dedup(batch, corpus).collect()
    )
    assert got == ["fresh text", "other text"]

    src = str(tmp_path / "in")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        dedup.incremental_dedup(stream, corpus, event_time_col="ts")
        .writeStream.format("memory")
        .queryName("t_incr_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_s = sorted(r.text for r in spark.table("t_incr_dedup").collect())
    assert got_s == ["fresh text", "other text"]


def test_sequence_pack_two_phase_equals_flat_cumsum(spark):
    """The distributed prefix sum must equal the naive global cumsum
    for ANY bucket size (bucket boundaries are an implementation
    detail, not a semantic)."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators.sampling import sequence_pack

    docs = io.load(spark, SF_DIR, "documents")
    base = {
        r["doc_id"]: (r["tok_offset"], r["chunk_id"], r["chunks_spanned"])
        for r in sequence_pack(docs, ctx=128, bucket_size=1).collect()
    }
    for bs in (7, 64, 10_000):
        got = {
            r["doc_id"]: (r["tok_offset"], r["chunk_id"], r["chunks_spanned"])
            for r in sequence_pack(docs, ctx=128, bucket_size=bs).collect()
        }
        assert got == base
    # offsets tile the token stream exactly: sorted offsets advance by
    # the previous doc's token count
    rows = sorted(
        (r["tok_offset"], r["tokens"])
        for r in sequence_pack(docs, ctx=128).collect()
    )
    for (o1, t1), (o2, _) in zip(rows, rows[1:]):
        assert o2 == o1 + t1


def test_span_dedup_removes_cross_doc_repeats(spark):
    from ts_data_pipeline_spark.operators.dedup import span_dedup

    words = " ".join(f"w{i}" for i in range(20))  # two aligned 10-word spans
    docs = spark.createDataFrame(
        [(1, words), (2, words), (3, "only unique tokens here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert got[1]["n_kept"] == 2 and got[1]["n_removed"] == 0
    assert got[2]["n_kept"] == 0 and got[2]["n_removed"] == 2
    assert got[3]["n_kept"] == 1 and got[3]["keep_ratio"] == 1.0
    for r in got.values():
        assert r["n_spans"] == r["n_kept"] + r["n_removed"]


def test_decontaminate_flags_eval_overlap(spark):
    from ts_data_pipeline_spark.functions.text import decontaminate

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, eval_text),                      # eval split (0 % 13 == 0)
            (1, eval_text + " iota kappa"),      # contaminated train doc
            (2, "totally different words with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(docs, n=4).collect()}
    assert set(got) == {1, 2}  # eval docs are not scored
    assert got[1]["n_contaminated"] == 5 and got[1]["flagged"]
    assert got[2]["n_contaminated"] == 0 and not got[2]["flagged"]


def test_corpus_shuffle_is_bucket_invariant_permutation(spark):
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators.sampling import corpus_shuffle

    docs = io.load(spark, SF_DIR, "documents")
    base = {r["doc_id"]: r["pos"] for r in corpus_shuffle(docs, n_buckets=1).collect()}
    assert sorted(base.values()) == list(range(len(base)))  # exact permutation
    for nb in (5, 32):
        got = {r["doc_id"]: r["pos"] for r in corpus_shuffle(docs, n_buckets=nb).collect()}
        assert got == base


def test_importance_resample_downsamples_head_only(spark):
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators.sampling import importance_resample, mixture_weights

    docs = io.load(spark, SF_DIR, "documents")
    mix = {r["lang"]: r for r in mixture_weights(docs).collect()}
    head = max(mix, key=lambda l: mix[l]["tokens"])
    got = importance_resample(docs).collect()
    rates = {r["lang"]: r["rate"] for r in got}
    assert rates[head] < 1.0  # over-represented language is thinned
    assert all(rate == 1.0 for lang, rate in rates.items() if lang != head)
    kept = {r["lang"]: [x["kept"] for x in got if x["lang"] == r["lang"]] for r in got}
    assert all(kept[lang] for lang in kept if lang != head)  # tail keeps all


def test_bpe_bigram_topk_counts_adjacent_pairs(spark):
    from ts_data_pipeline_spark.functions.text import bpe_bigram_topk

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "x")],  # 1-token doc: no pairs
        "doc_id long, text string",
    )
    got = [(r["pair"], r["n"]) for r in bpe_bigram_topk(docs, k=3).collect()]
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_ingest_pipeline_batch_equals_streaming(spark, tmp_path):
    """The composed ingest chain (gates + corpus anti-join + dedup)
    must admit the same survivors as a batch frame and as an
    availableNow stream."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import ingest

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    ok = " ".join(f"tok{i}" for i in range(30)) + " "  # ~180 chars, distinct
    corpus = spark.createDataFrame([(0, ok + "known", t0)], ["doc_id", "text", "ts"])
    digests = ingest.ingest_signals(corpus).select("digest")
    rep = " ".join(["spam"] * 40)          # repetitive gate
    batch = spark.createDataFrame(
        [
            (1, ok + "known", t0),         # dup of corpus
            (2, ok + "fresh one x", t0),   # survives
            (3, ok + "fresh one x", t0),   # in-batch dup of 2
            (4, "tiny", t0),               # too_short
            (5, rep, t0),                  # repetitive
            (6, ok + "mail a@b.co", t0),   # pii
            (7, ok + "fresh two y", t0),   # survives
        ],
        ["doc_id", "text", "ts"],
    )
    got_b = sorted(
        r.doc_id for r in ingest.ingest_pipeline(batch, digests).collect()
    )
    assert got_b in ([2, 7], [3, 7])       # dropDuplicates picks either twin
    src = str(tmp_path / "ingest_in")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        ingest.ingest_pipeline(stream, digests, event_time_col="ts")
        .writeStream.format("memory")
        .queryName("t_ingest_pipe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ingest_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_s = sorted(r.doc_id for r in spark.table("t_ingest_pipe").collect())
    assert got_s in ([2, 7], [3, 7])
    # verdicts in the auditable report line up with the gates
    verdicts = {
        r.doc_id: r.verdict
        for r in ingest.ingest_report(batch, digests).collect()
    }
    assert verdicts == {
        1: "dup_corpus", 2: "ok", 3: "ok", 4: "too_short",
        5: "repetitive", 6: "pii", 7: "ok",
    }


def test_build_training_corpus_recipe(spark, tmp_path):
    """The composed recipe: gates -> near-dup -> resample -> shuffle
    -> pack -> bounded write. Invariants: token offsets tile the
    stream exactly in shuffle order, every surviving doc passed the
    gates, and the written corpus is lang-partitioned."""
    from ts_data_pipeline_spark import io, recipes
    from ts_data_pipeline_spark.operators.corpus_io import corpus_manifest

    from ts_data_pipeline_spark.functions import text as text_fns

    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries import llmdata

    docs = io.load(spark, SF_DIR, "documents")
    # Embeddings deliberately cover only HALF the corpus: uncovered
    # docs have no semantic verdict and must pass through unharmed.
    emb = io.load(spark, SF_DIR, "embeddings").filter("vec_id < 250")
    out_path = str(tmp_path / "corpus")
    out = recipes.build_training_corpus(
        docs, out_path, embeddings=emb, semdedup_seeds=llmdata.KMEANS_SEED_IDS
    ).cache()
    rows = out.collect()
    assert 0 < len(rows) < docs.count()  # gates + dedup + resample thinned it
    # SemDeDup gate: no surviving doc was judged semantically
    # redundant, and docs OUTSIDE the embedding coverage still survive
    # (the stage is an anti-join on dropped ids, not a semi-join on
    # kept ids).
    sem_dropped = {
        r.vec_id
        for r in similarity.semdedup(
            emb, llmdata.KMEANS_SEED_IDS, max_cell_size=256
        ).filter("NOT kept").collect()
    }
    surviving = {r.doc_id for r in rows}
    assert sem_dropped and not sem_dropped & surviving
    assert any(d >= 250 for d in surviving), "uncovered docs were wiped"
    # CCNet gate: no surviving doc sits in the perplexity tail tercile
    tail_ids = {
        r.doc_id
        for r in text_fns.bigram_lm_perplexity(docs)
        .filter("ppl_bucket = 'tail'")
        .collect()
    }
    assert tail_ids and not tail_ids & {r.doc_id for r in rows}
    # offsets tile the token stream contiguously from 0
    tiled = sorted((r.tok_offset, r.tokens) for r in rows)
    assert tiled[0][0] == 0
    for (o1, t1), (o2, _) in zip(tiled, tiled[1:]):
        assert o2 == o1 + t1
    # chunk ids consistent with offsets
    for r in rows:
        assert r.chunk_id == r.tok_offset // 512
    # written output is partitioned by lang and readable
    manifest = {r.lang: r for r in corpus_manifest(spark, out_path).collect()}
    back = spark.read.parquet(out_path)
    assert back.count() == len(rows)
    assert set(manifest) == {r.lang for r in rows}


def test_pii_redact_leaves_no_live_signals(spark):
    """After redaction no email/URL/digit-run pattern may survive,
    and every planted signal is counted."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as text_fns
    from tests.conftest import SF_DIR

    red = text_fns.pii_redact(io.load(spark, SF_DIR, "documents"))
    leftovers = red.select(
        F.sum(F.regexp_count("text_redacted", F.lit(text_fns._PII_EMAIL))).alias("e"),
        F.sum(F.regexp_count("text_redacted", F.lit(text_fns._PII_URL))).alias("u"),
        F.sum(F.regexp_count("text_redacted", F.lit(text_fns._PII_DIGITS))).alias("d"),
        F.sum("n_redacted").alias("n"),
    ).collect()[0]
    assert (leftovers.e, leftovers.u, leftovers.d) == (0, 0, 0)
    assert leftovers.n > 0  # augmentation planted and redactor fired


def test_bigram_lm_ppl_terciles_are_ordered(spark):
    """head/middle/tail buckets partition the corpus by ppl: every
    head doc <= every middle doc <= every tail doc, near-equal sizes."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as text_fns
    from tests.conftest import SF_DIR

    ppl = text_fns.bigram_lm_perplexity(io.load(spark, SF_DIR, "documents"))
    stats = {
        r.ppl_bucket: r
        for r in ppl.groupBy("ppl_bucket")
        .agg(F.min("ppl").alias("lo"), F.max("ppl").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(stats) == {"head", "middle", "tail"}
    assert stats["head"].hi <= stats["middle"].lo
    assert stats["middle"].hi <= stats["tail"].lo
    sizes = sorted(s.n for s in stats.values())
    assert sizes[-1] - sizes[0] <= 2  # terciles, modulo boundary ties


def test_gopher_flags_match_single_doc_recompute(spark):
    """Pin the rule arithmetic against a plain-Python recompute of
    one document."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as text_fns
    from tests.conftest import SF_DIR

    docs = io.load(spark, SF_DIR, "documents")
    row = docs.orderBy("doc_id").first()
    got = (
        text_fns.gopher_quality_flags(docs)
        .filter(f"doc_id = {row.doc_id}")
        .collect()[0]
    )
    toks = [t for t in row.text.lower().split(" ") if t]
    n = len(toks)
    assert got.n_words == n
    assert got.mean_word_len == round(sum(len(t) for t in toks) / n, 4)
    assert got.frac_unique == round(len(set(toks)) / n, 4)
    assert got.stop_hits == len(set(toks) & set(text_fns.GOPHER_STOPWORDS))
    assert got.word_count_ok == (
        text_fns.GOPHER_MIN_WORDS <= n <= text_fns.GOPHER_MAX_WORDS
    )
    assert got.gopher_pass == (
        got.word_count_ok and got.mean_len_ok and got.symbol_ok and got.stop_ok
    )


def test_semdedup_matches_numpy_recompute(spark):
    """SemDeDup verdicts must reproduce a single-node recompute of the
    same spec: same cells (kmeans_assign), pairwise cosine only within
    a cell, survivor = farthest-from-centroid (vec_id tie-break)."""
    import numpy as np

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries import llmdata
    from tests.conftest import SF_DIR

    emb = io.load(spark, SF_DIR, "embeddings")
    got = {
        r.vec_id: r
        for r in similarity.semdedup(
            emb, llmdata.KMEANS_SEED_IDS, llmdata.KMEANS_ITERS
        ).collect()
    }
    X = {
        r.vec_id: (lambda v: v / np.linalg.norm(v))(
            np.array(r.embedding, dtype=float)
        )
        for r in emb.select("vec_id", "embedding").collect()
    }
    cells = {
        r.vec_id: (r.cell, r.cos_sim)
        for r in similarity.kmeans_assign(
            emb, llmdata.KMEANS_SEED_IDS, llmdata.KMEANS_ITERS
        ).collect()
    }
    dropped = set()
    for i, (ci, si) in cells.items():
        for j, (cj, sj) in cells.items():
            if i == j or ci != cj:
                continue
            if round(float(X[i] @ X[j]), 6) >= 0.45 and (
                (sj, j) < (si, i)
            ):
                dropped.add(i)
                break
    assert dropped, "no drops — planted near-dups not detected"
    for vid, r in got.items():
        assert r.kept == (vid not in dropped), vid
        assert (r.cell, r.centroid_sim) == cells[vid]


def test_classifier_quality_score_behavior(spark):
    """Hashed-linear scoring: deterministic across calls, bounded in
    (0,1), neutral 0.5 on empty docs, keep consistent with the
    threshold, and salt-versioned (new salt => new scores)."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "lorem ipsum dolor")],
        ["doc_id", "text"],
    )
    a = {r.doc_id: r for r in text_fns.classifier_quality_score(docs).collect()}
    b = {r.doc_id: r for r in text_fns.classifier_quality_score(docs).collect()}
    assert {k: v.clf_score for k, v in a.items()} == {
        k: v.clf_score for k, v in b.items()
    }
    assert a[2].clf_score == 0.5 and a[2].n_words == 0
    for r in a.values():
        assert 0.0 < r.clf_score < 1.0
        assert r.keep == (r.clf_score >= 0.5)
    c = {
        r.doc_id: r.clf_score
        for r in text_fns.classifier_quality_score(docs, salt="clf-v2").collect()
    }
    assert c != {k: v.clf_score for k, v in a.items()}


def test_bpe_tokenize_counts_match_hand_computation(spark):
    """Train->apply: after 1 merge on {aa:3, ab:1, b:1} the winner is
    'a </w>' (count 3, tie with 'a a' broken by pair-asc since '<' <
    'a'), so aa tokenizes to 2 symbols, ab to 3, b to 2."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "aa aa b")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.tokens_per_word)
        for r in text_fns.bpe_tokenize(docs, n_merges=1).collect()
    }
    assert got == {1: (2, 5, 2.5), 2: (3, 6, 2.0)}


def test_bpe_merges_survive_fully_merged_words(spark):
    """Once a frequent word is merged down to ONE symbol it has no
    pairs; the pair explode must yield an empty array there (Spark's
    sequence(1, 0) is the descending [1,0] — unguarded element_at
    throws), and when EVERY word is exhausted the remaining rounds
    emit no merge rows — matching DuckDB's empty range(1,1)."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    rows = text_fns.bpe_train_merges(docs, n_merges=3).collect()
    # Round 1 merges 'a </w>' everywhere; nothing left to merge after.
    assert [(r.step, r.merged, r.n) for r in rows] == [(1, "a</w>", 3)]
    # Exhaustion must not annihilate the symbol table: tokenize under
    # the same exhausted-merge budget still tokenizes every doc.
    tok = text_fns.bpe_tokenize(docs, n_merges=3).collect()
    assert [(r.doc_id, r.n_words, r.n_tokens) for r in tok] == [(1, 3, 3)]


def test_semdedup_cell_cap_bounds_degenerate_cells(spark):
    """Adversarial corpus: 200 near-identical vectors funnel into one
    k-means cell. With max_cell_size the oversized cell is excluded
    from the pair join (its members all kept — recall-only sacrifice,
    same contract as minhash max_bucket_size), while healthy cells
    still dedup; uncapped, the same corpus collapses the big cell to
    a single survivor (the quadratic-task shape the cap guards)."""
    from ts_data_pipeline_spark.operators import similarity

    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(200)]
    rows += [
        (300, [0.0, 1.0, 0.0, 0.0]),
        (301, [0.0, 1.0, 0.001, 0.0]),  # near-dup of 300
        (302, [0.0, 0.1, 1.0, 0.0]),  # same cell, below threshold
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    capped = similarity.semdedup(
        emb, seed_ids=[0, 300], n_iter=1, threshold=0.9, max_cell_size=64
    ).collect()
    by_id = {r.vec_id: r for r in capped}
    big_cell = by_id[0].cell
    assert all(r.kept for r in capped if r.cell == big_cell)
    assert sum(not by_id[v].kept for v in (300, 301)) == 1
    assert by_id[302].kept

    uncapped = similarity.semdedup(
        emb, seed_ids=[0, 300], n_iter=1, threshold=0.9
    ).collect()
    survivors_big = [r for r in uncapped if r.cell == big_cell and r.kept]
    assert len(survivors_big) == 1


def test_semdedup_capped_matches_oracle(spark, oracle):
    """The capped pair join must stay hash-exact vs the DuckDB
    recompute with the same cap (semdedup_sql(max_cell_size=...))."""
    from tests.conftest import SF_DIR, assert_parity
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries import llmdata

    emb = io.load(spark, SF_DIR, "embeddings")
    df = similarity.semdedup(
        emb, llmdata.KMEANS_SEED_IDS, llmdata.KMEANS_ITERS, max_cell_size=40
    )
    assert_parity(
        df,
        oracle,
        similarity.semdedup_sql(
            llmdata.KMEANS_SEED_IDS, llmdata.KMEANS_ITERS, max_cell_size=40
        ),
    )


def test_bpe_train_merges_matches_python_reference(spark):
    """The distributed unrolled merge loop must reproduce a plain
    single-node BPE trainer with the same spec (word-type counts,
    greedy left-to-right replace merging, count-desc/pair-asc
    tie-break) — including on a fixture with a 3+ identical-symbol
    run, where the shared-boundary replace semantics are part of the
    pinned spec."""
    import collections

    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa banana banana banana"), (2, "aaaa banana bandana")],
        ["doc_id", "text"],
    )

    def reference(texts, n_merges):
        wc = collections.Counter(
            w for t in texts for w in t.lower().split(" ") if w
        )
        cur = [(" " + " ".join(list(w)) + " </w> ", c) for w, c in wc.items()]
        out = []
        for step in range(1, n_merges + 1):
            pc = collections.Counter()
            for s, c in cur:
                a = s.strip().split(" ")
                for j in range(len(a) - 1):
                    pc[a[j] + " " + a[j + 1]] += c
            pair, n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            out.append((step, pair, pair.replace(" ", ""), n))
            cur = [
                (s.replace(" " + pair + " ", " " + pair.replace(" ", "") + " "), c)
                for s, c in cur
            ]
        return out

    got = [
        (r.step, r.pair, r.merged, r.n)
        for r in text_fns.bpe_train_merges(docs).orderBy("step").collect()
    ]
    assert got == reference(["aaaa aaaa banana banana banana", "aaaa banana bandana"], 4)


def test_chunk_documents_overlap_and_coverage(spark):
    """Windows advance by stride with chunk_tokens coverage: every
    token position is covered, consecutive chunks overlap by
    chunk_tokens - stride, and the tail chunk is truncated."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b c")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (
            (r.doc_id, r.chunk_idx, r.tok_offset, r.chunk_len, r.chunk_text)
            for r in text_fns.chunk_documents(
                docs, chunk_tokens=4, stride=3
            ).collect()
        )
    )
    d1 = [r for r in rows if r[0] == 1]
    assert [(r[2], r[3]) for r in d1] == [(0, 4), (3, 4), (6, 4), (9, 1)]
    assert d1[0][4] == "w0 w1 w2 w3"
    assert d1[1][4] == "w3 w4 w5 w6"  # one-token overlap (4 - 3)
    assert d1[3][4] == "w9"  # truncated tail
    d2 = [r for r in rows if r[0] == 2]
    assert [(r[2], r[3], r[4]) for r in d2] == [(0, 3, "a b c")]


def test_sq8_recall_and_reconstruction_bound(spark):
    """SQ8 + exact re-rank must recover nearly all of the exact
    brute-force top-5, and the dequantized grid can be off by at most
    half a grid step per dimension."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS, EMBEDDING_DIM

    emb = io.load(spark, SF_DIR, "embeddings")
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=5).collect()
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in similarity.sq8_topk(
            emb, ANN_QUERY_IDS, EMBEDDING_DIM, k=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"sq8 recall@5 = {recall}"

    # Reconstruction: |x - xhat| <= scale_d/2 (+1 ulp) on EVERY
    # dimension of the operator's own quantized output — 256 uniform
    # levels over [min_d, max_d] leave at most half a grid step.
    quant = similarity.sq8_quantize(emb, EMBEDDING_DIM)
    worst = (
        quant.select(
            F.array_max(
                F.zip_with("r", "xhat", lambda x, h: F.abs(x - h))
            ).alias("err")
        )
        .agg(F.max("err").alias("worst"))
        .collect()[0]["worst"]
    )
    r = emb.select(F.col("embedding").cast("array<double>").alias("r"))
    stats = r.agg(
        *[
            f(F.element_at("r", i)).alias(f"{n}{i}")
            for i in range(1, EMBEDDING_DIM + 1)
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    ).collect()[0]
    worst_step = max(
        (stats[f"mx{i}"] - stats[f"mn{i}"]) / 255.0
        for i in range(1, EMBEDDING_DIM + 1)
    )
    assert worst_step > 0
    assert worst <= worst_step / 2 * (1 + 1e-9), (worst, worst_step)
    # codes stay on the 8-bit grid
    rng = quant.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert rng["lo"] >= 0 and rng["hi"] <= 255


def test_recipe_source_cap_bounds_every_source(spark):
    """With source_cap the recipe keeps at most cap survivors per
    source, and the helper source column never leaks into the output
    contract. (No subset-of-uncapped assertion on purpose: the
    mixture keep-rates are computed from the post-cap corpus
    composition, so capping legitimately changes which docs the
    resample stage keeps.)"""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from ts_data_pipeline_spark import io, recipes

    docs = io.load(spark, SF_DIR, "documents")
    # skip the (expensive) LM gate: this test pins the cap stage only
    out = recipes.build_training_corpus(
        docs, source_cap=5, drop_ppl_tail=False
    ).cache()
    assert "source" not in out.columns  # helper column dropped
    rows = out.select("doc_id").collect()
    assert rows
    per_source = (
        out.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_source and all(r.n <= 5 for r in per_source)


def test_multiprobe_lsh_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of the single-bucket
    candidates (extra probes only add buckets), so at every (query,
    rank) the multi-probe cosine must be >= the single-probe one."""
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS, LSH_PLANE_IDS

    emb = io.load(spark, SF_DIR, "embeddings")
    single = {
        (r.query_id, r.rank): r.cos_sim
        for r in similarity.lsh_bucketed_topk(
            emb, ANN_QUERY_IDS, LSH_PLANE_IDS, k=5
        ).collect()
    }
    multi = {
        (r.query_id, r.rank): r.cos_sim
        for r in similarity.lsh_multiprobe_topk(
            emb, ANN_QUERY_IDS, LSH_PLANE_IDS, k=5, n_probe=3
        ).collect()
    }
    assert single and multi
    for key, s in single.items():
        assert key in multi and multi[key] >= s, (key, s, multi.get(key))


def test_snapshot_diff_verdicts(spark):
    """Hand-built snapshots: one added, one removed, one rewritten,
    one untouched — each classified correctly."""
    from ts_data_pipeline_spark.operators import ingest

    old = spark.createDataFrame(
        [(1, "same"), (2, "gone"), (3, "before"), (5, None), (6, None)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (3, "after"), (4, "fresh"), (5, None), (6, "now set")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.change for r in ingest.snapshot_diff(old, new).collect()}
    # NULL text is presence, not absence: 5 (NULL->NULL) is unchanged,
    # 6 (NULL->text) is changed — never added/removed.
    assert got == {1: "unchanged", 2: "removed", 3: "changed", 4: "added",
                   5: "unchanged", 6: "changed"}


def test_pandas_udf_ann_matches_expression_path(spark):
    """The Arrow-batched numpy escape hatch must reproduce the
    expression-path brute-force top-k value-for-value."""
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS

    emb = io.load(spark, SF_DIR, "embeddings")
    expr_rows = {
        (r.query_id, r.rank): (r.cand_id, r.cos_sim)
        for r in similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=10).collect()
    }
    udf_rows = {
        (r.query_id, r.rank): (r.cand_id, r.cos_sim)
        for r in similarity.brute_force_topk_pandas(
            emb, ANN_QUERY_IDS, k=10
        ).collect()
    }
    assert expr_rows == udf_rows


def test_source_drift_kl_closed_form_equals_dense(spark):
    """The absent-mass closed form must equal the dense smoothed KL —
    exercised with sources that MISS most of the vocabulary (the
    synthetic corpus can't: every source carries all 31 types), plus
    the identical-distribution floor."""
    import math
    from collections import Counter

    from ts_data_pipeline_spark.operators import quality as qops

    docs = spark.createDataFrame(
        [
            (0, "uniform", "a b c d e f"),
            (1, "uniform", "a b c d e f"),
            (2, "narrow", "a a a a a a a a"),
            (3, "tail", "f g g h h h"),
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in qops.source_drift_kl(docs).collect()}

    texts = {
        "uniform": "a b c d e f a b c d e f",
        "narrow": "a a a a a a a a",
        "tail": "f g g h h h",
    }
    corpus = Counter(
        w for t in texts.values() for w in t.split(" ") if w
    )
    n_corpus, v_corpus, alpha = sum(corpus.values()), len(corpus), 0.5
    for s, t in texts.items():
        c = Counter(w for w in t.split(" ") if w)
        n_s = sum(c.values())
        denom = n_s + alpha * v_corpus
        kl = sum(
            ((c.get(term, 0) + alpha) / denom)
            * math.log(((c.get(term, 0) + alpha) / denom) / (ct / n_corpus))
            for term, ct in corpus.items()
        )
        assert abs(got[s]["kl"] - round(kl, 4)) <= 1e-4, (s, kl, got[s]["kl"])
        assert got[s]["n_tokens"] == n_s
        assert got[s]["v_present"] == len(c)
    # every drift is positive (KL >= 0, and no source IS the corpus)
    assert all(r["kl"] > 0 for r in got.values())


def test_pq_topk_guarantees(spark):
    """Product quantization (operators/similarity.py::pq_topk):
    (a) re-ranked results carry EXACT cosines (every reported pair's
    cos_sim equals the brute-force value), (b) recall@5 vs brute
    force clears a floor at sf0.001, (c) the codes relation is
    m rows per vector with codes drawn from the codebook ids, and
    (d) queries never return themselves."""
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    k = 5
    brute = similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=k).collect()
    truth = {(r.query_id, r.cand_id) for r in brute}
    exact_cos = {(r.query_id, r.cand_id): r.cos_sim for r in brute}

    got = similarity.pq_topk(
        emb, ANN_QUERY_IDS, PQ_CODEBOOK_IDS, k=k
    ).collect()
    pairs = {(r.query_id, r.cand_id) for r in got}
    assert all(r.query_id != r.cand_id for r in got)
    for r in got:
        if (r.query_id, r.cand_id) in exact_cos:
            assert r.cos_sim == exact_cos[(r.query_id, r.cand_id)]
    recall = len(truth & pairs) / len(truth)
    # sampled (training-free) codebooks at the default 4x shortlist:
    # modest recall, measured 0.36 at sf0.001
    assert recall >= 0.3, recall

    # recall is bought with shortlist size — the PQ deployment knob:
    # rerank_factor=20 must beat the default and clear a real floor
    # (measured 0.8 at sf0.001)
    wide = similarity.pq_topk(
        emb, ANN_QUERY_IDS, PQ_CODEBOOK_IDS, k=k, rerank_factor=20
    ).collect()
    wide_pairs = {(r.query_id, r.cand_id) for r in wide}
    wide_recall = len(truth & wide_pairs) / len(truth)
    assert wide_recall >= max(recall, 0.6), (recall, wide_recall)

    # the compressed relation is m rows per vector (the 32x story)
    from pyspark.sql import functions as F

    n = emb.count()
    sub = emb.select(
        "vec_id", F.posexplode(similarity._slices("embedding", 8, 8))
        .alias("sub", "sv")
    )
    assert sub.count() == n * 8


def test_ivfpq_candidates_respect_probed_cells(spark):
    """IVFPQ (similarity.ivfpq_topk): every returned candidate's
    coarse cell is one of its query's nprobe probed cells (the IVF
    restriction really applies), and reported cosines are exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.operators.similarity import dot
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
    )
    from ts_data_pipeline_spark.queries.timeseries import IVF_CENTROID_IDS

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    nprobe = 2
    got = similarity.ivfpq_topk(
        emb, ANN_QUERY_IDS, IVF_CENTROID_IDS, PQ_CODEBOOK_IDS,
        k=5, nprobe=nprobe,
    ).collect()
    assert got and all(r.query_id != r.cand_id for r in got)

    # recompute assignments/probes independently
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).select("vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("n"))
    cents = base.filter(F.col("vec_id").isin(IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("ccid"), F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    ranked = (
        base.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "ccid",
            F.round(dot(F.col("v"), F.col("cv"))
                    / (F.col("n") * F.col("cn")), 6).alias("cc"),
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cc").desc(), F.col("ccid").asc()
                )
            ),
        )
    ).collect()
    cell_of = {r.vec_id: r.ccid for r in ranked if r.crk == 1}
    probes = {}
    for r in ranked:
        if r.vec_id in ANN_QUERY_IDS and r.crk <= nprobe:
            probes.setdefault(r.vec_id, set()).add(r.ccid)
    for r in got:
        assert cell_of[r.cand_id] in probes[r.query_id], r

    brute = {
        (b.query_id, b.cand_id): b.cos_sim
        for b in similarity.brute_force_topk(
            emb, ANN_QUERY_IDS, k=50
        ).collect()
    }
    for r in got:
        if (r.query_id, r.cand_id) in brute:
            assert r.cos_sim == brute[(r.query_id, r.cand_id)]


def test_pq_index_roundtrip_matches_inline(spark, tmp_path):
    """PQ index lifecycle: build-once codes on disk, query-many —
    results byte-match the inline pq_topk, and the persisted codes
    relation is a fraction of the raw vector bytes (the compression
    that funds the compressed-domain scan)."""
    import os

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "pqidx")
    meta = similarity.pq_build_index(emb, path, PQ_CODEBOOK_IDS)
    assert meta["m"] == 8

    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5
        ).collect()
    )
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_topk(
            emb, ANN_QUERY_IDS, PQ_CODEBOOK_IDS, k=5
        ).collect()
    )
    assert got == want and len(got) > 0

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs
        )

    codes_b = dir_bytes(os.path.join(path, "codes"))
    raw_b = os.path.getsize(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    assert codes_b < raw_b / 2, (codes_b, raw_b)


def test_clean_text_unicode_and_whitespace(spark):
    """clean_text on messy input: NFC composes combining marks
    (matching Python's unicodedata reference), control chars strip,
    whitespace runs collapse, and chars_removed accounts the net
    shrink."""
    import unicodedata

    from ts_data_pipeline_spark.functions import text as text_fns

    decomposed = "Café  du   monde"   # e + combining acute
    messy = "a\x00b\x07c\td\n e"
    docs = spark.createDataFrame(
        [(1, decomposed), (2, messy), (3, None), (4, "  already ok  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text_fns.clean_text(docs).collect()}

    want1 = unicodedata.normalize("NFC", decomposed)
    want1 = " ".join(want1.split())
    assert got[1].text_clean == want1 == "Café du monde"
    # chars_removed baselines on the POST-NFC text (NFC rewrites, it
    # doesn't "remove"): the NFC'd string has 16 chars, the cleaned
    # 13 — exactly the three collapsed spaces
    nfc_len = len(unicodedata.normalize("NFC", decomposed))
    assert got[1].chars_removed == nfc_len - len(want1) == 3

    assert got[2].text_clean == "abc d e"
    assert got[3].text_clean is None
    assert got[4].text_clean == "already ok"
    assert got[4].chars_removed == 4


def test_pq_index_append_is_delta_scoped_and_queryable(spark, tmp_path):
    """pq_index_append: existing code files untouched (delta-scoped
    I/O), and queries over the appended index return results
    identical to an inline pq_topk over the full corpus (pinned
    codebooks keep old and new codes comparable)."""
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    # the build corpus must CONTAIN the codebook rows (the builder
    # rejects a partial codebook rather than silently degrading)
    head = emb.filter(
        (F.col("vec_id") < 350) | F.col("vec_id").isin(PQ_CODEBOOK_IDS)
    )
    tail = emb.join(head.select("vec_id"), "vec_id", "left_anti")
    path = str(tmp_path / "pqidx")
    similarity.pq_build_index(head, path, PQ_CODEBOOK_IDS)

    codes_dir = os.path.join(path, "codes")
    before = {
        f: os.path.getmtime(os.path.join(codes_dir, f))
        for f in os.listdir(codes_dir) if f.endswith(".parquet")
    }
    n = similarity.pq_index_append(spark, path, tail)
    assert n == tail.count() > 0
    after = {
        f: os.path.getmtime(os.path.join(codes_dir, f))
        for f in os.listdir(codes_dir) if f.endswith(".parquet")
    }
    for f, mt in before.items():  # old files never rewritten
        assert after[f] == mt, f
    assert len(after) > len(before)

    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5
        ).collect()
    )
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_topk(
            emb, ANN_QUERY_IDS, PQ_CODEBOOK_IDS, k=5
        ).collect()
    )
    assert got == want


def test_recipe_optional_clean_and_eval_split(spark):
    """The recipe's optional stages compose without disturbing the
    default path: NFC cleaning is an exact no-op on the composed
    ASCII corpus (identical selected set), and the eval split
    attaches ONE split per document so chunks never straddle
    splits, with all three split names in use."""
    from ts_data_pipeline_spark import recipes

    docs = io.load(spark, SF_DIR, "documents")
    base = recipes.build_training_corpus(docs).collect()
    both = recipes.build_training_corpus(
        docs,
        nfc_clean=True,
        eval_split_fracs={"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()

    assert {r.doc_id for r in both} == {r.doc_id for r in base}
    assert sorted(
        (r.doc_id, r.chunk_id, r.tok_offset) for r in both
    ) == sorted((r.doc_id, r.chunk_id, r.tok_offset) for r in base)

    per_doc = {}
    for r in both:
        per_doc.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_doc.values())
    assert {s for v in per_doc.values() for s in v} == {
        "train", "val", "test"
    }


def test_pq_index_trained_roundtrip_matches_inline(spark, tmp_path):
    """Index lifecycle under TRAINED codebooks (VERDICT r6 #1's
    reference point): pq_build_index(train_iters=3) persists the
    Lloyd-trained codebook, pq_query_index consumes the STORED
    relation (codebook-agnostic — it never re-trains), and results
    byte-match the inline trained pq_topk; a delta append under the
    pinned trained codebook stays value-identical to inline too."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
        PQ_RERANK_FACTOR,
        PQ_TRAIN_ITERS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "pqidx_tr")
    head = emb.filter(
        (F.col("vec_id") < 350) | F.col("vec_id").isin(PQ_CODEBOOK_IDS)
    )
    tail = emb.subtract(head)
    # train on the HEAD ONLY (the deployment shape: codebooks pin at
    # build time; later deltas encode under them)
    meta = similarity.pq_build_index(
        head, path, PQ_CODEBOOK_IDS, train_iters=PQ_TRAIN_ITERS
    )
    assert meta["train_iters"] == PQ_TRAIN_ITERS
    n = similarity.pq_index_append(spark, path, tail)
    assert n == tail.count()

    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5,
            rerank_factor=PQ_RERANK_FACTOR,
        ).collect()
    )
    # the inline twin must train on the same head-only corpus for
    # the codebooks to match the pinned index
    cb = similarity._pq_cb_trained(
        head, PQ_CODEBOOK_IDS, 8, 8, "vec_id", "embedding",
        PQ_TRAIN_ITERS,
    )
    enc = similarity._pq_enc_from(emb, cb, 8, 8, "vec_id", "embedding")
    qtab = similarity._pq_qtab(
        emb, ANN_QUERY_IDS, cb, 8, 8, "vec_id", "embedding"
    )
    scored = enc.join(
        F.broadcast(qtab),
        (F.col("sub") == F.col("qsub")) & (F.col("code") == F.col("qcid")),
    )
    cands = similarity._pq_adc_cands(
        scored, "vec_id", PQ_RERANK_FACTOR * 5
    )
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity._pq_exact_rerank(
            emb, cands, ANN_QUERY_IDS, 5, "vec_id", "embedding"
        ).collect()
    )
    assert got == want


def test_duplicated_spans_covers_and_merges(spark):
    """Substring dedup (operators/dedup.py::duplicated_spans): (a) a
    shared k+ substring across documents is fully covered by a span
    in BOTH documents, (b) overlapping duplicated shingles merge into
    ONE maximal span, (c) a unique document yields no spans, (d)
    verbatim self-repetition inside one document is caught, (e) the
    per-doc stats fold spans into integer curation signals."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame([
        # docs 1+2 share an 8-token prefix, then diverge
        Row(doc_id=1, text="a b c d e f g h unique1 tail1"),
        Row(doc_id=2, text="a b c d e f g h other2 tail2"),
        # doc 3: all-unique tokens -> no duplicated shingles
        Row(doc_id=3, text="q w e r t y u i o p"),
        # doc 4: internal verbatim repetition of a 6-token phrase
        Row(doc_id=4, text="one two three four five six one two three four five six"),
    ])
    spans = {
        (r.doc_id, r.start_tok, r.end_tok, r.dup_tokens)
        for r in dedup.duplicated_spans(docs, k=3).collect()
    }
    by_doc = {}
    for d, s, e, n in spans:
        by_doc.setdefault(d, []).append((s, e, n))
    # (a)+(b): one merged span covering tokens 0..7 in docs 1 and 2
    assert by_doc[1] == [(0, 7, 8)]
    assert by_doc[2] == [(0, 7, 8)]
    # (c)
    assert 3 not in by_doc
    # (d): the repeated phrase makes every 3-shingle of doc 4 appear
    # twice -> one span covering the whole 12-token doc
    assert by_doc[4] == [(0, 11, 12)]

    stats = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
        for r in dedup.substring_dedup_stats(docs, k=3).collect()
    }
    assert stats[1] == (10, 8, 1)
    assert stats[2] == (10, 8, 1)
    assert stats[3] == (10, 0, 0)
    assert stats[4] == (12, 12, 1)


def test_duplicated_spans_gap_produces_two_spans(spark):
    """Two separated duplicated regions in one document must stay
    TWO spans (the merge joins only overlapping/adjacent shingles),
    and span numbering follows token order."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c GAP1ONLY x y z"),
        Row(doc_id=2, text="a b c GAP2DIFF x y z"),
    ])
    got = sorted(
        (r.doc_id, r.span_id, r.start_tok, r.end_tok)
        for r in dedup.duplicated_spans(docs, k=3).collect()
    )
    # "a b c" (pos 0) and "x y z" (pos 4) are shared; the middle
    # token differs -> spans [0,2] and [4,6] per doc
    assert got == [
        (1, 1, 0, 2), (1, 2, 4, 6),
        (2, 1, 0, 2), (2, 2, 4, 6),
    ]


def test_char_entropy_orders_garbage_below_prose(spark):
    """Character entropy (functions/text.py::char_entropy): a
    single-character flood scores exactly 0 bits, a two-char
    alternation exactly 1 bit, and natural-ish prose lands above
    both — the ordering the low-entropy garbage filter relies on;
    n_chars/distinct_chars are exact."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame([
        Row(doc_id=1, text="aaaaaaaaaa"),
        Row(doc_id=2, text="ababababab"),
        Row(doc_id=3, text="the quick brown fox jumps over lazy dogs"),
    ])
    got = {r.doc_id: (r.n_chars, r.distinct_chars, r.entropy_bits)
           for r in text_fns.char_entropy(docs).collect()}
    assert got[1] == (10, 1, 0.0)
    assert got[2] == (10, 2, 1.0)
    n3, d3, e3 = got[3]
    assert n3 == 40 and d3 > 10
    assert e3 > got[2][2] > got[1][2]


def test_char_entropy_counts_codepoints_not_utf16_units(spark):
    """ADVICE r7: non-BMP characters (emoji = one codepoint, two
    UTF-16 units) must count as ONE char — the old F.split(text, '')
    yielded surrogate halves, diverging from DuckDB's
    string_split(text, '') codepoints. Pins n_chars/distinct_chars
    and cross-engine agreement on emoji-bearing text."""
    import duckdb
    import pandas as pd
    from pyspark.sql import Row

    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame([
        Row(doc_id=1, text="a\U0001F600b\U0001F600"),  # a😀b😀
        Row(doc_id=2, text="\U0001F600" * 4),          # 😀😀😀😀
    ])
    got = {r.doc_id: (r.n_chars, r.distinct_chars, r.entropy_bits)
           for r in text_fns.char_entropy(docs).collect()}
    # 4 codepoints each; doc 1 has 3 distinct (a, b, emoji),
    # doc 2 is a single-codepoint flood -> exactly 0 bits
    assert got[1] == (4, 3, 1.5)
    assert got[2] == (4, 1, 0.0)

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["a\U0001F600b\U0001F600",
                               "\U0001F600" * 4]}),
    )
    want = {int(r.doc_id): (int(r.n_chars), int(r.distinct_chars),
                            float(r.entropy_bits))
            for r in con.execute(text_fns.char_entropy_sql())
            .df().itertuples(index=False)}
    con.close()
    assert got == want


def test_kmeans_zero_norm_cluster_drops_not_nan(spark):
    """ADVICE r7: a cluster whose member mean is the ZERO vector
    (two antipodal unit members) must DROP like an empty cluster,
    not renormalize into null/NaN centroid coordinates that poison
    downstream probe rankings."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import similarity

    emb = spark.createDataFrame([
        Row(vec_id=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, embedding=[-1.0, 0.0]),
    ])
    # single seed -> both vectors assign to it -> mean = zero vector
    cents = similarity._kmeans_centroids(
        emb, [1], n_iter=1, id_col="vec_id", vec_col="embedding", dim=2
    ).collect()
    assert cents == []  # dropped, and no NaN rows survived

    # a healthy cluster alongside the degenerate one still trains
    emb2 = spark.createDataFrame([
        Row(vec_id=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, embedding=[-1.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0]),
    ])
    # seeds 1 and 3: vec 2 is antipodal to seed 1 but closer to
    # nothing positive; cos(v2, c1) = -1, cos(v2, c3) = 0 -> cell 3
    cents2 = {
        r.cell: r.cv
        for r in similarity._kmeans_centroids(
            emb2, [1, 3], n_iter=1, id_col="vec_id",
            vec_col="embedding", dim=2,
        ).collect()
    }
    assert set(cents2) == {1, 3}
    assert all(
        all(x == x for x in cv) for cv in cents2.values()  # no NaNs
    )


def test_ivfpq_index_matches_inline_and_prunes(spark, tmp_path):
    """VERDICT r7 ask #1 — the IVF-partitioned persisted index:
    (a) ivfpq_query_index returns value-identical results to the
    inline ivfpq_topk under the same trained codebooks/centroids;
    (b) the codes scan carries a PartitionFilters entry on `cell`
    (partition-level pruning, not a full-index read); (c) the flat
    pq_query_index still works over the partitioned layout and
    matches inline pq_topk."""
    import contextlib
    import io as pyio
    import os

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivfpqidx")
    meta = similarity.ivfpq_build_index(
        emb, path, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS,
        train_iters=1, coarse_train_iters=1,
    )
    assert meta["ivf"]["nlist"] == len(IVFPQ_COARSE_IDS)
    # codes are physically laid out by cell
    cells_on_disk = {
        d for d in os.listdir(os.path.join(path, "codes"))
        if d.startswith("cell=")
    }
    assert len(cells_on_disk) > 1

    df = similarity.ivfpq_query_index(
        spark, path, emb, ANN_QUERY_IDS, k=5, nprobe=2, rerank_factor=4
    )
    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank) for r in df.collect()
    )
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_topk(
            emb, ANN_QUERY_IDS, IVFPQ_COARSE_IDS, PQ_CODEBOOK_IDS,
            k=5, nprobe=2, rerank_factor=4,
            train_iters=1, coarse_train_iters=1,
        ).collect()
    )
    assert got == want and len(got) > 0

    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan

    # flat search over the SAME partitioned index: full-scan PQ
    got_flat = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5
        ).collect()
    )
    want_flat = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.pq_topk(
            emb, ANN_QUERY_IDS, PQ_CODEBOOK_IDS, k=5, train_iters=1
        ).collect()
    )
    assert got_flat == want_flat and len(got_flat) > 0


def test_ivfpq_index_append_lands_in_cells(spark, tmp_path):
    """Append on the IVF-partitioned index: delta rows assign to
    their coarse cell under the PINNED stored centroids, land in the
    matching cell=<id>/ partitions without rewriting existing files,
    and the appended index answers identically to a full inline
    search."""
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    seed_ids = set(PQ_CODEBOOK_IDS) | set(IVFPQ_COARSE_IDS)
    head = emb.filter(
        (F.col("vec_id") < 350) | F.col("vec_id").isin(list(seed_ids))
    )
    tail = emb.join(head.select("vec_id"), "vec_id", "left_anti")
    path = str(tmp_path / "ivfpqidx")
    similarity.ivfpq_build_index(
        head, path, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS
    )

    codes_dir = os.path.join(path, "codes")
    before = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(codes_dir)
        for f in fs if f.endswith(".parquet")
    }
    n = similarity.pq_index_append(spark, path, tail)
    assert n == tail.count() > 0
    after = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(codes_dir)
        for f in fs if f.endswith(".parquet")
    }
    for f, mt in before.items():  # old files never rewritten
        assert after[f] == mt, f
    assert len(after) > len(before)
    # idempotent under re-delivery
    assert similarity.pq_index_append(spark, path, tail) == 0

    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5, nprobe=2, rerank_factor=4
        ).collect()
    )
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_topk(
            emb, ANN_QUERY_IDS, IVFPQ_COARSE_IDS, PQ_CODEBOOK_IDS,
            k=5, nprobe=2, rerank_factor=4,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_prefix_dim_topk_recall_and_exact_rerank(spark):
    """Matryoshka-style prefix ANN (similarity.prefix_dim_topk): the
    reported cos_sim/rank come from the FULL-dimension exact rerank
    (each returned pair's cos_sim matches brute force exactly), a
    full-width 'prefix' with ample shortlist reproduces brute force
    outright, and a narrow prefix still recalls most of the exact
    top-k on this corpus."""
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    truth = {
        (r.query_id, r.cand_id): (r.cos_sim, r.rank)
        for r in similarity.brute_force_topk(
            emb, ANN_QUERY_IDS, k=5
        ).collect()
    }
    # d_prefix = full width, big shortlist -> identical to brute force
    full = {
        (r.query_id, r.cand_id): (r.cos_sim, r.rank)
        for r in similarity.prefix_dim_topk(
            emb, ANN_QUERY_IDS, 64, k=5, rerank_factor=64
        ).collect()
    }
    assert full == truth
    # narrow prefix: every returned cos_sim is the exact full-dim one
    got = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in similarity.prefix_dim_topk(
            emb, ANN_QUERY_IDS, 16, k=5, rerank_factor=8
        ).collect()
    }
    exact = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in similarity.brute_force_topk(
            emb, ANN_QUERY_IDS, k=500
        ).collect()
    }
    assert got and all(exact[p] == s for p, s in got.items())
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.5, recall


def test_filtered_topk_pre_filters_candidates(spark):
    """Filtered ANN (similarity.filtered_topk): every candidate
    satisfies the predicate, queries need not, k is honored (no
    post-filter k-deflation), and results equal brute force over the
    pre-filtered corpus."""
    from pyspark.sql import functions as FF

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    rows = similarity.filtered_topk(
        emb, ANN_QUERY_IDS, "vec_id % 3 = 0", k=5
    ).collect()
    assert all(r.cand_id % 3 == 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == set(ANN_QUERY_IDS)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    # reference: the FULL exact ranking, re-ranked in Python after
    # dropping non-predicate candidates — pre-filter semantics
    n = emb.count()
    full = similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=n).collect()
    by_q = {}
    for r in sorted(full, key=lambda r: (r.query_id, -r.cos_sim, r.cand_id)):
        if r.cand_id % 3 == 0:
            by_q.setdefault(r.query_id, []).append((r.cand_id, r.cos_sim))
    want = {
        (q, c, s, i + 1)
        for q, lst in by_q.items()
        for i, (c, s) in enumerate(lst[:5])
    }
    got = {(r.query_id, r.cand_id, r.cos_sim, r.rank) for r in rows}
    assert got == want


def test_ivfpq_index_filter_composes_with_cell_pruning(spark, tmp_path):
    """filter_ids on ivfpq_query_index: attribute pre-filtering
    composed with the persisted index. With all cells probed and a
    shortlist wider than the filtered corpus, the filtered index
    query must equal the exact filtered_topk — and the filter must
    actually bind (no out-of-filter candidate ever returned)."""
    from pyspark.sql import functions as FF

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "fidx")
    similarity.ivfpq_build_index(
        emb, path, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS
    )
    allowed = emb.filter(FF.col("vec_id") % 3 == 0).select("vec_id")
    n_allowed = allowed.count()
    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_query_index(
            spark, path, emb, ANN_QUERY_IDS, k=5,
            nprobe=len(IVFPQ_COARSE_IDS),          # probe everything
            rerank_factor=(n_allowed // 5) + 1,    # shortlist > filtered corpus
            filter_ids=allowed,
        ).collect()
    )
    assert got and all(c % 3 == 0 for _, c, _, _ in got)
    want = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.filtered_topk(
            emb, ANN_QUERY_IDS, "vec_id % 3 = 0", k=5
        ).collect()
    )
    assert got == want


def test_pagerank_star_and_clique_semantics(spark):
    """PageRank over a pair graph (operators/dedup.py::pagerank): on
    a star the hub out-ranks every leaf (template vs variants); on a
    clique ranks are uniform; total mass stays ~1 (symmetrized graph
    has no dangling loss)."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.operators import dedup

    star = spark.createDataFrame(
        [Row(da=1, db=i) for i in (2, 3, 4, 5)]
    )
    pr = {r.doc_id: (r.deg, r.pr) for r in dedup.pagerank(star).collect()}
    assert pr[1][0] == 4 and all(pr[i][0] == 1 for i in (2, 3, 4, 5))
    assert pr[1][1] > pr[2][1]
    assert len({pr[i][1] for i in (2, 3, 4, 5)}) == 1  # symmetric leaves
    assert abs(sum(v for _, v in pr.values()) - 1.0) < 1e-3

    clique = spark.createDataFrame(
        [Row(da=a, db=b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    )
    prc = {r.doc_id: r.pr for r in dedup.pagerank(clique).collect()}
    assert len(set(prc.values())) == 1
    assert abs(sum(prc.values()) - 1.0) < 1e-3


def test_lexical_stats_zipf_slope_semantics(spark):
    """Lexical stats (functions/text.py::lexical_stats): exact
    integer totals; a perfectly Zipfian crafted corpus fits a slope
    near -1 while a flat (every-type-equal) corpus fits ~0; hapax
    count tracks the freq-1 spectrum mass."""
    from pyspark.sql import Row

    from ts_data_pipeline_spark.functions import text as text_fns

    # Zipfian: type t_r appears round(60/r) times, r = 1..12
    words = []
    for r in range(1, 13):
        words += [f"w{r}"] * max(1, round(60 / r))
    zipf_docs = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    z = text_fns.lexical_stats(zipf_docs).collect()[0]
    assert z.n_tokens == len(words) and z.n_types == 12
    assert -1.35 < z.zipf_slope < -0.75, z.zipf_slope

    flat_docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join([f"t{i}" for i in range(30)] * 3))]
    )
    fl = text_fns.lexical_stats(flat_docs).collect()[0]
    assert fl.n_types == 30 and fl.hapax_types == 0
    # every type has identical frequency -> single spectrum point ->
    # degenerate fit; the slope must come back NULL, not a crash
    assert fl.zipf_slope is None

    spec = {
        (r.freq, r.n_types)
        for r in text_fns.token_spectrum(zipf_docs).collect()
    }
    assert (60, 1) in spec                       # w1: 60 occurrences
    assert sum(f * n for f, n in spec) == z.n_tokens
    assert sum(n for _, n in spec) == 12


def test_ivfpq_residual_index_roundtrip(spark, tmp_path):
    """Residual (IVFADC) encoding — the r9 answer to the clustered
    sweep's finding that whole-corpus codebooks cap recall at the
    flat-PQ line. On the clustered fixture the residual index must
    (a) beat-or-match the raw-encoded index's recall at the same
    nprobe/rerank budget, (b) keep the cell-partitioned layout,
    (c) refuse the flat pq_query_index (space mismatch), and
    (d) append deltas residual-encoded and idempotently."""
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.operators.synth import clustered_embeddings
    from ts_data_pipeline_spark.queries.llmdata import PQ_CODEBOOK_IDS

    emb = clustered_embeddings(spark, 2000, 64, 8, 4.0)
    qids = list(range(16, 26))
    k = 10
    truth = {
        (r.query_id, r.cand_id)
        for r in similarity.brute_force_topk(emb, qids, k=k).collect()
    }

    raw_path = str(tmp_path / "rawidx")
    res_path = str(tmp_path / "residx")
    similarity.ivfpq_build_index(
        emb, raw_path, PQ_CODEBOOK_IDS, list(range(8)),
        train_iters=2, coarse_train_iters=2,
    )
    meta = similarity.ivfpq_build_index(
        emb, res_path, PQ_CODEBOOK_IDS, list(range(8)),
        train_iters=2, coarse_train_iters=2, residual=True,
    )
    assert meta["residual"] is True
    cells = {
        d for d in os.listdir(os.path.join(res_path, "codes"))
        if d.startswith("cell=")
    }
    assert len(cells) > 1

    def recall(path):
        got = {
            (r.query_id, r.cand_id)
            for r in similarity.ivfpq_query_index(
                spark, path, emb, qids, k=k, nprobe=2, rerank_factor=16
            ).collect()
        }
        return len(truth & got) / len(truth)

    r_raw, r_res = recall(raw_path), recall(res_path)
    assert r_res >= r_raw
    assert r_res >= 0.9

    import pytest

    with pytest.raises(ValueError, match="residual"):
        similarity.pq_query_index(spark, res_path, emb, qids, k=k)


def test_ivfpq_residual_append_idempotent(spark, tmp_path):
    """Appends to a residual index encode the delta's RESIDUAL under
    the pinned centroids, land in cell partitions, and re-delivery
    is a no-op."""
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.operators.synth import clustered_embeddings
    from ts_data_pipeline_spark.queries.llmdata import PQ_CODEBOOK_IDS

    emb = clustered_embeddings(spark, 1200, 64, 8, 4.0)
    seed_ids = set(PQ_CODEBOOK_IDS) | set(range(8))
    head = emb.filter(
        (F.col("vec_id") < 900) | F.col("vec_id").isin(list(seed_ids))
    )
    tail = emb.join(head.select("vec_id"), "vec_id", "left_anti")
    path = str(tmp_path / "residx")
    similarity.ivfpq_build_index(
        emb.sparkSession.createDataFrame(head.collect(), head.schema),
        path, PQ_CODEBOOK_IDS, list(range(8)), residual=True,
    )
    n = similarity.pq_index_append(spark, path, tail)
    assert n == tail.count() > 0
    # re-delivery: every id already present
    assert similarity.pq_index_append(spark, path, tail) == 0
    # appended rows are queryable in residual space: a query that IS
    # an appended row must return same-cluster neighbors, not noise
    qid = int(tail.agg(F.min("vec_id")).collect()[0][0])
    got = similarity.ivfpq_query_index(
        spark, path, emb, [qid], k=5, nprobe=2, rerank_factor=8
    ).collect()
    assert len(got) == 5
    assert all(r.cos_sim > 0.5 for r in got)


def test_ivfpq_residual_auto_selects_by_measured_anisotropy(spark, tmp_path):
    """residual='auto' (VERDICT r9 ask #3): the build measures the
    covariance spectrum's participation-ratio fraction and picks
    residual encoding on clustered corpora (synth sep>=1), raw on
    isotropic ones (the driver table) — the bloom_pays pattern: a
    measured crossover as a pure decision rule, evidence recorded in
    the meta sidecar. Both auto-built indexes stay queryable."""
    import os

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.operators.synth import clustered_embeddings
    from ts_data_pipeline_spark.queries.llmdata import PQ_CODEBOOK_IDS
    from tests.conftest import SF_DIR

    # clustered: auto -> residual
    emb_c = clustered_embeddings(spark, 1500, 64, 8, 1.0)
    meta_c = similarity.ivfpq_build_index(
        emb_c, str(tmp_path / "autoc"), PQ_CODEBOOK_IDS, list(range(8)),
        train_iters=1, coarse_train_iters=1, residual="auto",
    )
    assert meta_c["residual"] is True
    assert meta_c["residual_auto"]["decision"] == "residual"
    assert meta_c["residual_auto"]["pr_frac"] < similarity.RESIDUAL_AUTO_PR_FRAC

    # isotropic driver corpus: auto -> raw
    emb_i = io.load(spark, SF_DIR, "embeddings")
    meta_i = similarity.ivfpq_build_index(
        emb_i, str(tmp_path / "autoi"), PQ_CODEBOOK_IDS, list(range(8)),
        train_iters=1, coarse_train_iters=1, residual="auto",
    )
    assert meta_i["residual"] is False
    assert meta_i["residual_auto"]["decision"] == "raw"
    assert meta_i["residual_auto"]["pr_frac"] > similarity.RESIDUAL_AUTO_PR_FRAC

    # both decisions persist to the sidecar and stay queryable
    import json

    for path, want in ((tmp_path / "autoc", True), (tmp_path / "autoi", False)):
        with open(os.path.join(str(path), "_pq_meta.json")) as fh:
            stored = json.load(fh)
        assert stored["residual"] is want
        assert stored["residual_auto"]["decision"] == (
            "residual" if want else "raw"
        )
    got = similarity.ivfpq_query_index(
        spark, str(tmp_path / "autoc"), emb_c, [20, 21], k=5,
        nprobe=2, rerank_factor=8,
    ).collect()
    assert len(got) == 10

    import pytest as _pytest

    with _pytest.raises(ValueError, match="residual"):
        similarity.ivfpq_build_index(
            emb_i, str(tmp_path / "bad"), PQ_CODEBOOK_IDS, list(range(8)),
            residual="yes",
        )


def test_binary_sign_recall_and_signature_shape(spark):
    """1-bit sign quantization + exact re-rank: (a) recall@5 vs
    brute force at the gate's operating point (rf=32; measured 0.99
    at sf0.01, floor 0.8 leaves SF margin), (b) the packed
    signature is ceil(dim/32) words each within 32-bit range (the
    twin-able packing — DuckDB raises on 1::BIGINT << 63), and the
    hamming of a vector against its own negation is exactly dim."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        BSIGN_RERANK_FACTOR,
        EMBEDDING_DIM,
    )

    emb = io.load(spark, SF_DIR, "embeddings")
    exact = {
        (r.query_id, r.cand_id)
        for r in similarity.brute_force_topk(emb, ANN_QUERY_IDS, k=5).collect()
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in similarity.binary_sign_topk(
            emb, ANN_QUERY_IDS, EMBEDDING_DIM, k=5,
            rerank_factor=BSIGN_RERANK_FACTOR,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"bsign recall@5 = {recall}"

    v = emb.select(F.col("embedding").cast("array<double>").alias("v"))
    sig = v.select(
        similarity._sign_words(F.col("v"), EMBEDDING_DIM).alias("s"),
        similarity._sign_words(
            F.transform(F.col("v"), lambda x: -x - 1e-12), EMBEDDING_DIM
        ).alias("neg"),
    )
    rows = sig.select(
        F.size("s").alias("nw"),
        F.array_max(F.transform("s", lambda w: F.abs(w))).alias("mx"),
        similarity._hamming(F.col("s"), F.col("neg")).alias("hm"),
    ).collect()
    for r in rows:
        assert r.nw == (EMBEDDING_DIM + 31) // 32
        assert r.mx <= (1 << 32) - 1
        assert r.hm == EMBEDDING_DIM, r.hm


def test_ivfpq_index_compact_and_maintenance_decision(spark, tmp_path):
    """Index maintenance (the operational tail of the persisted-index
    story): appends fragment cell partitions into many small files;
    ivfpq_index_compact restores one file per cell WITHOUT changing a
    single query result (codes re-laid-out, never re-encoded), via a
    verified tmp-write-then-swap that refuses to touch the live index
    on a row-count mismatch. ivf_maintenance_decision recommends the
    compaction from measured stats and stays quiet on a fresh build."""
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    seed_ids = set(PQ_CODEBOOK_IDS) | set(IVFPQ_COARSE_IDS)
    head = emb.filter(
        (F.col("vec_id") < 300) | F.col("vec_id").isin(list(seed_ids))
    )
    mid = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    tail = emb.filter(F.col("vec_id") >= 400).join(
        head.select("vec_id"), "vec_id", "left_anti"
    )
    path = str(tmp_path / "ividx")
    similarity.ivfpq_build_index(
        head, path, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS
    )
    fresh = similarity.ivfpq_index_stats(spark, path)
    assert not similarity.ivf_maintenance_decision(fresh)["compact"]

    assert similarity.pq_index_append(spark, path, mid) > 0
    assert similarity.pq_index_append(spark, path, tail) > 0
    frag = similarity.ivfpq_index_stats(spark, path)
    assert frag["files_per_cell_max"] >= 3  # build + two appends
    assert frag["rows_total"] == emb.count()
    decision = similarity.ivf_maintenance_decision(frag)
    assert decision["compact"] is True
    assert decision["evidence"]["files_per_cell_mean"] > 2.0

    def results():
        return sorted(
            (r.query_id, r.cand_id, r.cos_sim, r.rank)
            for r in similarity.ivfpq_query_index(
                spark, path, emb, ANN_QUERY_IDS, k=5, nprobe=2,
                rerank_factor=4,
            ).collect()
        )

    pre = results()
    out = similarity.ivfpq_index_compact(spark, path)
    assert out["files_after"] < out["files_before"]
    assert out["files_per_cell_max_after"] == 1
    assert out["rows_total"] == frag["rows_total"]
    after = similarity.ivfpq_index_stats(spark, path)
    assert after["files_per_cell_max"] == 1
    assert after["rows_by_cell"] == frag["rows_by_cell"]
    assert results() == pre and len(pre) > 0  # bit-identical answers
    # pointer-commit hygiene: exactly ONE live codes dir remains (the
    # pointer's target); the superseded build-time dir and any crash
    # debris are swept
    import json

    live = json.load(open(os.path.join(path, "_codes_ptr.json")))["live"]
    codes_dirs = [
        n
        for n in os.listdir(path)
        if n == "codes" or n.startswith(("codes_v", "codes."))
    ]
    assert codes_dirs == [live], (codes_dirs, live)
    assert live.startswith("codes_v")


def test_ivf_maintenance_retrain_flag_on_distribution_drift(spark, tmp_path):
    """The retrain recommendation fires on measured cell skew from
    DISTRIBUTION DRIFT — the scenario pinned-centroid appends create:
    a quantizer seeded one-per-cluster stays balanced on the uniform
    mixture, but when the corpus drifts to ~80% one cluster (synth
    sep=4; keep every cluster-0 row, 1-in-4 of the rest), that
    cluster's cell holds most of the corpus, the imbalance factor
    crosses the 4x threshold, and ivf_maintenance_decision flags
    retrain while staying quiet on the uniform corpus."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import similarity, synth

    emb = synth.clustered_embeddings(
        spark, n=4000, dim=64, n_clusters=8, sep=4.0
    )
    # drifted corpus: all of cluster 0 (500 rows) + a uniform 320-row
    # head (40 rows/cluster, and it keeps every seed/codebook id
    # present) -> cluster 0's cell carries ~5.5x the mean
    drift = emb.filter(
        (F.col("vec_id") % 8 == 0) | (F.col("vec_id") < 320)
    )
    bal_ids = [0, 1, 2, 3, 4, 5, 6, 7]  # one seed per true cluster
    cb_ids = [64 + i for i in range(16)]

    stats = {}
    for name, corpus in (("drift", drift), ("uniform", emb)):
        path = str(tmp_path / name)
        similarity.ivfpq_build_index(corpus, path, cb_ids, bal_ids)
        stats[name] = similarity.ivfpq_index_stats(spark, path)

    d_drift = similarity.ivf_maintenance_decision(stats["drift"])
    d_uni = similarity.ivf_maintenance_decision(stats["uniform"])
    assert d_drift["retrain"] is True, stats["drift"]["imbalance"]
    assert d_uni["retrain"] is False, stats["uniform"]["imbalance"]
    assert stats["drift"]["imbalance"] > stats["uniform"]["imbalance"]


def test_sign_words_partial_word_packing_cross_engine(spark):
    """The 32-bit sign-word packing at a dim that is NOT a multiple
    of 32 (dim=40 -> word 2 carries 8 bits): Spark's _sign_words
    matches an independent Python reference bit-for-bit, and the SQL
    twin's packing expression produces the SAME words in DuckDB on
    the same vectors — pinning the cross-engine agreement off the
    gate's d=64 path."""
    import duckdb
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.operators import similarity

    import random

    rng = random.Random(13)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(40)] for _ in range(20)
    ]
    # force exact-zero coordinates through the >= 0 boundary
    vecs[0][3] = 0.0
    vecs[1][39] = 0.0

    def ref_words(v):
        out = []
        for wi in range(2):
            lo, hi = wi * 32, min(40, wi * 32 + 32)
            out.append(
                sum(1 << (i - lo) for i in range(lo, hi) if v[i] >= 0)
            )
        return out

    df = spark.createDataFrame(
        [Row(vec_id=i, v=v) for i, v in enumerate(vecs)],
        schema="vec_id long, v array<double>",
    )
    got = {
        r.vec_id: list(r.s)
        for r in df.select(
            "vec_id", similarity._sign_words(F.col("v"), 40).alias("s")
        ).collect()
    }
    assert got == {i: ref_words(v) for i, v in enumerate(vecs)}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, v DOUBLE[])")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(vecs))
    )
    duck = {
        int(r[0]): list(r[1])
        for r in con.execute("""
            SELECT vec_id,
                   list_transform(range(0, 2), w ->
                     CAST(list_sum(list_transform(range(w * 32, least(40, w * 32 + 32)),
                       i -> CASE WHEN v[i + 1] >= 0
                                 THEN (CAST(1 AS BIGINT) << CAST(i - w * 32 AS INT))
                                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS s
            FROM t
        """).fetchall()
    }
    assert duck == got


def test_index_maintenance_through_fs_api_on_file_uri(spark, tmp_path):
    """VERDICT r10 ask #7: the maintenance path must work wherever
    Spark reads the index — not just driver-local disk. The whole
    lifecycle (build -> append -> stats -> compact -> query) runs
    against an explicit ``file://`` URI through the Hadoop FileSystem
    API (operators/fsio); ``os.listdir`` would choke on the scheme
    prefix, so a green run pins the FS-API port."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        ANN_QUERY_IDS,
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    seed_ids = set(PQ_CODEBOOK_IDS) | set(IVFPQ_COARSE_IDS)
    head = emb.filter(
        (F.col("vec_id") < 350) | F.col("vec_id").isin(list(seed_ids))
    )
    tail = emb.filter(F.col("vec_id") >= 350).join(
        head.select("vec_id"), "vec_id", "left_anti"
    )
    uri = "file://" + str(tmp_path / "uri_idx")
    similarity.ivfpq_build_index(head, uri, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS)
    assert similarity.pq_index_append(spark, uri, tail) > 0
    frag = similarity.ivfpq_index_stats(spark, uri)
    assert frag["rows_total"] == emb.count()
    assert frag["files_per_cell_max"] >= 2
    pre = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_query_index(
            spark, uri, emb, ANN_QUERY_IDS, k=5, nprobe=2, rerank_factor=4
        ).collect()
    )
    out = similarity.ivfpq_index_compact(spark, uri)
    assert out["files_per_cell_max_after"] == 1
    assert out["rows_total"] == frag["rows_total"]
    post = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.ivfpq_query_index(
            spark, uri, emb, ANN_QUERY_IDS, k=5, nprobe=2, rerank_factor=4
        ).collect()
    )
    assert post == pre and len(pre) > 0


def test_compact_pointer_commit_is_crash_safe(spark, tmp_path):
    """The r10 advisor's compact finding: the old rename-pair swap
    had a window with NO live codes dir. The pointer-file commit
    closes it — a 'crash' at every stage leaves a queryable index:
    (a) an orphan rewrite dir before the pointer swap is ignored by
    readers and swept by the next compact; (b) after the pointer
    swap, the superseded dir is garbage, never the live one; (c) a
    torn pointer replace (tmp written, rename lost) read-repairs."""
    import json
    import os

    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import fsio, similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        IVFPQ_COARSE_IDS,
        PQ_CODEBOOK_IDS,
    )

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings").filter(
        (F.col("vec_id") < 200)
        | F.col("vec_id").isin(
            list(set(PQ_CODEBOOK_IDS) | set(IVFPQ_COARSE_IDS))
        )
    )
    path = str(tmp_path / "crash_idx")
    similarity.ivfpq_build_index(emb, path, PQ_CODEBOOK_IDS, IVFPQ_COARSE_IDS)

    def q():
        return sorted(
            (r.query_id, r.cand_id, r.cos_sim, r.rank)
            for r in similarity.ivfpq_query_index(
                spark, path, emb, [0, 1, 2], k=3, nprobe=2
            ).collect()
        )

    base = q()
    assert len(base) > 0

    # (a) crash BEFORE the pointer swap: an orphan rewrite dir exists,
    # the pointer still names the old dir -> readers unaffected, and
    # the next compact sweeps the orphan
    spark.read.parquet(os.path.join(path, "codes")).limit(5).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(path, "codes_vdeadbeef"))
    assert q() == base
    similarity.ivfpq_index_compact(spark, path)
    assert not os.path.exists(os.path.join(path, "codes_vdeadbeef"))
    assert q() == base

    # (b) after the commit the pointer names a codes_v* dir and the
    # build-time dir is gone — at no point did a reader face a
    # missing live dir
    live = json.load(open(os.path.join(path, "_codes_ptr.json")))["live"]
    assert live.startswith("codes_v")
    assert not os.path.exists(os.path.join(path, "codes"))

    # (c) torn pointer replace: tmp holds a NEWER commit, pointer
    # lost -> read_text_or_recover promotes the tmp
    ptr = os.path.join(path, "_codes_ptr.json")
    content = open(ptr).read()
    os.rename(ptr, ptr + ".tmp")
    assert json.loads(
        fsio.read_text_or_recover(spark, ptr)
    )["live"] == json.loads(content)["live"]
    assert os.path.exists(ptr) and not os.path.exists(ptr + ".tmp")
    assert q() == base


def test_bsign_bits_rule_anchors_and_cap():
    """The corpus-size signature rule (VERDICT r10 ask #3): 64 bits
    at/below the 500-row anchor (recall@10 0.99 measured), one
    dim-block per 4x corpus growth above it (128 bits at n=2000 —
    recall@10 0.92 measured vs 0.83 at fixed 64), monotone, capped
    at 1024 bits (128 bytes — still half the raw 256-byte vector)."""
    from ts_data_pipeline_spark.operators import similarity

    rule = similarity.bsign_bits_rule
    assert rule(100, 64) == 64
    assert rule(500, 64) == 64  # the measured anchor
    assert rule(501, 64) == 128
    assert rule(2000, 64) == 128  # the measured sf0.1 point
    assert rule(2001, 64) == 192
    assert rule(8000, 64) == 192
    assert rule(32000, 64) == 256
    prev = 0
    for n in (10, 500, 1000, 4000, 1_000_000, 10**9, 10**12):
        b = rule(n, 64)
        assert b >= prev, (n, b, prev)
        prev = b
    assert rule(10**12, 64) == similarity.BSIGN_MAX_BITS


def test_bsign_extended_bits_cross_engine(spark):
    """Hyperplane-extended signatures agree between engines at a
    PARTIAL extra word (3 extra bits): the Spark hamming shortlist +
    exact rerank equals the DuckDB twin exactly — pinning the
    pair-difference normal construction, the extra-word packing, and
    the concatenated-word hamming off the gate's axis-only path."""
    import duckdb

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = similarity.bsign_plane_pairs(3, start_id=20)
    got = sorted(
        (r.query_id, r.cand_id, float(r.cos_sim), r.rank)
        for r in similarity.binary_sign_topk(
            emb, [0, 1, 2], 64, k=5, rerank_factor=8, plane_pairs=pairs
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    sql = similarity.binary_sign_topk_sql(
        [0, 1, 2], 64, k=5, rerank_factor=8, plane_pairs=pairs
    )
    want = sorted(
        (int(q), int(c), float(s), int(rk))
        for q, c, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) == 15


def test_bsign_rule_recall_closes_the_cliff_at_sf01(spark):
    """The r10 published cliff (recall@10 0.99 at sf0.01 -> 0.83 at
    sf0.1 on fixed 64-bit signatures) is closed by the rule: at
    sf0.1 (n=2000 -> 128 bits, pair-difference normals) the
    persisted-index query holds recall@10 >= 0.9 against exact brute
    force, while the fixed-64-bit form measurably trails it."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import (
        BSIGN_PLANE_START,
        BSIGN_RERANK_FACTOR,
        EMBEDDING_DIM,
    )

    sf_dir = "/root/testdata/sf0.1"
    emb = _io.load(spark, sf_dir, "embeddings")
    qids = list(range(10))
    truth = {
        (r.query_id, r.cand_id)
        for r in similarity.brute_force_topk(emb, qids, k=10).collect()
    }
    n = emb.count()
    bits = similarity.bsign_bits_rule(n, EMBEDDING_DIM)
    assert bits > EMBEDDING_DIM  # the rule must actually engage here

    def recall(pairs):
        path = str(_tmp_bsign_dir())
        similarity.bsign_index_write(
            emb, path, EMBEDDING_DIM, plane_pairs=pairs
        )
        got = {
            (r.query_id, r.cand_id)
            for r in similarity.bsign_query_index(
                spark, path, emb, qids, k=10,
                rerank_factor=BSIGN_RERANK_FACTOR,
            ).collect()
        }
        return len(got & truth) / len(truth)

    def _tmp_bsign_dir():
        import tempfile

        return tempfile.mkdtemp(prefix="bsign_recall_")

    rec_rule = recall(
        similarity.bsign_plane_pairs(
            bits - EMBEDDING_DIM, BSIGN_PLANE_START
        )
    )
    rec_fixed = recall(None)
    assert rec_rule >= 0.9, (rec_rule, bits)
    assert rec_rule > rec_fixed, (rec_rule, rec_fixed)


def test_prefix_query_index_identity_basis_equals_raw_slice(spark, tmp_path):
    """The gate's mrl leg now reads the PERSISTED prefix relation
    under the identity basis — value-identical (bit-exact) to the
    inline raw-slice prefix_dim_topk, so prefix_dim_topk_sql remains
    its twin (the promotion contract of VERDICT r10 ask #2)."""
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    d_prefix, dim = 16, 64
    path = str(tmp_path / "pfx")
    similarity.prefix_index_write(
        emb, path, d_prefix,
        basis=(
            [[1.0 if j == i else 0.0 for j in range(dim)]
             for i in range(d_prefix)],
            [0.0] * dim,
        ),
    )
    via_index = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.prefix_query_index(
            spark, path, emb, [0, 1, 2], k=5, rerank_factor=4
        ).collect()
    )
    inline = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.prefix_dim_topk(
            emb, [0, 1, 2], d_prefix, k=5, rerank_factor=4
        ).collect()
    )
    assert via_index == inline and len(inline) == 15


def test_bsign_index_append_pinned_frame_and_idempotent(spark, tmp_path):
    """bsign index appends sign deltas under the PINNED frame (plane
    normals persisted beside the signatures — a delta need not
    contain the pair ids): head-build + tail-append answers equal
    the full-corpus build bit-for-bit, and re-delivering the same
    delta appends zero rows."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = similarity.bsign_plane_pairs(40, start_id=100)
    # head keeps the plane-pair ids (the build corpus defines the
    # frame); the tail delta contains NONE of them
    head = emb.filter(F.col("vec_id") < 300)
    tail = emb.filter(F.col("vec_id") >= 300)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    similarity.bsign_index_write(head, inc, 64, plane_pairs=pairs)
    n = similarity.bsign_index_append(spark, inc, tail)
    assert n == tail.count() > 0
    assert similarity.bsign_index_append(spark, inc, tail) == 0  # idempotent
    similarity.bsign_index_write(emb, full, 64, plane_pairs=pairs)

    def q(path):
        return sorted(
            (r.query_id, r.cand_id, r.cos_sim, r.rank)
            for r in similarity.bsign_query_index(
                spark, path, emb, [0, 1, 2], k=5, rerank_factor=8
            ).collect()
        )

    assert q(inc) == q(full) and len(q(full)) == 15


def test_fsio_torn_tmp_and_vanished_dir_hardening(spark, tmp_path):
    """r11 review hardening: (a) a TORN pointer tmp (killed
    mid-write, not valid JSON) is ignored and deleted instead of
    promoted — the caller's default still resolves, so a crash
    during the FIRST pointer write can never poison an index whose
    build-time 'codes' dir is alive; (b) is_dir on a
    concurrently-vanished path returns False instead of raising
    through Py4J (the pin protocol's retry relies on it)."""
    import os

    from ts_data_pipeline_spark.operators import fsio

    base = str(tmp_path / "p")
    os.makedirs(base)
    ptr = os.path.join(base, "_codes_ptr.json")
    with open(ptr + ".tmp", "w") as fh:
        fh.write('{"live": "codes_v12')  # torn mid-write
    assert fsio.read_text_or_recover(spark, ptr) is None
    assert not os.path.exists(ptr + ".tmp")  # torn tmp removed
    assert not os.path.exists(ptr)
    # a VALID tmp still promotes (the crash-between-write-and-rename
    # repair of test_compact_pointer_commit_is_crash_safe)
    with open(ptr + ".tmp", "w") as fh:
        fh.write('{"live": "codes_v99"}')
    assert fsio.read_text_or_recover(spark, ptr) == '{"live": "codes_v99"}'
    assert os.path.exists(ptr)

    assert fsio.is_dir(spark, os.path.join(base, "never_there")) is False
    assert fsio.rename(
        spark, os.path.join(base, "never_there"),
        os.path.join(base, "elsewhere"),
    ) is False


def test_prefix_index_write_sidecar_lands_on_uri_filesystem(spark, tmp_path):
    """r11 review: the PCA-basis sidecar must land ON the index's
    filesystem — the old local-open form silently wrote a URI path
    as a literal local directory name. Build a prefix index at an
    explicit file:// URI and read everything back through the FS
    API."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import fsio, similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    uri = "file://" + str(tmp_path / "uri_pfx")
    d_prefix, dim = 8, 64
    similarity.prefix_index_write(
        emb, uri, d_prefix,
        basis=(
            [[1.0 if j == i else 0.0 for j in range(dim)]
             for i in range(d_prefix)],
            [0.0] * dim,
        ),
    )
    assert fsio.exists(spark, uri + "/_pca_basis.json")
    assert fsio.exists(spark, uri + "/_prefix_meta.json")
    got = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.prefix_query_index(
            spark, uri, emb, [0, 1], k=5, rerank_factor=4
        ).collect()
    )
    inline = sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank)
        for r in similarity.prefix_dim_topk(
            emb, [0, 1], d_prefix, k=5, rerank_factor=4
        ).collect()
    )
    assert got == inline and len(got) == 10


def test_bsign_maintenance_decision_rewiden_rule(spark, tmp_path):
    """bsign_maintenance_decision: quiet while the corpus fits the
    stored width's rule regime, recommends REWIDEN once appends grow
    the corpus past it — the measured-decision shape of
    ivf_maintenance_decision applied to signature width."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "bs")
    similarity.bsign_index_write(emb.filter(F.col("vec_id") < 400),
                                 path, 64)
    ok = similarity.bsign_maintenance_decision(spark, path, 400)
    assert ok["rewiden"] is False
    assert ok["evidence"]["stored_bits"] == 64

    grown = similarity.bsign_maintenance_decision(spark, path, 2000)
    assert grown["rewiden"] is True
    assert grown["evidence"]["needed_bits"] == 128

    # a rule-width index at the larger corpus is quiet again
    wide = str(tmp_path / "bs_wide")
    similarity.bsign_index_write(
        emb, wide, 64,
        plane_pairs=similarity.bsign_plane_pairs(64, start_id=100),
    )
    assert similarity.bsign_maintenance_decision(
        spark, wide, 2000
    )["rewiden"] is False


def test_html_extract_decodes_once_and_strips_nonvisible(spark):
    """The HTML lane's two safety rules: (1) script/style/comment/
    title bodies never leak into training text — including scripts
    whose body contains a '<' comparison; (2) entity decode is ONE
    pass with &amp; last, so a document that legitimately contains
    the literal text '&lt;' (escaped by the wrap to '&amp;lt;')
    round-trips to '&lt;' — never double-decoded into a live '<'."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [
            (4, "plain a & b < c body", "en", "s", 20),  # %4=0 -> script
            (5, "literal &lt; stays literal", "en", "s", 26),  # %5=0 style
            (7, "x", "en", "s", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r.doc_id: r for r in text_fns.html_extract(docs).collect()}
    # script body ("var n", "n < 10") and style body never leak
    assert "var n" not in out[4].text_clean
    assert "n < 10" not in out[4].text_clean
    assert "color" not in out[5].text_clean
    for r in out.values():  # title is head metadata, not content
        assert "Doc " + str(r.doc_id) not in r.text_clean.split("\n")[0] or \
            r.text_clean.split("\n")[0].startswith("Title")
    # the escaped body decodes back exactly (roundtrip pins < and &)
    assert out[4].roundtrip_ok and "a & b < c" in out[4].text_clean
    # single decode: literal '&lt;' in the SOURCE text survives as
    # the five characters '&lt;', not as '<'
    assert "literal &lt; stays literal" in out[5].text_clean
    assert out[5].roundtrip_ok


def test_html_main_content_drops_link_walls_keeps_prose(spark):
    """Link-density boilerplate rule, integer-exact: nav and share
    link walls (visible text ~all inside anchors) are dropped; prose
    blocks with zero anchors are kept; the reassembled main_text
    preserves block order."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [
            (3, "prose body three", "en", "s", 16),   # %3=0 -> nav wall
            (13, "prose thirteen", "en", "s", 14),    # %6=1 -> share wall
            (2, "plain prose two", "en", "s", 15),    # no link fixtures
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r.doc_id: r for r in text_fns.html_main_content(docs).collect()}
    assert out[3].n_kept < out[3].n_blocks  # nav wall dropped
    assert "Home" not in out[3].main_text
    assert "prose body three" in out[3].main_text
    assert out[13].n_kept < out[13].n_blocks  # share wall dropped
    assert "Tweet" not in out[13].main_text
    assert out[2].n_kept == out[2].n_blocks  # nothing to drop
    # block order: title line precedes the prose line
    lines = out[2].main_text.split("\n")
    assert lines[0].startswith("Title") and "plain prose two" in lines[1]
    # link accounting is exact integers
    assert out[3].link_chars == len("Home News About")
    assert out[2].link_chars == 0


def test_prefix_and_bsign_filtered_search_semantics(spark, tmp_path):
    """r12 filtered-search contract on the persisted narrow-relation
    legs (the bsign leg is additionally hash-gated in
    ann_lsh_ivf_topk): (1) no filtered-out candidate ever surfaces;
    (2) no k-deflation — the shortlist ranks over filtered candidates,
    so each query still returns k rows; (3) the filtered result equals
    querying an index whose candidate set IS the filtered corpus
    (filter includes the query rows, so the two constructions
    coincide exactly)."""
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    qids = [0, 1, 2]
    allow = emb.filter("vec_id % 3 = 0 OR vec_id IN (0, 1, 2)").select(
        "vec_id"
    )
    allowed = {r.vec_id for r in allow.collect()}

    d_prefix, dim = 16, 64
    ident = (
        [[1.0 if j == i else 0.0 for j in range(dim)]
         for i in range(d_prefix)],
        [0.0] * dim,
    )
    ppath = str(tmp_path / "pfx")
    similarity.prefix_index_write(emb, ppath, d_prefix, basis=ident)
    got = similarity.prefix_query_index(
        spark, ppath, emb, qids, k=5, rerank_factor=4, filter_ids=allow
    ).collect()
    assert all(r.cand_id in allowed for r in got)
    assert sorted(
        (q, sum(1 for r in got if r.query_id == q)) for q in qids
    ) == [(0, 5), (1, 5), (2, 5)]
    # equivalence to an index over the filtered corpus
    ppath2 = str(tmp_path / "pfx2")
    similarity.prefix_index_write(
        emb.join(allow, "vec_id", "left_semi"), ppath2, d_prefix,
        basis=ident,
    )
    want = similarity.prefix_query_index(
        spark, ppath2, emb, qids, k=5, rerank_factor=4
    ).collect()
    key = lambda rows: sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank) for r in rows
    )
    assert key(got) == key(want)

    bpath = str(tmp_path / "bsig")
    similarity.bsign_index_write(emb, bpath, dim)
    bgot = similarity.bsign_query_index(
        spark, bpath, emb, qids, k=5, rerank_factor=4, filter_ids=allow
    ).collect()
    assert all(r.cand_id in allowed for r in bgot)
    bpath2 = str(tmp_path / "bsig2")
    similarity.bsign_index_write(
        emb.join(allow, "vec_id", "left_semi"), bpath2, dim
    )
    bwant = similarity.bsign_query_index(
        spark, bpath2, emb, qids, k=5, rerank_factor=4
    ).collect()
    assert key(bgot) == key(bwant) and len(bwant) == 15


def test_bsign_plane_pair_ids_validated_loudly(spark):
    """A plane pair referencing an id absent from the corpus must
    raise (r11 ADVICE): the inner join would otherwise silently drop
    the plane — Spark zero-fills the bit while the DuckDB twin's
    extsig shrinks, i.e. silent recall loss plus cross-engine
    divergence."""
    import pytest as _pytest

    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark.operators import similarity

    emb = _io.load(spark, "/root/testdata/sf0.001", "embeddings")
    bad = [(0, 10**9)]  # second id not in the corpus
    with _pytest.raises(ValueError, match="plane-pair"):
        similarity.binary_sign_topk(
            emb, [0, 1], 64, k=3, plane_pairs=bad
        )
    with _pytest.raises(ValueError, match="plane-pair"):
        similarity.bsign_index_write(
            emb, "/tmp/never_written_bsign", 64, plane_pairs=bad
        )


def test_url_canonicalization_semantics(spark):
    """The r12 weblinks lane's canonicalization rules, pinned on
    crafted URLs (the gate pins corpus-wide agreement; this pins the
    RULES): tracking params stripped with survivors sorted, host and
    scheme case-folded, default ports dropped (but only the
    scheme-matching default), fragments dropped, clean URLs are
    fixed points; registrable domain respects the two-label suffix;
    canonical dedup groups tracking mirrors."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.functions import weblinks as wl

    cases = [
        # (raw, want_canonical)
        ("https://WWW.Example.com:443/a/p?z=2&utm_source=x&id=1#top",
         "https://www.example.com/a/p?id=1&z=2"),
        ("http://sample.org:8080/p?ref=tw&fbclid=abc",
         "http://sample.org:8080/p"),          # non-default port kept
        ("http://sample.org:443/p?id=3",
         "http://sample.org:443/p?id=3"),      # 443 is NOT http's default
        ("https://news.example.co.uk/x?id=2",
         "https://news.example.co.uk/x?id=2"),  # already canonical
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [
        r.c for r in df.select(wl._canon_col(F.col("u")).alias("c"))
        .collect()
    ]
    assert got == [w for _, w in cases]

    # DuckDB twin agrees rule for rule
    import duckdb

    con = duckdb.connect()
    for raw, want in cases:
        val = con.execute(
            f"WITH t(url) AS (SELECT '{raw}') SELECT "
            + wl._canon_sql("url") + " FROM t"
        ).fetchone()[0]
        assert val == want, (raw, val)

    # registrable domain: two-label suffix takes three labels
    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 1), (1, "x", "en", "s", 1),
         (21, "x", "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    dom = {r.doc_id: r.domain for r in wl.registrable_domain(docs).collect()}
    # doc 0: ak=0 -> www.example.com -> example.com
    assert dom[0] == "example.com"
    # doc 21: ak=21%30=21, 21%5=1 -> news.example.co.uk
    assert dom[21] == "example.co.uk"

    # canonical dedup: tracking mirrors of one article collapse
    mirrors = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in (3, 33, 63)],  # ak = 3 each
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    out = {r.doc_id: (r.kept, r.n_dups)
           for r in wl.url_dedup_canonical(mirrors).collect()}
    assert out[3] == (True, 3) and out[33] == (False, 3)


def test_psl_registrable_rule_classes(spark):
    """The publicsuffix.org algorithm on crafted hosts, one per rule
    class (the gate pins corpus-wide agreement; this pins the RULES):
    normal single/multi-label, wildcard (* consumes exactly one
    label), exception (wins over the wildcard; suffix = rule minus
    its leftmost label), private-section entries, the implicit '*'
    rule for unlisted TLDs, and hosts that ARE a public suffix
    (registrable domain NULL)."""
    import duckdb

    from ts_data_pipeline_spark.functions import weblinks as wl

    cases = [
        # (host, want_public_suffix, want_domain)
        ("www.example.com", "com", "example.com"),
        ("news.example.co.uk", "co.uk", "example.co.uk"),
        ("co.uk", "co.uk", None),                 # IS a suffix
        ("foo.bar.ck", "bar.ck", "foo.bar.ck"),   # *.ck
        ("bar.ck", "bar.ck", None),               # * consumed the label
        ("www.ck", "ck", "www.ck"),               # !www.ck exception
        ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
        ("x.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
        ("a.b.kawasaki.jp", "b.kawasaki.jp", "a.b.kawasaki.jp"),
        ("user.github.io", "github.io", "user.github.io"),  # private
        ("some.unknowntld", "unknowntld", "some.unknowntld"),  # implicit *
        ("unknowntld", "unknowntld", None),
        ("deep.sub.example.gov.uk", "gov.uk", "example.gov.uk"),
        ("UPPER.Example.COM", "com", "example.com"),  # case-folded
        # punycode IDN TLD: PSL stores xn-- form; labels match
        # textually once the host is punycoded
        ("xn--80asehdb.xn--p1ai", "xn--p1ai", "xn--80asehdb.xn--p1ai"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(cases)],
        "doc_id bigint, host string",
    )
    got = {
        r.doc_id: (r.public_suffix, r.domain)
        for r in wl.psl_registrable(df).collect()
    }
    for i, (h, ps, dom) in enumerate(cases):
        assert got[i] == (ps, dom), (h, got[i], (ps, dom))

    # DuckDB twin agrees on the same crafted hosts
    vals = ", ".join(
        f"({i}, '{h}')" for i, (h, _, _) in enumerate(cases)
    )
    con = duckdb.connect()
    odf = con.execute(
        wl.psl_registrable_sql(
            f"SELECT * FROM (VALUES {vals}) t(doc_id, host)"
        )
    ).df()
    for _, row in odf.iterrows():
        ps = row.public_suffix if row.public_suffix == row.public_suffix \
            else None
        dom = row.domain if row.domain == row.domain else None
        assert got[row.doc_id] == (ps, dom), (row.host, ps, dom)

    # loader sanity: every rule class present in the snapshot
    rules = wl.psl_rules()
    assert any(p == 1 for _, _, p, _ in rules)            # exceptions
    assert any(r == m + 1 for _, m, _, r in rules)        # wildcards
    assert ("co.uk", 2, 0, 2) in rules
    assert ("github.io", 2, 0, 2) in rules                # private section


def test_charset_repair_property():
    """Hypothesis pins for the charset mapping layer (pure Python —
    the same computed tables the Column chain and the SQL twin
    embed): corrupt-then-repair is the identity for BOTH corruption
    families over arbitrary mixes of ASCII and the repairable
    alphabet, and repair is the identity on signature-free text."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ts_data_pipeline_spark.functions import text as t

    # Python reference of the repair chain (the Spark/SQL chains embed
    # the same _UTF8_REPAIRS/_C1_REPAIRS tables, pinned cross-engine
    # by the gate; here we pin the TABLES' algebra exhaustively)
    def chain_once_py(s: str) -> str:
        for moji, true in t._UTF8_REPAIRS:
            s = s.replace(moji, true)
        return s

    def repair_py(s: str, rounds: int = 2) -> str:
        for _ in range(rounds):
            s = chain_once_py(s)
        return s.translate(
            {ord(c): v for c, v in t._C1_REPAIRS}
        )

    alphabet = st.sampled_from(
        list(t._MOJIBAKE_CHARS) + list("abcXYZ 09.,!?'\"-\n")
    )
    texts = st.text(alphabet=alphabet, max_size=60)

    @given(texts)
    @settings(max_examples=300, deadline=None)
    def _roundtrip(s):
        assert repair_py(t._utf8_as_cp1252(s)) == s
        assert repair_py(t._cp1252_as_latin1(s)) == s
        # clean text is a fixed point (no char of the true alphabet
        # appears in either signature alphabet)
        assert repair_py(s) == s
        # idempotence
        assert repair_py(repair_py(t._utf8_as_cp1252(s))) == s
        # r14: DOUBLE-encoded UTF-8 inverts at rounds=2 because one
        # chain pass peels EXACTLY one corruption layer — pinned here
        # both as the roundtrip and as the layer-peeling fact the
        # enc_class 'utf8_double' discriminator relies on
        dd = t._utf8_as_cp1252(t._utf8_as_cp1252(s))
        assert repair_py(dd) == s
        assert chain_once_py(dd) == t._utf8_as_cp1252(s)

    _roundtrip()

    # the closure alphabet itself roundtrips at every depth <= 2 (the
    # seed property above only exercises seed chars)
    for c in sorted(t._MOJIBAKE_ALPHABET):
        assert repair_py(t._utf8_as_cp1252(c)) == c, repr(c)
        assert repair_py(t._utf8_as_cp1252(t._utf8_as_cp1252(c))) == c, repr(c)

    # r14 UTF-16/BOM lane (pure-Python twin of repair_bom_utf16): the
    # NUL-gated un-interleave inverts the LE fixture corruption and
    # is the identity on NUL-free text
    def bom_py(s: str) -> str:
        import re as _re

        s = _re.sub("\xff\xfe([\\s\\S]\x00)", r"\1", s)
        s = _re.sub("\xfe\xff(\x00[\\s\\S])", r"\1", s)
        # r15 (advisor): prefix strip gated on NUL evidence in the
        # remainder, or the pair being the whole string
        if (s.startswith("\xff\xfe") or s.startswith("\xfe\xff")) and (
            "\x00" in s or len(s) == 2
        ):
            s = s[2:]
        s = s.replace("\x00", "")
        return s.replace(t._UTF8_BOM_AS_CP1252, "").replace("﻿", "")

    @given(st.text(alphabet=st.sampled_from(list(
        "abcXYZ 09.,!?'\"-\n")), max_size=60))
    @settings(max_examples=150, deadline=None)
    def _u16_roundtrip(s):
        assert bom_py(t._utf16le_as_latin1(s)) == s
        assert bom_py(s) == s
        # mid-document misdecoded stream: the NUL-evidence pattern
        # removes the embedded BOM too, not just a prefix one
        if s:
            assert bom_py("head: " + t._utf16le_as_latin1(s)) == (
                "head: " + s
            )

    _u16_roundtrip()
    # review finding r14: a stray NUL plus a LEGITIMATE interior
    # 'ÿþ' letter run — the pair must survive (no NUL adjacency),
    # only the NUL goes
    assert bom_py("a\x00b ÿþ c") == "ab ÿþ c"
    # advisor finding r14 (fixed r15): NUL-free text legitimately
    # STARTING with a BOM-lookalike pair is untouched; the bare pair
    # (empty payload) and a NUL-evidenced prefix still strip
    assert bom_py("ÿþ c'est naïf") == "ÿþ c'est naïf"
    assert bom_py("þÿ also clean") == "þÿ also clean"
    assert bom_py("ÿþ") == ""
    assert bom_py("þÿ") == ""

    # r15 (VERDICT r14 ask #2): the gated repair is semantics-free —
    # the one-regex corruption signal is a SUPERSET of "repair
    # changes the text", so `when(signal, repaired).otherwise(text)`
    # equals unconditional repair. Pinned via the pure-Python twins
    # over an adversarial alphabet (mojibake chars + their corrupted
    # images + C1 + NUL + BOM chars + the BOM-lookalike letters).
    import re as _re2

    _sig_class = _re2.compile("[\x00\x80-\x9f﻿]|ï»¿")
    _mojis = [m for m, _ in t._UTF8_REPAIRS]

    def signal_py(s: str) -> bool:
        if _sig_class.search(s) or s in ("ÿþ", "þÿ"):
            return True
        return any(m in s for m in _mojis)

    def full_py(s: str) -> str:
        return repair_py(bom_py(s))

    adversarial = st.text(
        alphabet=st.sampled_from(
            list(t._MOJIBAKE_CHARS)
            + [c for m, _ in t._UTF8_REPAIRS for c in m]
            + list("abc 09.'\n\x00\x80\x9f﻿ÿþï»¿")
        ),
        max_size=40,
    )

    @given(adversarial)
    @settings(max_examples=400, deadline=None)
    def _gate_semantics_free(s):
        gated = full_py(s) if signal_py(s) else s
        assert gated == full_py(s)

    _gate_semantics_free()


def test_psl_matcher_property():
    """Hypothesis pin for the PSL rule algebra (the same tuples the
    broadcast relation and the VALUES twin are built from): for any
    host assembled as <random labels> + <snapshot suffix>, a Python
    reference implementing the publicsuffix.org algorithm directly
    (explicit candidate walk, exception > most-labels precedence,
    implicit '*') agrees with the integer-MAX reduction used by both
    engines (prevailing = max(prio*100 + rule_labels); ps = labels -
    prio)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ts_data_pipeline_spark.functions import weblinks as wl

    rules = wl.psl_rules()
    maxr = max(m for _, m, _, _ in rules)
    by_key: dict[tuple[str, int], list] = {}
    for k, m, p, r in rules:
        by_key.setdefault((k, m), []).append((p, r))

    def ps_via_max(host: str) -> int:
        labels = host.split(".")
        n = len(labels)
        best = None
        for i in range(1, min(n, maxr) + 1):
            cand = ".".join(labels[n - i:])
            for p, r in by_key.get((cand, i), ()):
                if r == i or n > i:  # wildcard needs one extra label
                    mk = p * 100 + r
                    best = mk if best is None else max(best, mk)
        if best is None:
            return 1
        return best % 100 - best // 100

    def ps_reference(host: str) -> int:
        """Direct publicsuffix.org algorithm: collect matching rules
        (rule labels are a suffix; '*' matches exactly one label),
        exceptions win, else most labels; default '*'."""
        labels = host.split(".")
        matches = []
        for k, m, p, r in rules:
            klabels = k.split(".")
            if labels[-m:] != klabels:
                continue
            if r == m + 1:  # wildcard: '*' must consume a real label
                if len(labels) >= m + 1:
                    matches.append((p, r))
            else:
                matches.append((p, r))
        if not matches:
            return 1
        exc = [x for x in matches if x[0] == 1]
        if exc:
            return max(r for _, r in exc) - 1
        return max(r for _, r in matches)

    label = st.text(
        alphabet=st.sampled_from("abcxyz09"), min_size=1, max_size=5
    )
    suffix = st.sampled_from(
        [k for k, m, p, r in rules] + ["zz", "unlisted.zz"]
    )

    @given(st.lists(label, min_size=0, max_size=3), suffix)
    @settings(max_examples=300, deadline=None)
    def _agree(prefix, suf):
        host = ".".join(prefix + [suf])
        assert ps_via_max(host) == ps_reference(host), host

    _agree()


def test_domain_quota_composition(spark):
    """The r13 recipe stage 2d building blocks composed directly:
    PSL registrable domains -> deterministic md5-rank quota. Pins
    that no domain exceeds the cap, every domain keeps min(count,
    cap) survivors, and the survivor set is identical across runs
    (the md5 draw, not partitioning luck)."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.functions import weblinks as wl
    from ts_data_pipeline_spark.operators import sampling

    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    dom = wl.registrable_domain_psl(docs).select(
        "doc_id",
        F.coalesce(F.col("domain"), F.col("host")).alias("dom"),
    )
    capped = sampling.source_quota_cap(dom, cap=10, source_col="dom")
    rows = capped.collect()
    per_dom_kept: dict[str, int] = {}
    per_dom_all: dict[str, int] = {}
    for r in rows:
        per_dom_all[r.dom] = per_dom_all.get(r.dom, 0) + 1
        if r.kept:
            per_dom_kept[r.dom] = per_dom_kept.get(r.dom, 0) + 1
    assert len(per_dom_all) >= 4  # the fixture's eTLD+1 families
    for d, n_all in per_dom_all.items():
        assert per_dom_kept.get(d, 0) == min(n_all, 10), d
    # determinism: the exact survivor ids reproduce
    kept1 = {r.doc_id for r in rows if r.kept}
    kept2 = {
        r.doc_id
        for r in sampling.source_quota_cap(
            dom, cap=10, source_col="dom"
        ).collect()
        if r.kept
    }
    assert kept1 == kept2


def test_charset_repair_semantics(spark):
    """The r13 charset lane's RULES on crafted strings (the gate pins
    corpus-wide agreement): both corruption classes invert exactly,
    clean text is a fixed point, repair is idempotent, a genuinely
    mixed string repairs both families, and the WHATWG pass-through
    bytes (the 0x9D inside a mojibake'd ”) are consumed by their
    3-char expansion, never double-repaired by the C1 translate."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark.functions import text as t

    truth = "— “q” it’s café… 12€"
    c1 = t._cp1252_as_latin1(truth)
    moji = t._utf8_as_cp1252(truth)
    assert "\x97" in c1    # em-dash as a bare cp1252 byte
    assert "Ã©" in moji   # e-acute read as cp1252
    assert "\x9d" in moji  # WHATWG pass-through inside the right-double-quote

    # a mixed string: one family per half
    mixed = moji + " | " + c1
    rows = [(0, truth), (1, moji), (2, c1), (3, mixed),
            (4, "plain ascii"), (5, t._utf8_as_cp1252("naïve région"))]
    df = spark.createDataFrame(rows, "doc_id bigint, s string")
    got = {
        r.doc_id: r.fixed
        for r in df.select(
            "doc_id", t.repair_mojibake(F.col("s")).alias("fixed")
        ).collect()
    }
    assert got[0] == truth            # fixed point
    assert got[1] == truth            # class 1 inverts
    assert got[2] == truth            # class 2 inverts
    assert got[3] == truth + " | " + truth  # both families in one row
    assert got[4] == "plain ascii"
    assert got[5] == "naïve région"

    # idempotence: repairing repaired text changes nothing
    twice = {
        r.doc_id: r.fixed2
        for r in df.select(
            "doc_id",
            t.repair_mojibake(
                t.repair_mojibake(F.col("s"))
            ).alias("fixed2"),
        ).collect()
    }
    assert twice == got

    # DuckDB twin agrees rule for rule on the same crafted rows
    import duckdb

    con = duckdb.connect()
    for _id, s in rows:
        esc = s.replace("'", "''")
        val = con.execute(
            f"SELECT {t.repair_mojibake_sql('s')} FROM"
            f" (SELECT '{esc}' AS s) x"
        ).fetchone()[0]
        assert val == got[_id], (_id, val)


def test_line_dedup_c4_semantics(spark):
    """The C4 line-dedup rules on crafted docs: corpus-wide counts
    include WITHIN-doc repeats, lines above the threshold vanish
    from every doc, unique lines keep their order, and a doc whose
    every line is hot collapses to an empty survivor (n_kept=0,
    text_kept='') without dropping the doc row."""
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = spark.createDataFrame(
        [
            (1, "alpha\nCOMMON\nbeta"),
            (2, "COMMON\ngamma"),
            (3, "SELFDUP\nSELFDUP\nSELFDUP"),  # within-doc repeats
            (4, "COMMON\nSELFDUP"),
            (5, "COMMON"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in text_fns.line_dedup(docs).collect()}
    # COMMON occurs 4x (>2) and SELFDUP 4x (3 within doc 3 + 1)
    assert out[1].text_kept == "alpha\nbeta" and out[1].n_kept == 2
    assert out[2].text_kept == "gamma"
    assert out[3].n_lines == 3 and out[3].n_kept == 0
    assert out[3].text_kept == ""
    assert out[4].n_kept == 0
    assert out[5].n_kept == 0 and out[5].n_lines == 1
    # threshold is >max_occurrences: at 4 nothing is hot
    out4 = {r.doc_id: r
            for r in text_fns.line_dedup(docs, max_occurrences=4).collect()}
    assert all(out4[d].n_kept == out4[d].n_lines for d in out4)


def test_recipe_durable_staging_matches_and_resumes(spark, tmp_path):
    """VERDICT r13 ask #2: the recipe's staging boundaries, durable.
    With ``staging_dir`` the three localCheckpoint boundaries become
    parquet spills through the FS layer; output must be identical to
    the default mode. Crash-walk: a re-run with ``staging_resume``
    must serve every staged stage FROM STORAGE — pinned by poisoning
    the input (empty corpus) and getting the original output anyway,
    which localCheckpoint cannot do (its blocks die with the job)."""
    import os

    from ts_data_pipeline_spark import io, recipes
    from ts_data_pipeline_spark.queries import llmdata

    docs = io.load(spark, SF_DIR, "documents")
    emb = io.load(spark, SF_DIR, "embeddings")
    kw = dict(
        embeddings=emb,
        semdedup_seeds=llmdata.KMEANS_SEED_IDS,
        source_cap=llmdata.RECIPE_SOURCE_CAP,
        domain_cap=llmdata.RECIPE_DOMAIN_CAP,
        domain_quota_mega_threshold=llmdata.RECIPE_DOMAIN_MEGA,
        html_input=True,
        url_dedup=True,
        line_dedup_max=2,
        charset_input=True,
        decontaminate_n=llmdata.RECIPE_DECON_N,
        decontaminate_threshold=llmdata.RECIPE_DECON_THRESHOLD,
    )
    base = sorted(
        tuple(r) for r in recipes.build_training_corpus(docs, **kw).collect()
    )
    sdir = str(tmp_path / "stages")
    staged = sorted(
        tuple(r)
        for r in recipes.build_training_corpus(
            docs, staging_dir=sdir, **kw
        ).collect()
    )
    assert staged == base
    for name in ("front_door", "gated", "selected"):
        assert os.path.exists(os.path.join(sdir, name, "_SUCCESS")), name
    # crash-walk: poisoned (empty) input + resume -> stages come from
    # storage, output unchanged
    poisoned = docs.limit(0)
    resumed = sorted(
        tuple(r)
        for r in recipes.build_training_corpus(
            poisoned, staging_dir=sdir, staging_resume=True, **kw
        ).collect()
    )
    assert resumed == base
    # a stage MISSING its _SUCCESS marker (crash mid-write) is not
    # trusted: resume recomputes it from the input
    os.remove(os.path.join(sdir, "front_door", "_SUCCESS"))
    rebuilt = sorted(
        tuple(r)
        for r in recipes.build_training_corpus(
            docs, staging_dir=sdir, staging_resume=True, **kw
        ).collect()
    )
    assert rebuilt == base


def test_html_line_dedup_fusion_matches_composition(spark):
    """The fused single-pass operator must be VALUE-identical to the
    two-stage composition it replaces (html_main_content -> rename ->
    line_dedup), row for row — including the edge contracts: docs
    with no visible blocks absent from both, fully-hot docs present
    with empty text in both."""
    from pyspark.sql import functions as F

    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as text_fns

    docs = io.load(spark, SF_DIR, "documents")
    fused = {
        r.doc_id: (r.n_lines, r.n_kept, r.text_kept)
        for r in text_fns.html_line_dedup(docs, max_occurrences=2).collect()
    }
    main = text_fns.html_main_content(docs).select(
        "doc_id", F.col("main_text").alias("text")
    )
    composed = {
        r.doc_id: (r.n_lines, r.n_kept, r.text_kept)
        for r in text_fns.line_dedup(main, max_occurrences=2).collect()
    }
    assert fused == composed
    # the hot-line rule did real work at this SF (not a vacuous pass)
    assert any(v[1] < v[0] for v in fused.values())


def test_charset_fixture_classes_label_and_repair(spark):
    """The r14 six-class fixture matrix: every class gets the right
    enc_class label, conflicts fire exactly where declared-vs-bytes
    disagree, and text_fixed strips the corruption to the same
    repaired payload with zero residual signatures."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as t

    docs = io.load(spark, SF_DIR, "documents")
    rows = t.charset_signals(docs).collect()
    want_class = {
        0: "clean", 1: "utf8_as_cp1252", 2: "cp1252_as_latin1",
        3: "clean", 4: "utf8_double", 5: "utf16_as_latin1",
    }
    want_conflict = {0: False, 1: True, 2: True, 3: False, 4: True, 5: True}
    seen = set()
    for r in rows:
        cls = r.doc_id % 6
        seen.add(cls)
        assert r.enc_class == want_class[cls], (r.doc_id, r.enc_class)
        assert r.charset_conflict == want_conflict[cls], r.doc_id
        assert r.residual_sigs == 0, (r.doc_id, r.residual_sigs)
        if cls == 5:
            assert r.n_nul > 0
            assert r.text_fixed.startswith(
                '<meta charset="utf-16le"/> ' + t._CHARSET_PAYLOAD_ASCII
            ), r.text_fixed[:80]
        if cls in (1, 4):
            assert r.text_fixed.split("/> ", 1)[1].startswith(
                t._CHARSET_PAYLOAD
            ), (cls, r.text_fixed[:80])
    assert seen == set(range(6))


def test_psl_full_scale_synthetic(spark, tmp_path):
    """VERDICT r13 ask #6 (upstream file unreachable in this
    environment — COVERAGE.md records the retry): prove the resolver
    at FULL-PSL scale with a deterministic ~10k-rule synthetic file
    mirroring the real shape (TLDs incl. punycode, ~9k second-level
    suffixes, wildcard and exception rules). Pins: (1) the Spark
    broadcast-rule join resolves every host class exactly as the
    integer-MAX reference; (2) the rule join really broadcasts at
    this cardinality; (3) the ADVICE r13 deployment path — rules
    materialized once via psl_rules_csv_write + read_csv relation —
    yields identical results while keeping the generated SQL
    constant-size (the VALUES form would splice ~10k rows into every
    query string); (4) the >=100-label load-time validation refuses
    a malformed file."""
    import duckdb
    import pytest

    from ts_data_pipeline_spark.functions import weblinks as wl

    psl_path = str(tmp_path / "psl_big.dat")
    with open(psl_path, "w", encoding="utf-8") as fh:
        fh.write("// synthetic full-scale PSL stress fixture\n")
        tlds = [f"tld{i}" for i in range(300)] + [
            f"xn--p{i}ai" for i in range(50)
        ]
        for t in tlds:
            fh.write(t + "\n")
        for i in range(9000):
            fh.write(f"s{i}.{tlds[i % len(tlds)]}\n")
        for i in range(300):
            fh.write(f"*.wild{i}.{tlds[i % len(tlds)]}\n")
            fh.write(f"!ok{i}.wild{i}.{tlds[i % len(tlds)]}\n")
    rules = wl.psl_rules(psl_path)
    assert len(rules) > 9900
    maxr = max(m for _, m, _, _ in rules)

    by_key: dict[tuple[str, int], list] = {}
    for k, m, p, r in rules:
        by_key.setdefault((k, m), []).append((p, r))

    def expected(host: str) -> tuple[str | None, str | None]:
        labels = host.split(".")
        n = len(labels)
        best = None
        for i in range(1, min(n, maxr) + 1):
            cand = ".".join(labels[n - i:])
            for p, r in by_key.get((cand, i), ()):
                if r == i or n > i:
                    mk = p * 100 + r
                    best = mk if best is None else max(best, mk)
        ps_n = 1 if best is None else best % 100 - best // 100
        ps = ".".join(labels[n - ps_n:]) if n >= ps_n else None
        dom = ".".join(labels[n - ps_n - 1:]) if n > ps_n else None
        return ps, dom

    hosts = []
    for j in range(2000):
        t = tlds[j % len(tlds)]
        k = j % 300
        hosts.append(
            [
                f"a.b.s{j % 9000}.{t}",            # 2-label listed suffix
                f"x.wild{k}.{tlds[k % len(tlds)]}",  # wildcard consumes x
                f"ok{k}.wild{k}.{tlds[k % len(tlds)]}",  # exception wins
                f"foo.unlisted{j}",                 # implicit '*'
                f"s{j % 9000}.{t}",                 # host IS a suffix
            ][j % 5]
        )
    hdf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "hid bigint, host string"
    )
    out = wl.psl_registrable(hdf, rules=rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "rule join must broadcast"
    got = {r.hid: (r.public_suffix, r.domain) for r in out.collect()}
    assert len(got) == len(hosts)
    for i, h in enumerate(hosts):
        assert got[i] == expected(h), (h, got[i], expected(h))

    # deployment twin: rules registered ONCE (read_csv), generated
    # SQL constant-size, results identical to the Spark side
    csv_path = wl.psl_rules_csv_write(str(tmp_path / "rules.csv"), rules)
    sql = wl.psl_registrable_sql(
        "SELECT hid, host FROM hostrel",
        rules_rel=wl.psl_table_sql(csv_path),
        max_match_len=maxr,
    )
    assert len(sql) < 6000, len(sql)  # no inlined VALUES blow-up
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE hostrel AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{h}')" for i, h in enumerate(hosts))
        + ") t(hid, host)"
    )
    oracle = {
        int(r[0]): (r[2], r[3])
        for r in con.execute(sql).fetchall()
    }
    assert oracle == got

    # advisor finding r14 (fixed r15): a path carrying a single quote
    # is refused, not spliced into the generated read_csv literal
    import pytest as _pytest

    with _pytest.raises(ValueError, match="single quote"):
        wl.psl_table_sql("/tmp/o'brien/rules.csv")

    # malformed file: a rule with >= 100 labels must refuse at load
    bad = str(tmp_path / "bad.dat")
    with open(bad, "w", encoding="utf-8") as fh:
        fh.write(".".join(["x"] * 120) + "\n")
    with pytest.raises(ValueError, match="refusing a malformed"):
        wl.psl_rules(bad)
