"""Training-data pipeline operators over the documents/embeddings
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search, text analysis, and multimodal
column plumbing.

Every deterministic operator ships with a DuckDB oracle built from the
same hash primitives (md5 — the one cryptographic hash both engines
expose with identical semantics), so the driver's side-by-side
correctness gate covers them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import dedup, multimodal, similarity, textstats

    return {
        # REAL audio path: write genuine WAV containers, parse them
        # back with stdlib wave, emit integer-exact PCM features
        "audio_wav_features": lambda s, d: multimodal.audio_features(
            multimodal.synthesize_wav_media(_docs(s, d))
        ).orderBy("doc_id"),
        # REAL image paths in ONE labeled entry (keeps the registry
        # inside the driver's 50-row CORRECTNESS window): 24-bpp BMP
        # struct parse, compressed PNG (zlib deflate, all five
        # scanline filters, stdlib inflate + NumPy unfiltering), and
        # GIF89a (from-scratch LZW dictionary coding)
        "image_container_features": lambda s, d: _image_container_entry(s, d),
        # REAL transform-coded path, BOTH JPEG modes in one labeled
        # entry: baseline JFIF (sequential DCT, canonical Huffman)
        # and progressive SOF2 (spectral selection + successive
        # approximation with DRI restarts, the full T.81 G.2
        # algorithm), each written and decoded from scratch;
        # constant-block + all-ones-quant streams make the loop
        # integer-exact (closed-form oracle)
        "image_jpeg_features": lambda s, d: _jpeg_modes_entry(s, d),
        # REAL WebP lossless (VP8L) from scratch: prefix codes, LZ77 +
        # 2D distance map, color cache, meta-prefix groups, and all
        # four transforms; the synthesizer rotates encoder features
        # per doc so the gate exercises every decoder path
        "image_webp_features": lambda s, d: _webp_entry(s, d),
        # REAL video path: write genuine RIFF/AVI containers (raw DIB
        # frames), parse them back with struct+NumPy, emit
        # integer-exact per-video and per-sampled-frame channel sums
        "video_avi_features": lambda s, d: multimodal.video_features(
            multimodal.synthesize_avi_media(_docs(s, d))
        ).orderBy("doc_id"),
        "video_frame_sample": lambda s, d: multimodal.frame_sample(
            multimodal.synthesize_avi_media(_docs(s, d)), every_n=2
        ).orderBy("doc_id", "frame_no"),
        "dedup_exact_groups": lambda s, d: dedup.exact_dup_groups(_docs(s, d)),
        "dedup_minhash_signatures": lambda s, d: dedup.minhash_signatures(
            _docs(s, d)
        ),
        "dedup_minhash_pairs": lambda s, d: dedup.minhash_candidate_pairs(
            _docs(s, d)
        ),
        "dedup_simhash": lambda s, d: dedup.simhash(_docs(s, d)),
        "dedup_simhash_pairs": lambda s, d: dedup.simhash_hamming_pairs(
            _docs(s, d)
        ),
        "dedup_ngram_jaccard_pairs": lambda s, d: dedup.ngram_jaccard_pairs(
            _docs(s, d)
        ),
        "dedup_components": lambda s, d: dedup.dedup_components(_docs(s, d)),
        # span-level exact-substring dedup (Lee et al. ACL'22 shape):
        # merged char ranges of 40-gram windows seen in >= 2 docs
        "dedup_substring_spans": lambda s, d: dedup.substring_dup_spans(
            _docs(s, d)
        ),
        # the pipeline's endpoint: per-doc keep/drop + canonical id
        "dedup_keep_canonical": lambda s, d: dedup.dedup_keep_canonical(
            _docs(s, d)
        ),
        # BOTH physical plans in one labeled entry: the HOF-expression
        # brute force and the Arrow/NumPy-matmul kernel compute the
        # identical ranking (same rounding, same tie order)
        "ann_cosine_topk": lambda s, d: _ann_cosine_paths_entry(s, d),
        # gate pins (bits, tables, multiprobe): the oracle SQL is a
        # static string and must hash the same LSH; the API default
        # scales bits with corpus size (lsh_bits_for)
        "ann_lsh_topk": lambda s, d: similarity.ann_lsh_topk(
            _emb(s, d), bits=8, tables=4, multiprobe=1
        ),
        "dedup_embedding_pairs": lambda s, d: similarity.embedding_near_dup_pairs(
            _emb(s, d), bits=8, tables=4
        ),
        "dedup_embedding_components": lambda s, d: similarity.embedding_components(
            _emb(s, d), bits=8, tables=4
        ),
        "ann_ivf_topk": lambda s, d: similarity.ann_ivf_topk(_emb(s, d)),
        "ann_pq_topk": lambda s, d: similarity.ann_pq_topk(_emb(s, d)),
        # the composed billion-scale structure: coarse inverted lists
        # prune, PQ residual codes rank via ADC LUTs, exact re-rank
        "ann_ivfpq_topk": lambda s, d: similarity.ann_ivfpq_topk(_emb(s, d)),
        "text_stats": lambda s, d: textstats.text_stats(_docs(s, d)),
        "text_quality": lambda s, d: textstats.text_quality(_docs(s, d)),
        "text_fingerprint": lambda s, d: textstats.text_fingerprint(_docs(s, d)),
        "text_pii_flags": lambda s, d: textstats.text_pii_flags(_docs(s, d)),
        "text_repetition": lambda s, d: textstats.text_repetition(_docs(s, d)),
        "text_ngram_repetition": lambda s, d: textstats.text_ngram_repetition(
            _docs(s, d)
        ),
        # keep/drop composition over the proven signal operators
        "text_quality_filter": lambda s, d: textstats.corpus_quality_filter(
            _docs(s, d)
        ),
        # benchmark decontamination over a deterministic eval split
        # (gate pins n=4 so both hit and clean docs occur at every SF;
        # the API default is the published 13)
        "text_decontaminate": lambda s, d: _decontam_entry(s, d),
        # distributed BPE merge learning (Sennrich ACL'16 / GPT-2
        # style): corpus pass -> word histogram, then per-merge pure
        # Catalyst pair-count + greedy fold; oracle re-trains with an
        # independent dict-based implementation
        "bpe_train_merges": lambda s, d: _bpe_entry(s, d),
        # CCNet-style model-based quality scoring: corpus-trained
        # add-one bigram LM, per-doc mean NLL + perplexity
        "text_lm_perplexity": lambda s, d: _lm_entry(s, d),
        # deterministic salted-hash train/val/test assignment
        "text_split_assign": lambda s, d: _splits_entry(s, d),
    }


def _image_container_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP ∪ PNG ∪ GIF decode features, labeled by format. Each leg is
    the unchanged per-format pipeline (synthesize genuine container
    bytes → decode with our own parser → integer-exact pixel features);
    the union normalizes column order (BMP emits b,g,r)."""
    from pyspark.sql import functions as F

    from . import multimodal

    docs = _docs(spark, sf_dir)

    def lab(df: DataFrame, fmt: str) -> DataFrame:
        return df.select(
            F.lit(fmt).alias("fmt"), "doc_id", "width", "height",
            "n_pixels", "r_sum", "g_sum", "b_sum",
        )

    bmp = multimodal.image_features(multimodal.synthesize_bmp_media(docs))
    png = multimodal.png_features(multimodal.synthesize_png_media(docs))
    gif = multimodal.gif_features(multimodal.synthesize_gif_media(docs))
    return (
        lab(bmp, "bmp")
        .unionByName(lab(png, "png"))
        .unionByName(lab(gif, "gif"))
        .orderBy("fmt", "doc_id")
    )


def _jpeg_modes_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline ∪ progressive JPEG decode features, labeled by mode.
    Each leg is the unchanged per-mode pipeline over the same docs;
    both land on the same closed-form gray sums."""
    from pyspark.sql import functions as F

    from . import multimodal

    docs = _docs(spark, sf_dir)
    cols = ["doc_id", "width", "height", "n_pixels", "gray_sum"]

    def lab(df: DataFrame, mode: str) -> DataFrame:
        return df.select(F.lit(mode).alias("mode"), *cols)

    base = multimodal.jpeg_features(multimodal.synthesize_jpeg_media(docs))
    prog = multimodal.jpeg_features(
        multimodal.synthesize_jpeg_progressive_media(docs)
    )
    return (
        lab(base, "baseline")
        .unionByName(lab(prog, "progressive"))
        .orderBy("mode", "doc_id")
    )


def _jpeg_modes_oracle_sql() -> str:
    from . import multimodal

    cols = "doc_id, width, height, n_pixels, gray_sum"
    return f"""
SELECT 'baseline' AS mode, {cols}
FROM ({multimodal.image_jpeg_features_sql()})
UNION ALL
SELECT 'progressive' AS mode, {cols}
FROM ({multimodal.image_jpeg_progressive_features_sql()})
ORDER BY mode, doc_id
"""


def _ann_cosine_paths_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force HOF plan ∪ Arrow-kernel plan, labeled by path —
    both must produce the identical rank-ordered top-k."""
    from pyspark.sql import functions as F

    from . import similarity

    emb = _emb(spark, sf_dir)
    cols = ["probe_id", "vec_id", "cos"]

    def lab(df: DataFrame, path: str) -> DataFrame:
        return df.select(F.lit(path).alias("path"), *cols)

    brute = similarity.ann_cosine_topk(emb)
    kernel = similarity.ann_cosine_topk_kernel(emb)
    return (
        lab(brute, "bruteforce")
        .unionByName(lab(kernel, "kernel"))
        .orderBy("path", "probe_id", F.desc("cos"), "vec_id")
    )


def _ann_cosine_paths_oracle_sql() -> str:
    from . import similarity

    cols = "probe_id, vec_id, cos"
    inner = similarity.ann_cosine_topk_sql()
    return f"""
SELECT 'bruteforce' AS path, {cols} FROM ({inner})
UNION ALL
SELECT 'kernel' AS path, {cols} FROM ({inner})
ORDER BY path, probe_id, cos DESC, vec_id
"""


def _bpe_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import bpe

    return bpe.bpe_train(_docs(spark, sf_dir))


def _lm_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import lm

    return lm.lm_perplexity(_docs(spark, sf_dir))


def _lm_oracle_sql() -> str:
    from . import lm

    return lm.lm_perplexity_sql()


def _splits_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import splits

    return splits.split_assign(_docs(spark, sf_dir))


def _splits_oracle_sql() -> str:
    from . import splits

    return splits.split_assign_sql()


def _bpe_oracle_sql() -> str:
    from . import bpe

    return bpe.bpe_train_sql()


def _webp_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import webp

    return webp.webp_features(
        webp.synthesize_webp_media(_docs(spark, sf_dir))
    ).orderBy("doc_id")


def _webp_oracle_sql() -> str:
    from . import webp

    return webp.image_webp_features_sql()


def _decontam_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from . import decontam

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontam.decontaminate_ngrams(train, bench, n=4)


def _gate_train_matrix(sf_dir: str | None):
    """The ONE sampling contract shared by every literal-parameter
    oracle (IVF / PQ / IVFPQ): gate sf dir (``BM25SPARK_GATE_SF_DIR``
    override, default the driver's sf0.01), embeddings ordered by
    vec_id, LIMIT 65536, float64 — exactly what the Spark entries
    train on. A change here changes every oracle identically."""
    import os

    import duckdb
    import numpy as np

    if sf_dir is None:
        sf_dir = os.environ.get(
            "BM25SPARK_GATE_SF_DIR", "/root/testdata/sf0.01"
        )
    con = duckdb.connect()
    rows = con.execute(
        "SELECT embedding FROM read_parquet("
        f"'{sf_dir}/embeddings.parquet') ORDER BY vec_id LIMIT 65536"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _ivf_oracle_sql(sf_dir: str | None = None) -> str:
    """Train the IVF centroids exactly as the Spark entry does (same
    rows, same order, same deterministic k-means) and inline them as
    literals in the DuckDB oracle (sampling contract:
    :func:`_gate_train_matrix`)."""
    from . import similarity

    centroids = similarity.ivf_train(_gate_train_matrix(sf_dir))
    return similarity.ann_ivf_topk_sql(centroids)


def _pq_oracle_sql(sf_dir: str | None = None) -> str:
    """Train the PQ codebooks exactly as the Spark entry does and
    inline them as literals (same contract as :func:`_ivf_oracle_sql`)."""
    from . import similarity

    books = similarity.pq_train(_gate_train_matrix(sf_dir))
    return similarity.ann_pq_topk_sql(books)


def _ivfpq_oracle_sql(sf_dir: str | None = None) -> str:
    """Train the composed IVFPQ parameters (coarse centroids + PQ
    codebooks over residuals) exactly as the Spark entry does and
    inline both as literals (same contract as :func:`_ivf_oracle_sql`)."""
    from . import similarity

    centroids, books = similarity.ivfpq_train(_gate_train_matrix(sf_dir))
    return similarity.ann_ivfpq_topk_sql(centroids, books)


def oracle_registry() -> dict[str, str]:
    from . import decontam, dedup, multimodal, similarity, textstats

    return {
        "audio_wav_features": multimodal.audio_wav_features_sql(),
        "image_container_features": multimodal.image_container_features_sql(),
        "image_jpeg_features": _jpeg_modes_oracle_sql(),
        "image_webp_features": _webp_oracle_sql(),
        "video_avi_features": multimodal.video_avi_features_sql(),
        "video_frame_sample": multimodal.video_frame_sample_sql(every_n=2),
        "dedup_exact_groups": dedup.exact_dup_groups_sql(),
        "dedup_minhash_signatures": dedup.minhash_signatures_sql(),
        "dedup_minhash_pairs": dedup.minhash_candidate_pairs_sql(),
        "dedup_simhash": dedup.simhash_sql(),
        "dedup_simhash_pairs": dedup.simhash_hamming_pairs_sql(),
        "dedup_ngram_jaccard_pairs": dedup.ngram_jaccard_pairs_sql(),
        # components of the candidate-pair graph via a recursive CTE
        "dedup_components": dedup.dedup_components_sql(),
        # span dedup groups by the gram TEXT (the Spark path's
        # xxhash64 grouping must agree or the gate mismatches)
        "dedup_substring_spans": dedup.substring_dup_spans_sql(),
        "dedup_keep_canonical": dedup.dedup_keep_canonical_sql(),
        # ONE oracle, both physical paths labeled in the entry
        "ann_cosine_topk": _ann_cosine_paths_oracle_sql(),
        # integer-exact LSH: the oracle reproduces the full pipeline
        # (bucket bits, multiprobe, re-rank) bit-for-bit
        "ann_lsh_topk": similarity.ann_lsh_topk_sql(dim=64, bits=8, tables=4),
        "dedup_embedding_pairs": similarity.embedding_near_dup_pairs_sql(
            dim=64, bits=8, tables=4
        ),
        "dedup_embedding_components": similarity.embedding_components_sql(
            dim=64, bits=8, tables=4
        ),
        # IVF centroids are trained parameters: regenerate them here
        # from the gate's sf0.01 table with the same deterministic
        # k-means the Spark entry runs, then embed them as literals
        # (the correctness gate is specified at sf=0.01)
        "ann_ivf_topk": _ivf_oracle_sql(),
        "ann_pq_topk": _pq_oracle_sql(),
        "ann_ivfpq_topk": _ivfpq_oracle_sql(),
        "text_stats": textstats.text_stats_sql(),
        "text_quality": textstats.text_quality_sql(),
        "text_fingerprint": textstats.text_fingerprint_sql(),
        "text_pii_flags": textstats.text_pii_flags_sql(),
        "text_repetition": textstats.text_repetition_sql(),
        "text_ngram_repetition": textstats.text_ngram_repetition_sql(),
        "text_quality_filter": textstats.corpus_quality_filter_sql(),
        "text_decontaminate": decontam.decontaminate_ngrams_sql(
            n=4, bench_pred="doc_id % 97 = 0"
        ),
        # trained model parameters inlined as literals (IVF contract)
        "bpe_train_merges": _bpe_oracle_sql(),
        "text_lm_perplexity": _lm_oracle_sql(),
        "text_split_assign": _splits_oracle_sql(),
    }
