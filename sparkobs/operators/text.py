"""Text analysis for training-data pipelines (extension, SURVEY.md §7 phase 7).

Everything here is pure Catalyst expression — no UDFs — so it runs
JVM-side inside whole-stage codegen at 100 TB: token statistics,
quality scoring, heuristic language-ID, and document fingerprinting
over a ``documents(doc_id, text, ...)`` table.

Tokenization convention: split on ``\\s+`` (the corpus is whitespace-
delimited); a BPE-ish regex token count is provided separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword profiles for the heuristic language-ID.
#: Scores are plain token-membership counts — deterministic, and
#: expressible identically in the DuckDB oracle.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
}

QUALITY_STOPWORDS = ("the", "a")


def _toks(text_col: str):
    return F.split(F.col(text_col), r"\s+")


def tokens_nonempty(text_col: str):
    """Whitespace tokens with empties dropped (leading/trailing space
    yields '' elements from split) — the tokenization every cross-doc
    operator shares; DuckDB mirror:
    ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')``."""
    return F.filter(_toks(text_col), lambda x: x != "")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, uniqueness, lengths."""
    toks = _toks(text_col)
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / n_tokens, 4
        ).alias("avg_token_len"),
    )


def token_count_regex(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish regex token count: word / number / other-symbol runs.

    Uses only regex constructs with identical semantics in Java regex
    (Spark) and RE2 (DuckDB oracle).
    """
    pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias("n_regex_tokens"),
    )


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """Deterministic quality score in [0,1]: length saturation +
    lexical diversity + stopword-inverse, the shape of production
    quality filters (length/punct/stopword ratios). ``keep_cols`` ride
    along unchanged (it's a pure projection — no reason to join the
    score back on when a downstream op needs more columns)."""
    toks = _toks(text_col)
    n_tokens = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, '\\\\s+'), t -> t in ({stop_list})))")
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0)) * 0.4
        + (n_unique / n_tokens) * 0.4
        + (F.lit(1.0) - n_stop / n_tokens) * 0.2
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: stopword-profile scores + CJK character
    detection, argmax with fixed priority order (en>de>fr>es), 'zh' when
    CJK chars dominate, 'und' when no profile matches."""
    toks = _toks(text_col)
    n_tokens = F.size(toks)
    scores = {}
    for lang, words in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        scores[lang] = F.expr(f"size(filter(split(text, '\\\\s+'), t -> t in ({lst})))")
    cjk = F.length(F.regexp_replace(F.col(text_col), "[^\\u4e00-\\u9fff]", ""))
    best = F.greatest(*scores.values())
    pred = (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["de"] == best, F.lit("de"))
        .when(scores["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        F.round(best / n_tokens, 4).alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint (content hash of normalized text): md5 of
    lowercased, whitespace-collapsed text. Identical rows ⇒ identical
    fingerprints ⇒ exact-dedup key (dedup.exact flavor)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xx64",
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (the MOSS
    scheme): hash every character ``k``-gram, then keep the MINIMUM
    hash of each sliding window of ``window`` consecutive k-gram
    hashes — guarantees any shared substring of length ≥ k+window−1
    contributes at least one common fingerprint, at ~1/window the
    storage of all k-grams. Output: (id, sorted distinct fingerprint
    array) — overlap of fingerprint sets localizes copied spans, which
    whole-document hashes (:func:`fingerprint`) cannot.

    Pure Catalyst: one generated expression per row (transform over a
    position sequence + sliding array_min), no shuffle at all.
    ``hash_fn="xx64"`` is the JVM-fast default; ``"md5"`` is the
    engine-portable mode (15-hex-char base-16 parse, same convention
    as the dedup tiers) the DuckDB oracle checks.
    """
    if hash_fn == "xx64":
        gram_hash = f"xxhash64(substring(text_, i, {k}))"
    elif hash_fn == "md5":
        gram_hash = (
            f"CAST(conv(substring(md5(substring(text_, i, {k})), 1, 15), 16, 10) AS BIGINT)"
        )
    else:
        raise ValueError(f"hash_fn must be xx64|md5, got {hash_fn}")
    n_grams = f"greatest(1, length(text_) - {k - 1})"
    fp_sql = (
        "array_sort(array_distinct(transform("
        f"sequence(1, greatest(1, size(hashes_) - {window - 1})), "
        f"j -> array_min(slice(hashes_, j, {window})))))"
    )
    return (
        df.select(
            F.col(id_col),
            F.col(text_col).alias("text_"),
        )
        .selectExpr(
            id_col,
            f"transform(sequence(1, {n_grams}), i -> {gram_hash}) AS hashes_",
        )
        .selectExpr(id_col, f"{fp_sql} AS fingerprints")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the doc→training-sample
    splitter every LLM data pipeline needs. Pure Catalyst: one split,
    a stride ``sequence`` of chunk starts, ``posexplode``, and array
    ``slice`` — no UDF, ~chunks/doc output rows per input row.

    Chunk starts are 1, 1+stride, … up to ``max(1, n_tokens-overlap)``
    (stride = chunk_tokens - overlap), so every non-first chunk carries
    more than ``overlap`` fresh tokens and short docs yield exactly one
    chunk. Output: (id, chunk_idx, token_start, n_tokens, chunk_text);
    chunk_idx = (token_start-1)/stride, deterministic.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # leading/trailing whitespace makes split() emit empty tokens —
    # drop them or they count against chunk capacity (hypothesis-found)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda x: x != ""
        ).alias("__toks"),
    )
    n = F.size("__toks")
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(stride)
    )
    ex = toks.select("id", "__toks", F.posexplode(starts).alias("chunk_idx", "token_start"))
    return ex.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("token_start").cast("int").alias("token_start"),
        F.least(F.lit(chunk_tokens), F.size("__toks") - F.col("token_start") + 1)
        .cast("int")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("token_start"), F.lit(chunk_tokens))
        ).alias("chunk_text"),
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document — the standard
    "drop boilerplate/spam" quality filters for training corpora:

    - ``dup_line_frac``: 1 − distinct/total over newline-split lines;
    - ``dup_token_frac``: 1 − distinct/total over whitespace tokens;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams (NULL for docs with < 2 tokens).

    Line/token fractions are per-row Catalyst array expressions; the
    bigram mode runs explode → (doc, bigram) count → per-doc max/sum —
    two key-local shuffles, linear in corpus size (no per-doc quadratic
    scan), then a doc_id-co-partitioned left join back.
    """
    toks = tokens_nonempty(text_col)
    lines = F.split(F.col(text_col), "\n")
    per_doc = df.select(
        F.col(id_col),
        F.when(
            F.size(lines) > 0,
            F.round(F.lit(1) - F.size(F.array_distinct(lines)) / F.size(lines), 4),
        ).alias("dup_line_frac"),
        F.when(
            F.size(toks) > 0,
            F.round(F.lit(1) - F.size(F.array_distinct(toks)) / F.size(toks), 4),
        ).alias("dup_token_frac"),
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).alias("__bg"),
    )
    bigram_counts = (
        per_doc.select(F.col(id_col), F.explode("__bg").alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"))
    )
    return per_doc.drop("__bg").join(bigram_counts, id_col, "left").select(
        id_col, "dup_line_frac", "dup_token_frac", "top_bigram_frac"
    )


#: PII patterns using only regex constructs with identical semantics in
#: Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for training corpora: replace email / phone /
    IPv4 matches with typed placeholders and count the redactions per
    kind — pure ``regexp_replace``/``regexp_count`` expressions, one
    codegen'd pass, no UDFs. Patterns are deliberately RE2-compatible
    so the DuckDB oracle applies the IDENTICAL regexes.

    Order matters: emails are scrubbed before phones so a phone-like
    digit run inside an address is not double-redacted.
    """
    out = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.regexp_count(out, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.select(F.col(id_col), *counts, out.alias("scrubbed_text"))


def source_quota_cap(
    df: DataFrame,
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source quota capping — the data-mixing primitive that stops
    one domain from dominating a training corpus: keep the ``quota``
    lowest-id docs per group (deterministic, reproducible across runs).
    One window shuffle on the group key; heavy groups prune early
    (rank filter pushes below the window's sort via WindowGroupLimit).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def quality_topk_per_source(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-ranked curation: keep the ``k`` highest-quality docs per
    source (ties broken by lowest id — fully deterministic), using
    :func:`quality_score`. The select-the-best counterpart to
    :func:`source_quota_cap`'s keep-any-N: one window shuffle on the
    group key, rank filter pushed below the sort via WindowGroupLimit,
    so heavy sources prune before the full sort materializes.
    """
    from pyspark.sql import Window as W

    scored = quality_score(df, id_col, text_col, keep_cols=(group_col,))
    w = W.partitionBy(group_col).orderBy(F.desc("quality"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(F.col(id_col), F.col(group_col), "quality", F.col("__rn").alias("rank"))
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split sequence packing — the standard LLM-pretraining
    batching step: documents are laid end-to-end into one global token
    stream (ordered by ``id_col``) and the stream is cut every
    ``budget`` tokens; each cut is one fixed-length training sequence
    ("pack"). Per document: its offset in the stream and which packs
    its tokens land in (a doc spans multiple packs when a cut falls
    inside it).

    Output: (doc_id, n_tokens, token_start, pack_first, pack_last,
    n_packs); ``token_start`` is the 0-based stream offset, packs are
    0-based.

    Scale shape: the only global state is the inclusive token cumsum,
    computed by :func:`sparkobs.operators.joins.global_running_sum` —
    per-partition window + broadcast partition offsets off one reused
    range exchange; NO single-partition window. Everything after the
    cumsum is row-local arithmetic.
    """
    from sparkobs.operators.joins import global_running_sum

    toks = df.select(
        F.col(id_col),
        F.size(
            tokens_nonempty(text_col)
        ).cast("long").alias("n_tokens"),
    )
    cum = global_running_sum(toks, [id_col], "n_tokens", out_col="__cum")
    start = F.col("__cum") - F.col("n_tokens")
    pack_first = F.floor(start / budget)
    pack_last = F.when(
        F.col("n_tokens") > 0, F.floor((F.col("__cum") - 1) / budget)
    ).otherwise(pack_first)
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        start.cast("long").alias("token_start"),
        pack_first.cast("long").alias("pack_first"),
        pack_last.cast("long").alias("pack_last"),
        (pack_last - pack_first + 1).cast("long").alias("n_packs"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent whitespace
    tokens with occurrence and document counts — the quick "what is
    this corpus made of" probe (and the input to stopword-list or
    tokenizer-merge decisions).

    One explode → one hash agg keyed by token (map-side partial
    combine absorbs the Zipf head BEFORE the shuffle, so hot tokens
    ship one partial row per input partition, not one row per
    occurrence) → global top-k via orderBy().limit(), which Catalyst
    executes as TakeOrderedAndProject (per-partition heaps — no full
    sort). Ties break on the token string for determinism.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            tokens_nonempty(text_col)
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def pack_manifest(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-pack manifest for :func:`pack_sequences` — the writer-side
    view: for every pack, how many documents contribute, how many
    tokens it holds (= ``budget`` except the final pack), and the
    contributing doc ids in stream order as a csv string (arrays don't
    survive the driver's value-hash canonicalizer; the csv is also the
    natural manifest-file format).

    A document spanning k packs contributes a row to each: its token
    count inside pack p is ``min(end, (p+1)·budget) − max(start,
    p·budget)``. Plan: the pack_sequences cumsum → explode of at most
    ``n_packs`` rows per doc (total rows = Σ n_packs ≈ n_docs +
    n_tokens/budget) → one hash agg on pack_id. Empty docs occupy no
    pack.
    """
    spans = pack_sequences(df, budget, id_col, text_col)
    seg = spans.where(F.col("n_tokens") > 0).select(
        F.col(id_col),
        F.col("token_start"),
        (F.col("token_start") + F.col("n_tokens")).alias("token_end"),
        F.explode(
            F.sequence(F.col("pack_first"), F.col("pack_last"))
        ).alias("pack_id"),
    )
    in_pack = F.least(
        F.col("token_end"), (F.col("pack_id") + 1) * budget
    ) - F.greatest(F.col("token_start"), F.col("pack_id") * budget)
    return (
        seg.select(F.col(id_col), "pack_id", in_pack.alias("n_in_pack"))
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_in_pack").alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.col(id_col))),
                    lambda d: d.cast("string"),
                ),
            ).alias("doc_ids"),
        )
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-corpus text normalization: lowercase, strip control
    characters, collapse whitespace runs, trim — the canonical form
    fed to tokenizers and dedup (exact dedup on normalized text
    catches case/whitespace variants of the same document).

    One codegen'd expression pass per document, no UDF; reports the
    size delta so curation can flag documents that were mostly
    control/whitespace noise.
    """
    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[\x00-\x1f\x7f]", " "),
            r"\s+",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("text_norm"),
        (F.length(t) - F.length(norm)).cast("long").alias("n_chars_removed"),
    )


def drop_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """Cross-document line-level boilerplate removal — the C4/
    RefinedWeb cleaning step: a line (nav bar, cookie banner, license
    header) that appears verbatim in ``min_docs`` or more documents is
    dropped from every document; the survivors are reassembled in
    original order.

    Plan shape for 100 TB: lines are keyed by ``md5(line)`` (16-byte
    shuffle keys, never the raw string); document frequency is ONE
    hash agg over (line_key → approx-distinct docs is not enough here,
    exact count_distinct with partial aggregation); the boilerplate
    SET (only lines at/above the threshold — the Zipf head, tiny
    relative to the corpus) feeds a ``left_anti`` join, which AQE
    converts to broadcast at runtime when it fits. Reassembly is one
    hash agg per doc with an in-group ``array_sort`` on (pos, line) —
    no global sort. Documents whose every line was boilerplate come
    back with empty ``clean_text`` via the final right join (they must
    not vanish: curation needs the "this doc was ALL boilerplate"
    signal).
    """
    import re as _re

    # split() treats its pattern as a regex but reassembly uses the
    # literal delimiter — escape so delim="|" or "." can't explode
    # every character
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.split(F.col(text_col), _re.escape(delim))
            ).alias("pos", "line"),
        )
        .where(F.col("line") != "")
        .withColumn("line_key", F.md5(F.col("line")))
    )
    # The boilerplate SET is the Zipf head — tiny — so it is
    # checkpointed (its build is a corpus-scale agg that must not
    # re-run per consumer). The line table itself is CORPUS-sized
    # (exploded text), so it is deliberately NOT checkpointed;
    # instead keep/total/reassemble collapse into ONE pass over it: a
    # left join marks boilerplate lines, and a single per-doc agg
    # counts all lines, counts survivors, and reassembles survivors
    # in (pos, line) order (r13 scan audit: the previous
    # anti-join + two separate per-doc aggs referenced the line table
    # three times — three corpus re-splits in one plan).
    boilerplate = (
        lines.groupBy("line_key")
        .agg(F.count_distinct("id").alias("line_doc_freq"))
        .where(F.col("line_doc_freq") >= min_docs)
        .select("line_key", F.lit(True).alias("__bp"))
        .localCheckpoint(eager=True)
    )
    marked = lines.join(boilerplate, "line_key", "left")
    keep = F.col("__bp").isNull()
    reassembled = marked.groupBy("id").agg(
        F.concat_ws(
            delim,
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line", keep.alias("__k")))
                    ),
                    lambda s: s["__k"],
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword/
    topic signal for corpus curation and near-dup triage.

    idf uses add-one smoothing: ``ln((N+1)/(df+1))``. Two hash aggs
    (term frequency per (doc, term); document frequency per term —
    the tf rows are already (doc, term)-distinct so df is a plain
    count) + one join back on the term key; the corpus size N is a
    1-row broadcast cross join, never a collect. Ranking is a
    per-document window (``row_number``), ties broken on the term
    string; scores on both engines multiply the SAME doubles
    (``tf · ln(...)`` of integer inputs), so ordering is
    engine-reproducible.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_nonempty(text_col)).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)),
                4,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_docs: int = 5,
) -> DataFrame:
    """Term → postings-summary index: document frequency, total term
    frequency, and the ``top_docs`` highest-tf documents per term as a
    csv string (tf desc, doc id asc — deterministic; arrays don't
    survive the driver's value-hash canonicalizer).

    At 100 TB the materialized index IS the long (term, doc, tf) table
    written sorted/bucketed by term — this operator is the summary
    view over it. One explode → one (doc, term) hash agg (map-side
    combine absorbs within-doc repeats) → one term-keyed agg; the
    in-group top-k is ``array_sort`` + ``slice``, never a global sort.
    """
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_nonempty(text_col)).alias("term"),
        )
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("tf")).alias("ntf"), F.col("id")))
                    ),
                    1,
                    top_docs,
                ),
                lambda s: s["id"].cast("string"),
            ),
        ).alias("top_doc_ids"),
    )


def search_all_terms(
    df: DataFrame,
    terms: tuple,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) term search over the corpus: documents
    containing EVERY term in ``terms``, scored by total occurrence
    count. The query side of :func:`inverted_index` — expressed
    directly over the corpus so Catalyst pushes the term filter into
    the scan side of the explode instead of materializing postings.

    One explode → ``isin`` filter (tiny term set, evaluated in
    codegen) → one doc-keyed agg with a ``count_distinct(term) = n``
    guard. No joins at all.
    """
    terms = tuple(dict.fromkeys(terms))  # a duplicate term would make
    # count_distinct == len(terms) unsatisfiable and return no rows
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_nonempty(text_col)).alias("term"),
    ).where(F.col("term").isin(list(terms)))
    return (
        toks.groupBy("id")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .where(F.col("n_terms") == len(terms))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def vocab_jsd(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence between two corpora's token
    distributions — the vocabulary-drift metric between corpus
    versions (crawl N vs N+1, train vs eval): 0 = identical mixes,
    ln(2) = disjoint vocabularies. The categorical companion to the
    numeric PSI drift monitor.

    One token agg per side, a full outer join on the token key, one
    sum — every term uses the 0·ln(0)=0 convention via explicit
    null/zero guards so one-sided tokens contribute their full
    half-divergence instead of NaN."""
    def dist(df: DataFrame, name: str) -> DataFrame:
        # checkpointed (vocabulary-sized): the token counts feed both
        # their own total and the join; lazy, each side's corpus
        # tokenization ran twice (r13 scan audit)
        c = (
            df.select(F.explode(tokens_nonempty(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"n_{name}"))
            .localCheckpoint(eager=True)
        )
        t = c.agg(F.sum(f"n_{name}").alias(f"tot_{name}"))
        return c.crossJoin(F.broadcast(t)).select(
            "token", (F.col(f"n_{name}") / F.col(f"tot_{name}")).alias(f"p_{name}")
        )
    j = dist(df_a, "a").join(dist(df_b, "b"), "token", "full_outer")
    p = F.coalesce(F.col("p_a"), F.lit(0.0))
    q = F.coalesce(F.col("p_b"), F.lit(0.0))
    m = (p + q) / 2
    term = F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0)) + F.when(
        q > 0, q * F.log(q / m)
    ).otherwise(F.lit(0.0))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_union"),
        F.sum((p > 0).cast("long") * (q > 0).cast("long")).cast("long").alias("vocab_shared"),
        F.round(F.sum(term) / 2, 6).alias("jsd_nats"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram (token) Shannon entropy in bits — the
    repetition/diversity signal quality pipelines threshold on (a doc
    repeating one phrase has entropy ≈ 0; natural prose sits well
    above it).

    One explode + one (id, token) hash agg + one id agg, using the
    identity H = log2(N) − (Σ c·log2 c)/N so the per-token pass needs
    only counts (no per-token probability column, no second join).
    Map-side combine handles the hot tokens; nothing is collected.
    """
    counts = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens_nonempty(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log2("c")).alias("clogc"),
            F.count(F.lit(1)).alias("uniq"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n").cast("long").alias("n_tokens"),
            F.col("uniq").cast("long").alias("n_unique_tokens"),
            F.round(F.log2("n") - F.col("clogc") / F.col("n"), 4).alias(
                "entropy_bits"
            ),
        )
    )


#: Gopher-style document quality rule bounds (Rae et al. 2021 §A1.1,
#: public paper): word-count window, mean-word-length window, minimum
#: lexical diversity, minimum distinct stopwords. Bounds are
#: parameters; these defaults are the published ones except the word
#: minimum (50 in the paper — kept here) and the stopword list, which
#: reuses this corpus's QUALITY_STOPWORDS.
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "min_unique_frac": 0.2,
    "min_distinct_stopwords": 2,
}


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **bounds,
) -> DataFrame:
    """Gopher-rule quality screen: one boolean per rule plus the
    conjunction, computed in a single narrow projection (no shuffle,
    no UDF — every rule is a Catalyst array/length expression, so the
    screen rides the scan at any corpus size).

    Rules (all bounds overridable by keyword):
    - ``ok_n_words``: token count within [min_words, max_words]
    - ``ok_mean_word_len``: mean token length within bounds
    - ``ok_unique_frac``: distinct/total tokens ≥ min_unique_frac
    - ``ok_stopwords``: ≥ min_distinct_stopwords distinct stopwords
    ``passes_gopher`` is the AND of the four.
    """
    b = {**GOPHER_DEFAULTS, **bounds}
    toks = tokens_nonempty(text_col)
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / n
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop_distinct = F.expr(
        f"size(array_distinct(filter(split({text_col}, '\\\\s+'),"
        f" t -> t in ({stop_list}))))"
    )
    ok_words = (n >= b["min_words"]) & (n <= b["max_words"])
    ok_len = (mean_len >= b["min_mean_word_len"]) & (
        mean_len <= b["max_mean_word_len"]
    )
    ok_uniq = (uniq / n) >= b["min_unique_frac"]
    ok_stop = n_stop_distinct >= b["min_distinct_stopwords"]
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(uniq / n, 4).alias("unique_frac"),
        n_stop_distinct.cast("long").alias("n_distinct_stopwords"),
        ok_words.alias("ok_n_words"),
        ok_len.alias("ok_mean_word_len"),
        ok_uniq.alias("ok_unique_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_len & ok_uniq & ok_stop).alias("passes_gopher"),
    )


def zipf_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 2,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: the OLS slope of
    log(freq) on log(rank) (natural logs), plus vocabulary size and
    the head token — a one-number corpus-health signal (natural
    language sits near slope −1; template/boilerplate corpora flatten,
    spam steepens).

    One token count pass (map-side combine), one DISTRIBUTED rank
    over the VOCABULARY (≪ corpus; further cut by ``min_freq``) via
    the per-partition-index + broadcast-offset primitive — a
    web-scale vocabulary never funnels through a single-partition
    window — and a built-in ``regr_slope`` aggregate. Ranks break
    ties (freq desc, token asc) so the fit is deterministic and
    engine-reproducible.
    """
    from sparkobs.operators.joins import global_row_index

    counts = (
        df.select(F.explode(tokens_nonempty(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= min_freq)
        # descending frequency expressed as an ASC key so the
        # distributed index applies (same trick as vocab_segments)
        .withColumn("__negf", -F.col("freq"))
    )
    ranked = global_row_index(counts, ["__negf", "tok"], index_col="rank")
    return ranked.agg(
        F.round(
            F.expr("regr_slope(ln(freq), ln(rank))"), 4
        ).alias("zipf_slope"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.min_by("tok", "rank").alias("top_token"),
        F.max("freq").cast("long").alias("top_freq"),
    )


def bigram_pmi(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    token pairs: PMI = ln(c_ab · N_uni² / (N_bi · c_a · c_b)) — the
    classic collocation-mining signal (phrases worth fusing into
    single tokens before BPE).

    Linear, not quadratic: only ADJACENT pairs are counted (one
    zip_with explode), unigram counts come from the same token pass,
    and the PMI arithmetic runs over the bigram VOCABULARY only. One
    broadcast of the two scalar totals; top-k is
    TakeOrderedAndProject with a deterministic (score, lhs, rhs)
    tiebreak.
    """
    from pyspark.sql import Window as W  # noqa: F401  (parity with siblings)

    toks = df.select(tokens_nonempty(text_col).alias("__tk"))
    n1 = F.greatest(F.size("__tk") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("__tk", 1, n1),
        F.slice(F.col("__tk"), 2, n1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    bi = (
        toks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    # checkpointed: the unigram vocabulary feeds THREE legs (the
    # scalar total + both broadcast joins) and Catalyst reuses no
    # subtree statically — lazy, each leg re-tokenized the corpus
    # (full scan + explode). Vocabulary-sized; values unchanged.
    uni = (
        df.select(F.explode(tokens_nonempty(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = uni.agg(
        F.sum("c").alias("n_uni"),
    ).crossJoin(
        toks.select(n1.alias("__n")).agg(F.sum("__n").alias("n_bi"))
    )
    scored = (
        bi.join(F.broadcast(uni.selectExpr("tok as lhs", "c as c_a")), "lhs")
        .join(F.broadcast(uni.selectExpr("tok as rhs", "c as c_b")), "rhs")
        .crossJoin(F.broadcast(totals))
        .select(
            "lhs",
            "rhs",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.col("n_uni")
                    * F.col("n_uni")
                    / (F.col("n_bi") * F.col("c_a") * F.col("c_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("lhs"), F.asc("rhs")
    ).limit(k)


def vocab_segments(
    df: DataFrame,
    text_col: str = "text",
    head_share: float = 0.5,
    torso_share: float = 0.9,
) -> DataFrame:
    """Head / torso / tail segmentation of the vocabulary by cumulative
    frequency share — the budgeting view behind "the top N tokens
    cover X% of the corpus" decisions (embedding table sizing, stopword
    cutoffs, quantization vocab). One token count pass over the data;
    ranking and cumulative shares run over the VOCABULARY only.
    A token is 'head' while the cumulative share up to and including it
    is ≤ head_share, 'torso' until torso_share, else 'tail'. Output is
    one row per segment: token count, occurrence mass, share.
    """
    from sparkobs.operators.joins import global_running_sum

    # checkpointed (vocabulary-sized): the count table feeds the
    # scalar total and both branches of the distributed running sum;
    # lazy, each reference re-tokenized the corpus (r13 scan audit:
    # 4 source scans; 1 after)
    counts = (
        df.select(F.explode(tokens_nonempty(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        # descending-frequency global order expressed as an ASC sort
        # key so the DISTRIBUTED running sum applies (per-partition
        # windows + broadcast offsets — a web-scale vocabulary never
        # funnels through a single-partition window)
        .withColumn("__negf", -F.col("freq"))
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(F.sum("freq").alias("__tot"))
    ranked = global_running_sum(
        counts, ["__negf", "tok"], "freq", out_col="__cum"
    ).crossJoin(F.broadcast(tot)).withColumn(
        "cum_share", F.col("__cum") / F.col("__tot")
    )
    seg = (
        F.when(F.col("cum_share") <= head_share, F.lit("head"))
        .when(F.col("cum_share") <= torso_share, F.lit("torso"))
        .otherwise(F.lit("tail"))
    )
    return (
        ranked.groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("occurrences"),
            F.round(F.sum("freq") / F.max("__tot"), 4).alias("share"),
        )
    )

def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every matching document for a fixed
    term query — the ranked-retrieval companion to the boolean
    :func:`search_all_terms`. Scale shape: because the query terms
    are literals, ONE corpus aggregation produces everything global —
    N, Σdl, and every per-term document frequency (an array column) —
    into a 1-row eager checkpoint (Catalyst would otherwise re-derive
    it per reference); the scoring pass is then a SECOND corpus scan
    with the stats riding a 1-row broadcast. Two scans, one per-doc
    hash agg, no inverted-index materialization for a handful of
    query terms.

    Cross-engine exactness: the per-(doc, term) BM25 term
    ``idf · tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))`` is a float
    expression over identical inputs, but the PER-DOC SUM over terms
    is summation-order-dependent, so each term's contribution is
    floored to integer 1e-4 score units first (floor is exact;
    engines then sum identical bigints in any order). Output:
    (doc_id, n_terms_hit, score_units) for docs matching ≥1 term —
    score_units/10000 is the BM25 score.
    """
    toks = tokens_nonempty(text_col)

    def tf_of(t: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("long")

    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.size(toks)).cast("long").alias("__sumdl"),
        F.array(
            *[
                F.sum(F.when(tf_of(t) > 0, F.lit(1)).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"__df{i}")
                for i, t in enumerate(terms)
            ]
        ).alias("__dfts"),
    ).localCheckpoint()  # 1 row
    per_term = F.array(
        *[
            F.struct(F.lit(i).alias("idx"), tf_of(t).alias("tf"))
            for i, t in enumerate(terms)
        ]
    )
    long = (
        df.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("__dl"),
            F.explode(per_term).alias("__t"),
        )
        .where(F.col("__t.tf") > 0)
        .select(
            id_col,
            "__dl",
            F.col("__t.idx").alias("__idx"),
            F.col("__t.tf").alias("__tf"),
        )
    )
    scored = long.crossJoin(F.broadcast(stats)).withColumn(
        "__dft", F.element_at(F.col("__dfts"), F.col("__idx") + 1)
    )
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__dft") + F.lit(0.5))
        / (F.col("__dft") + F.lit(0.5))
    )
    num = F.col("__tf") * F.lit(k1 + 1.0)
    den = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("__dl") / avgdl)
    )
    units = F.floor(F.lit(10000.0) * idf * (num / den)).cast("long")
    return (
        scored.select(id_col, units.alias("__u"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.sum("__u").cast("long").alias("score_units"),
        )
    )


def filter_funnel(
    df: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """Rule-level filter-funnel audit (extension, EXT-152 — distinct
    from EXT-52's pipeline-STAGE audit: this attributes removal to
    individual boolean RULES, marginally at chain position):
    given an ORDERED chain of boolean filter rules, report per rule
    how much it removes — both in isolation and marginally at its
    position in the chain — and how many documents survive it. The
    question every 100 TB curation pipeline asks before committing a
    filter chain ("which rule is doing the work, which is redundant
    at its position, what's left"), answered in ONE corpus scan.

    ``rules`` is ``[(name, sql_bool_expr)]``; expressions are SQL
    strings evaluated on the input columns (portable ones — arithmetic
    / comparisons / LIKE / length / replace — let a DuckDB oracle
    replay the funnel verbatim). NULL conditions count as FAIL (a
    curation filter keeps only affirmative passes; pinned by unit
    test), via ``coalesce(cond, false)``.

    Output, one row per rule in chain order:
    (step, rule, n_input, n_failing, n_failing_marginal, n_survivors)
    where ``n_failing`` is corpus-wide failures of the rule alone,
    ``n_failing_marginal`` counts failures among survivors of rules
    1..k-1 (what the rule actually removes at its position), and
    ``n_survivors`` is the running survivor count — so
    ``n_survivors[k-1] - n_failing_marginal[k] == n_survivors[k]``,
    an arithmetic invariant the oracle certifies row by row.

    Scale shape: every statistic is a conditional SUM over one scan —
    3·k map-side-combinable aggregates, a 1-row result exploded to k
    rows driver-free; no shuffle beyond the single agg exchange, no
    joins, no second pass. Reference analogue: the per-table check
    batteries of the reference's monitors (s3_key_monitor.py:141-220
    fan-in), generalized to an ordered removal audit."""
    if not rules:
        raise ValueError("filter_funnel needs at least one rule")
    aggs = []
    prev = None  # cumulative pass-predicate of rules 1..k-1
    for i, (name, cond) in enumerate(rules):
        p = F.coalesce(F.expr(cond), F.lit(False))
        prev_p = F.lit(True) if prev is None else prev
        aggs.append(
            F.sum(F.when(~p, 1).otherwise(0))
            .cast("long")
            .alias(f"__f{i}")
        )
        aggs.append(
            F.sum(F.when(prev_p & ~p, 1).otherwise(0))
            .cast("long")
            .alias(f"__m{i}")
        )
        aggs.append(
            F.sum(F.when(prev_p & p, 1).otherwise(0))
            .cast("long")
            .alias(f"__s{i}")
        )
        prev = prev_p & p
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n"), *aggs
    )
    # rule names ride as typed literals, never interpolated into a SQL
    # string — a quoted name is data here, not an injection surface
    structs = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_input"),
            F.col(f"__f{i}").alias("n_failing"),
            F.col(f"__m{i}").alias("n_failing_marginal"),
            F.col(f"__s{i}").alias("n_survivors"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    return one.select(
        F.explode(F.array(*structs)).alias("r")
    ).select("r.*")
