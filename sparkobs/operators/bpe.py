"""Distributed BPE tokenizer training and application.

Classic byte-pair-encoding over a corpus, re-expressed relationally:
"training" is n_merges rounds of (count adjacent symbol pairs over the
word-frequency table → take the most frequent pair → merge it
everywhere), and "applying" the learned merges is a chain of literal
string replacements — both pure DataFrame/expression work.

Representation: a word's current symbolization is ONE canonical string
— symbols joined by TWO spaces with a single leading/trailing space
(``"abc" → " a  b  c "``). In that form the merge step is a plain
LITERAL ``replace(sym, ' l  r ', ' lr ')``: every engine's replace()
scans left-to-right non-overlapping, and because adjacent symbols
share two boundary spaces (one "belonging" to each side), consecutive
matches each keep their own boundary — greedy left-to-right BPE merge
semantics, no regex, no lookaround (which RE2/DuckDB lacks), identical
across engines. The invariant (2 spaces between symbols, 1 at the
ends) is preserved by the replacement, which is what makes the whole
training loop oracle-checkable value-for-value in DuckDB.

Scale shape (100 TB corpus):
- the corpus is touched ONCE (word-frequency hash agg); every
  training round runs over the distinct-word table, which is orders
  of magnitude smaller and further shrinks as merges fuse symbols;
- each round is one pair-count hash agg + a TakeOrdered(1) — the only
  driver data is the single winning pair per round;
- lineage is truncated with an eager ``localCheckpoint`` per round
  (the iterative-plan growth fix proven in
  :func:`sparkobs.operators.dedup.connected_components`);
- applying merges to documents is a per-row chain of n_merges literal
  replaces — narrow, codegen'd, no joins, no loop jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkobs.operators.text import tokens_nonempty

#: chars → canonical symbol string; per-element substring references
#: only the word attribute (cheap O(len) accesses, not re-parses)
_CHARS_EXPR = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq, sym) over the corpus — the single pass that ever
    touches full-corpus data; ``sym`` is the canonical single-char
    symbolization every merge round rewrites."""
    words = df.select(F.explode(tokens_nonempty(text_col)).alias("word"))
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    sym = F.concat(
        F.lit(" "), F.array_join(F.expr(_CHARS_EXPR), "  "), F.lit(" ")
    )
    return wf.select("word", "freq", sym.alias("sym"))


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = F.split(F.trim(F.col("sym")), "  ")
    n1 = F.greatest(F.size(syms) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(syms, 1, n1),
        F.slice(syms, 2, n1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table (step, lhs, rhs, merged, pair_freq) — deterministic: ties on
    pair frequency break on (lhs, rhs) lexicographically.

    Stops early if the vocabulary runs out of adjacent pairs (every
    word fused to one symbol)."""
    spark = df.sparkSession
    words = word_frequencies(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], top[0]["pair_freq"]
        merges.append((step, lhs, rhs, lhs + rhs, int(freq)))
        words = words.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {lhs}  {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, pair_freq bigint"
    )


def bpe_apply(
    df: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with an ordered merge list (``(lhs,
    rhs)`` pairs, e.g. ``[(r["lhs"], r["rhs"]) for r in
    bpe_train(...).collect()]``): per document, the total symbol count
    before/after and the compression ratio.

    One explode + a per-word chain of ``len(merges)`` literal
    replaces + one doc-keyed agg — the merge list is driver-side by
    construction (n_merges rows), so this is broadcast-free narrow
    work."""
    w = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_nonempty(text_col)).alias("word"),
    )
    s = F.concat(F.lit(" "), F.array_join(F.expr(_CHARS_EXPR), "  "), F.lit(" "))
    for lhs, rhs in merges:
        s = F.replace(s, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} "))
    return (
        w.select(
            "id",
            F.length("word").alias("n_chars"),
            F.size(F.split(F.trim(s), "  ")).alias("n_sym"),
        )
        .groupBy("id")
        .agg(
            F.sum("n_chars").cast("long").alias("n_char_symbols"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_char_symbols",
            "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_char_symbols"), 4).alias(
                "compression"
            ),
        )
    )
