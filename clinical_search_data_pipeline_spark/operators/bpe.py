"""BPE vocabulary induction: a byte-pair-encoding merge step (and a
sequential trainer built from it) as native DataFrame programs.

North-star extension: `textanalysis.bpe_token_counts` covers the regex
PRE-tokenization stage of a BPE tokenizer; this module supplies the trainer
itself (Sennrich et al. 2016): count adjacent-symbol pair frequencies over
the weighted word vocabulary, merge the most frequent pair, repeat. One
merge step is fully relational and oracled bit-exactly against DuckDB;
training is the inherently-sequential loop over it.

Symbol-sequence representation (the crux of engine portability): a word's
symbol sequence is encoded as a delimited string ``|s1||s2||...||sn|`` —
every symbol carries its OWN flanking ``|`` on each side, so adjacent
pair occurrences share no characters. Applying merge (a, b) is then plain
``replace(s, '|a||b|', '|ab|')``: leftmost non-overlapping replacement —
identical semantics in Spark and DuckDB's non-regex `replace` — which is
exactly BPE's greedy left-to-right pairing (a run of k equal symbols
merges floor(k/2) times), and a match can never start mid-symbol because
symbols contain no ``|`` (guarded). The replacement restores the flanking
delimiters, so the encoding is closed under merges and the step iterates.

Scale posture: the corpus is touched ONCE (explode words -> count), after
which everything — pair counting, argmax, merge application — runs on the
VOCABULARY relation (Heaps' law: ~sqrt of corpus size), with the 1-row
best-pair broadcast against it. The trainer's per-merge `.collect()` is a
single row (the chosen pair) — the algorithm's sequential dependency, not
a driver-side data loop; production trainers (HF tokenizers, SentencePiece)
have the same per-merge synchronization point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_search_data_pipeline_spark.registry import register
from clinical_search_data_pipeline_spark.sources.readers import read_table

# Spark-side expression fragments ------------------------------------------

# chars -> '|c1||c2||...||cn|' (sequence(1, length) is safe: words are
# filtered non-empty, and Spark's descending-sequence gotcha needs start >
# stop which cannot happen for length >= 1)
_SPARK_SYM = (
    "concat('|', array_join(transform(sequence(1, length(word)), "
    "i -> substring(word, i, 1)), '||'), '|')"
)
# delimited string -> symbol array
_SPARK_SYMS_ARR = r"split(trim(BOTH '|' FROM s), '\\|\\|')"
# adjacent pairs in pattern form '|a||b|' (slice(..., 1, size-1) is [] for
# single-symbol words — no descending-sequence hazard)
_SPARK_PAIRS = (
    f"transform(slice({_SPARK_SYMS_ARR}, 1, size({_SPARK_SYMS_ARR}) - 1), "
    f"(x, i) -> concat('|', x, '||', element_at({_SPARK_SYMS_ARR}, i + 2), '|'))"
)


def word_vocab(docs: DataFrame) -> DataFrame:
    """(word, wf, s) — corpus word frequencies with the delimited initial
    (per-character) symbol sequence. The ONLY corpus-sized stage."""
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        (F.col("word") != "") & (~F.col("word").contains("|"))
    )
    return words.groupBy("word").agg(F.count("*").alias("wf")).withColumn(
        "s", F.expr(_SPARK_SYM)
    )


def pair_frequencies(vocab: DataFrame) -> DataFrame:
    """(pair, freq) — weighted adjacent-symbol pair counts over the vocab;
    `pair` is the ready-to-replace pattern '|a||b|'."""
    return (
        vocab.select("wf", F.explode(F.expr(_SPARK_PAIRS)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wf").alias("freq"))
    )


def best_pair(pairs: DataFrame) -> DataFrame:
    """1-row (pair, freq) argmax; ties broken by pair text ascending."""
    return pairs.orderBy(F.col("freq").desc(), F.col("pair").asc()).limit(1)


def bpe_merge_step(docs: DataFrame) -> DataFrame:
    """(word, wf, sym_before, sym_after, pair, freq) for every vocabulary
    word CHANGED by merging the corpus's most frequent adjacent pair.

    The vocab feeds both the pair-count branch and the rewrite scan;
    engine_cache materializes it once so the corpus-sized explode+agg runs
    ONCE (uncached, the plan duplicated the whole corpus scan under each
    consumer — visible as two FileScan+word-agg subtrees)."""
    from clinical_search_data_pipeline_spark.caching import engine_cache

    vocab = engine_cache(word_vocab(docs))
    best = best_pair(pair_frequencies(vocab)).select(
        "pair", "freq", F.expr("replace(pair, '||', '')").alias("_rep")
    )
    out = vocab.crossJoin(F.broadcast(best)).select(
        "word",
        "wf",
        F.col("s").alias("sym_before"),
        F.expr("replace(s, pair, _rep)").alias("sym_after"),
        "pair",
        "freq",
    )
    return out.filter(F.col("sym_before") != F.col("sym_after"))


def bpe_train(docs: DataFrame, n_merges: int) -> list[tuple[str, int]]:
    """The sequential trainer: n_merges rounds of (count pairs, collect the
    1-row argmax, apply). Returns [(pair_pattern, freq), ...] in merge
    order. Each round's jobs run on the vocab relation only (see module
    docstring on the per-merge 1-row collect)."""
    vocab = word_vocab(docs).cache()
    merges: list[tuple[str, int]] = []
    try:
        for _ in range(n_merges):
            top = best_pair(pair_frequencies(vocab)).collect()
            if not top or top[0]["freq"] <= 0:
                break
            pair, freq = top[0]["pair"], int(top[0]["freq"])
            merges.append((pair, freq))
            rep = pair.replace("||", "")
            # Bind the corpus-derived pair as a LITERAL, never by splicing it
            # into SQL text: word_vocab only guarantees words are '|'-free,
            # so a word containing a quote or backslash would otherwise break
            # (or silently corrupt) the generated expression.
            nxt = vocab.withColumn(
                "s", F.replace(F.col("s"), F.lit(pair), F.lit(rep))
            ).cache()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


@register(
    "q_bpe_merge_step",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, count(*) AS wf,
         '|' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)), '||') || '|' AS s
  FROM w WHERE word <> '' AND NOT contains(word, '|')
  GROUP BY word
),
syms AS (SELECT word, wf, s, string_split(trim(s, '|'), '||') AS a FROM vocab),
pr AS (
  SELECT wf,
         unnest(list_transform(range(1, len(a)),
                i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
  FROM syms
),
pf AS (SELECT pair, sum(wf)::BIGINT AS freq FROM pr GROUP BY pair),
best AS (SELECT pair, freq FROM pf ORDER BY freq DESC, pair ASC LIMIT 1)
SELECT word, wf, s AS sym_before,
       replace(s, best.pair, replace(best.pair, '||', '')) AS sym_after,
       best.pair AS pair, best.freq AS freq
FROM vocab CROSS JOIN best
WHERE s <> replace(s, best.pair, replace(best.pair, '||', ''))
""",
    tags=("bpe", "text", "northstar"),
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_step(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Two trainer rounds IN ONE PLAN: no driver synchronization at all
# ---------------------------------------------------------------------------


def bpe_two_merges(docs: DataFrame) -> DataFrame:
    """(word, wf, sym_after, pair1, pair2) — the vocabulary after TWO
    trainer rounds, with both chosen pairs, as a single declarative plan.

    `bpe_train` synchronizes on a 1-row collect per merge; for a small
    fixed number of merges the rounds can instead be UNROLLED into the
    plan: each round's argmax is a 1-row relation broadcast into the next
    round's rewrite, so the whole two-merge program is one job with zero
    driver round-trips (the same unrolling the kmeans oracle uses for its
    two assignment rounds). Round 2's pair counts run over round 1's
    REWRITTEN symbol strings — the sequential dependency is expressed as
    plan depth, not driver time. The vocab (and round 1's rewrite) each
    feed two consumers and are engine-cached so the corpus aggregates once.
    """
    from clinical_search_data_pipeline_spark.caching import engine_cache

    vocab = engine_cache(word_vocab(docs))
    b1 = best_pair(pair_frequencies(vocab)).select(
        F.col("pair").alias("pair1"), F.expr("replace(pair, '||', '')").alias("_r1")
    )
    v1 = engine_cache(
        vocab.crossJoin(F.broadcast(b1)).withColumn(
            "s", F.expr("replace(s, pair1, _r1)")
        )
    )
    pf2 = (
        v1.select("wf", "pair1", F.explode(F.expr(_SPARK_PAIRS)).alias("pair"))
        .groupBy("pair1", "pair")
        .agg(F.sum("wf").alias("freq"))
    )
    b2 = pf2.orderBy(F.col("freq").desc(), F.col("pair").asc()).limit(1).select(
        F.col("pair").alias("pair2"), F.expr("replace(pair, '||', '')").alias("_r2")
    )
    return (
        v1.crossJoin(F.broadcast(b2))
        .select(
            "word",
            "wf",
            F.expr("replace(s, pair2, _r2)").alias("sym_after"),
            "pair1",
            "pair2",
        )
    )


@register(
    "q_bpe_train2",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, count(*) AS wf,
         '|' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)), '||') || '|' AS s
  FROM w WHERE word <> '' AND NOT contains(word, '|')
  GROUP BY word
),
pf1 AS (
  SELECT pair, sum(wf)::BIGINT AS freq FROM (
    SELECT wf, unnest(list_transform(range(1, len(a)),
             i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
    FROM (SELECT wf, string_split(trim(s, '|'), '||') AS a FROM vocab)
  ) GROUP BY pair
),
b1 AS (SELECT pair AS pair1, replace(pair, '||', '') AS r1
       FROM pf1 ORDER BY freq DESC, pair ASC LIMIT 1),
v1 AS (SELECT word, wf, replace(s, pair1, r1) AS s, pair1
       FROM vocab CROSS JOIN b1),
pf2 AS (
  SELECT pair, sum(wf)::BIGINT AS freq FROM (
    SELECT wf, unnest(list_transform(range(1, len(a)),
             i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
    FROM (SELECT wf, string_split(trim(s, '|'), '||') AS a FROM v1)
  ) GROUP BY pair
),
b2 AS (SELECT pair AS pair2, replace(pair, '||', '') AS r2
       FROM pf2 ORDER BY freq DESC, pair ASC LIMIT 1)
SELECT word, wf, replace(s, pair2, r2) AS sym_after, pair1, pair2
FROM v1 CROSS JOIN b2
""",
    tags=("bpe", "text", "northstar"),
)
def q_bpe_train2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_two_merges(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# The n-merge trainer with NO per-merge driver collect (the kmeans_train
# pattern): one broadcast argmax per round, engine-tracked caches
# ---------------------------------------------------------------------------


def bpe_train_n(docs: DataFrame, n_merges: int) -> DataFrame:
    """(step, pair, freq) — the first `n_merges` BPE merges in order, as a
    single n-row result with ZERO per-merge driver data transfer: each
    round's argmax stays a 1-row RELATION broadcast into the next round's
    rewrite (the `bpe_two_merges` unrolling generalized), and the merge
    table is the union of the per-round argmax relations, collected once
    by the caller's action.

    `bpe_train`'s per-merge `.collect()` is hereby retired from the scale
    path (VERDICT r07 #6): the only driver round-trips are the per-round
    cache-materializing `.count()` scalars — the kmeans_train discipline
    that keeps lineage one round deep instead of n rewrites deep, each a
    VOCAB-sized job (the corpus is aggregated exactly once, in
    `word_vocab`). A degenerate corpus that runs out of pairs before
    n_merges yields an empty argmax relation and the merge table simply
    truncates — same contract as `bpe_train`'s early break."""
    from clinical_search_data_pipeline_spark.caching import engine_cache

    vocab = engine_cache(word_vocab(docs))
    merges: list[DataFrame] = []
    cur = vocab
    for i in range(n_merges):
        b = engine_cache(
            best_pair(pair_frequencies(cur)).select(
                F.lit(i + 1).alias("step"),
                "pair",
                "freq",
                F.expr("replace(pair, '||', '')").alias("_rep"),
            )
        )
        nxt = engine_cache(
            cur.crossJoin(F.broadcast(b.select("pair", "_rep")))
            .withColumn("s", F.expr("replace(s, pair, _rep)"))
            .select("word", "wf", "s")
        )
        nxt.count()  # vocab-sized materialization; also fills b's cache
        if cur is not vocab:
            cur.unpersist()
        merges.append(b.select("step", "pair", "freq"))
        cur = nxt
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def duck_bpe_train_sql(n_merges: int) -> str:
    """DuckDB twin of `bpe_train_n`: the trainer rounds unrolled as nested
    CTEs (generated, not hand-written — the SQL is the same round block
    repeated over the previous round's rewritten vocabulary)."""
    parts = [
        """w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, count(*) AS wf,
         '|' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)), '||') || '|' AS s
  FROM w WHERE word <> '' AND NOT contains(word, '|')
  GROUP BY word
)"""
    ]
    prev = "vocab"
    for i in range(1, n_merges + 1):
        parts.append(
            f"""pf{i} AS (
  SELECT pair, sum(wf)::BIGINT AS freq FROM (
    SELECT wf, unnest(list_transform(range(1, len(a)),
             i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
    FROM (SELECT wf, string_split(trim(s, '|'), '||') AS a FROM {prev})
  ) GROUP BY pair
),
b{i} AS (SELECT {i} AS step, pair, freq, replace(pair, '||', '') AS r
       FROM pf{i} ORDER BY freq DESC, pair ASC LIMIT 1),
v{i} AS (SELECT word, wf, replace(s, b{i}.pair, b{i}.r) AS s
       FROM {prev} CROSS JOIN b{i})"""
        )
        prev = f"v{i}"
    union = "\nUNION ALL\n".join(
        f"SELECT step, pair, freq FROM b{i}" for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


BPE_TRAIN_N = 4  # registered depth: enough rounds that merges 3/4 depend on
#                  rewritten (multi-char) symbols, i.e. the loop carry is real


@register(
    "q_bpe_train4",
    oracle=duck_bpe_train_sql(BPE_TRAIN_N),
    tags=("bpe", "text", "northstar"),
)
def q_bpe_train4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four BPE trainer rounds as one declarative program: per-round
    broadcast argmax, vocab-sized rewrites, no per-merge driver collect —
    pytest-pinned equal to the sequential `bpe_train` merge list."""
    return bpe_train_n(read_table(spark, sf_dir, "documents"), BPE_TRAIN_N)


# ---------------------------------------------------------------------------
# Applying the learned merges back to the corpus: per-doc token accounting
# ---------------------------------------------------------------------------


def bpe_tokenize2(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) — the corpus re-tokenized under the
    two-merge vocabulary from `bpe_two_merges`: every word carries the
    symbol count of its post-merge segmentation; documents sum their words.

    Shape: merges apply per word TYPE, so the expensive rewrite runs on the
    vocab relation once; the corpus then meets the (word -> n_sub) table in
    a broadcast equi-join (Heaps' law keeps the vocab broadcastable far
    beyond this fixture; past that point the same plan ships as a plain
    shuffle join on word — the accounting is unchanged). One corpus explode
    + one doc_id agg; no per-document merge computation anywhere.
    """
    seg = bpe_two_merges(docs).select(
        "word",
        (
            F.size(F.expr(r"split(trim(BOTH '|' FROM sym_after), '\\|\\|')"))
        ).alias("n_sub"),
    )
    toks = fan_out_docs(docs)
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
        )
    )


def fan_out_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, word) corpus token stream (the same filter contract as
    word_vocab, so the join back is total)."""
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter((F.col("word") != "") & (~F.col("word").contains("|")))


@register(
    "q_bpe_tokenize2",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, count(*) AS wf,
         '|' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)), '||') || '|' AS s
  FROM w WHERE word <> '' AND NOT contains(word, '|')
  GROUP BY word
),
pf1 AS (
  SELECT pair, sum(wf)::BIGINT AS freq FROM (
    SELECT wf, unnest(list_transform(range(1, len(a)),
             i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
    FROM (SELECT wf, string_split(trim(s, '|'), '||') AS a FROM vocab)
  ) GROUP BY pair
),
b1 AS (SELECT pair AS pair1, replace(pair, '||', '') AS r1
       FROM pf1 ORDER BY freq DESC, pair ASC LIMIT 1),
v1 AS (SELECT word, wf, replace(s, pair1, r1) AS s FROM vocab CROSS JOIN b1),
pf2 AS (
  SELECT pair, sum(wf)::BIGINT AS freq FROM (
    SELECT wf, unnest(list_transform(range(1, len(a)),
             i -> '|' || a[i] || '||' || a[i + 1] || '|')) AS pair
    FROM (SELECT wf, string_split(trim(s, '|'), '||') AS a FROM v1)
  ) GROUP BY pair
),
b2 AS (SELECT pair AS pair2, replace(pair, '||', '') AS r2
       FROM pf2 ORDER BY freq DESC, pair ASC LIMIT 1),
seg AS (
  SELECT word,
         len(string_split(trim(replace(s, pair2, r2), '|'), '||')) AS n_sub
  FROM v1 CROSS JOIN b2
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT doc_id, count(*) AS n_words, sum(n_sub)::BIGINT AS n_bpe_tokens
FROM tok JOIN seg USING (word)
WHERE word <> '' AND NOT contains(word, '|')
GROUP BY doc_id
""",
    tags=("bpe", "text", "northstar"),
)
def q_bpe_tokenize2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_tokenize2(read_table(spark, sf_dir, "documents"))
