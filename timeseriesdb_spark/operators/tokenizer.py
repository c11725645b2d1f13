"""BPE tokenizer training over the documents corpus — the missing
piece between token-count proxies (q_token_count / q_regex_tokens)
and a real training-data pipeline: learn the merge table itself.

Scale architecture (how industrial BPE trainers shard): the ONLY
corpus-sized pass is the distributed word-frequency count (one
groupBy over exploded tokens — at 100 TB this is the same shuffle as
q_vocab_topk). The merge-learning loop then runs on the BOUNDED
word-frequency table (top BPE_MAX_VOCAB words — a few MB regardless
of corpus size), because BPE statistics are fully determined by
(word, freq) pairs, not by token positions. Collecting a bounded,
frequency-capped vocabulary is the legitimate driver-side step; the
anti-pattern the 100 TB rule forbids is collecting corpus-sized data.

Determinism: ties in pair frequency break lexicographically, the
vocab cap breaks ties by (freq DESC, word ASC), so the merge table is
identical on any cluster at any parallelism. Because every step is
pure integer/string arithmetic, BOTH queries are oracle-checked: the
argmax-per-level recursion unrolls into BPE_MERGES generated SQL
stages (each merge round = one gaps-and-islands pass selecting
even-offset matches within runs — DuckDB replays the kernel exactly;
MATERIALIZED CTEs, else the 20-deep multi-reference chain explodes
under CTE inlining). pytest additionally pins the kernel on the
classic low/lower/newest/widest corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesdb_spark.tables import load_table

BPE_MERGES = 20        # merge-table size to learn
BPE_MAX_VOCAB = 10000  # bounded word-frequency table (driver cap)
END_OF_WORD = "</w>"


def learn_bpe_merges(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The merge-learning kernel: standard BPE on a (word, freq)
    table. Each word is a symbol sequence (chars + end-of-word
    marker); per round, count adjacent symbol pairs weighted by word
    freq, merge the most frequent pair (ties → lexicographically
    smallest) left-to-right non-overlapping in every word. Returns
    (rank, left, right, pair_count) rows."""
    seqs: dict[tuple[str, ...], int] = {}
    for w, freq in vocab:
        key = tuple(w) + (END_OF_WORD,)
        seqs[key] = seqs.get(key, 0) + freq
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, freq in seqs.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] += freq
        if not counts:
            break
        best_n = max(counts.values())
        a, b = min(p for p, c in counts.items() if c == best_n)
        merged = a + b
        new_seqs: dict[tuple[str, ...], int] = {}
        for syms, freq in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + freq
        seqs = new_seqs
        merges.append((rank, a, b, best_n))
    return merges


def corpus_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """Shared driver-side derivation both BPE queries use: distributed
    word-frequency count → bounded-vocab collect (the documented
    legitimate collect) → learn_bpe_merges. One definition, so the
    trainer's merge table and the encoder's can never drift."""
    doc = load_table(spark, sf_dir, "documents")
    vocab_rows = (
        doc.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(BPE_MAX_VOCAB)
        .collect()
    )
    return learn_bpe_merges(
        [(r["w"], r["freq"]) for r in vocab_rows], BPE_MERGES
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGES merges from the corpus: distributed
    word-frequency count, bounded-vocab collect, driver-side merge
    loop (see module docstring for why that split IS the scale
    design)."""
    return spark.createDataFrame(
        corpus_merges(spark, sf_dir),
        "rank int, left string, right string, pair_count bigint",
    )


def make_word_encoder(merges: list[tuple[str, str]]):
    """Build the one BPE apply kernel both the module-level
    ``apply_bpe`` (what pytest pins) and the distributed encoder's
    executor closure use: start from chars + end-of-word marker, apply
    merges in RANK ORDER (the BPE apply contract — rank order, not
    greedy-longest), each left-to-right non-overlapping. Deterministic
    for any input.

    Returned as a NESTED function on purpose: cloudpickle serializes
    nested functions by value (module-level ones only by reference),
    so the executor closure carries the kernel itself and never needs
    `timeseriesdb_spark` importable on a vanilla driver's workers."""
    eow = END_OF_WORD

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [eow]
        for a, b in merges:
            if len(syms) < 2:
                break
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return encode_word


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a learned merge table (delegates to the
    shared make_word_encoder kernel)."""
    return make_word_encoder(merges)(word)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed tokenizer APPLY — the other half of the BPE story:
    encode every document with the corpus-learned merge table and emit
    per-doc token accounting (word count, BPE token count, char count,
    and the chars-per-token ratio a data pipeline budgets with — in
    half-up-rounded integer millionths, so the column is engine-exact
    and the whole query hash-checks against the DuckDB replay).

    Scale: the merge table is the bounded object (a few KB–MB even at
    a production vocab) and ships inside the closure; documents stream
    through mapInPandas in Arrow batches — one corpus pass, zero
    shuffles. Per-batch encoding memoizes distinct words (Zipf makes
    the cache hit rate high), so cost is ~O(distinct words per batch ×
    merge ranks). Oracle-checked (see module docstring); pytest pins
    the apply kernel against the training kernel (encoding the
    training corpus with the learned table reproduces the trainer's
    final symbol sequences) and the round-trip property (concat of a
    word's tokens == word + marker)."""
    from collections.abc import Iterator

    import pandas as pd

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [(a, b) for _, a, b, _ in corpus_merges(spark, sf_dir)]
    # the SAME kernel the pytest parity suite pins via apply_bpe — a
    # nested function, so it ships by value inside the closure
    encode_word = make_word_encoder(merges)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(encode_word(word))
                cache[word] = n
            return n

        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "n_tokens": [], "n_chars": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in text.split(" ") if w]
                toks = sum(n_tokens(w) for w in words)
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_tokens"].append(toks)
                out["n_chars"].append(sum(len(w) for w in words))
            yield pd.DataFrame(out)

    return doc.mapInPandas(
        encode, "doc_id bigint, n_words bigint, n_tokens bigint, n_chars bigint"
    ).select(
        "doc_id",
        "n_words",
        "n_tokens",
        "n_chars",
        # half-up chars/token in integer millionths: pure bigint
        # arithmetic, bit-identical in any engine (no float rounding)
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                "(2 * n_chars * 1000000 + n_tokens) div (2 * n_tokens)"
            ),
        ).alias("cpt_micros"),
    )


def _sym_init_sql(src_expr: str, out: str, freq_expr: str) -> str:
    """CTE turning a word column into (w, syms, freq): chars + the
    end-of-word marker as a list — the kernel's initial state."""
    return f"""
    {out} AS MATERIALIZED (
        SELECT w,
               list_append(
                   list_transform(generate_series(1, length(w)),
                                  i -> substr(w, i, 1)),
                   '{END_OF_WORD}') AS syms,
               {freq_expr} AS freq
        FROM {src_expr}
    )"""


def _merge_stage_sql(src: str, best: str, out: str) -> str:
    """One left-to-right non-overlapping merge of pair `best` applied
    to every (w, syms, freq) row of `src` → `out`. Greedy LTR == keep
    match positions at even offsets within each island of consecutive
    match positions (gaps-and-islands over the match-position list) —
    exactly the while-loop in learn_bpe_merges / make_word_encoder."""
    return f"""
    m_{out} AS MATERIALIZED (
        SELECT w, unnest(mpos) AS i,
               unnest(generate_series(1, len(mpos))) AS k
        FROM (
            SELECT s.w,
                   list_filter(generate_series(1, len(s.syms) - 1),
                               j -> s.syms[j] = b.l AND s.syms[j+1] = b.r2)
                       AS mpos
            FROM {src} s, {best} b
        )
    ),
    k_{out} AS MATERIALIZED (
        SELECT w, list(i ORDER BY i) AS kept
        FROM (
            SELECT w, i,
                   min(i) OVER (PARTITION BY w, i - k) AS run_start
            FROM m_{out}
        )
        WHERE (i - run_start) % 2 = 0
        GROUP BY w
    ),
    {out} AS MATERIALIZED (
        SELECT s.w,
               CASE WHEN k.kept IS NULL THEN s.syms ELSE
                   flatten(list_transform(
                       generate_series(1, len(s.syms)),
                       i -> CASE
                           WHEN list_contains(k.kept, i)
                               THEN [b.l || b.r2]
                           WHEN list_contains(k.kept, i - 1) THEN []
                           ELSE [s.syms[i]]
                       END))
               END AS syms,
               s.freq
        FROM {src} s
        CROSS JOIN {best} b
        LEFT JOIN k_{out} k USING (w)
    )"""


def _pair_stage_sql(src: str, r: int) -> str:
    """Count adjacent symbol pairs weighted by freq; b{r} = the argmax
    with the kernel's tie-break (count DESC, then lexicographically
    smallest pair)."""
    return f"""
    p{r} AS MATERIALIZED (
        SELECT l, r2, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (
            SELECT syms[i] AS l, syms[i+1] AS r2, freq
            FROM (
                SELECT syms, freq,
                       unnest(generate_series(1, len(syms) - 1)) AS i
                FROM {src}
            )
        )
        GROUP BY l, r2
    ),
    b{r} AS MATERIALIZED (
        SELECT l, r2, cnt FROM p{r} ORDER BY cnt DESC, l, r2 LIMIT 1)"""


def _train_ctes() -> list[str]:
    """The unrolled trainer: bounded vocab → s0 → (pair count, argmax,
    merge) × BPE_MERGES, yielding merge tables b0..b{n-1}."""
    parts = [
        f"""
    v AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0
        GROUP BY w
        ORDER BY freq DESC, w
        LIMIT {BPE_MAX_VOCAB}
    )""",
        _sym_init_sql("v", "s0", "freq"),
    ]
    for r in range(BPE_MERGES):
        parts.append(_pair_stage_sql(f"s{r}", r))
        if r + 1 < BPE_MERGES:
            parts.append(_merge_stage_sql(f"s{r}", f"b{r}", f"s{r+1}"))
    return parts


def _bpe_merges_oracle() -> str:
    finals = "\n        UNION ALL\n".join(
        f'SELECT {r} AS rank, l AS "left", r2 AS "right",'
        f" cnt AS pair_count FROM b{r}"
        for r in range(BPE_MERGES)
    )
    return "WITH " + ",".join(_train_ctes()) + "\n" + finals


def _bpe_encode_oracle() -> str:
    parts = _train_ctes()
    # apply table: EVERY distinct corpus word, merges applied in rank
    # order (the make_word_encoder contract)
    parts.append(_sym_init_sql(
        """(
            SELECT DISTINCT w
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            WHERE len(w) > 0
        )""",
        "d0",
        "CAST(1 AS BIGINT)",
    ))
    for r in range(BPE_MERGES):
        parts.append(_merge_stage_sql(f"d{r}", f"b{r}", f"d{r+1}"))
    parts.append(f"""
    tok AS MATERIALIZED (
        SELECT w, CAST(len(syms) AS BIGINT) AS n_tok FROM d{BPE_MERGES}
    ),
    acct AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(length(dw.w)) AS BIGINT) AS n_chars
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents) dw
        JOIN tok t USING (w)
        WHERE len(dw.w) > 0
        GROUP BY doc_id
    )""")
    final = """
    SELECT d.doc_id,
           COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.n_chars, 0) AS n_chars,
           CASE WHEN a.n_tokens IS NULL THEN NULL
                ELSE (2 * a.n_chars * 1000000 + a.n_tokens)
                     // (2 * a.n_tokens)
           END AS cpt_micros
    FROM documents d LEFT JOIN acct a USING (doc_id)"""
    return "WITH " + ",".join(parts) + "\n" + final


QUERIES = {
    "q_bpe_merges": q_bpe_merges,
    "q_bpe_encode": q_bpe_encode,
}

ORACLES: dict[str, str] = {
    "q_bpe_merges": _bpe_merges_oracle(),
    "q_bpe_encode": _bpe_encode_oracle(),
}
