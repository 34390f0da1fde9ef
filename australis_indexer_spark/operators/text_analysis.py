"""Text-analysis operators (north-star: BASELINE.json LLM-data-pipeline ops).

Language-ID (stopword-vote heuristic), quality/stats scoring, token counting
(whitespace + BPE-ish estimate), and document fingerprinting over the
`documents` table. Everything is built-in `pyspark.sql.functions` — string
ops stay inside whole-stage codegen; no Python in the row path.

Determinism: ratios are single integer/integer divisions (one IEEE op —
identical in DuckDB); token pipelines use space-split semantics that match
`string_split` exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import op
from ..sources.batch import load_table as lt

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ein", "ist"),
    "es": ("el", "los", "y", "que", "un", "es"),
    "fr": ("le", "les", "et", "des", "une", "est"),
}


def _toks(col: str = "text") -> Column:
    return F.split(col, " ")


def _n_in_list(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def _sql_n_in_list(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({lst}))) AS BIGINT)"


@op(
    "text_stats_quality",
    tags=("northstar", "text"),
    oracle=f"""
SELECT doc_id,
       n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
       (LENGTH(replace(text, ' ', '')) / len(string_split(text, ' '))) AS avg_token_len,
       ({_sql_n_in_list(STOPWORDS['en'])} / CAST(len(string_split(text, ' ')) AS BIGINT))
         AS stopword_ratio,
       (len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))
         AS uniq_ratio
FROM documents
""",
)
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/diversity ratios per document — the
    standard pre-training quality gates (length, stopword density, repetition)
    as pure narrow projections; no shuffle at any scale."""
    toks = _toks()
    n_tokens = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    return lt(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_tokens).alias("avg_token_len"),
        (_n_in_list(toks, STOPWORDS["en"]) / n_tokens).alias("stopword_ratio"),
        (n_uniq / n_tokens).alias("uniq_ratio"),
    )


_LANG_CASE_SQL = f"""
CASE WHEN {_sql_n_in_list(STOPWORDS['en'])} >= greatest({_sql_n_in_list(STOPWORDS['de'])}, {_sql_n_in_list(STOPWORDS['es'])}, {_sql_n_in_list(STOPWORDS['fr'])}) THEN 'en'
     WHEN {_sql_n_in_list(STOPWORDS['de'])} >= greatest({_sql_n_in_list(STOPWORDS['es'])}, {_sql_n_in_list(STOPWORDS['fr'])}) THEN 'de'
     WHEN {_sql_n_in_list(STOPWORDS['es'])} >= {_sql_n_in_list(STOPWORDS['fr'])} THEN 'es'
     ELSE 'fr' END
"""


@op(
    "text_lang_id",
    tags=("northstar", "text"),
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       {_sql_n_in_list(STOPWORDS['en'])} AS score_en,
       {_sql_n_in_list(STOPWORDS['de'])} AS score_de,
       {_sql_n_in_list(STOPWORDS['es'])} AS score_es,
       {_sql_n_in_list(STOPWORDS['fr'])} AS score_fr,
       {_LANG_CASE_SQL} AS predicted_lang
FROM documents
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword votes, argmax with a
    fixed priority tie-break (en>de>es>fr). A real deployment swaps the word
    lists for char-n-gram profiles; the operator shape (narrow projection,
    argmax over k scores) is identical."""
    toks = _toks()
    scores = {lang: _n_in_list(toks, ws) for lang, ws in STOPWORDS.items()}
    pred = (
        F.when(
            (scores["en"] >= F.greatest(scores["de"], scores["es"], scores["fr"])), "en"
        )
        .when(scores["de"] >= F.greatest(scores["es"], scores["fr"]), "de")
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    return lt(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["es"].alias("score_es"),
        scores["fr"].alias("score_fr"),
        pred.alias("predicted_lang"),
    )


@op(
    "text_fingerprint",
    tags=("northstar", "text"),
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
         AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the canonical-form content key used for cross-snapshot identity
    (exact-dedup's portable cousin).

    The whitespace class is pinned EXPLICITLY as [ \\t\\n\\r\\f\\x0B] on both
    engines: Java's \\s includes vertical tab where RE2's (DuckDB's) does
    not, so a bare \\s+ fingerprint silently disagrees across engines on
    the first \\x0B a scraped page serves (fuzz edge:250, 430/575 docs)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+", " "))
    return lt(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


@op(
    "text_token_count",
    tags=("northstar", "text"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_bpe_est,
       CAST(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha_chars
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, a BPE-ish chars/4 estimate (the
    standard budget heuristic), and alpha-only char count via regex."""
    return lt(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_toks()).cast("long").alias("n_ws_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_bpe_est"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias("n_alpha_chars"),
    )


_BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


@op(
    "text_regex_tokenize",
    tags=("northstar", "text"),
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
FROM documents
""",
)
def text_regex_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex tokenization (GPT-2-pattern shape: letter runs, digit
    runs, punctuation runs, each with optional leading space) — the real
    pre-tokenizer pass, vs the chars/4 budget estimate in text_token_count.
    Pure regexp_extract_all, JVM-side, narrow."""
    return lt(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)"))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(_toks()).cast("long").alias("n_ws_tokens"),
    )


@op(
    "text_top_terms",
    tags=("northstar", "text"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token)
SELECT doc_id, token, tf, df FROM (
  SELECT doc_id, token, tf, df,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, df ASC, token) AS r
  FROM tf JOIN df USING (token)
) WHERE r <= 3
""",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document: rank by term frequency
    descending, document frequency ascending (the TF-IDF ordering expressed
    on exact integers — no float idf in the output, so the oracle is
    ulp-proof). Scale shape: one tokenize explode, one (doc,token) agg, one
    broadcast-able token->df join, one per-doc ranking window."""
    tok = lt(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_toks()).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token")
    )
    return (
        tf.join(df, "token")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .select("doc_id", "token", "tf", "df")
    )


@op(
    "text_inverted_index",
    tags=("northstar", "text", "index"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
occ AS (
  SELECT token, doc_id, COUNT(*) AS n FROM tok GROUP BY token, doc_id
),
idx AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS doc_freq,
         CAST(SUM(n) AS BIGINT) AS coll_freq,
         array_to_string(list_sort(list(doc_id))[1:8], ',') AS postings_head
  FROM occ GROUP BY token
)
SELECT token, doc_freq, coll_freq, postings_head
FROM idx ORDER BY coll_freq DESC, token LIMIT 500
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the search-engine core an *indexer* owes its
    name to: token -> document frequency, collection frequency, and the
    head of the ascending-doc_id posting list (first 8 ids, comma-joined so
    the column is a plain string on both engines). Output is the 500
    hottest terms by collection frequency, token-tiebroken so the LIMIT cut
    is deterministic.

    Scale shape: tokenize is a narrow explode; the (token, doc_id)
    occurrence count map-side combines before its one shuffle; the per-token
    rollup reuses the same token key (Catalyst plans it as a second partial
    agg, no wider than the vocabulary); the final top-500 compiles to
    TakeOrderedAndProject — no global sort. Posting lists are truncated to a
    fixed head so a stop-word's row can't balloon; a full 100 TB posting
    store would instead range-bucket by (token, doc_id) — that layout is
    exactly what sink_clustered_stats demonstrates.
    """
    tok = lt(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_toks()).alias("token")
    )
    occ = tok.groupBy("token", "doc_id").agg(F.count("*").alias("n"))
    idx = occ.groupBy("token").agg(
        F.count("*").alias("doc_freq"),
        F.sum("n").alias("coll_freq"),
        F.expr(
            "array_join(transform(slice(sort_array(collect_list(doc_id)), 1, 8),"
            " x -> CAST(x AS STRING)), ',')"
        ).alias("postings_head"),
    )
    return idx.orderBy(F.col("coll_freq").desc(), "token").limit(500)


_BQ_MUST = ("data", "hash")
_BQ_NOT = "batch"

_BOOL_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE list_contains(string_split(text, ' '), '{_BQ_MUST[0]}')
  AND list_contains(string_split(text, ' '), '{_BQ_MUST[1]}')
  AND NOT list_contains(string_split(text, ' '), '{_BQ_NOT}')
"""


@op("text_boolean_search", tags=("northstar", "text", "index"), oracle=_BOOL_ORACLE)
def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval ('{m0} AND {m1} AND NOT {n0}') — the query side of
    the inverted index: evaluated here as a map-only array-containment scan
    (split + array_contains, all JVM codegen, zero shuffles — the plan you
    run when you DON'T have an index). The served-index form is the same
    query as posting-list semi-joins against text_inverted_index's
    (token, doc_id) table: one semi-join per MUST term and an anti-join for
    the NOT term, all riding the doc_id key — worth it once the corpus is
    re-read per query; the scan form wins for one-shot batch filters. The
    oracle proves term-membership semantics exactly."""
    docs = lt(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pred = (
        F.array_contains(toks, _BQ_MUST[0])
        & F.array_contains(toks, _BQ_MUST[1])
        & ~F.array_contains(toks, _BQ_NOT)
    )
    return docs.where(pred).select("doc_id", "lang", "n_chars")


text_boolean_search.__doc__ = (
    text_boolean_search.__doc__
    .replace("{m0}", _BQ_MUST[0])
    .replace("{m1}", _BQ_MUST[1])
    .replace("{n0}", _BQ_NOT)
)


_COOC_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
pairs AS (
  SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS n_docs_both
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
),
df AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token)
SELECT token_a, token_b, n_docs_both,
       da.df AS df_a, db.df AS df_b,
       CAST((n_docs_both * 1000000)
            // CAST(LEAST(da.df, db.df) AS BIGINT) AS BIGINT)
         AS containment_ppm
FROM pairs
JOIN df da ON da.token = token_a
JOIN df db ON db.token = token_b
ORDER BY n_docs_both DESC, token_a, token_b
LIMIT 100
"""


@op("text_cooccurrence_pairs", tags=("northstar", "text"), oracle=_COOC_ORACLE)
def text_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence statistics — the raw counts behind PMI /
    collocation scoring and word-association features: for the top-100
    document-level token pairs, the co-document count, each token's
    document frequency, and integer-ppm containment (n_both / min df — the
    association strength that, unlike a float PMI log, stays exact across
    engines).

    Scale shape: the per-doc DISTINCT prunes repeated tokens BEFORE the
    within-doc self-join, so pair generation is sum over docs of
    (distinct-tokens choose 2) — bounded by capping tokens per doc (the
    chunking op's job), never |vocab|²; the pair count map-side combines,
    df joins are vocabulary-sized, and the top-100 compiles to
    TakeOrderedAndProject with a full tie-break."""
    toks = (
        lt(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    a = toks.select("doc_id", F.col("token").alias("token_a"))
    b = toks.select("doc_id", F.col("token").alias("token_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count("*").alias("n_docs_both"))
    )
    df = toks.groupBy("token").agg(F.count("*").alias("df"))
    da = df.select(F.col("token").alias("token_a"), F.col("df").alias("df_a"))
    db = df.select(F.col("token").alias("token_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "token_a")
        .join(F.broadcast(db), "token_b")
        .select(
            "token_a",
            "token_b",
            "n_docs_both",
            "df_a",
            "df_b",
            F.expr("(n_docs_both * 1000000) div LEAST(df_a, df_b)").alias(
                "containment_ppm"
            ),
        )
        .orderBy(F.col("n_docs_both").desc(), "token_a", "token_b")
        .limit(100)
    )


_INDEX_BUILD_ORACLE = r"""
WITH norm AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS t
  FROM documents
),
tok AS (SELECT doc_id, lang, unnest(string_split(t, ' ')) AS token FROM norm),
idx AS (
  SELECT lang, token,
         COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
  FROM tok GROUP BY lang, token
),
rolled AS (
  SELECT lang,
         COUNT(*) AS vocab_size,
         CAST(SUM(df) AS BIGINT) AS total_postings,
         CAST(SUM(cf) AS BIGINT) AS total_tokens,
         MAX(struct_pack(c := cf, t := token)) AS top
  FROM idx GROUP BY lang
)
SELECT lang, vocab_size, total_postings, total_tokens,
       top.t AS top_token, top.c AS top_token_cf
FROM rolled
"""


@op("pipeline_index_build", tags=("northstar", "text", "index", "pipeline"), oracle=_INDEX_BUILD_ORACLE)
def pipeline_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full index-construction pipeline as ONE Catalyst plan —
    normalize (lowercase, whitespace collapse) → tokenize → per-language
    inverted-index aggregate → per-language index manifest (vocabulary
    size, total posting entries, total token occurrences, and the hottest
    term via struct-MAX argmax). The per-shard twin of what
    text_inverted_index emits per-token: this is the summary a search
    cluster's shard-placement planner consumes.

    Scale shape: normalization and tokenization are narrow maps feeding
    the ONE (lang, token) shuffle (map-side combined; DISTINCT doc count
    planned as partial aggregation); the manifest rollup rides the lang
    key and the argmax is the windowless struct-MAX. Nothing in the plan
    materializes intermediate state — the optimizer sees the whole chain."""
    norm = lt(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        # explicit whitespace class — Java \s vs RE2 \s diverge on \x0B
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+", " ")).alias("t"),
    )
    tok = norm.select("doc_id", "lang", F.explode(F.split("t", " ")).alias("token"))
    idx = tok.groupBy("lang", "token").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )
    rolled = idx.groupBy("lang").agg(
        F.count("*").alias("vocab_size"),
        F.sum("df").alias("total_postings"),
        F.sum("cf").alias("total_tokens"),
        F.max(F.struct(F.col("cf").alias("c"), F.col("token").alias("t"))).alias(
            "top"
        ),
    )
    return rolled.select(
        "lang",
        "vocab_size",
        "total_postings",
        "total_tokens",
        F.col("top.t").alias("top_token"),
        F.col("top.c").alias("top_token_cf"),
    )


_LANGID_QUALITY_ORACLE = f"""
WITH scored AS (
  SELECT lang AS true_lang, {_LANG_CASE_SQL} AS predicted_lang
  FROM documents
)
SELECT true_lang, predicted_lang,
       COUNT(*) AS n_docs,
       CAST((COUNT(*) * 1000000)
            // CAST(SUM(COUNT(*)) OVER (PARTITION BY true_lang) AS BIGINT)
            AS BIGINT) AS row_share_ppm
FROM scored
GROUP BY true_lang, predicted_lang
"""


@op("text_langid_quality", tags=("northstar", "text", "quality"), oracle=_LANGID_QUALITY_ORACLE)
def text_langid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the language-ID heuristic against the corpus's
    true labels — the measured quality gate for the classifier family
    (per-(true, predicted) doc counts plus integer-ppm row-normalized
    shares, so per-language accuracy is the diagonal's share): a stopword
    list that drifts or a tie-break that flips shows up as off-diagonal
    mass in a value-checked table, the same drift-fails-loudly principle
    as dedup_minhash_quality and sim_ann_recall. One aggregate to at most
    |langs|² rows; the share window runs on that tiny table."""
    toks = _toks()
    scores = {lang: _n_in_list(toks, ws) for lang, ws in STOPWORDS.items()}
    pred = (
        F.when(
            (scores["en"] >= F.greatest(scores["de"], scores["es"], scores["fr"])),
            "en",
        )
        .when(scores["de"] >= F.greatest(scores["es"], scores["fr"]), "de")
        .when(scores["es"] >= scores["fr"], "es")
        .otherwise("fr")
    )
    from pyspark.sql import Window as W

    scored = lt(spark, sf_dir, "documents").select(
        F.col("lang").alias("true_lang"), pred.alias("predicted_lang")
    )
    counts = scored.groupBy("true_lang", "predicted_lang").agg(
        F.count("*").alias("n_docs")
    )
    return counts.select(
        "true_lang",
        "predicted_lang",
        "n_docs",
        F.expr(
            "(n_docs * 1000000) div SUM(n_docs) OVER (PARTITION BY true_lang)"
        ).alias("row_share_ppm"),
    )


_TFIDF_K = 5

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST((n.n_docs * 1000000) // df.df AS BIGINT) AS idf_ratio_ppm,
         tf.tf * CAST((n.n_docs * 1000000) // df.df AS BIGINT) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
) WHERE rk <= {_TFIDF_K}
"""


@op("text_tfidf_topterms", tags=("northstar", "text"), oracle=_TFIDF_ORACLE)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 terms by tf·idf weighting with the idf kept an
    EXACT integer — idf_ratio_ppm = (N·10⁶) div df, the rarity ratio in
    parts-per-million instead of the usual log(N/df) double (same ranking
    for fixed tf since x ↦ log x is monotone; and engine-exact, which a
    cross-engine log never is). This is the per-doc keyword view on top
    of text_top_terms' corpus view and the weighting text_boolean_search
    ranks with.

    Scale shape: ONE shuffle on (doc, term) builds tf with map-side
    combine; df reduces tf to vocabulary size and BROADCASTS back (a
    vocab is small even when the corpus is 100 TB); the per-doc top-5
    window repartitions by doc_id only the tf-sized table. The corpus
    text itself is touched exactly once."""
    from pyspark.sql import Window as W

    docs = lt(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf") * F.expr("(n_docs * 1000000) div df")
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score")
    )


_MARGIN_SQL_SCORES = ", ".join(
    _sql_n_in_list(STOPWORDS[l]) for l in ("en", "de", "es", "fr")
)

_MARGIN_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         list_sort([{_MARGIN_SQL_SCORES}]) AS s
  FROM documents
)
SELECT doc_id,
       s[4] AS top_score,
       s[3] AS second_score,
       s[4] - s[3] AS margin,
       CASE WHEN s[4] - s[3] <= 1 THEN 'human_review' ELSE 'auto' END
         AS route
FROM scored
"""


@op("text_langid_margin", tags=("northstar", "text", "quality"), oracle=_MARGIN_ORACLE)
def text_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier UNCERTAINTY routing (the active-learning margin rule):
    per document, the top and runner-up language-ID scores and their
    margin — a margin of ≤1 stopword vote means the classifier can't
    really tell, and the document routes to 'human_review' instead of
    auto-labeling. This is the triage step between text_lang_id (the
    prediction) and text_langid_quality (the confusion matrix): the
    matrix tells you WHERE the classifier is weak, the margin tells you
    WHICH documents to send for labels — the budget-bounded way to
    improve a 100 TB corpus's labels. Top-2 selection is an array_sort
    over the four integer vote counts (exact; no float softmax), so the
    route decision is engine-exact.

    Scale shape: narrow map, no shuffle — the router tags documents in
    place at scan speed; downstream, the 'human_review' slice is a
    scan-time filter."""
    toks = _toks()
    scores = F.array_sort(
        F.array(*[_n_in_list(toks, STOPWORDS[l]) for l in ("en", "de", "es", "fr")])
    )
    docs = lt(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(scores, 4).alias("top_score"),
        F.element_at(scores, 3).alias("second_score"),
        (F.element_at(scores, 4) - F.element_at(scores, 3)).alias("margin"),
        F.when(
            F.element_at(scores, 4) - F.element_at(scores, 3) <= 1, "human_review"
        )
        .otherwise("auto")
        .alias("route"),
    )


_FERT_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS BIGINT)
         AS total_bpe_tokens,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST((SUM(len(regexp_extract_all(text, '{_BPE_PATTERN}'))) * 1000000)
            // SUM(len(string_split(text, ' '))) AS BIGINT)
         AS fertility_ppm
FROM documents
GROUP BY lang
"""


@op("text_tokenizer_fertility", tags=("northstar", "text"), oracle=_FERT_ORACLE)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — BPE-ish tokens per whitespace
    word in exact ppm — the number that decides whether a tokenizer is
    fair to a language (high fertility = more tokens per word = higher
    cost and shorter effective context for that language's users; the
    standard multilingual-tokenizer audit). Reuses text_regex_tokenize's
    GPT-2-shaped pre-tokenizer pattern, aggregated per lang instead of
    per doc, with the ratio in floor-division ppm so the audit is
    engine-exact.

    Scale shape: narrow regexp counting inside the scan projection, one
    combine-friendly rollup to |langs| rows."""
    docs = lt(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)).cast(
        "long"
    )
    ws = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(bpe).alias("total_bpe_tokens"),
        F.sum(ws).alias("total_ws_tokens"),
        F.expr(
            f"(SUM(CAST(size(regexp_extract_all(text, '{_BPE_PATTERN}', 0)) AS BIGINT))"
            " * 1000000)"
            " div SUM(CAST(size(split(text, ' ')) AS BIGINT))"
        ).alias("fertility_ppm"),
    )


_NOVELTY_GRAM = 5

_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(w[g.i:g.i + {_NOVELTY_GRAM - 1}], ' ') AS gram
  FROM toks,
  LATERAL (SELECT UNNEST(range(1, len(w) - {_NOVELTY_GRAM - 2})) AS i) g
  WHERE len(w) >= {_NOVELTY_GRAM}
),
firsts AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM sh GROUP BY gram
)
SELECT s.source,
       COUNT(*) AS total_grams,
       CAST(SUM(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_grams,
       CAST((SUM(CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS novelty_ppm
FROM sh s JOIN firsts f ON s.gram = f.gram
GROUP BY s.source
"""


@op("text_novelty_by_source", tags=("northstar", "text", "quality"), oracle=_NOVELTY_ORACLE)
def text_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY accounting per source: of each source's distinct
    word 5-grams (per doc), how many are FIRST seen in that document
    (global first occurrence = min doc_id) — the diversity-vs-redundancy
    number a data buyer reads before paying for another crawl of the
    same content (a source whose novelty_ppm collapses is re-serving
    what the corpus already has; cf. dedup_boilerplate_ngrams for the
    pathological tail of the same distribution). Exact integer ppm.

    Scale shape: the shingle explode is narrow; first-occurrence is the
    MIN-reduction of the exact-dedup family (combine-friendly, shuffles
    (gram, doc) pairs once); the membership join rides the same gram
    hash partitioning; the rollup is |sources| rows. At 100 TB the
    firsts table is the corpus's global n-gram registry — the artifact
    incremental novelty scoring of NEW batches joins against."""
    docs = lt(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    ).where(F.size("w") >= _NOVELTY_GRAM)
    sh = (
        toks.select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(1), F.size("w") - (_NOVELTY_GRAM - 1))
            ).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "source",
            F.array_join(F.slice("w", F.col("i"), _NOVELTY_GRAM), " ").alias(
                "gram"
            ),
        )
        .distinct()
    )
    firsts = sh.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    j = sh.join(firsts, "gram")
    return j.groupBy("source").agg(
        F.count("*").alias("total_grams"),
        F.sum(
            F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
        ).alias("novel_grams"),
        F.expr(
            "CAST((SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)"
            " * 1000000) div COUNT(*) AS BIGINT)"
        ).alias("novelty_ppm"),
    )
