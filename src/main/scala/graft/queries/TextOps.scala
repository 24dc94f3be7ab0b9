package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.queries.TextPrimitives._

/**
 * Text-analysis operators over the `documents` table: token counting,
 * quality scoring, language-ID heuristic, document fingerprinting.
 *
 * All of these are per-row array/scalar expressions — fully codegen'd, no
 * UDFs, no shuffles except the final presentation sort. At 100 TB this is
 * a pure map stage that scales linearly with input splits.
 *
 * Determinism: integer counts are exact; ratios are a single double
 * division of exact ints (bit-identical across engines); fingerprints use
 * order-independent folds (min / xor) so engine-internal list ordering
 * can't matter.
 */
object TextOps {

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  // ------------------------------------------------------------ text stats
  /** Per-document token counts + quality signals. */
  def qTextStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = tokens(col("text"))
    val nTok = size(toks).cast(LongType)
    val charSum = aggregate(transform(toks, t => length(t).cast(LongType)),
      lit(0L), (a, x) => a + x)
    val stopCnt = size(filter(toks,
      t => t.isin(StopWords.map(_.asInstanceOf[Any]): _*))).cast(LongType)
    val longCnt = size(filter(toks, t => length(t) >= 6)).cast(LongType)
    docs.select(
      col("doc_id"),
      col("lang"),
      nTok.as("n_tokens"),
      length(col("text")).cast(LongType).as("n_chars_measured"),
      charSum.as("sum_token_chars"),
      (charSum.cast(DoubleType) / nTok.cast(DoubleType)).as("avg_token_len"),
      stopCnt.as("n_stopwords"),
      (stopCnt.cast(DoubleType) / nTok.cast(DoubleType)).as("stopword_ratio"),
      (longCnt.cast(DoubleType) / nTok.cast(DoubleType)).as("long_token_ratio"))
      .orderBy(col("doc_id"))
  }

  val qTextStatsSql: String = {
    val toks = sqlTokens("text")
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang,
       | len($toks) AS n_tokens,
       | CAST(length(text) AS BIGINT) AS n_chars_measured,
       | CAST(list_sum(list_transform($toks, t -> CAST(len(t) AS BIGINT))) AS BIGINT) AS sum_token_chars,
       | CAST(list_sum(list_transform($toks, t -> CAST(len(t) AS BIGINT))) AS DOUBLE)
       |   / CAST(len($toks) AS DOUBLE) AS avg_token_len,
       | CAST(len(list_filter($toks, t -> list_contains($stopList, t))) AS BIGINT) AS n_stopwords,
       | CAST(len(list_filter($toks, t -> list_contains($stopList, t))) AS DOUBLE)
       |   / CAST(len($toks) AS DOUBLE) AS stopword_ratio,
       | CAST(len(list_filter($toks, t -> len(t) >= 6)) AS DOUBLE)
       |   / CAST(len($toks) AS DOUBLE) AS long_token_ratio
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- lang id
  /** Marker-token language-ID heuristic + aggregate confusion counts.
    * Deterministic argmax with a fixed tie-break order. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of"),
    "es" -> Seq("el", "la", "los", "es"),
    "de" -> Seq("der", "die", "und", "ist"),
    "zh" -> Seq("de", "shi", "le", "zai"))

  def qLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // Argmax with tie-break = declaration order, same semantics as the
    // original strictly-greater when-chain fold — but that fold embedded
    // each score expression ~2^k times and every copy re-ran
    // split+filter (higher-order functions are CodegenFallback, so no
    // CSE rescued it): ~0.89 s/pass, 20x its text-family siblings.
    // Instead: tokenize ONCE (its own Project — CollapseProject refuses
    // to inline a non-cheap alias used 4x), score each language once
    // into an array, argmax = first position of the max (array_position
    // returns the FIRST hit, which IS the declaration-order tie-break).
    val withToks = docs.select(col("lang"), tokens(col("text")).as("__toks"))
    def score(ws: Seq[String]): Column =
      size(filter(col("__toks"),
        t => t.isin(ws.map(_.asInstanceOf[Any]): _*))).cast(LongType)
    val scoreArr = array(LangMarkers.map { case (_, ws) => score(ws) }: _*)
    val langArr = array(LangMarkers.map { case (l, _) => lit(l) }: _*)
    val pred = coalesce( // null text ⇒ null scores ⇒ head lang, as before
      element_at(langArr,
        array_position(scoreArr, array_max(scoreArr)).cast("int")),
      lit(LangMarkers.head._1))
    withToks.select(col("lang"), pred.as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  val qLangIdSql: String = {
    def score(ws: Seq[String]): String = {
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(${sqlTokens("text")}, t -> list_contains($lst, t))) AS BIGINT)"
    }
    // same strictly-greater fold as the Spark side
    val pred = LangMarkers.tail.foldLeft(
      (score(LangMarkers.head._2), s"'${LangMarkers.head._1}'")) {
      case ((bestScore, bestLang), (l, ws)) =>
        val s = score(ws)
        (s"CASE WHEN $s > $bestScore THEN $s ELSE $bestScore END",
          s"CASE WHEN $s > $bestScore THEN '$l' ELSE $bestLang END")
    }._2
    s"""SELECT lang, $pred AS lang_pred, COUNT(*) AS n_docs
       |FROM documents
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  // --------------------------------------------------------- fingerprint
  /** Per-document fingerprint from 3-token shingle hashes: min-hash and
    * xor-fold (both order-independent), plus shingle cardinality. */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val hs = shingleHashSet(col("text"))
    docs.select(
      col("doc_id"),
      size(hs).cast(LongType).as("n_shingles"),
      array_min(hs).as("fp_min"),
      aggregate(hs, lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor"))
      .orderBy(col("doc_id"))
  }

  val qFingerprintSql: String = {
    val hs = sqlShingleHashes(sqlShingles3(sqlTokens("text")))
    s"""SELECT doc_id,
       | len($hs) AS n_shingles,
       | list_min($hs) AS fp_min,
       | list_reduce($hs, (a, x) -> xor(a, x)) AS fp_xor
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- BPE-ish tokens
  /** BPE-style pre-tokenizer count: letter runs, digit runs, and
    * punctuation runs count as separate tokens (the GPT-2 pre-tokenizer
    * shape, minus lookaheads so the pattern is portable between Java
    * regex and DuckDB's RE2 — the classes are disjoint, so leftmost-first
    * vs leftmost-longest matching agree). Whitespace-token count rides
    * along for the fertility ratio (bpe tokens per word). */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  def qBpeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val bpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
    val ws = size(tokens(col("text")))
    docs.select(col("source"), bpe.cast(LongType).as("n_bpe"),
        ws.cast(LongType).as("n_ws"))
      .groupBy(col("source"))
      .agg(sum(col("n_bpe")).cast(LongType).as("bpe_tokens"),
        sum(col("n_ws")).cast(LongType).as("ws_tokens"),
        (sum(col("n_bpe")).cast(DoubleType) /
          sum(col("n_ws")).cast(DoubleType)).as("fertility"))
      .orderBy(col("source"))
  }

  val qBpeTokensSql: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe,
       |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_ws
       |  FROM documents)
       |SELECT source, CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
       |  CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE) AS fertility
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------ heavy hitters
  /** Exact corpus-level heavy hitters: top 50 tokens by DOCUMENT
    * frequency (stopword/boilerplate discovery). Shape at 100 TB:
    * explode(distinct tokens per doc) → one count shuffle on uniform
    * token keys (partial+final) → a tiny global top-k sort. The exact
    * count is the oracle anchor; a count-min/SpaceSaving variant rides
    * the same plan with a sketch aggregate when exactness can be
    * traded. */
  def qHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    docs
      .select(explode(array_distinct(tokens(col("text")))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(50)
  }

  val qHeavyHittersSql: String =
    s"""SELECT token, COUNT(*) AS doc_freq FROM (
       |  SELECT doc_id, unnest(list_distinct(${sqlTokens("text")})) AS token
       |  FROM documents)
       |WHERE len(token) > 0
       |GROUP BY token
       |ORDER BY doc_freq DESC, token
       |LIMIT 50""".stripMargin

  // ------------------------------------------------------- keyword search
  /** Fixed query terms for the keyword-search operator — chosen from the
    * corpus vocabulary so the query selects data at every SF. */
  val KeywordTerms = Seq("vector", "hash", "filter")

  /** Multi-term keyword search: per-document term frequencies for a fixed
    * query-term set, ranked by (#matched terms, total tf, doc_id), top 20.
    *
    * Scale shape: a pure map stage computes the per-term tf vector from
    * the token array (codegen `filter`/`size`, no explode — the doc never
    * leaves its partition), then `TakeOrdered(20)` — partial top-k on
    * every partition, 20 rows to the driver. Integer ranking keys keep it
    * engine-exact (BM25-style scoring would add floating log/division —
    * the tf/df components computed here are exactly its inputs). */
  def qKeywordTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = tokens(col("text"))
    val tfCols = KeywordTerms.map(t =>
      size(filter(toks, x => x === t)).cast(LongType).as(s"tf_$t"))
    val withTf = docs.select(col("doc_id") +: tfCols: _*)
    val matched = KeywordTerms.map(t =>
      when(col(s"tf_$t") > 0L, 1L).otherwise(0L)).reduce(_ + _)
    val totalTf = KeywordTerms.map(t => col(s"tf_$t")).reduce(_ + _)
    withTf
      .withColumn("matched", matched)
      .withColumn("total_tf", totalTf)
      .filter(col("matched") > 0L)
      .orderBy(col("matched").desc, col("total_tf").desc, col("doc_id"))
      .limit(20)
  }

  val qKeywordTopKSql: String = {
    val tfExprs = KeywordTerms.map(t =>
      s"CAST(len(list_filter(${sqlTokens("text")}, x -> x = '$t')) AS BIGINT) AS tf_$t")
    val matched = KeywordTerms.map(t =>
      s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val total = KeywordTerms.map(t => s"tf_$t").mkString(" + ")
    s"""WITH tf AS (
       |  SELECT doc_id, ${tfExprs.mkString(", ")} FROM documents)
       |SELECT doc_id, ${KeywordTerms.map(t => s"tf_$t").mkString(", ")},
       |  CAST($matched AS BIGINT) AS matched,
       |  CAST($total AS BIGINT) AS total_tf
       |FROM tf
       |WHERE $matched > 0
       |ORDER BY matched DESC, total_tf DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------------ PII scrub
  /** PII REDACTION — the pre-training hygiene pass every large text
    * corpus needs: emails, IPv4 addresses, and long digit runs (phone
    * shapes) replaced with typed placeholders. Pure chained
    * `regexp_replace` (codegen built-ins, zero UDFs) — a map-only stage
    * at 100 TB. The fixture corpus is synthetic and PII-free, so the
    * query PLANTS deterministic PII derived from `doc_id` into the text
    * first and the DuckDB oracle replays the same planting + scrub —
    * the patterns must behave identically in Java regex and RE2 for
    * the hash to match, which is itself part of the pin (portable
    * patterns only). */
  def qPiiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val planted = concat(
      col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com"),
      lit(" host 10.0."), (col("doc_id") % 256).cast("long"), lit(".7"),
      lit(" tel +1555"), (col("doc_id") % 10000 + 1000000).cast("long"))
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(planted,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
          "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
        "\\+\\d{7,15}", "<PHONE>")
    docs.select(
      col("doc_id").cast(LongType).as("doc_id"),
      scrubbed.as("scrubbed"),
      (length(planted) - length(scrubbed)).cast(LongType).as("chars_removed"))
      .filter(col("doc_id") < 500)
      .orderBy(col("doc_id"))
  }

  val qPiiScrubSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |    '@example.com host 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
      |    '.7 tel +1555' || CAST(doc_id % 10000 + 1000000 AS VARCHAR) AS t
      |  FROM documents WHERE doc_id < 500
      |), scrubbed AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |      '\+\d{7,15}', '<PHONE>', 'g') AS s,
      |    t
      |  FROM planted
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, s AS scrubbed,
      |  CAST(length(t) - length(s) AS BIGINT) AS chars_removed
      |FROM scrubbed ORDER BY doc_id""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "text_pii_scrub" -> (qPiiScrub _, qPiiScrubSql),
    "text_stats" -> (qTextStats _, qTextStatsSql),
    "text_lang_id" -> (qLangId _, qLangIdSql),
    "text_fingerprint" -> (qFingerprint _, qFingerprintSql),
    "text_bpe_tokens" -> (qBpeTokens _, qBpeTokensSql),
    "text_heavy_hitters" -> (qHeavyHitters _, qHeavyHittersSql),
    "text_keyword_topk" -> (qKeywordTopK _, qKeywordTopKSql))
}
