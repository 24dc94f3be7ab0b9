package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/**
 * Similarity search over the `embeddings` table (64-dim float vectors).
 *
 * Determinism contract: both engines cast float -> double (exact), then
 * compute dot products as a strict left fold in array order (Spark
 * `aggregate`, DuckDB `list_reduce`) — bit-identical IEEE doubles, so
 * scores, thresholds and rank orders agree exactly with the oracle.
 *
 * Scale design:
 *  - brute-force top-k: the query side is a tiny filtered set, broadcast
 *    against the full corpus — a map-only pass over the big side plus a
 *    per-query top-k (window over qid). At 100 TB the corpus side stays
 *    partition-parallel; no shuffle of the corpus itself.
 *  - sign-LSH: each vector gets a 16-bit bucket from fixed pseudo-random
 *    hyperplanes (constant-size signature, computed in a map stage).
 *    Near-dup candidates come from a bucket-equality join — shuffle on
 *    uniform bucket keys instead of an O(N^2) cross join. This is the
 *    ANN path that survives 1000x data growth.
 */
object Similarity {

  /** Query subset: one in 10 vectors probes the corpus. */
  private val QueryMod = 10

  // ---------------------------------------------------------- primitives

  /** Strict left-fold dot product of two double arrays — the native
    * codegen [[graft.functions.DotProduct]] (no per-row array allocation),
    * bit-identical to `aggregate(zip_with(_*_), 0.0, _+_)`. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotp(a, b)

  private def toDouble(c: Column): Column = c.cast("array<double>")

  /** DuckDB twin of [[dot]]: zip + transform + sequential reduce. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       | p -> p[1] * p[2]), (acc, v) -> acc + v)"""
      .stripMargin.replaceAll("\n", " ")

  // ----------------------------------------------------- brute-force topk
  /** Exact cosine top-5 neighbors for each query vector (qid % 10 == 0). */
  def qBruteForceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    // norms precomputed once per vector (not once per PAIR): the factored
    // cosine dot/(qn*nn) multiplies the same IEEE doubles, so results stay
    // bit-identical to the unfactored oracle form
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val queries = emb.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val joined = broadcast(queries).crossJoin(
        emb.select(col("vec_id").as("nid"), col("v").as("nv"),
          col("nrm").as("nn")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("rank"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val qBruteForceTopKSql: String = {
    val d = sqlDot("q.v", "n.v")
    val nq = sqlDot("q.v", "q.v")
    val nn = sqlDot("n.v", "n.v")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id % $QueryMod = 0),
       |n AS (SELECT vec_id AS nid, v FROM e),
       |scored AS (
       |  SELECT qid, nid, $d / (sqrt($nq) * sqrt($nn)) AS cosine
       |  FROM q, n WHERE qid <> nid),
       |ranked AS (
       |  SELECT qid, nid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, nid, rank, cosine FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // ------------------------------------------------------------ sign LSH
  /** Number of hyperplanes = bucket bits. */
  private val LshBits = 12

  /** Fixed pseudo-random hyperplane component: integer in [-8, 8]. */
  private def plane(j: Int, i: Int): Int =
    ((1000003 * (j * 64 + i) + 12345) % 17 + 17) % 17 - 8

  /** Sign-LSH bucket id of a double-array column (16-bit int as long). */
  private def lshBucket(v: Column): Column = {
    val terms: Seq[Column] = (0 until LshBits).map { j =>
      // dot(v, plane_j) as strict fold over element index
      val proj = aggregate(
        zip_with(v,
          array((0 until 64).map(i => lit(plane(j, i).toDouble)): _*),
          (x, p) => x * p),
        lit(0.0), (acc, t) => acc + t)
      when(proj > 0.0, lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  private def sqlLshBucket(vExpr: String): String =
    (0 until LshBits).map { j =>
      val planes = (0 until 64).map(i => s"${plane(j, i)}.0").mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_transform(list_zip($vExpr, $planes),
         | p -> p[1] * p[2]), (acc, t) -> acc + t) > 0.0
         | THEN ${1L << j} ELSE 0 END""".stripMargin.replaceAll("\n", " ")
    }.mkString("(", " + ", ")")

  /** Bucket histogram: how the corpus spreads over sign-LSH buckets. */
  def qLshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        lshBucket(toDouble(col("embedding"))).as("bucket"))
    emb.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("bucket"))
  }

  val qLshBucketsSql: String =
    s"""WITH b AS (
       |  SELECT vec_id, label, ${sqlLshBucket("embedding::DOUBLE[]")} AS bucket
       |  FROM embeddings)
       |SELECT bucket, COUNT(*) AS n_vectors,
       |  COUNT(DISTINCT label) AS n_labels, MIN(vec_id) AS min_vec_id
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // -------------------------------------------- embedding near-dup pairs
  /** High-similarity pairs via banded sign-LSH: the 12-bit signature is
    * split into 3 bands of 4 bits; vectors sharing ANY band bucket become
    * candidates (OR-amplification, exactly like minhash banding), then
    * exact cosine >= 0.2 verifies. Band keys are uniform → balanced join;
    * band width scales with corpus size at 100 TB (more bits per band =
    * fewer, more-precise candidates). */
  private val NearDupBands = 3
  private val NearDupBandBits = 4
  private val NearDupThreshold = 0.2

  def qEmbeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    // persisted so the 12 hyperplane projections + norm run once per
    // vector; the band self-join reads it from cache on both sides
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v")))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mask = (1L << NearDupBandBits) - 1
    val bandKeys = (0 until NearDupBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("bucket"), b * NearDupBandBits).bitwiseAND(lit(mask))
          .as("key"))
    }
    val bands = emb.select(col("vec_id"), col("v"), col("nrm"),
        explode(array(bandKeys: _*)).as("bk"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // vectors + norms ride through the band join, so verification is a
    // scalar compute on the collision rows — no re-join against the
    // corpus; the threshold filter runs BEFORE the pair-dedup so the
    // distinct shuffles only near-dup pairs, not every band collision
    val verified = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
    verified.filter(col("cosine") >= NearDupThreshold)
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  val qEmbeddingNearDupSql: String = {
    val d = sqlDot("x.v", "y.v")
    val nx = sqlDot("x.v", "x.v")
    val ny = sqlDot("y.v", "y.v")
    val mask = (1L << NearDupBandBits) - 1
    val bandRows = (0 until NearDupBands).map { b =>
      s"SELECT vec_id, $b AS band, (bucket >> ${b * NearDupBandBits}) & $mask AS key FROM e"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    ${sqlLshBucket("embedding::DOUBLE[]")} AS bucket
       |  FROM embeddings),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
       |SELECT id1, id2, $d / (sqrt($nx) * sqrt($ny)) AS cosine
       |FROM cand
       |JOIN e x ON cand.id1 = x.vec_id
       |JOIN e y ON cand.id2 = y.vec_id
       |WHERE $d / (sqrt($nx) * sqrt($ny)) >= $NearDupThreshold
       |ORDER BY id1, id2""".stripMargin
  }

  // ------------------------------------------------------------ IVF topk
  /** IVF (inverted-file) ANN: a coarse quantizer assigns every corpus
    * vector to its nearest of [[IvfK]] fixed centroids (map-only argmax,
    * strict fold order so ties resolve to the first max in both engines);
    * each query probes only the [[IvfProbes]] nearest cells, so exact
    * cosine runs against ~nProbe/K of the corpus instead of all of it.
    *
    * Scale path: cell is a uniform shuffle key — the corpus partitions by
    * cell once and queries fan out to probed cells only. At 100 TB the
    * fixed centroids become a sampled k-means codebook (Spark ML kmeans||
    * on ~1M sampled rows, K in the thousands) and the assignment stays an
    * identical map-only argmax; deterministic centroids here keep the
    * DuckDB oracle bit-exact. */
  private val IvfK = 16
  private val IvfProbes = 4

  /** Fixed centroid component: integer in [-5, 5], nonlinear in (j, i) so
    * centroids don't alias (a linear formula repeats with period 9/11). */
  private def centVal(j: Int, i: Int): Int =
    ((7919 * j * j + 104729 * i + 7 * j * i + 13) % 11 + 11) % 11 - 5

  private def centNorm(j: Int): Double =
    math.sqrt((0 until 64).map(i => centVal(j, i).toDouble)
      .map(x => x * x).sum)

  /** Per-row centroid-similarity scores (dot / centroid norm; the query
    * norm is constant across centroids so it can't change the argmax). */
  private def ivfScores(v: Column): Column =
    array((0 until IvfK).map { j =>
      val c = array((0 until 64).map(i => lit(centVal(j, i).toDouble)): _*)
      (aggregate(zip_with(v, c, (x, y) => x * y), lit(0.0), (acc, t) => acc + t)
        / lit(centNorm(j))).as(s"s$j")
    }: _*)

  private def sqlIvfScores(vExpr: String): String =
    (0 until IvfK).map { j =>
      val c = (0 until 64).map(i => s"${centVal(j, i)}.0").mkString("[", ", ", "]")
      val sumSq = (0 until 64).map(i => centVal(j, i) * centVal(j, i)).sum
      s"${sqlDot(vExpr, c)} / sqrt($sumSq.0)"
    }.mkString("[", ", ", "]")

  /** Top-5 cosine neighbors per query, searching only IVF-probed cells. */
  def qIvfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("scores", ivfScores(col("v")))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // first-occurrence argmax: identical tie semantics in both engines
    val corpus = emb.select(col("vec_id").as("nid"), col("v").as("nv"),
      col("nrm").as("nn"),
      array_position(col("scores"), array_max(col("scores"))).as("cell"))
    val queries = emb.filter(col("vec_id") % QueryMod === 0)
      .withColumn("cutoff",
        element_at(sort_array(col("scores"), asc = false), IvfProbes))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(sequence(lit(1L), lit(IvfK.toLong))).as("pcell"),
        col("scores"), col("cutoff"))
      .filter(element_at(col("scores"), col("pcell").cast("int")) >= col("cutoff"))
      .select(col("qid"), col("qv"), col("qn"), col("pcell"))
    val cand = broadcast(queries)
      .join(corpus, col("pcell") === col("cell") && col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("rank"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val qIvfTopKSql: String = {
    val d = sqlDot("qv", "nv")
    val nq = sqlDot("qv", "qv")
    val nn = sqlDot("nv", "nv")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |    ${sqlIvfScores("embedding::DOUBLE[]")} AS scores
       |  FROM embeddings),
       |corpus AS (SELECT vec_id AS nid, v AS nv,
       |    list_position(scores, list_max(scores)) AS cell FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, scores,
       |    list_sort(scores, 'DESC')[$IvfProbes] AS cutoff
       |  FROM e WHERE vec_id % $QueryMod = 0),
       |probes AS (
       |  SELECT qid, qv, i AS pcell FROM q
       |  CROSS JOIN (SELECT unnest(range(1, ${IvfK + 1})) AS i) t
       |  WHERE scores[CAST(i AS INT)] >= cutoff),
       |cand AS (
       |  SELECT qid, nid, $d / (sqrt($nq) * sqrt($nn)) AS cosine
       |  FROM probes JOIN corpus ON pcell = cell AND qid <> nid),
       |ranked AS (SELECT qid, nid, cosine,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
       |  FROM cand)
       |SELECT qid, nid, rank, cosine FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // ------------------------------------------------------------- PQ topk
  /** PRODUCT QUANTIZATION ANN: every corpus vector is compressed to
    * [[PqM]] sub-codes (argmin over [[PqK]] codewords per 8-dim
    * subspace) plus its exact norm, and queries rank candidates by the
    * ASYMMETRIC dot product (query sub-vectors against the corpus's
    * CODEWORDS — the corpus's raw floats are never touched during
    * ranking). The top-ranked candidates are then reranked with the
    * exact cosine — the standard shortlist-and-rerank PQ serving shape.
    *
    * Scale path: the ranking pass reads 8 code bytes + 8 norm bytes per
    * vector instead of 512 B of raw floats — a 16x scan-IO reduction
    * that is THE reason PQ exists at 100 TB; encoding is map-only, the
    * query side broadcasts, the corpus never shuffles, and the exact
    * rerank touches only |queries| x 5 rows. Fixed formula codewords
    * here keep the DuckDB oracle bit-exact; a production build trains
    * them per-subspace on a bounded sample (FAISS-style) and the
    * encode/rank algebra below is unchanged.
    *
    * This is the FLAT-PQ labeled baseline: the ADC pass still scans the
    * whole (16x-smaller) code table. The SERVING path at 100 TB is
    * IVFADC — the same codec riding the cell-partitioned IvfIndex
    * (`IvfIndexConfig(pqM, ...)` + `Graft.annSearch`; oracle
    * `idx_ivfpq_topk`), where ADC ranks only the probed cells' codes
    * and the golden plan pins the cell pruning. */
  private val PqM = 8    // subspaces of 8 dims each
  private val PqK = graft.index.ivf.PqCodec.K // codewords per subspace

  /** Fixed codeword component — shared with the IVFADC index path
    * ([[graft.index.ivf.PqCodec]]) so both serve the same algebra. */
  private def pqVal(m: Int, k: Int, i: Int): Int =
    graft.index.ivf.PqCodec.codeword(m, k, i)

  private lazy val pqFormulaCb =
    graft.index.ivf.PqCodec.formulaCodebook(PqM, 8)

  /** Spark-side codes: for each subspace, first-occurrence argmin of the
    * strict-fold squared L2 distance to each codeword (1-based, matching
    * DuckDB's list_position). */
  private def pqCodes(v: Column): Column =
    graft.index.ivf.PqCodec.codesCol(v, pqFormulaCb)

  private def sqlPqCodes(vExpr: String): String =
    (0 until PqM).map { m =>
      val sub = s"$vExpr[${m * 8 + 1}:${m * 8 + 8}]"
      val dists = (0 until PqK).map { k =>
        val cw = (0 until 8).map(i => s"${pqVal(m, k, i)}.0").mkString("[", ", ", "]")
        s"""list_reduce(list_transform(list_zip($sub, $cw),
           | p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, t) -> acc + t)"""
          .stripMargin.replaceAll("\n", " ")
      }.mkString("[", ", ", "]")
      s"list_position($dists, list_min($dists))"
    }.mkString("[", ", ", "]")

  /** Per-query lookup table: dot(query sub-vector, codeword) for every
    * (subspace, codeword) — the classic ADC table, PqM x PqK doubles. */
  private def pqQueryTable(qv: Column): Column =
    graft.index.ivf.PqCodec.queryTableCol(qv, pqFormulaCb)

  private def sqlPqQueryTable(vExpr: String): String =
    (0 until PqM).map { m =>
      val sub = s"$vExpr[${m * 8 + 1}:${m * 8 + 8}]"
      (0 until PqK).map { k =>
        val cw = (0 until 8).map(i => s"${pqVal(m, k, i)}.0").mkString("[", ", ", "]")
        s"""list_reduce(list_transform(list_zip($sub, $cw),
           | p -> p[1] * p[2]), (acc, t) -> acc + t)"""
          .stripMargin.replaceAll("\n", " ")
      }.mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** Top-5 per query by PQ approximate cosine, exact-cosine reranked. */
  def qPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // the serving-side artifact: codes + exact norm, raw floats dropped
    val codes = emb.select(col("vec_id").as("nid"),
      pqCodes(col("v")).as("codes"), col("nrm").as("nn"))
    val queries = emb.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("nrm").as("qn"),
        pqQueryTable(col("v")).as("qtab"))
    // ADC: sum the per-subspace table entries the codes select
    val approx = broadcast(queries).crossJoin(codes)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (graft.index.ivf.PqCodec.adcDot(col("codes"), col("qtab")) /
          (col("qn") * col("nn"))).as("cosine_adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine_adc").desc, col("nid"))
    val shortlist = approx
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
    // exact rerank touches only |queries| x 5 raw vectors
    val qv = emb.select(col("vec_id").as("qid2"), col("v").as("qvv"),
      col("nrm").as("qn2"))
    val nv = emb.select(col("vec_id").as("nid2"), col("v").as("nvv"),
      col("nrm").as("nn2"))
    shortlist
      .join(qv, col("qid") === col("qid2"))
      .join(nv, col("nid") === col("nid2"))
      .select(col("qid"), col("nid"), col("rank"), col("cosine_adc"),
        (dot(col("qvv"), col("nvv")) / (col("qn2") * col("nn2")))
          .as("cosine_exact"))
      .orderBy(col("qid"), col("rank"))
  }

  val qPqTopKSql: String = {
    val d = sqlDot("q.v", "n.v")
    val nq = sqlDot("q.v", "q.v")
    val nn = sqlDot("n.v", "n.v")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |nrm AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e),
       |codes AS (SELECT vec_id AS nid, ${sqlPqCodes("v")} AS codes, nrm AS nn
       |  FROM nrm),
       |q AS (SELECT vec_id AS qid, nrm AS qn, ${sqlPqQueryTable("v")} AS qtab
       |  FROM nrm WHERE vec_id % $QueryMod = 0),
       |approx AS (
       |  SELECT qid, nid,
       |    list_reduce(list_transform(list_zip(codes, qtab),
       |      p -> (p[2])[CAST(p[1] AS INT)]), (acc, t) -> acc + t)
       |      / (qn * nn) AS cosine_adc
       |  FROM q, codes WHERE qid <> nid),
       |ranked AS (SELECT qid, nid, cosine_adc,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_adc DESC, nid) AS rank
       |  FROM approx)
       |SELECT r.qid, r.nid, r.rank, r.cosine_adc,
       |  $d / (sqrt($nq) * sqrt($nn)) AS cosine_exact
       |FROM ranked r
       |JOIN e q ON r.qid = q.vec_id
       |JOIN e n ON r.nid = n.vec_id
       |WHERE r.rank <= 5
       |ORDER BY r.qid, r.rank""".stripMargin
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "sim_brute_topk" -> (qBruteForceTopK _, qBruteForceTopKSql),
    "sim_lsh_buckets" -> (qLshBuckets _, qLshBucketsSql),
    "sim_embedding_neardup" -> (qEmbeddingNearDup _, qEmbeddingNearDupSql),
    "sim_ivf_topk" -> (qIvfTopK _, qIvfTopKSql),
    "sim_pq_topk" -> (qPqTopK _, qPqTopKSql))
}
