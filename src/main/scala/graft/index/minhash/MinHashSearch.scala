package graft.index.minhash

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.index.IndexLogEntry

/**
 * Near-duplicate queries against a [[MinHashIndexDescriptor]] index.
 *
 * Every entry point shares the LSH shape that keeps 100 TB tractable:
 * band keys collide only for likely-duplicates, the band join exchanges
 * constant-size `(id, band, key)` rows — SIGNATURES NEVER RIDE A
 * SHUFFLE: candidate pairs distinct on bare ids and the signatures
 * re-join onto surviving pairs only — and verification is the MinHash
 * ESTIMATE (fraction of equal signature slots), so no text is ever
 * re-read. Callers wanting exact Jaccard confirmation re-join the
 * (tiny) result against the corpus text themselves.
 */
object MinHashSearch {

  import MinHashBuild._

  private def desc(entry: IndexLogEntry): MinHashIndexDescriptor =
    entry.descriptor.asInstanceOf[MinHashIndexDescriptor]

  /** Estimated Jaccard between two signature columns: the fraction of
    * equal slots. Runs only on verified candidate pairs (post-distinct),
    * so the higher-order function stays off the corpus-sized hot path. */
  private def estJaccard(s1: Column, s2: Column, numPerm: Int): Column =
    size(filter(zip_with(s1, s2, (x, y) => x === y), b => b))
      .cast(DoubleType) / numPerm.toDouble

  /** Sign a raw `(id, text)` slice into the uniform
    * `(<alias>, sig, band0..B-1)` row shape. */
  private def signedRows(d: MinHashIndexDescriptor, docs: DataFrame,
      idCol: String, textCol: String, idAlias: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as(idAlias),
        sigCol(d, col(textCol)).as(SigColumn))
      .filter(col(SigColumn).isNotNull && size(col(SigColumn)) > 0)
      .select(col(idAlias) +: col(SigColumn) +: bandCols(d): _*)

  /** Live index rows in the uniform shape, with hybrid-serve inputs
    * folded in: `appended` (a source slice not yet indexed) is signed ON
    * THE FLY and `droppedFids` anti-filter like tombstones. Together
    * they let a drifted index serve exact results with zero maintenance
    * I/O. The appended leg re-signs once per plan subtree that consumes
    * it (the band self-join + the two signature re-joins — up to 4×);
    * that stays cheap because drift is ratio-bounded small, and is the
    * deliberate trade against a library-held persist (which could never
    * be released safely under a lazy result) — sustained heavy drift is
    * what `refreshIndex("incremental")` is for.
    *
    * An appended file may RE-CONTAIN an already-indexed id (an
    * append-rewrite the lister can't pair with a delete); serving both
    * rows would multiply the signature re-joins and emit duplicate
    * (id1, id2) pairs with differing estimates. The union therefore
    * dedups per id, preferring the appended (fresher) row. The dedup
    * window shuffles signature rows on id — a cost that exists ONLY
    * under drift; the steady-state path keeps the signatures-never-
    * shuffle invariant, and a refresh restores it. */
  private def liveRows(spark: SparkSession, entry: IndexLogEntry,
      appended: Option[DataFrame], droppedFids: Seq[Long]): DataFrame = {
    val d = desc(entry)
    val persisted =
      antiTombstone(readIndexData(spark, entry.content), d, droppedFids)
    val shape = col(d.idColumn) +: col(SigColumn) +:
      (0 until d.bands).map(b => col(bandColumn(b)))
    appended match {
      case Some(app) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(d.idColumn)).orderBy(col("__prio").desc)
        persisted.select(shape: _*).withColumn("__prio", lit(0))
          .unionByName(signedRows(d, app, d.idColumn, d.textColumn, d.idColumn)
            .withColumn("__prio", lit(1)))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__prio", "__rn")
      case None => persisted.select(shape: _*)
    }
  }

  /** Exploded `(<id>, band, key)` from uniform rows. */
  private def bandsOf(d: MinHashIndexDescriptor, rows: DataFrame,
      idName: String): DataFrame =
    rows.select(col(idName),
      explode(array((0 until d.bands).map(b =>
        struct(lit(b).as("band"), col(bandColumn(b)).as("key"))): _*)).as("bk"))
      .select(col(idName), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Bare candidate id pairs → signature re-join → estimate filter. */
  private def verified(d: MinHashIndexDescriptor, cand: DataFrame,
      leftSigs: DataFrame, rightSigs: DataFrame,
      left: String, right: String, minEst: Double): DataFrame =
    cand
      .join(leftSigs, left)
      .join(rightSigs, right)
      .select(col(left), col(right),
        estJaccard(col("__s1"), col("__s2"), d.numPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)

  /** Self-join near-dup pairs over uniform rows: `(id1, id2, est)`. */
  private def pairsOver(d: MinHashIndexDescriptor, rows: DataFrame,
      idName: String, minEst: Double): DataFrame = {
    val bands = bandsOf(d, rows, idName)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idName") < col(s"b.$idName"))
      .select(col(s"a.$idName").as("id1"), col(s"b.$idName").as("id2"))
      .distinct()
    verified(d, cand,
      rows.select(col(idName).as("id1"), col(SigColumn).as("__s1")),
      rows.select(col(idName).as("id2"), col(SigColumn).as("__s2")),
      "id1", "id2", minEst)
  }

  /** All near-duplicate pairs within the indexed corpus:
    * `(id1, id2, est_jaccard)` with `est_jaccard >= minEst`. */
  def pairs(spark: SparkSession, entry: IndexLogEntry, minEst: Double,
      appended: Option[DataFrame] = None,
      droppedFids: Seq[Long] = Nil): DataFrame =
    pairsOver(desc(entry), liveRows(spark, entry, appended, droppedFids),
      desc(entry).idColumn, minEst)

  /** Near-duplicate pairs WITHIN a standalone `(id, text)` frame (no
    * index involved) — the batch-internal leg of incremental curation.
    * Returns `(id1, id2, est_jaccard)` with `id1 < id2`. */
  def selfPairs(spark: SparkSession, d: MinHashIndexDescriptor,
      docs: DataFrame, idCol: String, textCol: String,
      minEst: Double): DataFrame =
    pairsOver(d, signedRows(d, docs, idCol, textCol, "id"), "id", minEst)

  /** Incremental dedup: near-duplicates of a NEW batch against the
    * indexed corpus without re-signing the corpus. The batch is signed
    * on the fly (`idCol`/`textCol` name its columns) and its band keys —
    * broadcast, batches are small by definition — probe the persisted
    * band table. Returns `(batch_id, corpus_id, est_jaccard)`.
    *
    * Batch ids live in a DIFFERENT id space than the corpus (they are
    * not yet ingested), so no `id1 < id2` dedup applies — every
    * (batch, corpus) collision is a candidate. */
  def dedupAgainst(spark: SparkSession, entry: IndexLogEntry,
      batch: DataFrame, idCol: String, textCol: String, minEst: Double,
      appended: Option[DataFrame] = None,
      droppedFids: Seq[Long] = Nil): DataFrame = {
    val d = desc(entry)
    val corpus = liveRows(spark, entry, appended, droppedFids)
    val signed = signedRows(d, batch, idCol, textCol, "batch_id")
    val cand = bandsOf(d, corpus, d.idColumn)
      .join(broadcast(bandsOf(d, signed, "batch_id")), Seq("band", "key"))
      .select(col("batch_id"), col(d.idColumn).as("corpus_id"))
      .distinct()
    verified(d, cand,
      signed.select(col("batch_id"), col(SigColumn).as("__s1")),
      corpus.select(col(d.idColumn).as("corpus_id"), col(SigColumn).as("__s2")),
      "batch_id", "corpus_id", minEst)
  }
}
