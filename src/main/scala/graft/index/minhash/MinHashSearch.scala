package graft.index.minhash

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.index.IndexLogEntry

/**
 * Near-duplicate queries against a [[MinHashIndexDescriptor]] index.
 *
 * Both entry points share the LSH shape that keeps 100 TB tractable:
 * band keys collide only for likely-duplicates, the band join exchanges
 * constant-size `(id, band, key)` rows, candidate pairs are distinct-ed
 * before verification, and the signature re-join touches only surviving
 * pairs. Verification is the MinHash ESTIMATE (fraction of equal
 * signature slots) — the point of persisting signatures is that no text
 * is ever re-read; callers wanting exact Jaccard confirmation re-join
 * the (tiny) result against the corpus text themselves.
 */
object MinHashSearch {

  import MinHashBuild._

  private def desc(entry: IndexLogEntry): MinHashIndexDescriptor =
    entry.descriptor.asInstanceOf[MinHashIndexDescriptor]

  /** Estimated Jaccard between two signature columns: the fraction of
    * equal slots. Runs only on collision pairs (post-band-join), so the
    * higher-order function stays off the corpus-sized hot path. */
  private def estJaccard(s1: Column, s2: Column, numPerm: Int): Column =
    size(filter(zip_with(s1, s2, (x, y) => x === y), b => b))
      .cast(DoubleType) / numPerm.toDouble

  /** Live `(id, sig)` rows and exploded `(id, band, key)` rows.
    *
    * Hybrid-serve inputs: `appended` (a source slice not yet indexed) is
    * signed ON THE FLY and unioned in — one codegen pass over only the
    * drifted files; `droppedFids` (source files deleted since the last
    * refresh) anti-filter exactly like tombstones. Together they let a
    * drifted index serve exact results with zero maintenance I/O. */
  private def tables(spark: SparkSession, entry: IndexLogEntry,
      appended: Option[DataFrame], droppedFids: Seq[Long])
      : (DataFrame, DataFrame) = {
    val d = desc(entry)
    val persisted0 = antiTombstone(readIndexData(spark, entry.content), d)
    val persisted =
      if (droppedFids.isEmpty || !persisted0.columns.contains(LineageColumn))
        persisted0
      else persisted0.filter(col(LineageColumn).isNull ||
        !col(LineageColumn).isin(droppedFids: _*))
    val shape = col(d.idColumn) +: col(SigColumn) +:
      (0 until d.bands).map(b => col(bandColumn(b)))
    val data = appended match {
      case Some(app) =>
        val fresh = app
          .select(col(d.idColumn).cast("long").as(d.idColumn),
            sigCol(d, col(d.textColumn)).as(SigColumn))
          .filter(col(SigColumn).isNotNull && size(col(SigColumn)) > 0)
          .select(col(d.idColumn) +: col(SigColumn) +: bandCols(d): _*)
        persisted.select(shape: _*).unionByName(fresh)
      case None => persisted.select(shape: _*)
    }
    val sigs = data.select(col(d.idColumn), col(SigColumn))
    val bands = data.select(col(d.idColumn),
      explode(array((0 until d.bands).map(b =>
        struct(lit(b).as("band"), col(bandColumn(b)).as("key"))): _*)).as("bk"))
      .select(col(d.idColumn), col("bk.band").as("band"), col("bk.key").as("key"))
    (sigs, bands)
  }

  /** All near-duplicate pairs within the indexed corpus:
    * `(id1, id2, est_jaccard)` with `est_jaccard >= minEst`. */
  def pairs(spark: SparkSession, entry: IndexLogEntry, minEst: Double,
      appended: Option[DataFrame] = None,
      droppedFids: Seq[Long] = Nil): DataFrame = {
    val d = desc(entry)
    val (sigs, bands) = tables(spark, entry, appended, droppedFids)
    val id = d.idColumn
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"))
      .distinct()
    cand
      .join(sigs.select(col(id).as("id1"), col(SigColumn).as("s1")), "id1")
      .join(sigs.select(col(id).as("id2"), col(SigColumn).as("s2")), "id2")
      .select(col("id1"), col("id2"),
        estJaccard(col("s1"), col("s2"), d.numPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** Near-duplicate pairs WITHIN a standalone `(id, text)` frame (no
    * index involved): sign, band, collide, estimate — the batch-internal
    * leg of incremental curation. Returns `(id1, id2, est_jaccard)`
    * with `id1 < id2`. */
  def selfPairs(spark: SparkSession, d: MinHashIndexDescriptor,
      docs: DataFrame, idCol: String, textCol: String,
      minEst: Double): DataFrame = {
    val rows = docs
      .select(col(idCol).cast("long").as("id"),
        sigCol(d, col(textCol)).as(SigColumn))
      .filter(col(SigColumn).isNotNull && size(col(SigColumn)) > 0)
      .select(col("id") +: col(SigColumn) +: bandCols(d): _*)
    val bands = rows.select(col("id"),
      explode(array((0 until d.bands).map(b =>
        struct(lit(b).as("band"), col(bandColumn(b)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val sigs = rows.select(col("id"), col(SigColumn))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
      .join(sigs.select(col("id").as("id1"), col(SigColumn).as("s1")), "id1")
      .join(sigs.select(col("id").as("id2"), col(SigColumn).as("s2")), "id2")
      .select(col("id1"), col("id2"),
        estJaccard(col("s1"), col("s2"), d.numPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

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
    val (sigs, bands) = tables(spark, entry, appended, droppedFids)
    val id = d.idColumn
    val signed = batch
      .select(col(idCol).cast("long").as("batch_id"),
        sigCol(d, col(textCol)).as(SigColumn))
      .filter(col(SigColumn).isNotNull && size(col(SigColumn)) > 0)
      .select(col("batch_id") +: col(SigColumn).as("bsig") +:
        bandCols(d).zipWithIndex.map { case (c, i) => c.as(s"bk$i") }: _*)
    val batchBands = signed.select(col("batch_id"), col("bsig"),
      explode(array((0 until d.bands).map(b =>
        struct(lit(b).as("band"), col(s"bk$b").as("key"))): _*)).as("bk"))
      .select(col("batch_id"), col("bsig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands
      .join(broadcast(batchBands), Seq("band", "key"))
      .select(col("batch_id"), col(id).as("corpus_id"), col("bsig"))
      .distinct()
    cand
      .join(sigs.select(col(id).as("corpus_id"), col(SigColumn).as("csig")),
        "corpus_id")
      .select(col("batch_id"), col("corpus_id"),
        estJaccard(col("bsig"), col("csig"), d.numPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }
}
