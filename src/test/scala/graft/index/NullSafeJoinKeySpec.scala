package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * [[graft.index.rules.NormalizeNullSafeJoinKeys]]: the null-safe
 * equality that EXCEPT/INTERSECT lowering puts on its anti/semi joins
 * is rewritten to plain equality exactly when a side is provably
 * non-null — and NEVER when the both-null row pair (the one case where
 * the operators differ) is possible.
 */
class NullSafeJoinKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def joinConditions(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case j: Join => j.condition
    }.flatten

  private def opt(df: DataFrame) = joinConditions(df)

  test("EXCEPT over IS NOT NULL-guarded keys lowers to a plain-equality " +
      "anti join (the bucketable form)") {
    val a = Seq(1L, 2L, 3L).toDF("k").filter($"k".isNotNull).distinct()
    val b = Seq(2L, 4L).toDF("k").filter($"k".isNotNull).distinct()
    val conds = opt(a.except(b))
    assert(conds.nonEmpty)
    assert(conds.forall(c => !c.exists(_.isInstanceOf[EqualNullSafe])),
      s"null-safe key survived a provable not-null: $conds")
    assert(conds.exists(_.exists(_.isInstanceOf[EqualTo])),
      s"expected a plain-equality key: $conds")
  }

  test("one-sided proof suffices (the operators differ only on the " +
      "both-null pair), and values match vanilla Spark with nulls on " +
      "the unproven side") {
    // parquet sources, not local relations: ConvertToLocalRelation folds
    // a Filter over local data away (erasing the IsNotNull constraint
    // the proof rides on), which a real file source never does
    val dir = java.nio.file.Files.createTempDirectory("graft_nsjk").toString
    Seq(Some(1L), Some(2L), Some(3L)).toDF("k")
      .write.mode("overwrite").parquet(s"$dir/left")
    Seq(Some(2L), None).toDF("k")
      .write.mode("overwrite").parquet(s"$dir/right")
    val left = spark.read.parquet(s"$dir/left").filter($"k".isNotNull)
    val right = spark.read.parquet(s"$dir/right")
    val q = left.except(right)
    assert(opt(q).forall(c => !c.exists(_.isInstanceOf[EqualNullSafe])))
    val rewritten = q.collect().map(_.getLong(0)).sorted.toSeq
    val vanilla =
      try {
        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        left.except(right).collect().map(_.getLong(0)).sorted.toSeq
      } finally spark.conf.set(GraftConf.ApplyEnabledKey, "true")
    assert(rewritten == Seq(1L, 3L) && rewritten == vanilla)
  }

  test("no proof, no rewrite: nullable keys keep null-safe semantics " +
      "(a null row subtracts a null row)") {
    val left = Seq(Some(1L), None).toDF("k")
    val right = Seq[Option[Long]](None).toDF("k")
    val q = left.except(right)
    assert(opt(q).exists(_.exists(_.isInstanceOf[EqualNullSafe])),
      "rewrite fired without a not-null proof")
    val rows = q.collect().map(r => Option(r.get(0))).toSeq
    assert(rows == Seq(Some(1L)),
      s"EXCEPT null semantics changed: $rows")
  }

  test("nested null-safe equality (under NOT) is left alone even with " +
      "a proof — the operators differ on one-null pairs there") {
    val left = Seq(1L, 2L).toDF("k").filter($"k".isNotNull)
    val right = Seq(Some(2L), None).toDF("j")
    val q = left.join(right, !($"k" <=> $"j"), "inner")
    assert(opt(q).exists(_.exists(_.isInstanceOf[EqualNullSafe])),
      "negated null-safe equality must not be rewritten")
    // vanilla semantics: NOT(k <=> j) is TRUE for (k, null) pairs
    assert(q.count() == 3L) // (1,2),(1,null),(2,null)
  }

  test("INTERSECT gets the same treatment (semi-join leg)") {
    val a = Seq(1L, 2L, 3L).toDF("k").filter($"k".isNotNull).distinct()
    val b = Seq(2L, 3L, 4L).toDF("k").filter($"k".isNotNull).distinct()
    val q = a.intersect(b)
    assert(opt(q).forall(c => !c.exists(_.isInstanceOf[EqualNullSafe])))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }
}
