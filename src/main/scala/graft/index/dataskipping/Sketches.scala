package graft.index.dataskipping

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.Resolver
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.{ArrayType, DataType}

import graft.index.dataskipping.expressions.{BloomFilterAgg, BloomFilterMightContain, BloomFilterMightContainAny, SortedArrayLowerBound}

/**
 * Per-file sketches + source→index predicate translation (reference:
 * index/dataskipping/sketches/Sketch.scala:36-119, MinMaxSketch.scala:45-100,
 * BloomFilterSketch.scala:61-86).
 *
 * Each sketch contributes (a) aggregate columns computed per source file at
 * build time and (b) a partial function translating one source predicate
 * node into a predicate over its sketch columns meaning "this file MIGHT
 * contain matching rows" — false ⇒ the file is provably skippable.
 */
sealed trait Sketch {
  def spec: SketchSpec
  /** Unique column prefix within the index ("s0", "s1", ...). */
  def prefix: String
  def sourceColumn: String = spec.expr
  def aggregates(source: DataFrame): Seq[Column]
  def outputColumns: Seq[String]

  /** Translate one predicate node. `attrOf` resolves a sketch output
    * column to the index relation's attribute; `isSketched` tests whether
    * an expression is exactly the sketched source column. */
  def convert(
      pred: Expression,
      attrOf: String => Expression,
      isSketched: Expression => Boolean): Option[Expression]
}

final case class MinMaxSketch(spec: SketchSpec, prefix: String) extends Sketch {
  private val minCol = s"${prefix}_min"
  private val maxCol = s"${prefix}_max"
  override def outputColumns: Seq[String] = Seq(minCol, maxCol)
  override def aggregates(source: DataFrame): Seq[Column] =
    Seq(min(col(sourceColumn)).as(minCol), max(col(sourceColumn)).as(maxCol))

  /** Files whose [min,max] interval may intersect the predicate
    * (reference: MinMaxSketch.scala:45-100, same algebra). */
  override def convert(
      pred: Expression,
      attrOf: String => Expression,
      isSketched: Expression => Boolean): Option[Expression] = {
    lazy val mn = attrOf(minCol)
    lazy val mx = attrOf(maxCol)
    pred match {
      case EqualTo(e, l: Literal) if isSketched(e) && l.value != null =>
        Some(And(LessThanOrEqual(mn, l), GreaterThanOrEqual(mx, l)))
      case EqualTo(l: Literal, e) if isSketched(e) && l.value != null =>
        Some(And(LessThanOrEqual(mn, l), GreaterThanOrEqual(mx, l)))
      case EqualNullSafe(e, l: Literal) if isSketched(e) && l.value != null =>
        Some(And(LessThanOrEqual(mn, l), GreaterThanOrEqual(mx, l)))
      case LessThan(e, l: Literal) if isSketched(e) => Some(LessThan(mn, l))
      case LessThan(l: Literal, e) if isSketched(e) => Some(GreaterThan(mx, l))
      case LessThanOrEqual(e, l: Literal) if isSketched(e) => Some(LessThanOrEqual(mn, l))
      case LessThanOrEqual(l: Literal, e) if isSketched(e) => Some(GreaterThanOrEqual(mx, l))
      case GreaterThan(e, l: Literal) if isSketched(e) => Some(GreaterThan(mx, l))
      case GreaterThan(l: Literal, e) if isSketched(e) => Some(LessThan(mn, l))
      case GreaterThanOrEqual(e, l: Literal) if isSketched(e) => Some(GreaterThanOrEqual(mx, l))
      case GreaterThanOrEqual(l: Literal, e) if isSketched(e) => Some(LessThanOrEqual(mn, l))
      case IsNotNull(e) if isSketched(e) => Some(IsNotNull(mn))
      case In(e, list) if isSketched(e) && list.forall(_.isInstanceOf[Literal]) =>
        inTranslation(list.collect { case Literal(v, _) if v != null => v },
          list.head.dataType, mn, mx)
      case InSet(e, hset) if isSketched(e) =>
        inTranslation(hset.toSeq.filter(_ != null), e.dataType, mn, mx)
      case _ => None
    }
  }

  /** Small lists → OR of interval tests; large sets → binary-search
    * lower bound over the sorted values (reference: MinMaxSketch InSet
    * path via SortedArrayLowerBound + ElementAt). */
  private def inTranslation(
      values: Seq[Any], dt: DataType,
      mn: Expression, mx: Expression): Option[Expression] = {
    if (values.isEmpty) return Some(Literal.FalseLiteral)
    if (values.size <= 8) {
      Some(values.map { v =>
        val l = Literal.create(v, dt)
        And(LessThanOrEqual(mn, l), GreaterThanOrEqual(mx, l)): Expression
      }.reduce(Or))
    } else {
      val ordering = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(dt)
      val sorted = values.sorted(ordering)
      val arr = Literal.create(new GenericArrayData(sorted.toArray),
        ArrayType(dt, containsNull = false))
      val lb = SortedArrayLowerBound(arr, mn)
      // no element >= min  ⇒ lb null ⇒ And(false-ish) ⇒ prunable
      Some(And(IsNotNull(lb), LessThanOrEqual(ElementAt(arr, lb), mx)))
    }
  }
}

final case class BloomSketch(
    spec: SketchSpec, prefix: String,
    expectedItems: Long, fpp: Double) extends Sketch {
  private val bfCol = s"${prefix}_bf"
  override def outputColumns: Seq[String] = Seq(bfCol)

  override def aggregates(source: DataFrame): Seq[Column] = {
    val child = GraftBridge.expression(col(sourceColumn))
    Seq(GraftBridge.column(
      BloomFilterAgg(child, expectedItems, fpp).toAggregateExpression()).as(bfCol))
  }

  override def convert(
      pred: Expression,
      attrOf: String => Expression,
      isSketched: Expression => Boolean): Option[Expression] = {
    lazy val bf = attrOf(bfCol)
    pred match {
      case EqualTo(e, l: Literal) if isSketched(e) && l.value != null =>
        Some(BloomFilterMightContain(bf, l))
      case EqualTo(l: Literal, e) if isSketched(e) && l.value != null =>
        Some(BloomFilterMightContain(bf, l))
      case EqualNullSafe(e, l: Literal) if isSketched(e) && l.value != null =>
        Some(BloomFilterMightContain(bf, l))
      case In(e, list) if isSketched(e) && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.collect { case Literal(v, _) if v != null => v }
        if (vs.isEmpty) Some(Literal.FalseLiteral)
        else Some(BloomFilterMightContainAny(bf, vs.toArray, list.head.dataType))
      case InSet(e, hset) if isSketched(e) =>
        val vs = hset.toSeq.filter(_ != null)
        if (vs.isEmpty) Some(Literal.FalseLiteral)
        else Some(BloomFilterMightContainAny(bf, vs.toArray, e.dataType))
      case _ => None
    }
  }
}

/**
 * Distinct-values-per-file sketch (reference: the ValueListSketch
 * documented at sketches/BloomFilterSketch.scala:30-32 — upstream-only in
 * the snapshot, implemented here): stores the file's sorted distinct
 * value list (exact, unlike bloom — no false positives) when the column
 * is low-cardinality per file. Use `maxValues` to bound sketch size; a
 * file exceeding it stores null and is never pruned by this sketch.
 */
final case class ValueListSketch(
    spec: SketchSpec, prefix: String, maxValues: Int) extends Sketch {
  private val vlCol = s"${prefix}_vl"
  override def outputColumns: Seq[String] = Seq(vlCol)

  override def aggregates(source: DataFrame): Seq[Column] = {
    // cap enforced DURING accumulation (not via when(size<=max) after a
    // full collect_set, which would materialize every distinct value of a
    // high-cardinality file before discarding it): over-budget files
    // evaluate to null — "unknown, keep the file"
    val child = GraftBridge.expression(col(sourceColumn))
    Seq(GraftBridge.column(
      graft.index.dataskipping.expressions
        .CappedDistinctListAgg(child, maxValues).toAggregateExpression())
      .as(vlCol))
  }

  override def convert(
      pred: Expression,
      attrOf: String => Expression,
      isSketched: Expression => Boolean): Option[Expression] = {
    lazy val vl = attrOf(vlCol)
    def contains(l: Literal): Expression = ArrayContains(vl, l)
    // Range tests index into the sorted list; ElementAt on an EMPTY list
    // (a file whose sketched column is all nulls) throws under
    // spark.sql.ansi.enabled — and the pruning query runs lazily at scan
    // time, outside ApplyGraft's try/catch, so that would fail the user
    // query instead of skipping pruning. CaseWhen short-circuits:
    //   non-empty -> the range test;
    //   empty (known: no non-null values) -> FALSE (provably skippable);
    //   null (collect_set over budget: unknown) -> NULL (keep the file).
    def range(test: Expression => Expression, idx: Int): Expression =
      CaseWhen(Seq(
        (GreaterThan(Size(vl), Literal(0)), test(ElementAt(vl, Literal(idx)))),
        (IsNotNull(vl), Literal.FalseLiteral)))
    pred match {
      case EqualTo(e, l: Literal) if isSketched(e) && l.value != null => Some(contains(l))
      case EqualTo(l: Literal, e) if isSketched(e) && l.value != null => Some(contains(l))
      case EqualNullSafe(e, l: Literal) if isSketched(e) && l.value != null =>
        Some(contains(l))
      case In(e, list) if isSketched(e) && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.collect { case l @ Literal(v, _) if v != null => contains(l) }
        if (vs.isEmpty) Some(Literal.FalseLiteral) else Some(vs.reduce(Or))
      case InSet(e, hset) if isSketched(e) =>
        val vs = hset.toSeq.filter(_ != null)
          .map(v => contains(Literal.create(v, e.dataType)): Expression)
        if (vs.isEmpty) Some(Literal.FalseLiteral) else Some(vs.reduce(Or))
      case IsNotNull(e) if isSketched(e) =>
        // guard like range(): legacy mode evaluates size(null) to -1, which
        // would prune an over-budget (null list = UNKNOWN) file
        Some(CaseWhen(Seq((IsNotNull(vl),
          GreaterThan(org.apache.spark.sql.catalyst.expressions.Size(vl),
            Literal(0))))))
      case LessThan(e, l: Literal) if isSketched(e) =>
        Some(range(LessThan(_, l), 1))
      case LessThanOrEqual(e, l: Literal) if isSketched(e) =>
        Some(range(LessThanOrEqual(_, l), 1))
      case GreaterThan(e, l: Literal) if isSketched(e) =>
        Some(range(GreaterThan(_, l), -1))
      case GreaterThanOrEqual(e, l: Literal) if isSketched(e) =>
        Some(range(GreaterThanOrEqual(_, l), -1))
      case _ => None
    }
  }
}

/**
 * Partition-column sketch (reference: sketches/PartitionSketch.scala:38-74):
 * the column is constant within a file, so `first(col)` captures it
 * exactly, and ANY deterministic predicate over only partition columns
 * translates verbatim — which keeps disjunctions mixing partition and
 * data columns translatable. Auto-added for partitioned sources
 * (reference: DataSkippingIndexConfig.scala:61-84).
 */
final case class PartitionSketch(spec: SketchSpec, prefix: String) extends Sketch {
  private val partCol = s"${prefix}_part"
  override def outputColumns: Seq[String] = Seq(partCol)
  override def aggregates(source: DataFrame): Seq[Column] =
    Seq(org.apache.spark.sql.functions.first(col(sourceColumn)).as(partCol))

  override def convert(
      pred: Expression,
      attrOf: String => Expression,
      isSketched: Expression => Boolean): Option[Expression] = {
    val refs = pred.references.toSeq
    if (pred.deterministic && refs.nonEmpty && refs.forall(isSketched))
      Some(pred.transform {
        case a: AttributeReference if isSketched(a) => attrOf(partCol)
      })
    else None
  }
}

object Sketches {
  val FileIdColumn = "_data_file_id"

  def fromSpecs(specs: Seq[SketchSpec]): Seq[Sketch] =
    specs.zipWithIndex.map {
      case (s, i) => s.sketchKind match {
        case "minmax" => MinMaxSketch(s, s"s$i")
        case "bloom" => BloomSketch(s, s"s$i",
          s.params.getOrElse("expectedItems", "10000").toLong,
          s.params.getOrElse("fpp", "0.01").toDouble)
        case "partition" => PartitionSketch(s, s"s$i")
        case "valuelist" => ValueListSketch(s, s"s$i",
          s.params.getOrElse("maxValues", "1000").toInt)
        case k => throw new IllegalArgumentException(s"Unknown sketch kind '$k'")
      }
    }

  /**
   * Translate a full filter condition into an index predicate
   * (reference: DataSkippingIndex.scala:143-185 — And keeps partial
   * translations, Or requires both sides, leaves dispatch to sketches).
   */
  def translate(
      cond: Expression,
      sketches: Seq[Sketch],
      attrOf: String => Expression,
      resolver: Resolver): Option[Expression] = {

    def isSketchedBy(s: Sketch)(e: Expression): Boolean = e match {
      case a: AttributeReference => resolver(a.name, s.sourceColumn)
      case _ => false
    }

    def go(e: Expression): Option[Expression] = e match {
      case And(l, r) => (go(l), go(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (Some(a), None) => Some(a)
        case (None, Some(b)) => Some(b)
        case _ => None
      }
      case Or(l, r) => for { a <- go(l); b <- go(r) } yield Or(a, b)
      case leaf =>
        sketches.iterator
          .flatMap(s => s.convert(leaf, attrOf, isSketchedBy(s)))
          .nextOption()
    }
    go(cond)
  }
}
