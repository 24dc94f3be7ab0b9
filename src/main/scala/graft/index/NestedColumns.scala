package graft.index

import org.apache.spark.sql.catalyst.analysis.Resolver
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GetStructField}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Nested-column support: struct-field paths (`a.b.c`) are indexable; index
 * data stores them FLATTENED into top-level columns (reference:
 * util/ResolverUtils.scala:44-104 flattens to `__hs_nested.<path>`; we
 * encode with `__` separators instead of dots so the physical name stays
 * inert through every name-based Spark surface — bucketBy, parquet,
 * UnresolvedAttribute parsing — without quoting).
 *
 * Logical names (user configs, descriptors, coverage checks) keep the
 * dotted path; the physical encoding appears only in index data schemas
 * and scan-substitution attribute rewriting.
 */
object NestedColumns {

  val Prefix = "__graft_nested__"

  def isNested(logical: String): Boolean = logical.contains(".")

  /** Flat column name used in index data for a logical path. */
  def physicalName(logical: String): String =
    if (isNested(logical)) Prefix + logical.replace(".", "__") else logical

  /** `GetStructField` chain rooted at an attribute → (root, field path). */
  def pathOf(e: Expression): Option[(AttributeReference, Seq[String])] = e match {
    case a: AttributeReference => Some((a, Nil))
    case g: GetStructField =>
      pathOf(g.child).map { case (a, p) =>
        (a, p :+ g.childSchema(g.ordinal).name)
      }
    case _ => None
  }

  /** Logical dotted name of an access: `a` for a bare attribute, `a.b.c`
    * for a struct-field chain. */
  def logicalName(root: AttributeReference, path: Seq[String]): String =
    (root.name +: path).mkString(".")

  /** All leaf accesses in an expression: struct-field chains are recorded
    * whole (their inner attribute is NOT also reported); any other bare
    * attribute reference is recorded with an empty path. */
  def accesses(e: Expression): Seq[(AttributeReference, Seq[String])] = e match {
    case g: GetStructField =>
      pathOf(g) match {
        case Some(hit) => Seq(hit)
        case None => g.children.flatMap(accesses) // chain over non-attribute
      }
    case a: AttributeReference => Seq((a, Nil))
    case other => other.children.flatMap(accesses)
  }

  /** Does `logical` (possibly dotted) resolve against these attributes —
    * either as a top-level column or as a struct-field path? */
  def resolvableIn(
      output: Seq[Attribute], logical: String, resolver: Resolver): Boolean = {
    if (output.exists(a => resolver(a.name, logical))) return true
    val segs = logical.split('.')
    if (segs.length < 2) return false
    output.find(a => resolver(a.name, segs.head)).exists { root =>
      walk(root.dataType, segs.tail.toSeq, resolver).isDefined
    }
  }

  /** Resolve a dotted path against a schema, returning the canonical
    * (schema-cased) dotted name. Top-level fields win over paths. */
  def resolvePath(
      schema: StructType, logical: String, resolver: Resolver): Option[String] = {
    schema.fields.find(f => resolver(f.name, logical)) match {
      case Some(f) => Some(f.name)
      case None =>
        val segs = logical.split('.')
        if (segs.length < 2) None
        else schema.fields.find(f => resolver(f.name, segs.head)).flatMap { root =>
          walk(root.dataType, segs.tail.toSeq, resolver)
            .map(canon => (root.name +: canon).mkString("."))
        }
    }
  }

  private def walk(
      dt: DataType, segs: Seq[String], resolver: Resolver): Option[Seq[String]] =
    (dt, segs) match {
      case (_, Nil) => Some(Nil)
      case (s: StructType, head +: rest) =>
        s.fields.find(f => resolver(f.name, head)).flatMap(f =>
          walk(f.dataType, rest, resolver).map(f.name +: _))
      case _ => None
    }
}
