package graft.index

import org.apache.spark.sql.DataFrame

/** Resolve user-given column names against a DataFrame schema using the
  * session's resolver (case-insensitive by default), returning the
  * canonical (schema-cased) names. Reference analogue:
  * util/ResolverUtils.scala:44-104 (minus nested-column flattening). */
object ColumnResolver {
  def resolveAll(df: DataFrame, names: Seq[String]): Seq[String] = {
    val resolver = df.sparkSession.sessionState.conf.resolver
    names.map { n =>
      // top-level fields win; otherwise `a.b.c` resolves as a nested
      // struct-field path (flattened at build time — see NestedColumns)
      NestedColumns.resolvePath(df.schema, n, resolver).getOrElse(
        throw new IllegalArgumentException(
          s"Column '$n' not found in schema ${df.schema.simpleString}"))
    }
  }
}
