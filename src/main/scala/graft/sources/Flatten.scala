package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Recursive struct flattener — the engine's version of the reference's
  * `flatten_dict` (reference `kafka_producer/yahoo_finance_producer.py:72-80`):
  * nested keys joined with `sep` into a single flat namespace, applied to
  * Spark `StructType` columns instead of Python dicts (P3, SURVEY.md §2.2).
  *
  * Schema-first: the flattening is computed from the schema at plan time —
  * one narrow `select`, no per-row recursion, fully codegen'd, and column
  * pruning still reaches the scan because each output column maps to one
  * nested field path.
  */
object Flatten {

  /** All leaf columns of `schema`, aliased `a_b_c` for nested path a.b.c. */
  def leafColumns(schema: StructType, sep: String = "_"): Seq[Column] = {
    def walk(s: StructType, path: Seq[String]): Seq[Column] =
      s.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case nested: StructType => walk(nested, p)
          case _ =>
            Seq(col(p.map(n => s"`$n`").mkString(".")).as(p.mkString(sep)))
        }
      }
    walk(schema, Nil)
  }

  def apply(df: DataFrame, sep: String = "_"): DataFrame =
    df.select(leafColumns(df.schema, sep): _*)
}
