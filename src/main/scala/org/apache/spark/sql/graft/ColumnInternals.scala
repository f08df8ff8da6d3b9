package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, SortOrder}

/** Compile-checked accessors for `private[sql]` Column internals.
  *
  * Lives under `org.apache.spark.sql` so it can see `private[sql]` members —
  * the sanctioned pattern for Spark extensions that need plan/tree-level
  * introspection without string-matching on rendered plans.
  */
object ColumnInternals {

  /** True when the column is a SortOrder node (`.asc` / `.desc` / nulls-first
    * variants), i.e. not a plain value expression. */
  def isSortOrder(c: Column): Boolean = c.node match {
    case _: SortOrder => true
    case _: ColumnNode => false
  }

  /** The bare attribute name when the column is a plain single-part
    * reference (`col("x")` / `$"x"`), None for any computed expression.
    * Lets operators detect "this order column IS that payload column"
    * without string-matching on rendered expressions. */
  def simpleAttributeName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.UnresolvedAttribute
        if a.nameParts.length == 1 => Some(a.nameParts.head)
    case _ => None
  }
}
