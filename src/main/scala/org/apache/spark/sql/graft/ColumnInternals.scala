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
}
