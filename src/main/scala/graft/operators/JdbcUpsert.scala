package graft.operators

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert into a JDBC warehouse — SURVEY.md S8 option (b), the
  * reference's actual sink (Postgres `INSERT … ON CONFLICT DO UPDATE`,
  * reference etl/load.py:30-52).
  *
  * Spark-first split of the work:
  *  - the DATA path is distributed: the batch is deduped last-writer-wins
  *    (same contract as [[Upsert]]) and written `df.write.jdbc` into a
  *    staging table — one connection per partition, cluster-parallel;
  *  - the MERGE is one driver-side set-based statement inside a single
  *    transaction (staging → target), so concurrent readers never observe a
  *    half-applied batch and a crashed run leaves the target untouched.
  *
  * The SQL dialect is pluggable: [[PostgresOnConflict]] emits the
  * reference's `ON CONFLICT` form (requires a unique index on the keys,
  * exactly as the reference's schema.sql declares); [[AnsiMerge]] emits
  * standard `MERGE INTO` (Derby/DB2/SQL Server/Oracle — and what the
  * embedded round-trip spec runs against).
  */
object JdbcUpsert {

  trait Dialect extends Serializable {
    def upsertSql(target: String, staging: String,
                  cols: Seq[String], keys: Seq[String]): String
    /** CDC merge statements: rows whose `opCol` equals `deleteValue`
      * DELETE their matched target row; all other rows upsert. `cols` are
      * the TARGET columns (opCol excluded — it lives only in staging).
      * Returned statements run in ONE transaction. */
    def mergeCdcSql(target: String, staging: String, cols: Seq[String],
                    keys: Seq[String], opCol: String, deleteValue: String): Seq[String]
    /** Spark's JDBC writer creates staging columns QUOTED (lower case as
      * written); unquoted identifiers would case-fold past them in both
      * Derby (upper) and Postgres (lower), so the generated SQL quotes
      * every column reference. */
    protected def q(id: String): String = "\"" + id + "\""
  }

  /** Postgres `INSERT … ON CONFLICT (keys) DO UPDATE` (etl/load.py:39-47).
    * Requires a unique constraint/index on the key columns. */
  object PostgresOnConflict extends Dialect {
    override def upsertSql(target: String, staging: String,
                           cols: Seq[String], keys: Seq[String]): String = {
      val nonKeys = cols.filterNot(keys.contains)
      val conflictAction =
        if (nonKeys.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      s"""INSERT INTO $target (${cols.map(q).mkString(", ")})
         |SELECT ${cols.map(q).mkString(", ")} FROM $staging
         |ON CONFLICT (${keys.map(q).mkString(", ")}) $conflictAction""".stripMargin
    }

    /** Postgres pre-15 has no MERGE: tombstone DELETE (standard
      * EXISTS-correlated form) + ON CONFLICT upsert of the survivors, both
      * inside the caller's transaction. */
    override def mergeCdcSql(target: String, staging: String, cols: Seq[String],
                             keys: Seq[String], opCol: String,
                             deleteValue: String): Seq[String] = {
      val keyMatch = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val del =
        s"""DELETE FROM $target t WHERE EXISTS (
           |SELECT 1 FROM $staging s WHERE $keyMatch AND s.${q(opCol)} = '$deleteValue')""".stripMargin
      val nonKeys = cols.filterNot(keys.contains)
      val conflictAction =
        if (nonKeys.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      val ins =
        s"""INSERT INTO $target (${cols.map(q).mkString(", ")})
           |SELECT ${cols.map(q).mkString(", ")} FROM $staging
           |WHERE ${q(opCol)} <> '$deleteValue'
           |ON CONFLICT (${keys.map(q).mkString(", ")}) $conflictAction""".stripMargin
      Seq(del, ins)
    }
  }

  /** ANSI `MERGE INTO` — needs no declared constraint on the target. */
  object AnsiMerge extends Dialect {
    override def upsertSql(target: String, staging: String,
                           cols: Seq[String], keys: Seq[String]): String = {
      val nonKeys = cols.filterNot(keys.contains)
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val matched =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + "\n"
      s"""MERGE INTO $target t
         |USING $staging s
         |ON $on
         |${matched}WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
         |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
    }

    /** One three-clause MERGE: tombstones delete, others update/insert
      * (clause refinements keep the priority explicit). */
    override def mergeCdcSql(target: String, staging: String, cols: Seq[String],
                             keys: Seq[String], opCol: String,
                             deleteValue: String): Seq[String] = {
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val nonKeys = cols.filterNot(keys.contains)
      val update =
        if (nonKeys.isEmpty) ""
        else s"WHEN MATCHED AND s.${q(opCol)} <> '$deleteValue' THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + "\n"
      Seq(
        s"""MERGE INTO $target t
           |USING $staging s
           |ON $on
           |WHEN MATCHED AND s.${q(opCol)} = '$deleteValue' THEN DELETE
           |${update}WHEN NOT MATCHED AND s.${q(opCol)} <> '$deleteValue'
           |THEN INSERT (${cols.map(q).mkString(", ")})
           |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin)
    }
  }

  /** Upsert `batch` into JDBC table `target` keyed on `keys`.
    *
    * `orderBy` breaks ties WITHIN the batch (last writer wins, descending
    * preference first — same contract as [[Upsert.upsert]]); rows already in
    * the target always lose to the batch (the reference's DO UPDATE).
    * `stagingOptions` is passed to the staging `df.write.jdbc` (e.g.
    * `createTableColumnTypes` to get VARCHAR keys instead of the dialect's
    * default CLOB/TEXT, which some databases refuse to compare in a MERGE). */
  def upsert(batch: DataFrame, url: String, target: String, keys: Seq[String],
             orderBy: Seq[Column] = Nil,
             dialect: Dialect = PostgresOnConflict,
             props: Properties = new Properties(),
             stagingOptions: Map[String, String] = Map.empty): Unit = {
    val cols = batch.columns.toSeq
    stageAndApply(batch, url, target, keys, orderBy, props, stagingOptions,
      targetCols = cols,
      statements = staging =>
        Seq(dialect.upsertSql(renderIdent(target), staging, cols, keys)))
  }

  /** Render a table name for embedding in generated SQL. Plain identifiers
    * pass through unquoted (keeping the dialect's case-folding, which
    * [[tableExists]] relies on); anything else — spaces, punctuation, a
    * would-be `a;b` injection — is double-quoted with embedded quotes
    * escaped, so exotic names round-trip instead of breaking the statement
    * or injecting into it. Control characters are rejected outright. */
  private[operators] def renderIdent(id: String): String = {
    require(id.nonEmpty && !id.exists(_.isControl), s"bad SQL identifier: '$id'")
    if (id.matches("[A-Za-z_][A-Za-z0-9_]*")) id
    else "\"" + id.replace("\"", "\"\"") + "\""
  }

  /** Shared skeleton for the JDBC sinks: last-writer-wins dedup →
    * distributed staging write (unique table name: concurrent loads into
    * the same target must not share or clobber staging) → dialect
    * statements + staging drop in ONE transaction; on failure, roll back
    * and reap the staging table (its write committed outside the txn). */
  private def stageAndApply(batch: DataFrame, url: String, target: String,
                            keys: Seq[String], orderBy: Seq[Column],
                            props: Properties, stagingOptions: Map[String, String],
                            targetCols: Seq[String],
                            statements: String => Seq[String],
                            freshInsertWhere: String = ""): Unit = {
    require(keys.nonEmpty, "JDBC load requires at least one key column")
    require(keys.forall(batch.columns.contains),
      s"keys $keys must be columns of the batch")

    // batch-level last-writer-wins dedup (load.py dedupes before INSERT —
    // Postgres rejects two conflicting rows in one statement otherwise).
    // With no caller ordering the tiebreak is pure ingest order
    // (monotonically_increasing_id), which an aggregate `max_by` resolves
    // identically to the window form (the id is unique, so there are no
    // ties for either to break) — but with MAP-SIDE partial combine: the
    // shuffle carries one candidate per key per partition instead of
    // dragging the whole micro-batch through a window sort. Caller-supplied
    // orderings keep the window form (they may mix .asc/.desc SortOrders).
    val deduped = if (orderBy.isEmpty) {
      val cols = batch.columns
      batch
        .withColumn("__mid", monotonically_increasing_id())
        .groupBy(keys.map(col): _*)
        .agg(max_by(struct(cols.map(col): _*), col("__mid")).as("__rep"))
        .select(cols.map(c => col(s"__rep.$c").as(c)): _*)
    } else {
      val ordering = orderBy :+ monotonically_increasing_id().desc
      batch
        .withColumn("__rn", row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)))
        .filter(col("__rn") === 1).drop("__rn")
    }

    // staging + index names derive from a SANITIZED base so they stay plain
    // identifiers whatever the target is called (Spark's JDBC writer embeds
    // the staging name raw in its own CREATE TABLE)
    val base = target.replaceAll("[^A-Za-z0-9_]", "_")
    val staging = s"${base}_staging_" +
      java.util.UUID.randomUUID().toString.replace("-", "").substring(0, 8)
    val writer = deduped.write.mode(SaveMode.Overwrite)
    stagingOptions.foreach { case (k, v) => writer.option(k, v) }
    writer.jdbc(url, staging, props)

    val targetSql = renderIdent(target)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      if (!tableExists(conn, target)) {
        val projected = targetCols.map(c => "\"" + c + "\"").mkString(", ")
        execute(conn,
          s"CREATE TABLE $targetSql AS SELECT $projected FROM $staging WITH NO DATA")
        // Fresh-table FAST PATH: the target is empty and the batch is
        // already key-deduped, so the dialect's conflict machinery has
        // nothing to resolve — load with a plain INSERT…SELECT and declare
        // the unique key index AFTER the bulk load (per-row index
        // maintenance during the initial MERGE measured 3.2× slower on the
        // embedded round-trip: 4.66 s vs 1.45 s at 172k rows). The index is
        // still created in the SAME transaction, so the operator's
        // key-uniqueness invariant (which ON CONFLICT resolves against on
        // later batches — 42P10 otherwise) is never observable as absent.
        // CDC batches filter their delete-tombstones via `freshInsertWhere`
        // (a delete against an empty table is a no-op).
        execute(conn,
          s"INSERT INTO $targetSql ($projected) SELECT $projected FROM $staging" +
            freshInsertWhere)
        val quoted = keys.map(k => "\"" + k + "\"").mkString(", ")
        execute(conn, s"CREATE UNIQUE INDEX ${base}_key_ux ON $targetSql ($quoted)")
      } else {
        statements(staging).foreach(execute(conn, _))
      }
      execute(conn, s"DROP TABLE $staging")
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        try { conn.setAutoCommit(true); execute(conn, s"DROP TABLE $staging") }
        catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }

  /** CDC merge: `batch` carries `opCol`; rows whose op equals
    * `deleteValue` DELETE their target row, every other row upserts —
    * the replication-stream load shape (insert/update/delete tombstones)
    * against the reference's warehouse. Same distributed-staging +
    * one-transaction contract as [[upsert]]; the op column stays in
    * staging and never reaches the target. Replay-idempotent: deletes of
    * absent keys and re-upserts of applied rows are no-ops. */
  def mergeCdc(batch: DataFrame, url: String, target: String, keys: Seq[String],
               opCol: String, deleteValue: String = "D",
               orderBy: Seq[Column] = Nil,
               dialect: Dialect = PostgresOnConflict,
               props: Properties = new Properties(),
               stagingOptions: Map[String, String] = Map.empty): Unit = {
    require(batch.columns.contains(opCol), s"batch must carry op column $opCol")
    require(deleteValue.nonEmpty && !deleteValue.contains("'"),
      "deleteValue is embedded in SQL literals: non-empty, no quotes")
    // the generated SQL compares the op column to a quoted string literal
    // and the NULL-normalization below coalesces with '' — a non-string op
    // (e.g. an int op code) would be implicitly cast or silently never
    // match deleteValue; fail fast instead
    val opType = batch.schema(opCol).dataType
    require(opType == org.apache.spark.sql.types.StringType,
      s"op column $opCol must be StringType, got ${opType.simpleString} — " +
        "cast it to string explicitly before mergeCdc")
    val cols = batch.columns.toSeq.filterNot(_ == opCol)
    // a NULL op would match NEITHER the delete nor the upsert guard
    // (NULL <> 'D' is NULL) and the row would silently vanish — normalize
    // it to the upsert path, matching the documented "all other rows
    // upsert" contract
    val normalized = batch.withColumn(opCol,
      coalesce(col(opCol), lit("")))
    stageAndApply(normalized, url, target, keys, orderBy, props, stagingOptions,
      targetCols = cols,
      statements = staging =>
        dialect.mergeCdcSql(renderIdent(target), staging, cols, keys, opCol, deleteValue),
      // identifier ALWAYS double-quoted (Spark's JDBC writer creates the
      // staging column case-exact, so a bare identifier would be
      // case-folded by the engine), literal with quotes doubled: the
      // require above already rejects quoted deleteValues, but the
      // predicate must stay well-formed even if that gate ever loosens
      // (advisor, round 18 — injection-style breakage on the fresh path)
      freshInsertWhere = " WHERE \"" + opCol.replace("\"", "\"\"") +
        s"""" <> '${deleteValue.replace("'", "''")}'""")
  }

  private def execute(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try st.execute(sql): Unit
    finally st.close()
  }

  /** Case-insensitive existence check via JDBC metadata (Derby folds
    * unquoted identifiers to upper case, Postgres to lower). */
  private def tableExists(conn: Connection, table: String): Boolean = {
    def probe(name: String): Boolean = {
      val rs = conn.getMetaData.getTables(null, null, name, Array("TABLE"))
      try rs.next() finally rs.close()
    }
    probe(table.toUpperCase) || probe(table.toLowerCase) || probe(table)
  }
}
