package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-trip for the JDBC upsert sink (SURVEY S8 option (b)) against
  * embedded Derby — the in-container stand-in for the reference's Postgres
  * warehouse (reference etl/load.py:30-52). Derby speaks ANSI MERGE; the
  * Postgres dialect's SQL shape is asserted textually. */
class JdbcUpsertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val props = new java.util.Properties()
  private val varcharName = Map("createTableColumnTypes" -> "name VARCHAR(64)")

  test("embedded round-trip: insert, within-batch dedup, conflicting re-upsert") {
    val url = s"jdbc:derby:${tempDir("derby")}/wh;create=true"
    // batch 1 carries an internal conflict on id=2: the later row must win
    // (last-writer-wins, the Upsert.upsert contract)
    val batch1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "b2", 21.0))
      .toDF("id", "name", "v")
    JdbcUpsert.upsert(batch1, url, "items", Seq("id"),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)

    def table() = spark.read.jdbc(url, "items", props).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val t1 = table()
    assert(t1.size === 2)
    assert(t1(1L) === (("a", 10.0)))
    assert(t1(2L) === (("b2", 21.0)))

    // batch 2: conflicting update for id=2, fresh insert id=3
    val batch2 = Seq((2L, "bb", 22.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    JdbcUpsert.upsert(batch2, url, "items", Seq("id"),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    val t2 = table()
    assert(t2.size === 3)
    assert(t2(1L) === (("a", 10.0)))   // untouched key survives
    assert(t2(2L) === (("bb", 22.0)))  // conflict → batch wins
    assert(t2(3L) === (("c", 30.0)))   // new key inserted

    // idempotent re-run: same batch, no growth, same content
    JdbcUpsert.upsert(batch2, url, "items", Seq("id"),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    assert(table() === t2)
  }

  test("mergeCdc: delete tombstones, updates, inserts in one transaction; replay idempotent") {
    val url = s"jdbc:derby:${tempDir("derby-cdc")}/wh;create=true"
    val opts = Map("createTableColumnTypes" -> "name VARCHAR(64), op VARCHAR(1)")
    // seed the table
    JdbcUpsert.mergeCdc(
      Seq((1L, "a", "U"), (2L, "b", "U"), (3L, "c", "U")).toDF("id", "name", "op"),
      url, "cdc", Seq("id"), opCol = "op",
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = opts)
    def table() = spark.read.jdbc(url, "cdc", props)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(table() === Map(1L -> "a", 2L -> "b", 3L -> "c"))

    // CDC batch: update 1, delete 2, insert 4, tombstone for absent 9 (no-op)
    val batch = Seq((1L, "A2", "U"), (2L, "b", "D"), (4L, "d", "U"), (9L, "", "D"))
      .toDF("id", "name", "op")
    JdbcUpsert.mergeCdc(batch, url, "cdc", Seq("id"), opCol = "op",
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = opts)
    assert(table() === Map(1L -> "A2", 3L -> "c", 4L -> "d"))

    // replay the same batch: deletes of absent keys and re-upserts are no-ops
    JdbcUpsert.mergeCdc(batch, url, "cdc", Seq("id"), opCol = "op",
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = opts)
    assert(table() === Map(1L -> "A2", 3L -> "c", 4L -> "d"))
  }

  test("mergeCdc: NULL op rows upsert instead of silently vanishing") {
    val url = s"jdbc:derby:${tempDir("derby-cdc-null")}/wh;create=true"
    val opts = Map("createTableColumnTypes" -> "name VARCHAR(64), op VARCHAR(1)")
    val batch = Seq((1L, "a", Some("U")), (2L, "b", Option.empty[String]))
      .toDF("id", "name", "op")
    JdbcUpsert.mergeCdc(batch, url, "cdcn", Seq("id"), opCol = "op",
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = opts)
    val table = spark.read.jdbc(url, "cdcn", props)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(table === Map(1L -> "a", 2L -> "b")) // null-op row made it in
  }

  test("mergeCdc: non-string op column fails fast instead of silently upserting tombstones") {
    val url = s"jdbc:derby:${tempDir("derby-cdc-int")}/wh;create=true"
    val batch = Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "name", "op")
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.mergeCdc(batch, url, "cdci", Seq("id"), opCol = "op",
        dialect = JdbcUpsert.AnsiMerge)
    }
    assert(e.getMessage.contains("StringType"))
  }

  test("exotic table names round-trip quoted; injection shapes cannot escape") {
    // 'my table' is not a plain identifier — it must be quoted in every
    // generated statement, while staging/index names stay plain
    val url = s"jdbc:derby:${tempDir("derby-quoted")}/wh;create=true"
    val batch = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    JdbcUpsert.upsert(batch, url, "my table", Seq("id"),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    val rows = spark.read.jdbc(url, "\"my table\"", props)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a", 2L -> "b"))
    // second upsert against the same exotic name (tableExists must find it)
    JdbcUpsert.upsert(Seq((2L, "b2", 21.0)).toDF("id", "name", "v"),
      url, "my table", Seq("id"),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    val rows2 = spark.read.jdbc(url, "\"my table\"", props)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows2 === Map(1L -> "a", 2L -> "b2"))

    // a name with an embedded quote is escaped, not an escape hatch
    assert(JdbcUpsert.renderIdent("a\"b;drop") === "\"a\"\"b;drop\"")
    intercept[IllegalArgumentException] { JdbcUpsert.renderIdent("bad\nname") }
  }

  test("Postgres CDC dialect emits EXISTS-delete + guarded ON CONFLICT insert") {
    val sqls = JdbcUpsert.PostgresOnConflict.mergeCdcSql(
      "t", "t_stg", Seq("id", "name"), Seq("id"), "op", "D")
    assert(sqls.length === 2)
    assert(sqls.head.contains("DELETE FROM t t WHERE EXISTS"))
    assert(sqls.head.contains("s.\"op\" = 'D'"))
    assert(sqls(1).contains("WHERE \"op\" <> 'D'"))
    assert(sqls(1).contains("ON CONFLICT (\"id\") DO UPDATE SET \"name\" = EXCLUDED.\"name\""))
  }

  test("explicit orderBy overrides arrival order for within-batch conflicts") {
    val url = s"jdbc:derby:${tempDir("derby-ord")}/wh;create=true"
    val batch = Seq((1L, "old", 2024L), (1L, "new", 2025L), (1L, "mid", 2020L))
      .toDF("id", "name", "version")
    JdbcUpsert.upsert(batch, url, "versioned", Seq("id"),
      orderBy = Seq(org.apache.spark.sql.functions.col("version").desc),
      dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    val rows = spark.read.jdbc(url, "versioned", props).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(1) === "new") // highest version, not last row
  }

  test("JDBC and parquet upsert sinks converge to identical keyed state") {
    import org.apache.spark.sql.functions.col
    val url = s"jdbc:derby:${tempDir("derby-parity")}/wh;create=true"
    val pq = tempDir("parity-pq") + "/table"
    // overlapping keys across batches + an in-batch conflict (id=2, three
    // versions); priority: highest version wins
    val batches = Seq(
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      Seq((2L, "b2", 3L), (4L, "d", 1L), (2L, "bx", 2L)),
      Seq((1L, "a2", 2L), (5L, "e", 1L)))
    batches.foreach { b =>
      val df = b.toDF("id", "name", "version")
      Upsert.upsertTable(spark, pq, df, Seq("id"), Seq(col("version").desc))
      JdbcUpsert.upsert(df, url, "parity", Seq("id"),
        orderBy = Seq(col("version").desc),
        dialect = JdbcUpsert.AnsiMerge, stagingOptions = varcharName)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "name", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val viaParquet = rows(spark.read.parquet(pq))
    val viaJdbc = rows(spark.read.jdbc(url, "parity", props))
    assert(viaParquet === viaJdbc)
    assert(viaParquet === Seq((1L, "a2", 2L), (2L, "b2", 3L), (3L, "c", 1L),
      (4L, "d", 1L), (5L, "e", 1L)))
  }

  test("PostgresOnConflict emits the reference's ON CONFLICT DO UPDATE form") {
    val sql = JdbcUpsert.PostgresOnConflict
      .upsertSql("fact", "fact_staging", Seq("k1", "k2", "a", "b"), Seq("k1", "k2"))
    assert(sql.contains("""INSERT INTO fact ("k1", "k2", "a", "b")"""))
    assert(sql.contains("""SELECT "k1", "k2", "a", "b" FROM fact_staging"""))
    assert(sql.contains(
      """ON CONFLICT ("k1", "k2") DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b""""))
    // all-key table degrades to DO NOTHING (nothing to update)
    val keysOnly = JdbcUpsert.PostgresOnConflict
      .upsertSql("t", "t_staging", Seq("k"), Seq("k"))
    assert(keysOnly.contains("""ON CONFLICT ("k") DO NOTHING"""))
  }
}
