package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers: bucketed tables for co-located joins, and
  * Z-order clustering for multi-dimensional file skipping.
  *
  * A join between two tables bucketed by the same key into the same bucket
  * count needs NO shuffle — each task reads matching buckets from both
  * sides. At 100 TB this converts the dominant cost of fact⋈fact joins
  * (a full shuffle of both sides) into a local merge per bucket; the price
  * is paid once at write time. Bucketing requires the session catalog
  * (`saveAsTable`), which works against the default in-memory catalog +
  * `spark.sql.warehouse.dir` with no Hive metastore.
  *
  * Z-ordering serves the other scan axis: parquet keeps min/max stats per
  * file and row group, and a scan with a predicate skips units whose range
  * doesn't overlap — but sorting by ONE column leaves every other column's
  * ranges spanning the whole table. Interleaving the bits of N scaled
  * columns (a Morton curve) keeps each file's bounding box tight in ALL N
  * dimensions, so selective predicates on any of them skip most files. */
object Layout {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Pay-once bucketed layout, cached per (source path, source mtime) per
    * JVM — the q02/q87 cache-key discipline in one place. `tag` namespaces
    * the layout; each spec is (shortName, frame, bucketCol, numBuckets);
    * `sources` lists the table file names under `dir` whose modification
    * times key the cache. Returns the resolved table names in spec order.
    *
    * The mtime resolves through the Hadoop FileSystem for the path's
    * scheme — `java.io.File.lastModified` returns 0 for hdfs://-like
    * URIs, which would silently serve stale buckets after a remote data
    * refresh. Before writing a new generation, every PRIOR mtime-suffixed
    * generation of the same (tag, dir) is dropped from the catalog and its
    * warehouse directory deleted, so repeated regenerations don't leak
    * warehouse disk (the in-memory catalog forgets managed tables across
    * JVMs while their directories survive). */
  def payOnceBucketed(s: SparkSession, dir: String, tag: String,
                      sources: Seq[String],
                      specs: Seq[(String, DataFrame, String, Int)]): Seq[String] = {
    import graft.util.Fs
    val conf = s.sparkContext.hadoopConfiguration
    val mtime = sources.map { tn =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$tn.parquet")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
    }.max
    // SANITIZED FULL PATH, not a 32-bit hash — two dirs colliding would
    // silently serve the wrong tables
    val dirSfx = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val names = specs.map { case (short, _, _, _) =>
      s"graft_${tag}_${short}_${dirSfx}_$mtime"
    }
    if (!names.forall(s.catalog.tableExists)) {
      val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
      specs.foreach { case (short, _, _, _) =>
        val prefix = s"graft_${tag}_${short}_${dirSfx}_"
        s.catalog.listTables().collect()
          .filter(_.name.startsWith(prefix))
          .foreach(ti => s.sql(s"DROP TABLE IF EXISTS ${ti.name}"))
        // prior-mtime dirs orphaned by earlier JVMs, plus any half-written
        // current dir — the prefix covers both
        Fs.childDirsWithPrefix(wh, prefix, conf)
          .foreach(d => Fs.deleteRecursively(s"$wh/$d", conf))
      }
      specs.zip(names).foreach { case ((_, df, bucketCol, nb), tbl) =>
        writeBucketed(df, tbl, bucketCol, nb)
      }
    }
    names
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the co-location check for bucketed joins. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Compact the small files a bucketed keyed table accumulates: every
    * incremental [[Upsert.upsertPartitionedTable]]/[[Merge.mergePartitionedTable]]
    * batch rewrites its touched buckets as fresh files, and a
    * frequently-merged bucket ends up as many small parquet files — more
    * footer reads and task overhead per scan. Compaction rewrites ONLY the
    * buckets holding more than `maxFilesPerBucket` files (coalesced to one
    * file each, staged then swapped — same crash contract as the merge
    * path). Data, layout contract, and the bucket marker are unchanged.
    * Returns the number of buckets compacted. */
  def compactBuckets(spark: SparkSession, path: String,
                     maxFilesPerBucket: Int = 4): Int = {
    import graft.util.Fs
    val conf = spark.sparkContext.hadoopConfiguration
    require(Fs.readMarker(s"$path/${Upsert.BucketMarker}", conf).isDefined,
      s"$path is not a graft bucketed layout")
    Upsert.withWriterLock(path, conf) {
      compactBucketsLocked(spark, path, maxFilesPerBucket)
    }
  }

  private def compactBucketsLocked(spark: SparkSession, path: String,
                                   maxFilesPerBucket: Int): Int = {
    import graft.util.Fs
    val conf = spark.sparkContext.hadoopConfiguration

    // crash recovery FIRST: a previous run that died inside swapInto
    // (between deleting the bucket dir and renaming the staged copy in)
    // left the bucket's only copy in a hidden .__graft_compact_* dir.
    // Complete that swap before anything else; staging dirs whose bucket
    // still exists are pre-swap leftovers and are discarded.
    def stagingFor(b: String) = s"$path/.__graft_compact_$b"
    Fs.childDirsWithPrefix(path, ".__graft_compact_", conf).foreach { stagedDir =>
      val bucket = stagedDir.stripPrefix(".__graft_compact_")
      if (!Fs.exists(s"$path/$bucket", conf))
        Fs.swapInto(s"$path/$stagedDir", s"$path/$bucket", conf)
      else
        Fs.deleteRecursively(s"$path/$stagedDir", conf)
    }

    val buckets = Fs.childDirsWithPrefix(path, Upsert.BucketCol + "=", conf)
    val oversized = buckets.filter { b =>
      val fs = Fs.fileSystem(s"$path/$b", conf)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$b"))
        .count(s => s.isFile && !s.getPath.getName.startsWith("_")) > maxFilesPerBucket
    }
    oversized.foreach { b =>
      // the staged copy is FULLY materialized before the bucket dir is
      // touched; a crash mid-swap is healed by the recovery preamble above
      spark.read.parquet(s"$path/$b").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stagingFor(b))
      Fs.swapInto(stagingFor(b), s"$path/$b", conf)
    }
    oversized.size
  }

  /** Morton z-value of already-scaled non-negative integer columns (each in
    * `[0, 2^bits)`): bit `i` of column `j` lands at interleaved position
    * `i*N + j`. Pure bit arithmetic — codegen'd, no UDF. */
  def interleaveBits(scaled: Seq[Column], bits: Int): Column = {
    val n = scaled.length
    val parts = for {
      i <- 0 until bits
      (c, j) <- scaled.zipWithIndex
    } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Z-value over numeric columns, min/max-scaled to `bits` bits each.
    * `ranges` supplies (min, max) per column — compute once per write via
    * an `agg(min, max)` pass (two scalars per column reach the driver).
    * Nulls scale to 0 (sort first, like a NULLS FIRST cluster). */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.length == ranges.length)
    require(bits * cols.length <= 60, "z-value must fit a long")
    val maxV = (1L << bits) - 1
    val scaled = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      // CLAMP out-of-range values (callers reuse ranges across incremental
      // writes, so rows beyond [lo,hi] are legal) — a bitmask would WRAP
      // them to the opposite end of the curve and wreck the file boxes
      least(
        greatest(
          coalesce(floor((c.cast("double") - lo) / span * maxV).cast("long"),
            lit(0L)),
          lit(0L)),
        lit(maxV))
    }
    interleaveBits(scaled, bits)
  }

  /** Rewrite `df` as parquet z-ordered on `cols`: range-partition by the
    * z-value into `numFiles` tight Morton segments, sort within each, drop
    * the helper column, write. One write-time shuffle buys min/max file
    * skipping on every clustered column for all later scans. */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 16): Unit = {
    val exprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val mm = df.agg(exprs.head, exprs.tail: _*).head()
    // empty input / all-null column → null min/max: degrade to a unit
    // range (every such row z-scales to 0) instead of an opaque NPE
    val ranges = cols.indices.map { i =>
      if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1)) (0.0, 1.0)
      else (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
    }
    df.withColumn("__graft_z", zValue(cols.map(col), ranges, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
