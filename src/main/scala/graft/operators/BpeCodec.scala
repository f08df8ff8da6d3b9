package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.{tokens, tokensFast}

/** Scale-safe BPE ENCODE — the broadcast-merge-table greedy encoder the
  * round-13 verdict asked for (#3). [[BpeTrain.encode]]'s fused kernel
  * ([[graft.plans.BpeEncodeLen]]) applies merge rules SEQUENTIALLY — one
  * pass over the word's symbols per rule — so a word costs
  * O(rules × len): perfect at q110's 12-rule vocab, hopeless at a
  * production tokenizer's 30k–100k merges. This encoder is the standard
  * production shape (HuggingFace `tokenizers`, SentencePiece BPE): the
  * rank-ordered merge table ships to executors as ONE broadcast hash map
  * and each word is encoded by RANK-PRIORITY greedy merging — repeatedly
  * merge the adjacent pair with the lowest merge rank (leftmost on rank
  * ties) until no adjacent pair is in the table. Cost per word is
  * O(len² · lookup), INDEPENDENT of vocabulary size.
  *
  * Rank-priority is semantically EQUIVALENT to sequential rule
  * application (both resolve overlaps lowest-rank-first and leftmost
  * within a rank; a rule's matches are never consumed by a later rule in
  * either scheme). The equivalence is load-bearing, so it is pinned three
  * ways: a property spec against a sequential reference encoder on
  * randomized merge tables (`BpeCodecSpec`), a hard in-query gate
  * comparing against the [[graft.plans.BpeEncodeLen]] sequential kernel
  * on a deterministic word sample (q129), and q130's full DuckDB oracle,
  * which replays a 2-rule prefix table sequentially in SQL.
  *
  * The encode sits at the same `mapPartitions` codec seam as
  * [[Multimodal]]'s decoders: plain JVM code over an iterator, no
  * row-at-a-time UDF, executed once per DISTINCT word (vocabulary-sized,
  * never corpus-sized) with results broadcast-joined back to the word
  * instances — [[BpeTrain.encode]]'s proven shape. */
object BpeCodec {

  /** Rank lookup keyed `left` + '\u0000' + `right` — NUL can never occur
    * inside a symbol (words are whitespace-tokenized and merged symbols
    * concatenate their code points), so the key is unambiguous. A plain
    * string key keeps the per-pair probe cheap on the hot path (no tuple
    * boxing). */
  private[graft] def rankTable(
      merges: Seq[(String, String)]): java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins, matching rank order (a duplicated pair in a
      // malformed table must not demote its rank)
      m.putIfAbsent(a + "\u0000" + b, i)
    }
    m
  }

  /** Rank-priority greedy encode of one word: split into code-point
    * symbols, then repeatedly merge the adjacent pair with the lowest
    * rank in `table` (leftmost on ties) until none remains. Returns the
    * final symbol array. */
  private[graft] def greedyEncode(
      word: String, table: java.util.HashMap[String, Int]): Array[String] = {
    // code points, not UTF-16 units (the trainer's substring semantics)
    var n = 0
    var i = 0
    val syms = new Array[String](word.length)
    while (i < word.length) {
      val w = Character.charCount(word.codePointAt(i))
      syms(n) = word.substring(i, i + w)
      n += 1
      i += w
    }
    var done = n <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var k = 0
      while (k < n - 1) {
        val r = table.getOrDefault(syms(k) + "\u0000" + syms(k + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = k } // strict < keeps leftmost
        k += 1
      }
      if (bestAt < 0) done = true
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        var j = bestAt + 1
        while (j < n - 1) { syms(j) = syms(j + 1); j += 1 }
        n -= 1
        done = n <= 1
      }
    }
    java.util.Arrays.copyOfRange(syms, 0, n)
  }

  /** Compact per-document term frequencies `(doc_id, tfs:
    * array<struct<w,tf>>)`, computed ENTIRELY in a per-row projection —
    * sort the doc's token array, run-length encode it (the q132 DSIR RLE
    * idiom: run starts are the positions where the sorted value changes),
    * emit one struct per distinct word. No exchange happens at all: the
    * groupBy(doc_id, w) formulation shuffled one row per (doc, word) pair
    * — the corpus's dominant cardinality — to compute a quantity that is
    * local to each row. Documents with no tokens get an empty array.
    *
    * This is the ONE corpus tokenize pass both the table builder and the
    * encoder consume: persist THIS frame (one compact row per doc,
    * strictly smaller than the text) and derive flat views per consumer. */
  def termFrequencyEntries(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    // conditional rebalance (the round-15 single-partition lesson)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    graft.plans.Tokenize.register(docs.sparkSession)
    val sorted = balanced.select(col(idCol).as("doc_id"),
      array_sort(filter(tokensFast(col(textCol)), t => t =!= "")).as("__ws"))
    // Run starts over the sorted words. Guards (the q132 lessons):
    // `sequence(1, 0)` DESCENDS so the empty doc never reaches it; the i=1
    // branch is a lazy CASE (ANSI element_at(_, 0) errors — Or does not
    // short-circuit); `when`'s then-branch keeps element_at(__st, j+1)
    // unevaluated at the last run.
    val ws = col("__ws")
    val starts = when(size(ws) > 0,
      filter(sequence(lit(1), size(ws)), i =>
        when(i === 1, lit(true))
          .otherwise(element_at(ws, i) =!= element_at(ws, i - 1))))
      .otherwise(array().cast("array<int>"))
    sorted
      .select(col("doc_id"), col("__ws"), starts.as("__st"))
      .select(col("doc_id"),
        when(size(col("__st")) > 0,
          transform(sequence(lit(1), size(col("__st"))), j =>
            struct(
              element_at(col("__ws"), element_at(col("__st"), j)).as("w"),
              (when(j < size(col("__st")), element_at(col("__st"), j + 1))
                .otherwise(size(col("__ws")) + 1) -
                element_at(col("__st"), j)).cast("long").as("tf"))))
          .otherwise(array().cast("array<struct<w:string,tf:bigint>>"))
          .as("tfs"))
  }

  /** Flat `(doc_id, w, tf)` view of [[termFrequencyEntries]] — projection
    * only (explode of the per-row RLE), still no exchange. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    flatTf(termFrequencyEntries(docs, idCol, textCol))

  /** Explode a [[termFrequencyEntries]] frame to flat `(doc_id, w, tf)`.
    *
    * `explode_outer` + a post-filter on the GENERATED attribute, not plain
    * `explode`, and the difference is load-bearing: a non-outer explode
    * makes `InferFiltersFromGenerate` synthesize `size(tfs) > 0 AND
    * isnotnull(tfs)` on the generator input, and predicate pushdown then
    * carries that predicate below the rebalance exchange BY SUBSTITUTION —
    * the entire RLE expression (tokenize, array_sort, the run-start filter)
    * inlined ~20× into one per-row Filter that runs at the SCAN's
    * parallelism. On a 2-file sf1 corpus that turned a ~2.5 s dict build
    * into minutes on 2 cores (the persist() boundary had been masking it).
    * The outer explode infers no filter, and `__e IS NOT NULL` references a
    * column that only exists above the Generate, so nothing can sink. */
  def flatTf(entries: DataFrame): DataFrame =
    entries.select(col("doc_id"), explode_outer(col("tfs")).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col("doc_id"), col("__e.w").as("w"), col("__e.tf").as("tf"))

  /** Per-document fertility stats under a rank-ordered merge table —
    * [[BpeTrain.encode]]'s exact output schema
    * `(doc_id, n_words, n_chars, n_bpe_tokens, chars_per_token)`, with the
    * vocabulary-sized encode pass running through the broadcast-table
    * greedy encoder instead of the per-rule kernel. Documents with no
    * tokens emit no row. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    encodeFromTf(termFrequencies(docs, idCol, textCol), merges)

  /** [[encode]] over a pre-computed [[termFrequencies]] frame.
    *
    * `vocab`: an optional pre-computed distinct-word frame (any frame with
    * a `w` column, e.g. the `(w, cnt)` dict the caller already aggregated
    * for [[frequencyMergeTableFromDict]]). Without it the encoder derives
    * the vocabulary with `tf.select("w").distinct()` — a full
    * corpus-instance exchange that is pure waste when the caller holds a
    * persisted dict from the same tokenize pass (q129/q130 both did the
    * vocab exchange twice before this seam existed). */
  def encodeFromTf(tf: DataFrame, merges: Seq[(String, String)],
                   vocab: Option[DataFrame] = None): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge rule")
    val spark = tf.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rankTable(merges))
    val words = vocab.map(_.select("w")).getOrElse(tf.select("w").distinct())
    val dict = words.as[String]
      .mapPartitions { it =>
        val table = bc.value
        it.map(w => (w, greedyEncode(w, table).length.toLong))
      }.toDF("w", "n_syms")
    tf.join(broadcast(dict), "w")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_words"),
        sum(col("tf") * length(col("w")).cast("long")).as("n_chars"),
        sum(col("tf") * col("n_syms")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4)
          .as("chars_per_token"))
  }

  /** Global `(w, cnt)` word counts — the BPE dict — as ONE codegen'd
    * pass: explode the fused-tokenizer array, hash-aggregate. No per-doc
    * RLE: the dict is a GLOBAL aggregate, so partial aggregation already
    * collapses per-partition duplicates map-side and the exchange moves
    * only vocab-sized partials — the RLE's per-row array_sort + run-start
    * filters (interpreted HOFs) bought nothing here and dominated the
    * dict build (measured ~2.6 s vs ~0.9 s at sf1). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    graft.plans.Tokenize.register(docs.sparkSession)
    balanced
      .select(explode(tokensFast(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
  }

  /** [[encode]]'s per-document stats with NO exchange and NO per-word
    * grouping: every output is an INSTANCE sum (`n_words` = token count,
    * `n_chars` = Σ code points, `n_bpe_tokens` = Σ n_syms(token)), so one
    * `mapPartitions` pass tokenizes each doc in-JVM (the same
    * [[graft.plans.Tokenize]] kernel the SQL form calls) and folds against
    * a broadcast vocab→n_syms map. The vocab-sized collect behind that map
    * is exactly the rows a `broadcast(dict)` join would pull to the driver
    * to build its hash relation. Semantics mirror [[encodeFromTf]]:
    * docs with no tokens emit no row; `n_chars` counts code points (Spark
    * `length()`); `chars_per_token` is Spark's `round(x, 4)` (HALF_UP on
    * the double quotient). Differential spec: `BpeCodecSpec`. */
  def encodeStatsFromDocs(docs: DataFrame, vocab: DataFrame,
                          merges: Seq[(String, String)],
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge rule")
    statsFromEncodedVocab(docs, encodedLengths(vocab, merges), idCol, textCol)
  }

  /** Driver-side vocabulary ceiling for the broadcast-dict encode paths
    * (advisor r16): the collected `(word → count)` map is vocab-bounded
    * by design, but an unbounded raw-text vocabulary (no normalization,
    * adversarial tokens) would exhaust the driver entry by entry —
    * fail loudly at the cap instead. ~20M words ≈ low-GB of driver heap. */
  val MaxVocabWords: Int = 20000000

  /** The fold half of [[encodeStatsFromDocs]], reusable by any encoder
    * that can produce the vocab-bounded `word → token count` map (q121/
    * q122 feed it from the sequential [[graft.plans.BpeEncodeLen]] kernel
    * so the per-rule fold semantics stay in their evidence path).
    *
    * PRECONDITION (advisor r16): `idCol` must be unique per row — the
    * fold emits one stats row per INPUT row; duplicate ids are NOT merged
    * the way a groupBy(doc_id) formulation would merge them. */
  private[operators] def statsFromEncodedVocab(
      docs: DataFrame, nSyms: java.util.HashMap[String, Long],
      idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val bcN = spark.sparkContext.broadcast(nSyms)
    val idType = docs.schema(idCol).dataType
    balanced.select(col(idCol).cast("string").as("doc_id"), col(textCol))
      .mapPartitions { it =>
        val nSyms = bcN.value
        it.flatMap { r =>
          val text = r.getString(1)
          if (text == null) Iterator.empty
          else {
            val toks = graft.plans.Tokenize.tokenize(
              org.apache.spark.unsafe.types.UTF8String.fromString(text))
            var words = 0L; var chars = 0L; var toksOut = 0L
            var i = 0
            val n = toks.numElements()
            while (i < n) {
              val u = toks.getUTF8String(i)
              if (u.numBytes() > 0) {
                val w = u.toString
                words += 1
                chars += w.codePointCount(0, w.length)
                // a vocab built from THESE docs always resolves, so a miss
                // means the caller fed a stale/foreign vocab — fail with
                // the word and the contract, not a silent undercount (or,
                // when every word misses, an Infinity ratio downstream)
                if (!nSyms.containsKey(w)) throw new IllegalStateException(
                  s"BpeCodec: word '$w' is missing from the encoded vocab " +
                    "— the vocab map must come from wordCounts over the " +
                    "same corpus (stale or foreign vocab)")
                toksOut += nSyms.get(w)
              }
              i += 1
            }
            if (words == 0) Iterator.empty
            else {
              // exactly Spark's round(double, 4): double division first,
              // then BigDecimal.valueOf(double).setScale(HALF_UP)
              val cpt = java.math.BigDecimal.valueOf(chars.toDouble / toksOut)
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
              Iterator((r.getString(0), words, chars, toksOut, cpt))
            }
          }
        }
      }.toDF("doc_id", "n_words", "n_chars", "n_bpe_tokens", "chars_per_token")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /** Encode every vocab word on the executors, return the vocab-bounded
    * `word → token count` map (the hash relation a broadcast dict join
    * would build). */
  private def encodedLengths(vocab: DataFrame, merges: Seq[(String, String)])
      : java.util.HashMap[String, Long] = {
    require(merges.nonEmpty, "encode needs at least one merge rule")
    val spark = vocab.sparkSession
    import spark.implicits._
    val bcT = spark.sparkContext.broadcast(rankTable(merges))
    // cap enforced BEFORE driver materialization (advisor, round 18):
    // take(cap+1) bounds what ever reaches the driver to cap+1 rows — a
    // vocabulary far past the cap trips the require below without first
    // exhausting driver memory, which is exactly the failure the guard
    // exists for (a plain collect-then-require guards nothing)
    val enc = vocab.select("w").as[String].mapPartitions { it =>
      val t = bcT.value
      it.map(w => (w, greedyEncode(w, t).length.toLong))
    }.take(MaxVocabWords + 1)
    require(enc.length <= MaxVocabWords,
      s"BpeCodec: vocabulary exceeds $MaxVocabWords words — unbounded " +
        "raw-text vocab would exhaust the driver; normalize/hash words first")
    val m = new java.util.HashMap[String, Long](enc.length * 2)
    enc.foreach { case (w, n) => m.put(w, n) }
    m
  }

  /** A rank-ordered merge table of production SHAPE (hundreds of rules)
    * in O(levels) corpus-dict aggregations: level 1 takes the `perLevel`
    * most frequent adjacent CODE-POINT pairs (weighted by word count,
    * ties by byte order), each further level re-encodes the dict under
    * the table so far and appends the top `perLevel` adjacent SYMBOL
    * pairs — so later levels merge merged symbols, like real BPE ranks.
    *
    * This is NOT Sennrich training ([[BpeTrain.learnMerges]] is — one
    * argmax round per rule, 300 rules = 300 Spark jobs): within a level,
    * ranks come from one shared count rather than sequential re-counts.
    * The ENCODER doesn't care — it contracts only on a rank-ordered
    * table — and this builder sizes q129's table like production so the
    * benchmark measures encode cost, not training cost. Its first rule
    * coincides with q110's first learned merge (same weighted argmax).
    *
    * A pair already in the table can never be appended again: the
    * level-k dict is the greedy encode under the table, in which no
    * table pair survives adjacent (the encoder merges until none
    * remains). Each level's candidate count is vocabulary-sized; only
    * `perLevel` rows are ever collected. */
  def frequencyMergeTable(docs: DataFrame, perLevel: Int = 150,
                          levels: Int = 2,
                          textCol: String = "text"): Seq[(String, String)] = {
    val words = docs
      .select(explode(filter(tokens(col(textCol)), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try frequencyMergeTableFromDict(words, perLevel, levels)
    finally { words.unpersist(): Unit }
  }

  /** [[frequencyMergeTable]] over a pre-computed `(w, cnt)` corpus dict —
    * derive it from a persisted [[termFrequencies]] frame with
    * `tf.groupBy("w").agg(sum("tf").as("cnt"))` to share the tokenize pass
    * with [[encodeFromTf]]. The dict should be cached by the caller when
    * `levels > 1` (each level re-encodes it under the table so far). */
  def frequencyMergeTableFromDict(dict: DataFrame, perLevel: Int,
                                  levels: Int): Seq[(String, String)] = {
    require(perLevel > 0 && levels > 0, "perLevel and levels must be positive")
    val spark = dict.sparkSession
    import spark.implicits._
    val words = dict.select(col("w"), col("cnt").cast("long")).as[(String, Long)]
    var table = Vector.empty[(String, String)]
    for (_ <- 1 to levels) {
      val bc = spark.sparkContext.broadcast(rankTable(table))
      val top = words.mapPartitions { it =>
          val t = bc.value
          it.flatMap { case (w, cnt) =>
            val syms = greedyEncode(w, t)
            (0 until syms.length - 1).iterator
              .map(i => (syms(i), syms(i + 1), cnt))
          }
        }.toDF("a", "b", "cnt")
        .groupBy("a", "b").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("a").asc, col("b").asc)
        .limit(perLevel)
        .collect() // bounded: perLevel rows
      table = table ++ top.map(r => (r.getString(0), r.getString(1)))
    }
    table
  }

  /** UTF-8 BYTE-order `<` on strings — Spark's string ordering contract
    * (UTF8String compares unsigned bytes, NOT Java's UTF-16 chars). The
    * driver-side replications below must tie-break exactly like the
    * distributed `orderBy` they replace. Same function as BpeTrain's
    * driver finisher. */
  private[graft] def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** Driver cap for the codec-build finisher (round-20): the SAME conf and
    * default as [[BpeTrain.learnMerges]]'s finisher — both collect the
    * vocabulary-sized `(w, cnt)` dict, the k-centroids bounded-collect
    * class. 0 disables the driver path; values ≥ Int.MaxValue are clamped
    * down so a big-driver override widens rather than silently disables. */
  private[graft] def driverVocabCap(spark: org.apache.spark.sql.SparkSession): Int =
    math.min(
      spark.conf.getOption("graft.bpe.maxDriverVocab")
        .map(_.toLong).getOrElse(1000000L),
      (Int.MaxValue - 1).toLong).toInt

  /** [[frequencyMergeTableFromDict]] replayed on the driver over the
    * collected dict rows — bit-identical by construction: the pair counts
    * are exact integer sums over the SAME greedy encodes (same JVM
    * function the executors run), and the top-`perLevel` selection is the
    * identical total order (pc desc, a asc, b asc in UTF-8 byte order;
    * keys are unique so the order is total). Each level re-encodes under
    * the table so far, exactly like the distributed loop. */
  private[graft] def frequencyMergeTableFromRows(
      rows: Array[(String, Long)], perLevel: Int,
      levels: Int): Seq[(String, String)] = {
    require(perLevel > 0 && levels > 0, "perLevel and levels must be positive")
    var table = Vector.empty[(String, String)]
    for (_ <- 1 to levels) {
      val t = rankTable(table)
      val pc = new java.util.HashMap[(String, String), java.lang.Long]()
      rows.foreach { case (w, cnt) =>
        val syms = greedyEncode(w, t)
        var i = 0
        while (i < syms.length - 1) {
          pc.merge((syms(i), syms(i + 1)), java.lang.Long.valueOf(cnt),
            (x, y) => java.lang.Long.valueOf(x.longValue() + y.longValue()))
          i += 1
        }
      }
      val top = pc.entrySet().toArray(
          Array.empty[java.util.Map.Entry[(String, String), java.lang.Long]])
        .sortWith { (e1, e2) =>
          val c1 = e1.getValue.longValue(); val c2 = e2.getValue.longValue()
          if (c1 != c2) c1 > c2
          else if (e1.getKey._1 != e2.getKey._1) utf8Lt(e1.getKey._1, e2.getKey._1)
          else utf8Lt(e1.getKey._2, e2.getKey._2)
        }
        .take(perLevel)
      table = table ++ top.map(e => e.getKey)
    }
    table
  }

  /** [[encodedLengths]]' map built on the driver from already-collected
    * dict rows (same greedy encoder, so the same `word → token count`
    * values, without the extra distributed pass + take). */
  private[graft] def encodedLengthsFromRows(
      rows: Array[(String, Long)],
      merges: Seq[(String, String)]): java.util.HashMap[String, Long] = {
    require(merges.nonEmpty, "encode needs at least one merge rule")
    val t = rankTable(merges)
    val m = new java.util.HashMap[String, Long](rows.length * 2)
    rows.foreach { case (w, _) => m.put(w, greedyEncode(w, t).length.toLong) }
    m
  }

  /** Public seam for callers that built the vocab map on the driver
    * (the q129/q130 finisher): the same one-pass stats fold as
    * [[encodeStatsFromDocs]]. */
  private[graft] def encodeStatsFromVocabMap(
      docs: DataFrame, nSyms: java.util.HashMap[String, Long],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    statsFromEncodedVocab(docs, nSyms, idCol, textCol)
}
