package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.{tokens, tokensFast}

/** BPE merge-rule TRAINING — learning a tokenizer from the corpus, the
  * step beyond applying a fixed one (q28's regex tokenizer, q58's
  * packing). Classic Sennrich-style byte-pair encoding over words.
  *
  * Scale shape (the reason this is feasible at 100 TB): ONE corpus pass
  * builds the word-frequency dict — `groupBy(word).count` with map-side
  * combine, output is VOCABULARY-sized — and the whole merge loop then
  * runs on the dict, exactly how production trainers work (HuggingFace
  * `tokenizers` trains on word counts, not raw text). Each iteration is
  * an explode + weighted pair aggregation over vocab rows (never corpus
  * rows), one single-row argmax collect, and one array-rewrite
  * projection; the dict is re-persisted per round with the previous
  * round unpersisted ([[Graph.pagerank]]'s loop discipline).
  *
  * Merge application is the standard greedy left-to-right scan,
  * expressed as an `aggregate` fold over the symbol array (so "aaa"
  * under merge (a,a) becomes ["aa","a"], matching reference
  * implementations). Ties in pair count break by (left, right) symbol
  * order — specifically Spark's string order, which is UTF-8 BYTE
  * comparison (not Java's UTF-16 code-unit order; the two disagree when
  * supplementary-plane symbols meet BMP symbols above U+E000) — making
  * the learned rules fully deterministic across engines that compare
  * UTF-8 bytes. Base symbols are Unicode CODE POINTS (`substring` /
  * `length` semantics), so a surrogate pair is one symbol.
  *
  * Declared rows-only (a 12-round argmax loop has no tractable SQL
  * oracle); semantics are pinned by a differential spec against a naive
  * in-memory reference trainer on seeded corpora
  * ([[graft.operators]] `TextDedupDifferentialSpec` pattern).
  */
object BpeTrain {

  /** Greedy left-to-right merge of adjacent (a, b) occurrences in a
    * symbol array: fold that either extends the accumulator or replaces
    * its last element with the merged symbol. */
  private def applyMerge(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
        .otherwise(concat(acc, array(s))))

  /** Learn `numMerges` merge rules. Output: one row per learned rule,
    * `(merge_rank, left, right, pair_count)`, rank 1-based in learning
    * order. Stops early if no adjacent pair remains. */
  def learnMerges(docs: DataFrame, numMerges: Int = 12,
                  textCol: String = "text"): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    graft.plans.Tokenize.register(spark)
    import spark.implicits._

    // corpus pass: vocabulary-sized word-frequency dict, then chars.
    // Conditional rebalance first (the round-15 single-partition lesson):
    // the tokenize+explode map side otherwise runs at the scan's
    // parallelism — one core on a single-file corpus.
    val par = spark.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val words = balanced
      .select(explode(filter(tokensFast(col(textCol)), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(transform(sequence(lit(1), length(col("w"))),
        i => substring(col("w"), i, lit(1))).as("syms"), col("cnt"))

    // Only the BASE dict is persisted: each round's frame is a chain of
    // vocab-sized array-fold projections over it, cheap to recompute at
    // argmax time — re-materializing (persist + count) every round costs
    // an extra action per merge and measured ~2× the loop wall. If the
    // projection chain ever gets deep enough to hurt (numMerges ≫ 16),
    // re-introduce a periodic persist every K rounds, not every round.
    val base = words.persist(StorageLevel.MEMORY_AND_DISK)

    // Driver finisher (round-19, the Graph.connectedComponents gate
    // applied to the merge loop): the dict is VOCABULARY-sized — the
    // corpus pass above already reduced 100 TB of text to word counts —
    // while each merge round costs a distributed argmax action at the
    // driver job floor plus a fold chain one deeper than the last
    // (12 rounds ≈ 31 jobs measured at sf0.1, most of q110's 2.5 s).
    // Under the cap (graft.bpe.maxDriverVocab rows, default 1M — the
    // same driver budget as encode()'s vocab collect) the identical loop
    // runs in memory: exact integer pair counts, argmax tie-broken by
    // (count desc, left, right) in UTF-8 BYTE order (UTF8String's
    // comparison contract — NOT Java's UTF-16 order), and the same
    // greedy left-to-right fold per word. Results are bit-identical by
    // construction (all-integer argmax; the q110/q111 DuckDB replay
    // oracles pin it). Over-cap corpora take the distributed loop
    // unchanged; take(cap+1) is the one action either way.
    val vocabCap = spark.conf.getOption("graft.bpe.maxDriverVocab")
      .map(_.toInt).getOrElse(1000000)
    val dictRows = base.limit(vocabCap + 1).collect()
    if (dictRows.length <= vocabCap) {
      var dictD: Array[(Array[String], Long)] =
        dictRows.map(r => (r.getSeq[String](0).toArray, r.getLong(1)))
      def utf8Lt(x: String, y: String): Boolean = {
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
      val learnedD = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      var exhaustedD = false
      for (rank <- 1 to numMerges if !exhaustedD) {
        val pc = new java.util.HashMap[(String, String), java.lang.Long]()
        dictD.foreach { case (syms, cnt) =>
          var i = 0
          while (i < syms.length - 1) {
            pc.merge((syms(i), syms(i + 1)), java.lang.Long.valueOf(cnt),
              (x, y) => java.lang.Long.valueOf(x.longValue() + y.longValue()))
            i += 1
          }
        }
        if (pc.isEmpty) exhaustedD = true
        else {
          var bestA: String = null; var bestB: String = null; var bestC = 0L
          pc.forEach { (k, v) =>
            val c = v.longValue()
            if (c > bestC || (c == bestC &&
                (utf8Lt(k._1, bestA) ||
                  (k._1 == bestA && utf8Lt(k._2, bestB))))) {
              bestA = k._1; bestB = k._2; bestC = c
            }
          }
          learnedD += ((rank, bestA, bestB, bestC))
          // greedy left-to-right merge — the applyMerge fold's semantics
          dictD = dictD.map { case (syms, cnt) =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            syms.foreach { s =>
              if (out.nonEmpty && out.last == bestA && s == bestB)
                out(out.length - 1) = bestA + bestB
              else out += s
            }
            (out.toArray, cnt)
          }
        }
      }
      base.unpersist()
      return learnedD.toSeq.toDF("merge_rank", "left", "right", "pair_count")
    }

    base.count()
    var dict = base
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (rank <- 1 to numMerges if !exhausted) {
      // weighted adjacent-pair counts over the dict (vocab-sized explode)
      val best = dict
        .select(col("cnt"), explode(when(size(col("syms")) >= 2,
          zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("a"), b.as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // single-row argmax, per round
      if (best.isEmpty) exhausted = true
      else {
        val a: String = best(0).getString(0)
        val b: String = best(0).getString(1)
        val pc: Long = best(0).getLong(2)
        learned += ((rank, a, b, pc))
        dict = dict
          .select(applyMerge(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))
      }
    }
    base.unpersist()
    learned.toSeq.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** ENCODE under rank-ordered merge rules — the apply half of the
    * tokenizer story ([[learnMerges]] trains; this tokenizes the corpus
    * with what was learned). Output: per document,
    * `(doc_id, n_words, n_chars, n_bpe_tokens, chars_per_token)` —
    * the fertility stats a tokenizer change is judged by. Documents
    * with no tokens emit no row.
    *
    * Scale shape: ONE vocabulary exchange (explode + distinct); the merge
    * chain runs over the DISTINCT-word dict only (vocabulary-sized,
    * never corpus-sized — how production tokenizers encode), as ONE
    * fused kernel call per dict word ([[graft.plans.BpeEncodeLen]] —
    * the declarative 12-nested-`aggregate`-folds form evaluated the
    * whole chain with an array allocation per symbol per rule and
    * measured 14.5 s at sf0.1; the kernel is scan-cost), and the per-doc
    * stats fold each doc against the broadcast vocab→n_syms map in one
    * exchange-free pass ([[BpeCodec.statsFromEncodedVocab]] — the stats
    * are instance sums, so the former (doc,word) aggregate + join-back +
    * re-aggregate bought nothing; [[TermWeighting.tfidfTopTerms]]'s
    * broadcast-vocab stance and caveat apply).
    * Kernel semantics are pinned two ways: the differential encoder
    * spec (`BpeTrainSpec`), and q122's full DuckDB oracle on the
    * 2-rule prefix. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge rule")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.BpeEncodeLen.register(spark)
    graft.plans.Tokenize.register(spark)
    // conditional rebalance (the round-15 single-partition lesson)
    val par = spark.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    // ONE vocab exchange (the old shape shuffled a (doc,word) aggregate —
    // the corpus's dominant cardinality — then joined the dict back and
    // re-aggregated per doc: three exchanges for what is an instance sum);
    // the `when` wrapper on the generator input blocks
    // InferFiltersFromGenerate from sinking a tokenizer-inlined filter
    // below the rebalance (see BpeCodec.flatTf). n_syms still comes from
    // the sequential per-rule kernel, keeping BpeEncodeLen in q121/q122's
    // oracle-checked path; the collect is vocab-bounded — the same rows
    // the broadcast dict join pulled to the driver before.
    val toks = filter(tokensFast(col(textCol)), t => t =!= "")
    val dict = balanced
      .select(explode(when(size(toks) >= 0, toks)).as("w")).distinct()
      .select(col("w"), graft.plans.BpeEncodeLen.encodeLen(col("w"), merges)
        .cast("long").as("n_syms"))
      .as[(String, Long)].take(BpeCodec.MaxVocabWords + 1)
    // take(cap+1), not collect-then-require: the guard must bound driver
    // memory BEFORE materialization (advisor, round 18)
    require(dict.length <= BpeCodec.MaxVocabWords,
      s"BpeTrain.encode: vocabulary exceeds ${BpeCodec.MaxVocabWords} " +
        "words — unbounded raw-text vocab would exhaust the driver; " +
        "normalize/hash words first")
    val m = new java.util.HashMap[String, Long](dict.length * 2)
    dict.foreach { case (w, n) => m.put(w, n) }
    graft.operators.BpeCodec.statsFromEncodedVocab(docs, m, idCol, textCol)
  }
}
