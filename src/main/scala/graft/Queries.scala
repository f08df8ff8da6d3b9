package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Upsert, Validate}

/** The engine's declared query surface (SURVEY.md §2 inventory), each entry
  * paired with an ANSI-SQL oracle in [[oracles]] runnable by DuckDB over the
  * same parquet tables.
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - floating aggregates are `round(x, 4)`-ed on both sides (partial
  *    aggregation order differs between engines at the last ulp);
  *  - no bare `LIMIT` without a total order;
  *  - `try_cast`, never `cast`, for string→number (Spark 4 ANSI mode throws
  *    on bad input; the reference's pandas `errors='coerce'` semantics —
  *    reference etl/transform.py:35,39 — map to try_cast).
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val ts_19980902 = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
  private val ts_19960101 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")

  /** Allowed event types for the validation demo (the synthetic `events`
    * table also contains 'error' rows, which become the dead-letter side). */
  private val allowedEventTypes = Seq("view", "click", "purchase", "signup")

  // ---------------------------------------------------------------- core ---

  val core: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3/A4: grouped aggregation with arithmetic (TPC-H Q1 shape).
    "q01_pricing_summary" -> ((s, dir) => {
      // Money sums follow the q02 exact-aggregation rule (the round-12 sf1
      // lesson surfaced HERE in round 14: at ~1e10 magnitudes the engines'
      // double-sum association orders diverge in the 4th decimal — q01's
      // sf1 compare flipped run-to-run): quantize each product to
      // millionths as a long (pure codegen FP, identical to the oracle's
      // per-row decimal(23,6) cast — see q02 for the verified identity),
      // sum exactly in decimal(25,0), divide/round once per output row.
      // sum_qty/avg_qty are sums of INTEGRAL doubles (exact at any order)
      // and avg_disc's rounding headroom is ~1e7× its association error,
      // so those stay free-running.
      val base6 = floor(col("l_extendedprice") * lit(1000000.0) + lit(0.5))
        .cast("long")
      val disc6 = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(1000000.0) + lit(0.5)).cast("long")
      def money(c: Column) = round(sum(c.cast("decimal(25,0)"))
        / lit(1000000).cast("decimal(7,0)"), 4).cast("double")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(ts_19980902))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          money(base6).as("sum_base_price"),
          money(disc6).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // J1: fact → dims star join; dims broadcast (reference README.md:145-147).
    // Plan (round-14): pre-aggregate lineitem revenue per order BEFORE the
    // star join. The previous shape computed countDistinct(o_orderkey) over
    // the full lineitem×orders fanout — a distinct-shuffle of every joined
    // row, which is also the plan that dies first at 100× scale. Summing per
    // l_orderkey first gets map-side partial aggregation on the scan, makes
    // every later join 1:1 per order, and turns the distinct into a plain
    // count(*). Result is identical: inner joins keep exactly the orders
    // that have lineitems in both shapes.
    "q02_revenue_by_nation" -> ((s, dir) => {
      // money sums aggregate EXACTLY, never in free-running double (round-12
      // sf1 lesson: at ~1e10 the engines' double-sum association orders
      // diverge in the 4th decimal). The oracle spells the rule as a
      // per-row cast to decimal(23,6); executing that literally costs a
      // BigDecimal box per lineitem row (measured: the cast alone was ~0.5s
      // of a 1.5s sf0.1 wall). Instead each product is quantized to the
      // SAME decimal(23,6) value as an unscaled long — floor(x*1e6 + 0.5)
      // is half-up in millionths for the always-positive revenue, pure
      // codegen FP — and the longs are summed: exact and order-independent.
      // Quantization identity with the decimal cast is data-safe (products
      // of 2-decimal money values sit ~0.5 away from any millionth-tie) and
      // VERIFIED: zero mismatched orders against the decimal(23,6) per-row
      // cast at both sf0.1 and sf1.
      //
      // Overflow bounds: the per-order long sum is bounded by lineitems-
      // per-order (≤7 at any TPC-H SF) × ~1e11 unscaled « 2^63. The final
      // per-nation sum runs in decimal(25,0) — compact-long internally
      // until 9.2e18 and automatically widening beyond, so the group total
      // is exact at ANY scale; the ÷10^6 decimal divide and round(,4)
      // happen once per output row.
      // Layout (round-15, the q87 machinery): lineitem and orders live as
      // PAY-ONCE tables bucketed by order key, so both remaining heavy
      // exchanges vanish — the per-order pre-aggregation rides the
      // lineitem bucketing (a hash aggregate over a bucketed scan has its
      // required distribution satisfied, no exchange) and the
      // perOrder ⋈ orders join is bucket-co-located (32 = 32). Build is
      // once per JVM per (path, mtime) — the q87 cache-key discipline —
      // and Bench reports the warm-up build separately (`layout_build`).
      // 32 buckets = local[32] parallelism; a cluster writes the same
      // layout with O(data / target-file-size) buckets. Customer joins by
      // broadcast (projected: 2 longs/row — MBs at bench scale; a
      // deployment where customer is fact-sized buckets it on custkey
      // with the same machinery instead).
      import graft.operators.Layout
      val Seq(liTbl, ordTbl) = Layout.payOnceBucketed(s, dir, "q02",
        Seq("lineitem", "orders"),
        Seq(
          ("li", t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
            "l_orderkey", 32),
          ("ord", t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            "o_orderkey", 32)))
      val rev6 = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * lit(1000000.0) + lit(0.5)).cast("long")
      val perOrder = s.table(liTbl)
        .groupBy(col("l_orderkey"))
        .agg(sum(rev6).as("rev6"))
      perOrder
        // co-partitioned buckets make the join exchange-free either way;
        // the SHUFFLE_HASH hint swaps the SMJ's two per-partition sorts
        // (1.5M rows each side at sf1) for one build-side hash map per
        // bucket — measured faster at every SF, and the build side is
        // bucket-bounded (rows/buckets) at any scale
        .join(s.table(ordTbl).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("rev6").cast("decimal(25,0)"))
            / lit(1000000).cast("decimal(7,0)"), 4)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // O3: latest-per-key (top-1 window with deterministic tiebreak).
    "q03_latest_order_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").as("latest_orderdate"), col("o_totalprice").as("latest_totalprice"))
    }),

    // J2: scalar-subquery join (reference README.md:154-160), via spark.sql.
    "q04_orders_at_max_date" -> ((s, dir) => {
      Tables.register(s, dir, "orders")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
               WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)""")
    }),

    // P5/P10: selective filter + projection (both pushed to the parquet scan).
    "q05_selective_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24 && col("l_shipdate") >= lit(ts_19960101))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    }),

    // D1: deterministic first-wins dedup. (l_orderkey, l_linenumber) is not
    // unique in the synthetic data, so the tiebreak orders by every column.
    // The order is total and all-ascending, so min-struct hash aggregation
    // ([[Dedup.exact]]) picks the IDENTICAL row as the row_number window
    // (equivalence spec-pinned in UpsertSpec) while shuffling one partial
    // min per key per input partition instead of sorting every row —
    // [[Dedup.firstWins]] remains the primitive for .desc/.asc mixes.
    "q06_dedup_first_wins" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val order = Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      Dedup.exact(li.select("l_orderkey", order: _*), Seq("l_orderkey"),
        order.map(col))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    }),

    // P11/F10: LIKE predicates (pushed as StartsWith to the scan).
    "q07_like_filter" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_type").like("STAND%") || col("p_name").like("red%"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
    }),

    // O2: top-k with a total order (ties broken by key).
    "q08_topk_acctbal" -> ((s, dir) => {
      t(s, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    }),

    // A1/A2: data-quality gates (row count + null-key count) in one pass.
    "q09_dq_gates" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("o_custkey").isNull || col("o_orderkey").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_null_keys"))
    }),

    // Set op: UNION (distinct) of projected keys.
    "q10_active_nation_keys" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    }),

    // P3/P4/F1-F3: year-range normalization ("2020-2021" → 2020) with
    // try_cast, the reference's signature coercion (etl/transform.py:38-39).
    "q11_year_normalize" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          concat_ws("-", year(col("o_orderdate")).cast("string"),
            (year(col("o_orderdate")) + 1).cast("string")).as("year_raw"))
        .withColumn("year_norm", expr("try_cast(element_at(split(year_raw, '-'), 1) AS INT)"))
    }),

    // S8/D4: keyed last-writer-wins upsert (anti-join + union).
    "q12_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 2001)
        .select(col("o_orderkey"), lit("R").as("o_orderstatus"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"))
      Upsert.upsert(base, updates, Seq("o_orderkey"), Seq(col("o_orderkey")))
    }),

    // F6: JSON extraction + try_cast.
    "q13_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_str"))
        .withColumn("k_int", expr("try_cast(k_str AS INT)"))
    }),

    // ST6 (batch shape): tumbling-window aggregation over event time.
    "q14_hourly_windows" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("n_events"), col("total_value"))
    }),

    // V1 (valid side): vectorized validation, dead-letter split.
    "q15_validate_valid" -> ((s, dir) => {
      val (valid, _) = Validate.split(t(s, dir, "events"), eventRules)
      valid.select("event_id", "user_id", "event_type", "value")
    }),

    // V1 (dead-letter side): rejected rows with error detail.
    "q16_validate_rejected" -> ((s, dir) => {
      val (_, rejected) = Validate.split(t(s, dir, "events"), eventRules)
      rejected.select("event_id", "event_type", "error_details")
    }),

    // Text analysis: token counting (whitespace tokenizer).
    "q17_token_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("n_unique"))
    }),

    // Text analysis: document fingerprint (whitespace-normalized md5).
    "q18_doc_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))
    }),

    // ROLLUP subtotals (region → nation hierarchy).
    "q30_rollup_revenue" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum("c_acctbal"), 4).as("total_acctbal"),
          count(lit(1)).as("n_customers"))
    }),

    // J3: referential-integrity DQ via anti-join counts (NOT EXISTS).
    "q31_orphan_check" -> ((s, dir) => {
      Tables.register(s, dir, "orders", "lineitem")
      s.sql("""SELECT
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphan_lineitems,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
             AS n_childless_orders""")
    }),

    // Correlated EXISTS (semi join).
    "q32_exists_big_lineitem" -> ((s, dir) => {
      Tables.register(s, dir, "orders", "lineitem")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders o
               WHERE EXISTS (SELECT 1 FROM lineitem l
                             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""")
    }),

    // Distinct aggregation per group.
    "q33_distinct_agg" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
          round(avg("c_acctbal"), 4).as("avg_acctbal"))
    }),

    // Exact interpolated percentiles per group.
    "q38_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
    }),

    // Time series: 7-day moving average over daily rollups. The global
    // window runs on the DAILY aggregate (tiny at any source scale).
    "q39_moving_avg" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(round(sum("o_totalprice"), 4).as("daily_total"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily.select(col("day"), col("daily_total"),
        round(avg(col("daily_total")).over(w), 4).as("ma7"))
    }),

    // As-of join: each event matched to the user's latest order at or
    // before the event time (union+window operator; DuckDB ASOF oracle).
    "q40_asof_latest_order" -> ((s, dir) => {
      val events = t(s, dir, "events").select("event_id", "user_id", "ts")
      // right side unique per (key, time): deterministic pre-dedup
      val orders = Dedup.firstWins(t(s, dir, "orders"),
        Seq("o_custkey", "o_orderdate"), Seq(col("o_orderkey").desc))
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      AsOfJoin.asofJoin(events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey" -> "matched_orderkey",
          "o_totalprice" -> "matched_totalprice"))
    }),

    // PORTABLE HLL approximate distinct (round-17: rows-only → hash-green).
    // The estimate comes from [[SketchRollup.PortableHll]] — md5-derived
    // registers and an exact-integer register sum, so DuckDB replays the
    // ESTIMATE itself cell-exact (estimator internals were the only thing
    // keeping this query rows-only; Datasketches HLL remains available as
    // the binary-sketch variant in SketchRollup). The 2%-vs-exact runtime
    // self-gate stays: the oracle proves cross-engine agreement, the gate
    // proves the estimator still estimates. A production 100 TB run keeps
    // the sketch-only aggregation (registers are a bounded two-level
    // hash aggregate: ≤4096 rows per group per partition).
    "q42_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.SketchRollup.PortableHll
      def gated(c: String): Double = {
        val colDf = t(s, dir, "lineitem").select(col(c))
        val approx = PortableHll
          .estimate(PortableHll.registers(colDf, Nil, col(c)), Nil)
          .head().getAs[Double]("approx_distinct")
        val exact = colDf.distinct().count()
        val relErr = math.abs(approx - exact) / exact
        require(relErr <= 0.02,
          f"q42 $c approx-distinct error $relErr%.4f > 2%% (approx=$approx exact=$exact)")
        approx
      }
      // The two per-column jobs are independent — submit both and let the
      // scheduler overlap them (local[32] and any real cluster have the
      // slack). Each job rescans its own single-column projection of the
      // parquet — two narrow column scans traded for no Expand; nothing is
      // shared or cached between them on purpose (a persist of the full
      // scan would cost more than the second column read).
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val Seq(orders, parts) = Await.result(
        Future.sequence(Seq("l_orderkey", "l_partkey").map(c => Future(gated(c)))),
        Duration.Inf)
      // output shape unchanged (rows-only check): the approx estimates
      Seq((orders, parts)).toDF("approx_orders", "approx_parts")
    }),

    // Window-function breadth: lag/lead deltas, rank, cumulative share.
    "q41_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("order_rank", row_number().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("price_delta", round(col("o_totalprice") - coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 4))
        .withColumn("running_spend", round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
        .drop("o_orderdate")
    }),

    // Gap-based sessionization as a BATCH window query — the SQL-expressible
    // twin of streaming/EventStreams.sessionize (30-minute gap).
    "q43_sessionization" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val gapMs = 30 * 60 * 1000L
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
    }),

    // PIVOT: customer counts per nation, one column per market segment.
    // The segment domain is declared explicitly — at scale an undeclared
    // pivot needs a distinct-scan pass first, so production pivots should
    // always pin the domain.
    "q49_pivot_segments" -> ((s, dir) => {
      val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .pivot("c_mktsegment", segments)
        .agg(count(lit(1)))
        .na.fill(0L, segments)
    }),

    // Set operations: INTERSECT / EXCEPT.
    "q46_set_ops" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val supp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cust.intersect(supp).withColumn("op", lit("both"))
        .unionByName(cust.except(supp).withColumn("op", lit("customer_only")))
        .unionByName(supp.except(cust).withColumn("op", lit("supplier_only")))
    }),

    // Fuzzy dedup by edit distance — see operators.TextDedup.editDistancePairs
    // for the blocking rationale. Non-vacuous behavior (planted same-source
    // near-identical docs produce the expected pairs) is asserted in
    // ExtensionSpec; at the oracle SFs the synthetic corpus happens to
    // produce zero qualifying pairs, which the oracle confirms.
    "q47_edit_distance_pairs" -> ((s, dir) =>
      operators.TextDedup.editDistancePairs(t(s, dir, "documents"))),

    // Equi + range predicate join (burst detection): same-user event pairs
    // within 5 minutes. Blocked on (user, hour-bucket) equality so the join
    // stays a hash join over hour-sized groups — a per-user equi join alone
    // produces |events-per-user|² rows before the range filter (66M at
    // sf0.1). Blocking is TWO-SIDED (left side exploded into hour and
    // hour+1) so boundary-straddling pairs like :59 → :01 are included —
    // see operators.RangeJoin.
    "q48_range_join" -> ((s, dir) =>
      graft.operators.RangeJoin.withinWindowPairs(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        keyCols = Seq("user_id"), tsCol = "ts",
        window = expr("INTERVAL 5 MINUTES"),
        outA = Seq("event_id" -> "event_a"),
        outB = Seq("event_id" -> "event_b"))),

    // Conditional aggregation (pivot shape without PIVOT syntax).
    "q34_status_by_year" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
    })
  )

  /** Shared with ExtQueries for the reject-breakdown query. */
  private[graft] def eventRulesForOracle: Seq[Validate.Rule] = eventRules

  private def eventRules: Seq[Validate.Rule] =
    Validate.required("event_id", "ts", "user_id", "event_type") ++ Seq(
      Validate.Rule("event_type not in allowed set",
        col("event_type").isin(allowedEventTypes: _*)),
      Validate.Rule("value must be non-negative", col("value") >= 0))

  // The same rules as ANSI SQL, for the oracle (order must match eventRules).
  private val sqlRules: Seq[(String, String)] = Seq(
    "event_id is required" -> "event_id IS NOT NULL",
    "ts is required" -> "ts IS NOT NULL",
    "user_id is required" -> "user_id IS NOT NULL",
    "event_type is required" -> "event_type IS NOT NULL",
    "event_type not in allowed set" ->
      s"event_type IN (${allowedEventTypes.map("'" + _ + "'").mkString(",")})",
    "value must be non-negative" -> "value >= 0")

  private[graft] val sqlErrorDetails: String = sqlRules.map { case (msg, ok) =>
    s"CASE WHEN NOT coalesce($ok, false) THEN '$msg' END"
  }.mkString("concat_ws('; ', ", ", ", ")")

  private val sqlAllOk: String =
    sqlRules.map { case (_, ok) => s"coalesce($ok, false)" }.mkString(" AND ")

  /** DuckDB scalar-subquery twin of `SketchRollup.PortableHll` over one
    * column of `table`: md5-top-60-bit hash → 12-bit bucket / 48-bit rest
    * → rank `49 − length(bin(rest))` → EXACT integer register sum
    * `Σ 2^(49−M)` (empty buckets contribute 2^49) → the identical IEEE
    * estimator chain, linear counting below 2.5·m. Every step up to the
    * final double chain is integer-exact, so the estimate matches Spark's
    * cell-for-cell. */
  private[graft] def hllScalarSql(table: String, column: String): String =
    s"""(WITH ro AS (
       |  SELECT h >> 48 AS hb, h & 281474976710655 AS rest FROM (
       |    SELECT (('0x'||substr(md5(CAST($column AS VARCHAR)),1,15))::BIGINT) AS h
       |    FROM $table)),
       |go AS (SELECT hb,
       |         max(CASE WHEN rest = 0 THEN 49
       |             ELSE 49 - length(bin(rest)) END) AS hm
       |       FROM ro GROUP BY hb),
       |so AS (SELECT CAST(sum(1::BIGINT << (49 - hm)) AS BIGINT) AS s,
       |              count(*) AS nb FROM go),
       |eo AS (SELECT (4096 - nb) AS v,
       |              s + (4096 - nb) * 562949953421312 AS n FROM so)
       |SELECT round(CASE WHEN v > 0 AND
       |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 562949953421312.0 / CAST(n AS DOUBLE) <= 2.5 * 4096.0
       |  THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
       |  ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 562949953421312.0 / CAST(n AS DOUBLE) END, 4)
       |FROM eo)""".stripMargin

  // -------------------------------------------------------------- oracles ---

  val coreOracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),4) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(23,6))),4) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(23,6))),4) AS DOUBLE) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
         CAST(round(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(23,6))),4) AS DOUBLE) AS revenue,
         count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q03_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
         o_orderdate AS latest_orderdate, o_totalprice AS latest_totalprice
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders) WHERE rn = 1""",

    "q04_orders_at_max_date" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)""",

    "q05_selective_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'""",

    "q06_dedup_first_wins" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey,
                  l_suppkey, l_quantity, l_extendedprice, l_discount, l_tax,
                  l_returnflag, l_linestatus, l_shipdate) AS rn
               FROM lineitem) WHERE rn = 1""",

    "q07_like_filter" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
         WHERE p_type LIKE 'STAND%' OR p_name LIKE 'red%'""",

    "q08_topk_acctbal" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""",

    "q09_dq_gates" ->
      """SELECT count(*) AS n_rows,
         CAST(coalesce(sum(CASE WHEN o_custkey IS NULL OR o_orderkey IS NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null_keys
         FROM orders""",

    "q10_active_nation_keys" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey AS nationkey FROM supplier""",

    "q11_year_normalize" ->
      """SELECT o_orderkey, year_raw,
         TRY_CAST(split_part(year_raw, '-', 1) AS INTEGER) AS year_norm
         FROM (SELECT o_orderkey,
                 concat(CAST(year(o_orderdate) AS VARCHAR), '-',
                        CAST(year(o_orderdate)+1 AS VARCHAR)) AS year_raw
               FROM orders)""",

    "q12_upsert" ->
      """WITH upd AS (SELECT o_orderkey, 'R' AS o_orderstatus,
                        o_totalprice + 100.0 AS o_totalprice
                      FROM orders WHERE year(o_orderdate) = 2001)
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)""",

    "q13_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
         FROM events""",

    "q14_hourly_windows" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
         count(*) AS n_events, round(sum(value),4) AS total_value
         FROM events GROUP BY 1, 2""",

    "q15_validate_valid" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
          WHERE $sqlAllOk""",

    "q16_validate_rejected" ->
      s"""SELECT event_id, event_type, error_details
          FROM (SELECT event_id, event_type, $sqlErrorDetails AS error_details
                FROM events)
          WHERE error_details <> ''""",

    "q17_token_stats" ->
      """SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_unique
         FROM documents""",

    "q18_doc_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
         FROM documents""",

    "q30_rollup_revenue" ->
      """SELECT r_name, n_name, round(sum(c_acctbal),4) AS total_acctbal,
         count(*) AS n_customers
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",

    "q31_orphan_check" ->
      """SELECT
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphan_lineitems,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
           AS n_childless_orders""",

    "q32_exists_big_lineitem" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""",

    "q33_distinct_agg" ->
      """SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments,
         round(avg(c_acctbal),4) AS avg_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q38_percentiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90
         FROM orders GROUP BY o_orderstatus""",

    "q39_moving_avg" ->
      """WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                               round(sum(o_totalprice), 4) AS daily_total
                        FROM orders GROUP BY 1)
         SELECT day, daily_total,
                round(avg(daily_total) OVER
                  (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
         FROM daily""",

    "q40_asof_latest_order" ->
      """WITH r AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
                    FROM (SELECT *, row_number() OVER
                            (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) AS rn
                          FROM orders) WHERE rn = 1)
         SELECT e.event_id, e.user_id, e.ts,
                r.o_orderkey AS matched_orderkey,
                r.o_totalprice AS matched_totalprice
         FROM events e ASOF JOIN r
           ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""",

    // q42: the portable-HLL estimate replayed end to end — same md5
    // registers, same exact-integer register sum, same one chain of IEEE
    // estimator ops (see SketchRollup.PortableHll).
    "q42_approx_distinct" ->
      s"""SELECT ${hllScalarSql("lineitem", "l_orderkey")} AS approx_orders,
         |       ${hllScalarSql("lineitem", "l_partkey")} AS approx_parts""".stripMargin,

    "q41_window_suite" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER w AS order_rank,
         lag(o_totalprice, 1) OVER w AS prev_price,
         round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, 0.0), 4) AS price_delta,
         round(sum(o_totalprice) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "q43_sessionization" ->
      """WITH marked AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT *, CAST(sum(new_session) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           FROM marked)
         SELECT user_id, session_seq,
                min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM sessions GROUP BY user_id, session_seq""",

    "q49_pivot_segments" ->
      """SELECT n_name,
         CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
         CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
         CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
         CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
         CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q46_set_ops" ->
      """SELECT nationkey, 'both' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey AS nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'customer_only' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey AS nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'supplier_only' AS op FROM
           (SELECT s_nationkey AS nationkey FROM supplier
            EXCEPT SELECT c_nationkey AS nationkey FROM customer)""",

    "q47_edit_distance_pairs" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit_distance
         FROM documents a JOIN documents b
           ON a.source = b.source
          AND floor(a.n_chars / 10) = floor(b.n_chars / 10)
          AND a.doc_id < b.doc_id
         WHERE levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) <= 40""",

    "q48_range_join" ->
      """WITH a2 AS (
           SELECT event_id, user_id, ts, date_trunc('hour', ts) AS block FROM events
           UNION ALL
           SELECT event_id, user_id, ts, date_trunc('hour', ts) + INTERVAL 1 HOUR AS block
           FROM events),
         b1 AS (SELECT event_id, user_id, ts, date_trunc('hour', ts) AS block FROM events)
         SELECT a2.event_id AS event_a, b1.event_id AS event_b
         FROM a2 JOIN b1
           ON a2.user_id = b1.user_id
          AND a2.block = b1.block
          AND b1.ts > a2.ts
          AND b1.ts <= a2.ts + INTERVAL 5 MINUTE""",

    "q34_status_by_year" ->
      """SELECT year(o_orderdate) AS order_year,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
         FROM orders GROUP BY 1"""
  )

  def all: Map[String, (SparkSession, String) => DataFrame] =
    core ++ ExtQueries.queries ++ Ext2Queries.queries ++ Ext3Queries.queries ++
      Ext4Queries.queries ++ Ext5Queries.queries ++ Ext6Queries.queries ++
      Ext7Queries.queries ++ Ext8Queries.queries ++ Ext9Queries.queries
  def oracles: Map[String, String] =
    coreOracles ++ ExtQueries.oracles ++ Ext2Queries.oracles ++
      Ext3Queries.oracles ++ Ext4Queries.oracles ++ Ext5Queries.oracles ++
      Ext6Queries.oracles ++ Ext7Queries.oracles ++ Ext8Queries.oracles ++
      Ext9Queries.oracles
}
