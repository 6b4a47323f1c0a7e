package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wide
import graft.sources.Tables

/** Load-time integrity checks (reference load_duckdb.py:98-128):
  * per-table row counts and referential orphan counts in both directions,
  * expressed as anti-joins (never a driver-side loop — the anti-join
  * shuffles on the key and scales out).
  */
object Integrity {

  /** Q1 — row counts of every corpus table, one row per table. */
  def rowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.names
      .map { n =>
        Tables(spark, dir, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("tbl"), col("n_rows"))
      }
      .reduce(_ union _)
      .orderBy("tbl")

  /** Q2 — orders with no lineitem (anti-join, load_duckdb.py:108-115). */
  def ordersWithoutLines(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(
        Tables.lineitem(spark, dir).select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** Q3 — lineitems with no order (mirror, load_duckdb.py:117-124). */
  def linesWithoutOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** q105 — declarative data-quality expectation suite (the
    * Deequ/Great-Expectations operator class): uniqueness, null,
    * range, accepted-values, consistency and referential checks across
    * four corpus tables, each reported as a (check_id, tbl, metric,
    * passed) row where `metric` is the VIOLATION count — so a failing
    * dataset reports what is wrong, not just that something is.
    * `events.value.le_400` genuinely fails on the fixture (max value
    * 490), keeping the fail path observable under the gate.
    *
    * Scale shape: ALL checks of a table are computed in ONE scan — a
    * single aggregate row of conditional sums (+ the distinct count's
    * two-phase expand), exploded into per-check rows driver-free; a
    * naive check-per-scan suite reads each 100 TB table k times, this
    * reads it once. The one relational check (lineitem→orders FK) is
    * the q03 anti-join count, which shuffles on the key and scales out.
    */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    def checksOf(tbl: String, agged: DataFrame,
        checks: Seq[(String, Column)]): DataFrame =
      agged.select(explode(array(checks.map { case (id, metric) =>
        struct(lit(id).as("check_id"), lit(tbl).as("tbl"),
          metric.cast("double").as("metric"),
          (metric.cast("double") === 0.0).as("passed"))
      }: _*)).as("c")).select("c.*")

    def bad(c: Column): Column = sum(when(c, 1L).otherwise(0L))

    val o = checksOf("orders",
      Tables.orders(spark, dir).agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("nd"),
        bad(col("o_custkey").isNull).as("nulls"),
        bad(col("o_totalprice") <= 0).as("bad_price"),
        bad(!col("o_orderstatus").isin("O", "F", "P")).as("bad_status"),
        bad(!col("o_orderdate").between(lit("1990-01-01"), lit("2005-12-31")))
          .as("bad_date")),
      Seq(
        "orders.o_orderkey.unique" -> (col("n") - col("nd")),
        "orders.o_custkey.not_null" -> col("nulls"),
        "orders.o_totalprice.positive" -> col("bad_price"),
        "orders.o_orderstatus.accepted" -> col("bad_status"),
        "orders.o_orderdate.in_range" -> col("bad_date")))
    val l = checksOf("lineitem",
      Tables.lineitem(spark, dir).agg(
        bad(!col("l_quantity").between(1, 50)).as("bad_qty"),
        bad(!col("l_discount").between(0, 1)).as("bad_disc")),
      Seq(
        "lineitem.l_quantity.in_range" -> col("bad_qty"),
        "lineitem.l_discount.in_range" -> col("bad_disc")))
    val e = checksOf("events",
      Tables.events(spark, dir).agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("nd"),
        bad(col("value") < 0).as("bad_value"),
        bad(col("value") > 400).as("big_value"),
        bad(!col("event_type").isin(
          "view", "click", "purchase", "signup", "error")).as("bad_type")),
      Seq(
        "events.event_id.unique" -> (col("n") - col("nd")),
        "events.value.non_negative" -> col("bad_value"),
        "events.value.le_400" -> col("big_value"),
        "events.event_type.accepted" -> col("bad_type")))
    val d = checksOf("documents",
      Tables.documents(spark, dir).agg(
        count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("nd"),
        bad(col("n_chars") =!= length(col("text"))).as("mismatch")),
      Seq(
        "documents.doc_id.unique" -> (col("n") - col("nd")),
        "documents.n_chars.consistent" -> col("mismatch")))
    val fk = checksOf("lineitem",
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("orphans")),
      Seq("lineitem.l_orderkey.fk_orders" -> col("orphans")))

    o.unionByName(l).unionByName(e).unionByName(d).unionByName(fk)
      .orderBy("check_id")
  }

  /** q120 — FUNCTIONAL-DEPENDENCY audit: for each declared candidate
    * dependency A → B, the distinct-A count, distinct-(A,B) count and
    * the number of A values mapping to >1 B — key discovery and
    * denormalization checking, the profiling step (q92 profiles
    * columns in isolation; this profiles cross-column structure) that
    * catches a fact table silently becoming many-to-many after an
    * upstream change. Two dependencies hold by design (PK shapes), two
    * fail by design, so both report paths stay gate-exercised.
    *
    * Scale shape: each dependency is one hash aggregate on the LHS
    * (map-side combined) reduced to a single audit row — never a
    * pairwise comparison; the suite is a union of one-row relations.
    */
  def fdAudit(spark: SparkSession, dir: String): DataFrame = {
    def one(name: String, df: DataFrame, lhs: String, rhs: String): DataFrame =
      df.groupBy(col(lhs).as("k")).agg(countDistinct(col(rhs)).as("nr"))
        .agg(count(lit(1)).as("n_lhs"), sum("nr").as("n_pairs"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("dependency"), col("n_lhs"), col("n_pairs"),
          col("n_violating"), (col("n_violating") === 0).as("holds"))
    val ev = Tables.events(spark, dir)
    one("events.event_id->user_id", ev, "event_id", "user_id")
      .unionByName(one("events.user_id->event_type", ev, "user_id", "event_type"))
      .unionByName(one("orders.o_orderkey->o_custkey",
        Tables.orders(spark, dir), "o_orderkey", "o_custkey"))
      .unionByName(one("lineitem.l_orderkey->l_suppkey",
        Tables.lineitem(spark, dir), "l_orderkey", "l_suppkey"))
      .orderBy("dependency")
  }

  /** Tombstone selectivity for q162: 1-in-[[DeleteMod]] customers. */
  val DeleteMod = 20

  /** q162 — DELETION-CASCADE audit (right-to-be-forgotten): given a
    * deterministic tombstone set of customers (salted-md5 1-in-
    * [[DeleteMod]] — the q45 no-rand() selection, so the same users
    * tombstone on every engine and re-run), report per table how many
    * rows the cascade purges and what remains, with an exact
    * retained-key checksum (summed in DECIMAL(38,0), shipped as two
    * BIGINT halves — [[graft.functions.Wide]]) that downstream re-runs
    * can diff to PROVE the purge happened and touched nothing else. The
    * cascade follows the relational chain customer → orders (by
    * custkey) → lineitem (by purged orderkey) and events (by user id —
    * the fixture's shared customer/user key space).
    *
    * Scale shape: the tombstone set is selectivity-bounded (|customer|
    * / [[DeleteMod]]) and joins broadcast against every table; the
    * lineitem leg keys on the purged-orders relation (itself
    * tombstone-bounded); each table contributes ONE scan folded to a
    * single audit row of conditional integer sums — the checksum rides
    * the same aggregate, so the whole audit is 4 scans total, no
    * re-reads, nothing row-scale crosses the wire.
    */
  /** q192 — SUBJECT-ACCESS report (the READ twin of q162's deletion
    * cascade, completing the GDPR pair: article 15 before article 17):
    * for the SAME deterministic subject set q162 tombstones, one row
    * per subject assembling everything the warehouse holds on them —
    * order/line counts, exact total spend, event count, distinct event
    * types, first/last activity. Sharing the selection hash with q162
    * means the access report and the deletion audit can never disagree
    * about WHO a request covers.
    *
    * Scale shape: subjects are selectivity-bounded and broadcast into
    * every leg; the lineitem leg keys on the subject-bounded order
    * relation; each table contributes one scan folded to subject-keyed
    * aggregates; output is subjects-sized. Spend sums in exact
    * DECIMAL(18,2) money and ships one deterministic double cast.
    */
  def subjectAccess(spark: SparkSession, dir: String): DataFrame =
    subjectAccessFrom(Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir), Tables.events(spark, dir))

  def subjectAccessFrom(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, events: DataFrame): DataFrame = {
    val tomb = customer
      .filter(graft.functions.TextFns.hash32(
        concat(lit("forget|"), col("c_custkey").cast("string")))
        % DeleteMod === 0)
      .select(col("c_custkey").as("tk"))
    val subjOrders = orders
      .join(broadcast(tomb), col("o_custkey") === col("tk"))
      .select(col("tk"), col("o_orderkey"))
    val ordAgg = subjOrders.groupBy("tk")
      .agg(count(lit(1)).as("n_orders"))
    val liAgg = lineitem
      .join(broadcast(subjOrders), col("l_orderkey") === col("o_orderkey"))
      .groupBy("tk")
      .agg(count(lit(1)).as("n_lines"),
        sum(graft.functions.Det.money(col("l_extendedprice")))
          .cast("double").as("total_spend"))
    val evAgg = events
      .join(broadcast(tomb), col("user_id") === col("tk"))
      .groupBy("tk")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        min(col("ts")).as("first_event"),
        max(col("ts")).as("last_event"))
    tomb.join(ordAgg, Seq("tk"), "left")
      .join(liAgg, Seq("tk"), "left")
      .join(evAgg, Seq("tk"), "left")
      .na.fill(0L, Seq("n_orders", "n_lines", "n_events", "n_event_types"))
      .na.fill(0.0, Seq("total_spend"))
      .withColumnRenamed("tk", "subject_key")
      .orderBy("subject_key")
  }

  def deletionCascade(spark: SparkSession, dir: String): DataFrame =
    deletionCascadeFrom(Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir), Tables.events(spark, dir))

  def deletionCascadeFrom(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, events: DataFrame): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val tomb = customer
      .filter(graft.functions.TextFns.hash32(
        concat(lit("forget|"), col("c_custkey").cast("string")))
        % DeleteMod === 0)
      .select(col("c_custkey").as("tk"))
    def leg(df: DataFrame, name: String, joinKey: Column, probe: DataFrame,
        probeKey: Column, rowKey: Column): DataFrame =
      df.join(broadcast(probe), joinKey === probeKey, "left")
        .select(lit(name).as("table_name"),
          probeKey.isNotNull.as("purge"), rowKey.cast(dec0).as("key"))
    val purgedOrders = orders
      .join(broadcast(tomb), col("o_custkey") === col("tk"), "left_semi")
      .select(col("o_orderkey").as("pok"))
    leg(customer, "customer", col("c_custkey"), tomb, col("tk"),
        col("c_custkey"))
      .union(leg(orders, "orders", col("o_custkey"), tomb, col("tk"),
        col("o_orderkey")))
      .union(leg(lineitem, "lineitem", col("l_orderkey"), purgedOrders,
        col("pok"), col("l_orderkey") * 10 + col("l_linenumber")))
      .union(leg(events, "events", col("user_id"), tomb, col("tk"),
        col("event_id")))
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("purge"), 1L).otherwise(0L)).as("n_purged"),
        sum(when(!col("purge"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(!col("purge"), col("key")).otherwise(lit(0).cast(dec0)))
          .cast(dec0).as("rk_sum"))
      .select(col("table_name"), col("n_total"), col("n_purged"),
        col("n_retained"),
        Wide.hi62(col("rk_sum")).as("retained_sum_hi"),
        Wide.lo62(col("rk_sum")).as("retained_sum_lo"))
      .orderBy("table_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_deletion_cascade" -> (deletionCascade _),
    "q192_subject_access" -> (subjectAccess _),
    "q01_row_counts" -> (rowCounts _),
    "q02_orders_without_lines" -> (ordersWithoutLines _),
    "q03_lines_without_order" -> (linesWithoutOrder _),
    "q105_expectations" -> (expectations _),
    "q120_fd_audit" -> (fdAudit _))

  val oracle: Map[String, String] = Map(
    // same salted-md5 tombstone selection; retained checksum summed in
    // DECIMAL(38,0) (key sums wrap BIGINT at warehouse scale) and
    // shipped as hi/lo BIGINT halves (Wide.sql — gate-safe output)
    // q162's subject selection verbatim; per-subject aggregates with
    // exact DECIMAL money and one deterministic double cast
    "q192_subject_access" -> {
      val h = graft.functions.TextFns.sql.hash32(
        "'forget|' || CAST(c_custkey AS VARCHAR)")
      s"""WITH tomb AS (SELECT c_custkey AS tk FROM customer
         |  WHERE $h % $DeleteMod = 0),
         |so AS (SELECT tk, o_orderkey FROM orders
         |  JOIN tomb ON o_custkey = tk),
         |oa AS (SELECT tk, count(*) AS n_orders FROM so GROUP BY 1),
         |la AS (SELECT tk, count(*) AS n_lines,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |      AS total_spend
         |  FROM lineitem JOIN so ON l_orderkey = o_orderkey GROUP BY 1),
         |ea AS (SELECT tk, count(*) AS n_events,
         |    count(DISTINCT event_type) AS n_event_types,
         |    min(ts) AS first_event, max(ts) AS last_event
         |  FROM events JOIN tomb ON user_id = tk GROUP BY 1)
         |SELECT tomb.tk AS subject_key,
         |  CAST(coalesce(oa.n_orders, 0) AS BIGINT) AS n_orders,
         |  CAST(coalesce(la.n_lines, 0) AS BIGINT) AS n_lines,
         |  coalesce(la.total_spend, 0.0) AS total_spend,
         |  CAST(coalesce(ea.n_events, 0) AS BIGINT) AS n_events,
         |  CAST(coalesce(ea.n_event_types, 0) AS BIGINT) AS n_event_types,
         |  ea.first_event, ea.last_event
         |FROM tomb LEFT JOIN oa ON oa.tk = tomb.tk
         |LEFT JOIN la ON la.tk = tomb.tk
         |LEFT JOIN ea ON ea.tk = tomb.tk
         |ORDER BY subject_key""".stripMargin
    },
    "q162_deletion_cascade" -> {
      val h = graft.functions.TextFns.sql.hash32(
        "'forget|' || CAST(c_custkey AS VARCHAR)")
      s"""WITH tomb AS (SELECT c_custkey AS tk FROM customer
         |  WHERE $h % $DeleteMod = 0),
         |po AS (SELECT o_orderkey AS pok FROM orders
         |  JOIN tomb ON o_custkey = tk),
         |u AS (
         |  SELECT 'customer' AS table_name, tk IS NOT NULL AS purge,
         |    CAST(c_custkey AS DECIMAL(38,0)) AS key
         |  FROM customer LEFT JOIN tomb ON c_custkey = tk
         |  UNION ALL
         |  SELECT 'orders', tk IS NOT NULL, CAST(o_orderkey AS DECIMAL(38,0))
         |  FROM orders LEFT JOIN tomb ON o_custkey = tk
         |  UNION ALL
         |  SELECT 'lineitem', pok IS NOT NULL,
         |    CAST(l_orderkey * 10 + l_linenumber AS DECIMAL(38,0))
         |  FROM lineitem LEFT JOIN po ON l_orderkey = pok
         |  UNION ALL
         |  SELECT 'events', tk IS NOT NULL, CAST(event_id AS DECIMAL(38,0))
         |  FROM events LEFT JOIN tomb ON user_id = tk),
         |g AS (SELECT table_name, count(*) AS n_total,
         |  CAST(sum(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
         |  CAST(sum(CASE WHEN NOT purge THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_retained,
         |  CAST(sum(CASE WHEN NOT purge THEN key
         |    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
         |    AS rk_sum
         |FROM u GROUP BY 1)
         |SELECT table_name, n_total, n_purged, n_retained,
         |  ${graft.functions.Wide.sql.hi62("rk_sum")} AS retained_sum_hi,
         |  ${graft.functions.Wide.sql.lo62("rk_sum")} AS retained_sum_lo
         |FROM g ORDER BY 1""".stripMargin
    },
    "q120_fd_audit" -> {
      def one(name: String, tbl: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS dependency, count(*) AS n_lhs,
           |  CAST(sum(nr) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |  sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $lhs AS k, count(DISTINCT $rhs) AS nr FROM $tbl GROUP BY 1) g""".stripMargin
      Seq(
        one("events.event_id->user_id", "events", "event_id", "user_id"),
        one("events.user_id->event_type", "events", "user_id", "event_type"),
        one("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        one("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY dependency")
    },
    "q01_row_counts" ->
      Tables.names
        .map(n => s"SELECT '$n' AS tbl, COUNT(*) AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),
    "q02_orders_without_lines" ->
      """SELECT COUNT(*) AS n_orphans FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q03_lines_without_order" ->
      """SELECT COUNT(*) AS n_orphans FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin,
    "q105_expectations" ->
      """WITH o AS (
        |  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
        |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
        |    sum(CASE WHEN NOT o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS bad_status,
        |    sum(CASE WHEN NOT o_orderdate BETWEEN '1990-01-01' AND '2005-12-31' THEN 1 ELSE 0 END) AS bad_date
        |  FROM orders),
        |l AS (
        |  SELECT
        |    sum(CASE WHEN NOT l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS bad_qty,
        |    sum(CASE WHEN NOT l_discount BETWEEN 0 AND 1 THEN 1 ELSE 0 END) AS bad_disc
        |  FROM lineitem),
        |e AS (
        |  SELECT count(*) AS n, count(DISTINCT event_id) AS nd,
        |    sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS bad_value,
        |    sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS big_value,
        |    sum(CASE WHEN NOT event_type IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS bad_type
        |  FROM events),
        |d AS (
        |  SELECT count(*) AS n, count(DISTINCT doc_id) AS nd,
        |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS mismatch
        |  FROM documents),
        |fk AS (
        |  SELECT count(*) AS orphans FROM lineitem li
        |  WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = li.l_orderkey)),
        |rows_ AS (
        |  SELECT 'orders.o_orderkey.unique' AS check_id, 'orders' AS tbl, n - nd AS metric FROM o
        |  UNION ALL SELECT 'orders.o_custkey.not_null', 'orders', nulls FROM o
        |  UNION ALL SELECT 'orders.o_totalprice.positive', 'orders', bad_price FROM o
        |  UNION ALL SELECT 'orders.o_orderstatus.accepted', 'orders', bad_status FROM o
        |  UNION ALL SELECT 'orders.o_orderdate.in_range', 'orders', bad_date FROM o
        |  UNION ALL SELECT 'lineitem.l_quantity.in_range', 'lineitem', bad_qty FROM l
        |  UNION ALL SELECT 'lineitem.l_discount.in_range', 'lineitem', bad_disc FROM l
        |  UNION ALL SELECT 'events.event_id.unique', 'events', n - nd FROM e
        |  UNION ALL SELECT 'events.value.non_negative', 'events', bad_value FROM e
        |  UNION ALL SELECT 'events.value.le_400', 'events', big_value FROM e
        |  UNION ALL SELECT 'events.event_type.accepted', 'events', bad_type FROM e
        |  UNION ALL SELECT 'documents.doc_id.unique', 'documents', n - nd FROM d
        |  UNION ALL SELECT 'documents.n_chars.consistent', 'documents', mismatch FROM d
        |  UNION ALL SELECT 'lineitem.l_orderkey.fk_orders', 'lineitem', orphans FROM fk)
        |SELECT check_id, tbl, CAST(metric AS DOUBLE) AS metric,
        |  CAST(metric AS DOUBLE) = 0 AS passed
        |FROM rows_ ORDER BY check_id""".stripMargin)
}
