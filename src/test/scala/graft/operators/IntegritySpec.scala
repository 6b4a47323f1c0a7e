package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark
import graft.sources.Tables

class IntegritySpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  describe("row counts (q01)") {
    it("covers every corpus table with a positive count") {
      val rows = Integrity.rowCounts(spark, sf).collect()
      assert(rows.length == Tables.names.length)
      assert(rows.forall(_.getLong(1) > 0))
    }
  }

  describe("deletionCascade (q162)") {
    it("purges the salted-md5 tombstones down the relational chain, exactly") {
      import spark.implicits._
      // independent reimplementation of the selection hash: first 8 md5
      // hex chars as an unsigned int — pins the engine-side TextFns
      // kernel against a from-scratch oracle
      def h32(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(4).map(b => f"$b%02x").mkString, 16)
      }
      val keys = (1L to 60L).toSeq
      val tomb = keys.filter(k => h32(s"forget|$k") % Integrity.DeleteMod == 0).toSet
      assert(tomb.nonEmpty, "fixture must tombstone at least one customer")
      val customer = keys.map(k => (k, s"c$k")).toDF("c_custkey", "c_name")
      val orders = keys.map(k => (k * 100, k)).toDF("o_orderkey", "o_custkey")
      val lineitem = keys.flatMap(k => Seq((k * 100, 1L), (k * 100, 2L)))
        .toDF("l_orderkey", "l_linenumber")
      val events = keys.map(k => (k, k)).toDF("event_id", "user_id")
      val r = Integrity
        .deletionCascadeFrom(customer, orders, lineitem, events)
        .collect()
        .map(x => x.getAs[String]("table_name") -> x).toMap
      // retained sum ships as hi/lo BIGINT halves (Wide.hi62/lo62)
      def dec(t: String) =
        BigDecimal(r(t).getAs[Long]("retained_sum_hi")) *
          BigDecimal(2).pow(62) +
          BigDecimal(r(t).getAs[Long]("retained_sum_lo"))
      val kept = keys.filterNot(tomb)
      assert(r("customer").getAs[Long]("n_purged") == tomb.size.toLong)
      assert(r("orders").getAs[Long]("n_purged") == tomb.size.toLong)
      assert(r("lineitem").getAs[Long]("n_purged") == 2L * tomb.size)
      assert(r("events").getAs[Long]("n_purged") == tomb.size.toLong)
      assert(r("lineitem").getAs[Long]("n_total") == 120L)
      assert(r("customer").getAs[Long]("n_retained") == kept.size.toLong)
      assert(dec("customer") == BigDecimal(kept.sum))
      assert(dec("orders") == BigDecimal(kept.map(_ * 100).sum))
      assert(dec("lineitem") ==
        BigDecimal(kept.map(k => (k * 100 * 10 + 1) + (k * 100 * 10 + 2)).sum))
      assert(dec("events") == BigDecimal(kept.sum))
    }
  }

  describe("subjectAccess (q192)") {
    it("assembles one complete row per q162-selected subject") {
      import spark.implicits._
      def h32(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(4).map(b => f"$b%02x").mkString, 16)
      }
      val keys = (1L to 60L).toSeq
      val subj = keys.filter(k => h32(s"forget|$k") % Integrity.DeleteMod == 0)
      assert(subj.nonEmpty)
      val customer = keys.map(k => (k, s"c$k")).toDF("c_custkey", "c_name")
      // 2 orders per customer, 2 lines per order at price o + 0.25
      val orders = keys.flatMap(k => Seq((k * 10 + 1, k), (k * 10 + 2, k)))
        .toDF("o_orderkey", "o_custkey")
      val lineitem = keys.flatMap(k => Seq(k * 10 + 1, k * 10 + 2))
        .flatMap(o => Seq((o, 1L, o + 0.25), (o, 2L, o + 0.25)))
        .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      val events = keys.map(k =>
          (k, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0${k % 10}"), k, "click"))
        .toDF("event_id", "ts", "user_id", "event_type")
      val r = Integrity
        .subjectAccessFrom(customer, orders, lineitem, events)
        .collect()
      assert(r.map(_.getAs[Long]("subject_key")).toSeq == subj)
      r.foreach { x =>
        val k = x.getAs[Long]("subject_key")
        assert(x.getAs[Long]("n_orders") == 2L)
        assert(x.getAs[Long]("n_lines") == 4L)
        assert(x.getAs[Double]("total_spend") ==
          2 * ((k * 10 + 1) + 0.25) + 2 * ((k * 10 + 2) + 0.25))
        assert(x.getAs[Long]("n_events") == 1L)
        assert(x.getAs[Long]("n_event_types") == 1L)
        assert(x.getAs[java.sql.Timestamp]("first_event") ==
          x.getAs[java.sql.Timestamp]("last_event"))
      }
    }
  }

  describe("orphan checks (q02/q03)") {
    it("anti-join equals left-join + IS NULL formulation") {
      val anti = Integrity.ordersWithoutLines(spark, sf).collect()(0).getLong(0)
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), lit(1).as("marker"))
        .distinct()
      val viaLeft = o.join(l, Seq("o_orderkey"), "left")
        .filter(col("marker").isNull).count()
      assert(anti == viaLeft)
    }

    it("is symmetric-safe: both directions run and are non-negative") {
      assert(Integrity.ordersWithoutLines(spark, sf).collect()(0).getLong(0) >= 0)
      assert(Integrity.linesWithoutOrder(spark, sf).collect()(0).getLong(0) >= 0)
    }
  }

  describe("expectations (q105)") {
    it("emits one row per declared check with passed ≡ (metric == 0)") {
      val r = Integrity.expectations(spark, sf).collect()
      assert(r.length == 14)
      assert(r.map(_.getAs[String]("check_id")).distinct.length == 14)
      r.foreach { row =>
        assert(row.getAs[Boolean]("passed") == (row.getAs[Double]("metric") == 0.0))
        assert(row.getAs[Double]("metric") >= 0.0)
      }
      // the clean synthetic corpus passes the structural checks…
      val byId = r.map(x => x.getAs[String]("check_id") -> x).toMap
      Seq("orders.o_orderkey.unique", "events.event_id.unique",
        "documents.doc_id.unique", "documents.n_chars.consistent",
        "lineitem.l_orderkey.fk_orders").foreach { id =>
        assert(byId(id).getAs[Boolean]("passed"), id)
      }
      // …while the deliberately tight value cap reports its violations
      assert(byId("events.value.le_400").getAs[Double]("metric") ==
        Tables.events(spark, sf).filter(col("value") > 400).count().toDouble)
    }
  }

  describe("fdAudit (q120)") {
    it("confirms the key-shaped dependencies and catches the many-to-many ones") {
      val r = Integrity.fdAudit(spark, sf).collect()
      val byDep = r.map(x => x.getAs[String]("dependency") -> x).toMap
      assert(byDep.keySet == Set(
        "events.event_id->user_id", "events.user_id->event_type",
        "orders.o_orderkey->o_custkey", "lineitem.l_orderkey->l_suppkey"))
      // PK-shaped dependencies hold: zero violating LHS values
      assert(byDep("events.event_id->user_id").getAs[Boolean]("holds"))
      assert(byDep("orders.o_orderkey->o_custkey").getAs[Boolean]("holds"))
      // many-to-many shapes fail, with the violation count exposed
      assert(!byDep("events.user_id->event_type").getAs[Boolean]("holds"))
      assert(!byDep("lineitem.l_orderkey->l_suppkey").getAs[Boolean]("holds"))
      // n_pairs >= n_lhs always; equality exactly when the FD holds
      r.foreach { x =>
        val (lhs, pairs) = (x.getAs[Long]("n_lhs"), x.getAs[Long]("n_pairs"))
        assert(pairs >= lhs)
        assert((pairs == lhs) == x.getAs[Boolean]("holds"))
      }
    }
  }
}
