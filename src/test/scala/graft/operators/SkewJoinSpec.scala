package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class SkewJoinSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  describe("salted skew join") {
    it("is row-identical to the plain inner join on skewed data") {
      // 10k rows of one hot key + a tail, joined to a 3-row dim
      val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
        Seq(("warm", 1L), ("cold", 2L), ("absent-on-small", 3L)))
        .toDF("k", "v")
      val small = Seq(("hot", "H"), ("warm", "W"), ("cold", "C"))
        .toDF("k", "tag")

      val plain = big.join(small, Seq("k")).groupBy("k", "tag").count()
        .collect().map(_.toString).sorted.toSeq
      val salted = SkewJoin.salted(big, small, "k", salts = 8)
        .groupBy("k", "tag").count()
        .collect().map(_.toString).sorted.toSeq
      assert(salted == plain)
    }

    it("spreads the hot key across salt partitions in the plan") {
      val big = (1 to 100).map(i => ("hot", i.toLong)).toDF("k", "v")
      val small = Seq(("hot", "H")).toDF("k", "tag")
      val plan = SkewJoin.salted(big, small, "k", salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), "join key must include the salt")
    }
  }
}
