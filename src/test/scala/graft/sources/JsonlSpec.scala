package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class JsonlSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/dev/shm/graft-test-jsonl"

  describe("Jsonl source/sink") {
    it("round-trips the documents table losslessly") {
      val docs = Tables.documents(spark, TestSpark.Sf)
      Jsonl.write(docs, s"$dir/docs")
      val back = Jsonl.readDocuments(spark, s"$dir/docs")
      assert(back.schema == docs.schema)
      val a = docs.orderBy("doc_id").collect().toSeq
      val b = back.orderBy("doc_id").collect().toSeq
      assert(a == b)
    }

    it("keeps null fields so the schema round-trips") {
      val df = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      Jsonl.write(df, s"$dir/nulls")
      val back = Jsonl.read(spark, df.schema, s"$dir/nulls")
      val r = back.collect()(0)
      assert(r.getLong(0) == 1L && r.isNullAt(1))
    }

    it("preserves unicode and JSON-special characters in text") {
      val texts = Seq("quote \" backslash \\", "newline\nin doc", "emoji 🚀 and ümlaut")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      Jsonl.write(df, s"$dir/special")
      val back = Jsonl.read(spark, df.schema, s"$dir/special")
        .orderBy("doc_id").select("text").as[String].collect().toSeq
      assert(back == texts)
    }

    it("fails loudly on corrupt lines instead of yielding nulls") {
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(s"$dir/corrupt/part-00000.json")
      val out = fs.create(p, true)
      out.write("{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes("UTF-8"))
      out.close()
      val ex = intercept[org.apache.spark.SparkException] {
        Jsonl.read(spark,
          new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("text", "string"),
          s"$dir/corrupt").collect()
      }
      assert(ex.getMessage.contains("MALFORMED_RECORD") ||
        ex.getCause != null)
    }
  }
}
