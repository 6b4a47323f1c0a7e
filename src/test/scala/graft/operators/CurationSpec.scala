package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class CurationSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  describe("hashSplit (q45)") {
    it("assigns every doc, roughly 80/10/10, and is stable across runs") {
      val r = Curation.hashSplit(spark, TestSpark.Sf)
        .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("n_docs")).toMap
      val total = r.values.sum
      assert(total == 500)
      assert(r("train") > 350 && r("train") < 450) // ~400 expected
      val again = Curation.hashSplit(spark, TestSpark.Sf)
        .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("n_docs")).toMap
      assert(again == r)
    }
  }

  describe("decontaminate (q46)") {
    it("flags docs sharing a bigram with the benchmark, counts distinct overlaps") {
      // benchmark = doc_ids 0-4; only "x y" is shared below
      val r = Curation.decontaminateFrom(docs(
        (0L, "x y unique0", "en", "s", 1L),
        (1L, "benchmark text one", "en", "s", 1L),
        (2L, "benchmark text two", "en", "s", 1L),
        (3L, "filler three a", "en", "s", 1L),
        (4L, "filler four b", "en", "s", 1L),
        (5L, "contains x y twice x y", "en", "s", 1L), // "x y" shared (distinct: 1)
        (6L, "benchmark text one copy", "en", "s", 1L), // "benchmark text", "text one"
        (7L, "nothing shared here", "en", "s", 1L)))
        .collect()
      assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_overlap"))).toSeq ==
        Seq((5L, 1L), (6L, 2L)))
    }
  }

  describe("repetition (q47)") {
    it("scores duplicate bigrams and drops shingle-less docs") {
      val r = Curation.repetitionFrom(docs(
        (1L, "a b a b a", "en", "s", 1L), // 4 shingles, 2 distinct
        (2L, "all distinct words here", "en", "s", 1L), // 3/3
        (3L, "single", "en", "s", 1L))) // no shingles: dropped
        .collect()
      assert(r.length == 2)
      assert(r(0).getAs[Int]("n_shingles") == 4)
      assert(r(0).getAs[Int]("n_distinct") == 2)
      assert(r(0).getAs[Double]("rep_ratio") == 0.5)
      assert(r(1).getAs[Double]("rep_ratio") == 0.0)
    }
  }

  describe("sourceMixture (q48)") {
    it("allocates the exact budget with largest-remainder rounding") {
      // tokens: s1=3, s2=3, s3=1 of 7; raw = 42857.142../42857.142../14285.714..
      // floors sum to 99999, the 1 leftover unit goes to s3 (largest frac)
      val r = Curation.sourceMixtureFrom(docs(
        (1L, "one two three", "en", "s1", 1L),
        (2L, "four five six", "en", "s2", 1L),
        (3L, "seven", "en", "s3", 1L)))
        .collect()
      assert(r.map(x => (x.getAs[String]("source"), x.getAs[Long]("alloc_tokens"))).toSeq ==
        Seq(("s1", 42857L), ("s2", 42857L), ("s3", 14286L)))
    }

    it("allocations sum exactly to the budget on the fixture") {
      val total = Curation.sourceMixture(spark, TestSpark.Sf)
        .agg(org.apache.spark.sql.functions.sum("alloc_tokens"))
        .collect()(0).getLong(0)
      assert(total == Curation.MixBudget)
    }
  }

  describe("chunkDedup (q58)") {
    it("counts cross-doc repeated chunks and ignores partial trailing chunks") {
      val a = "a1 a2 a3 a4 a5 a6 a7 a8" // shared chunk
      val b = "b1 b2 b3 b4 b5 b6 b7 b8"
      val c = "c1 c2 c3 c4 c5 c6 c7 c8"
      val d = "d1 d2 d3 d4 d5 d6 d7 d8"
      val r = Curation.chunkDedupFrom(docs(
        (1L, s"$a $b", "en", "s", 1L),       // chunks {a,b}; a is boiler
        (2L, s"$a $c tail", "en", "s", 1L),  // chunks {a,c}; "tail" ignored
        (3L, s"$d", "en", "s", 1L),          // unique
        (4L, "short doc", "en", "s", 1L)))   // < 8 tokens: dropped
        .collect()
      assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("n_chunks"),
        x.getAs[Long]("n_boiler"), x.getAs[Double]("boiler_ratio"))).toSeq ==
        Seq((1L, 2, 1L, 0.5), (2L, 2, 1L, 0.5), (3L, 1, 0L, 0.0)))
    }

    it("is stable across runs on the fixture") {
      val r = Curation.chunkDedup(spark, TestSpark.Sf).collect()
      assert(r.length == 500)
      assert(r.map(_.getAs[Long]("n_boiler")).sum > 0) // planted dups repeat chunks
      assert(Curation.chunkDedup(spark, TestSpark.Sf).collect().toSeq == r.toSeq)
    }
  }

  describe("dpRelease (q214)") {
    // independent re-derivation of the hash-seeded Laplace mechanism
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def lap(source: String, tag: String, b: Double): Double = {
      val k = java.lang.Long.parseLong(md5hex(s"dp|$source|$tag").take(15), 16) %
        1048576L
      val u = (k.toDouble + 0.5) / 1048576.0
      -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    it("releases Laplace-noised counts matching the inverse-CDF closed form") {
      val r = Curation.dpReleaseFrom(docs(
          (1L, "a b c", "en", "s1", 5L), (2L, "d e", "en", "s1", 3L),
          (3L, "x", "en", "s2", 1L)))
        .collect().map(x => x.getAs[String]("source") -> x).toMap
      assert(r("s1").getAs[Double]("epsilon") == 1.0)
      assert(r("s1").getAs[Long]("clip") == 1000L)
      assert(r("s1").getAs[Double]("noised_docs") ==
        r6(2.0 + lap("s1", "docs", 2.0)))
      assert(r("s1").getAs[Double]("noised_tokens") ==
        r6(5.0 + lap("s1", "tokens", 2000.0)))
      assert(r("s2").getAs[Double]("noised_docs") ==
        r6(1.0 + lap("s2", "docs", 2.0)))
    }

    it("clips each document's token contribution at the sensitivity bound") {
      val big = ("tok " * 3000).trim // 3000 tokens, clipped to 1000
      val r = Curation.dpReleaseFrom(docs((1L, big, "en", "s1", 1L)))
        .collect()(0)
      assert(r.getAs[Double]("noised_tokens") ==
        r6(1000.0 + lap("s1", "tokens", 2000.0)))
    }

    it("noise is per-(source, statistic) and stable across runs") {
      val d = docs((1L, "a", "en", "s1", 1L), (2L, "a", "en", "s2", 1L))
      val one = Curation.dpReleaseFrom(d).collect().map(_.toSeq).toSeq
      val two = Curation.dpReleaseFrom(d).collect().map(_.toSeq).toSeq
      assert(one == two)
      // equal true counts, different sources → different noise draws
      val byS = one.map(r => r.head -> (r(3), r(4))).toMap
      assert(byS("s1") != byS("s2"))
    }
  }

  describe("schemaEvolution (q221)") {
    it("legacy parquet footers genuinely lack the evolved columns") {
      import scala.jdk.CollectionConverters._
      val rel = graft.sources.Evolved.documentsFor(spark, graft.TestSpark.Sf)
      val conf = spark.sparkContext.hadoopConfiguration
      val schemas = rel.inputFiles.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSet
        finally r.close()
      }
      assert(schemas.exists(s => !s.contains("lang")),
        "some files must predate the lang column")
      assert(schemas.exists(_.contains("lang")),
        "some files must carry the evolved schema")
    }

    it("the merged read backfills legacy rows as NULL, rollup matches direct") {
      val rel = graft.sources.Evolved.documentsFor(spark, graft.TestSpark.Sf)
      import org.apache.spark.sql.functions._
      // every even doc_id is legacy → lang null; odd carries lang
      val probe = rel.select(col("doc_id"), col("lang")).collect()
      probe.foreach { r =>
        val even = r.getLong(0) % 2 == 0
        assert(r.isNullAt(1) == even, s"doc ${r.getLong(0)}")
      }
      val got = Curation.schemaEvolution(spark, graft.TestSpark.Sf).collect()
      got.foreach { r =>
        assert(r.getAs[Long]("n_legacy") + r.getAs[Long]("n_evolved") ==
          r.getAs[Long]("n_docs"))
        assert(r.getAs[Long]("n_lang_known") == r.getAs[Long]("n_evolved"))
      }
    }
  }

  describe("timeTravel (q222)") {
    it("the previous-generation read returns the pre-publish snapshot") {
      val r = Curation.timeTravel(spark, graft.TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        assert(x.getAs[Long]("n_docs_now") ==
          x.getAs[Long]("n_docs_prev") + x.getAs[Long]("n_added"))
        assert(x.getAs[Long]("n_added") >= 0L)
      }
      // re-running republishes two more generations; the diff is stable
      val again = Curation.timeTravel(spark, graft.TestSpark.Sf).collect()
      assert(again.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
    }

    it("readVersion walks generations; too-far stepsBack is refused") {
      import graft.sources.AtomicWarehouse
      import org.apache.spark.sql.functions._
      val root = "/dev/shm/graft-test-tt-spec"
      graft.sources.Materialize.deleteRecursively(
        java.nio.file.Paths.get(root))
      val one = Seq((1L, "a")).toDF("k", "v")
      val two = Seq((2L, "b")).toDF("k", "v")
      AtomicWarehouse.overwrite(one, root, "t")
      AtomicWarehouse.overwrite(two, root, "t") // same millis: Lamport bump
      assert(AtomicWarehouse.read(spark, root, "t")
        .collect()(0).getLong(0) == 2L)
      assert(AtomicWarehouse.readVersion(spark, root, "t", 0)
        .collect()(0).getLong(0) == 2L)
      assert(AtomicWarehouse.readVersion(spark, root, "t", 1)
        .collect()(0).getLong(0) == 1L)
      intercept[IllegalArgumentException] {
        AtomicWarehouse.readVersion(spark, root, "t", 9)
      }
    }
  }

  describe("mixtureReweight (q223)") {
    it("one mirror-descent step upweights the under-modeled source, weights renormalize") {
      val r = Curation.mixtureReweight(spark, graft.TestSpark.Sf)
        .collect()
      assert(r.nonEmpty)
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // both weight columns are distributions (round-6 tolerance)
      assert(math.abs(r.map(_.getAs[Double]("w_before")).sum - 1.0) < 1e-4)
      assert(math.abs(r.map(_.getAs[Double]("w_after")).sum - 1.0) < 1e-4)
      // the DoReMi property: relative weight moves WITH the loss —
      // the max-loss source gains relative mass, the min-loss one loses
      val hi = r.maxBy(_.getAs[Double]("loss"))
      val lo = r.minBy(_.getAs[Double]("loss"))
      assert(hi.getAs[Double]("w_after") >= hi.getAs[Double]("w_before") ||
        hi.getAs[Double]("loss") == lo.getAs[Double]("loss"))
      assert(lo.getAs[Double]("w_after") <= lo.getAs[Double]("w_before") ||
        hi.getAs[Double]("loss") == lo.getAs[Double]("loss"))
      // the update algebra, re-derived from the row's own columns:
      // w_after = w0·exp(η·loss) / Σ — recompute the normalizer
      val scores = r.map(x => x.getAs[Double]("w_before") *
        math.exp(Curation.RwEta * x.getAs[Double]("loss")))
      val dn = scores.sum
      r.zip(scores).foreach { case (x, s) =>
        assert(math.abs(x.getAs[Double]("w_after") - r6(s / dn)) <= 2e-6,
          x.getAs[String]("source"))
      }
    }
  }

  describe("cdcMerge (q167)") {
    it("applies deletes-over-updates and the checksum matches a from-scratch replay") {
      // independent md5 reimplementation of hash32/hash60 and the whole
      // merge, so the engine's apply is pinned against a replay that
      // shares no code with it
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      def h32(s: String) = java.lang.Long.parseLong(md5hex(s).take(8), 16)
      def h60(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
      val base = (1L to 40L).map(k => k -> s"doc text number $k").toMap
      def sel(salt: String, mod: Int)(k: Long) = h32(s"$salt$k") % mod == 0
      val dels = base.keySet.filter(sel("cdc_del|", Curation.CdcDelMod))
      val upds = base.keySet.filter(sel("cdc_upd|", Curation.CdcUpdMod))
      val inss = base.keySet.filter(sel("cdc_ins|", Curation.CdcInsMod))
      assert(dels.nonEmpty && upds.nonEmpty && inss.nonEmpty,
        "fixture must exercise all three op paths")
      val replay =
        base.filterKeys(!dels(_)).map { case (k, t) =>
          k -> (if (upds(k)) t.reverse else t) }.toMap ++
        inss.map(k => (k + base.keySet.max + 1) -> // ins_off = max(doc_id)+1
          base(k).toUpperCase).toMap
      val expChk = replay.map { case (k, t) =>
        BigDecimal(h60(s"$k|${md5hex(t)}")) }.sum
      val d = base.toSeq.map { case (k, t) => (k, t, "en", "s", 1L) }
      val r = Curation.cdcMergeFrom(docs(d: _*)).collect()(0)
      assert(r.getAs[Long]("n_base") == 40L)
      assert(r.getAs[Long]("n_deletes") == dels.size.toLong)
      assert(r.getAs[Long]("n_updates") == (upds -- dels).size.toLong)
      assert(r.getAs[Long]("n_inserts") == inss.size.toLong)
      assert(r.getAs[Long]("n_final") == replay.size.toLong)
      // checksum ships as hi/lo BIGINT halves (Wide.hi62/lo62)
      assert(BigDecimal(r.getAs[Long]("checksum_hi")) *
        BigDecimal(2).pow(62) +
        BigDecimal(r.getAs[Long]("checksum_lo")) == expChk)
    }
  }

  describe("contaminationRadius (q171)") {
    it("rolls q46's hits to per-source doc and token mass") {
      // bench doc 0 carries "alpha beta". source A: one doc sharing the
      // bigram (4 tokens) + one clean (3 tokens); source B: clean only.
      val d = docs(
        (0L, "alpha beta gamma delta", "en", "bench", 22L),
        (10L, "xx alpha beta yy", "en", "A", 16L),
        (11L, "one two three", "en", "A", 13L),
        (12L, "clean text here", "en", "B", 15L))
      val r = Curation.contaminationRadiusFrom(d).collect()
        .map(x => x.getAs[String]("source") -> x).toMap
      assert(r("A").getAs[Long]("n_docs") == 2L)
      assert(r("A").getAs[Long]("n_contaminated") == 1L)
      assert(r("A").getAs[Double]("doc_rate") == 0.5)
      assert(r("A").getAs[Long]("n_tokens") == 7L)
      assert(r("A").getAs[Long]("tokens_contaminated") == 4L)
      assert(r("A").getAs[Double]("token_share") ==
        BigDecimal(4.0 / 7.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r("A").getAs[Long]("max_overlap") == 1L)
      assert(r("B").getAs[Long]("n_contaminated") == 0L)
      assert(r("B").getAs[Double]("token_share") == 0.0)
      assert(r("B").getAs[Long]("max_overlap") == 0L)
      // the bench doc itself never appears as a source row
      assert(!r.contains("bench"))
    }
  }

  describe("snapshotDiff (q59)") {
    it("classifies added/removed/changed/unchanged across two snapshots") {
      val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
      val neu = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("doc_id", "text")
      val r = Curation.snapshotDiffFrom(old, neu).collect()
        .map(x => x.getAs[String]("change_class") ->
          ((x.getAs[Long]("n_docs"), x.getAs[Long]("chars_old"), x.getAs[Long]("chars_new"))))
        .toMap
      assert(r == Map(
        "added" -> ((1L, 0L, 1L)),
        "removed" -> ((1L, 1L, 0L)),
        "changed" -> ((1L, 1L, 2L)),
        "unchanged" -> ((1L, 1L, 1L))))
    }

    it("derives deterministic snapshots on the fixture with all four classes") {
      val r = Curation.snapshotDiff(spark, TestSpark.Sf).collect()
      assert(r.map(_.getAs[String]("change_class")).toSet ==
        Set("added", "removed", "changed", "unchanged"))
      // both snapshots keep ~90%: class masses must reflect the overlap
      val m = r.map(x => x.getAs[String]("change_class") -> x.getAs[Long]("n_docs")).toMap
      assert(m.values.sum >= 450 && m("unchanged") > m("changed"))
      assert(Curation.snapshotDiff(spark, TestSpark.Sf).collect().toSeq == r.toSeq)
    }
  }

  describe("scdMerge (q99)") {
    import java.sql.Date
    import org.apache.spark.sql.functions._
    def dim(rows: (Long, String, Int, Double)*): DataFrame =
      rows.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

    it("closes superseded versions and appends the new ones") {
      val cur = dim((1L, "a", 1, 10.0), (2L, "b", 2, 20.0))
      val upd = dim((2L, "b", 2, 99.0))
      val h = Curation.scdMergeFrom(cur, upd, "2024-01-01", "2024-01-02").collect()
      assert(h.length == 3)
      val s1 = h.filter(_.getAs[Long]("s_suppkey") == 1L)
      assert(s1.length == 1 && s1(0).getAs[Boolean]("is_current")
        && s1(0).isNullAt(s1(0).fieldIndex("valid_to")))
      val s2 = h.filter(_.getAs[Long]("s_suppkey") == 2L)
        .sortBy(_.getAs[Date]("valid_from").toString)
      assert(s2.length == 2)
      assert(!s2(0).getAs[Boolean]("is_current")
        && s2(0).getAs[Date]("valid_to").toString == "2024-01-02"
        && s2(0).getAs[Double]("s_acctbal") == 20.0)
      assert(s2(1).getAs[Boolean]("is_current")
        && s2(1).isNullAt(s2(1).fieldIndex("valid_to"))
        && s2(1).getAs[Double]("s_acctbal") == 99.0)
    }

    it("is idempotent: an unchanged update row produces no new version") {
      val cur = dim((3L, "c", 3, 30.0))
      val h = Curation.scdMergeFrom(cur, dim((3L, "c", 3, 30.0)),
        "2024-01-01", "2024-01-02").collect()
      assert(h.length == 1 && h(0).getAs[Boolean]("is_current"))
    }
  }

  describe("ingestDedup (q67)") {
    it("flags new docs whose normalized fingerprint matches a different prior doc") {
      val old = Seq((1L, "Same   Text!"), (2L, "other"), (3L, "same text"))
        .toDF("doc_id", "text")
      val neu = Seq((1L, "same text"), (4L, "same, text"), (5L, "fresh"))
        .toDF("doc_id", "text")
      val r = Curation.ingestDedupFrom(old, neu).collect()
        .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("dup_of"),
          x.getAs[Long]("n_old_copies")))
      // normalization makes "Same   Text!" ≡ "same text" ≡ "same, text";
      // a same-id prior copy never counts as a duplicate
      assert(r.toSeq == Seq((1L, 3L, 1L), (4L, 1L, 2L)))
    }

    it("planted mirror replicas make the fixture gate bind") {
      val r = Curation.ingestDedup(spark, TestSpark.Sf).collect()
      assert(r.length > 50, s"expected ~90 replica hits, got ${r.length}")
      r.foreach { x =>
        assert(x.getAs[Long]("dup_of") >= Curation.RepShift,
          "every duplicate's canonical copy is a planted replica")
      }
    }
  }

  describe("fuzzyDecontaminate (q77)") {
    it("flags corpus docs near-duplicating a benchmark doc, not disjoint ones") {
      // benchmark = doc_ids 0-4; doc 6 copies bench doc 1 verbatim
      val r = Curation.fuzzyDecontaminateFrom(docs(
        (0L, "alpha beta gamma delta epsilon", "en", "s", 1L),
        (1L, "the quick brown fox jumps over the lazy dog", "en", "s", 1L),
        (2L, "bench two text body", "en", "s", 1L),
        (3L, "bench three text body", "en", "s", 1L),
        (4L, "bench four text body", "en", "s", 1L),
        (6L, "the quick brown fox jumps over the lazy dog", "en", "s", 1L),
        (7L, "completely unrelated vocabulary everywhere", "en", "s", 1L)))
        .collect()
        .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("bench_id"),
          x.getAs[Double]("jaccard")))
      assert(r.contains((6L, 1L, 1.0)), s"verbatim bench copy must flag: ${r.toSeq}")
      assert(!r.exists(_._1 == 7L), "disjoint-vocab doc must not flag")
      r.foreach { case (d, b, j) =>
        assert(d >= Curation.BenchDocs && b < Curation.BenchDocs &&
          j >= Curation.FuzzyDecontamMin)
      }
    }

    it("corpus run flags only verified pairs in bench x corpus orientation") {
      val r = Curation.fuzzyDecontaminate(spark, TestSpark.Sf).collect()
      r.foreach { x =>
        assert(x.getAs[Long]("doc_id") >= Curation.BenchDocs)
        assert(x.getAs[Long]("bench_id") < Curation.BenchDocs)
        assert(x.getAs[Double]("jaccard") >= Curation.FuzzyDecontamMin)
      }
    }
  }

  describe("shuffleShards (q81)") {
    it("deals every sequence once, positions dense per shard, stable under repartition") {
      val manifest = Curation.packSequences(spark, TestSpark.Sf)
      val r = Curation.shuffleShardsFrom(manifest).collect()
        .map(x => (x.getAs[Long]("seq_id"), x.getAs[Int]("shard"),
          x.getAs[Long]("shard_pos"), x.getAs[Long]("n_docs")))
      // every sequence id appears exactly once
      assert(r.map(_._1).distinct.length == r.length && r.nonEmpty)
      // dense per-shard positions: 0..n-1 within each shard
      r.groupBy(_._2).foreach { case (shard, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
          s"shard $shard positions must be dense from 0")
      }
      // the deal is a pure function of seq_id: physical layout must not move it
      val again = Curation.shuffleShardsFrom(manifest.repartition(13)).collect()
        .map(x => (x.getAs[Long]("seq_id"), x.getAs[Int]("shard"),
          x.getAs[Long]("shard_pos"), x.getAs[Long]("n_docs")))
      assert(again.toSeq == r.toSeq)
    }
  }

  describe("ingestNearDup (q78)") {
    it("flags near-dup new docs against a different prior doc, best match first") {
      val old = Seq(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "totally different words here now")).toDF("doc_id", "text")
      val neu = Seq(
        (1L, "alpha beta gamma delta epsilon"), // same id: never a dup of itself
        (7L, "alpha beta gamma delta epsilon"), // verbatim copy of old doc 1
        (8L, "unrelated vocabulary entirely everywhere")).toDF("doc_id", "text")
      val r = Curation.ingestNearDupFrom(old, neu).collect()
        .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("near_dup_of"),
          x.getAs[Double]("jaccard")))
      assert(r.toSeq == Seq((7L, 1L, 1.0)))
    }

    it("supersets q67's exact hits: every exact ingest dup verifies at jaccard 1") {
      val exact = Curation.ingestDedup(spark, TestSpark.Sf).collect()
        .map(x => x.getAs[Long]("doc_id")).toSet
      val near = Curation.ingestNearDup(spark, TestSpark.Sf).collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("jaccard")).toMap
      exact.foreach { d =>
        assert(near.contains(d), s"exact dup $d missing from near-dup ingest")
        assert(near(d) == 1.0, s"exact dup $d should verify at jaccard 1.0")
      }
    }
  }

  describe("packSequences (q63)") {
    it("matches the naive global-window cumulative sum and is contiguous") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = Curation.packSequences(spark, TestSpark.Sf).collect()
      // naive formulation: one global window through a single partition —
      // the plan the distributed prefix sum exists to avoid
      val d = graft.sources.Tables.documents(spark, TestSpark.Sf)
        .select(col("doc_id"),
          size(graft.functions.TextFns.toks(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= 1)
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = d.withColumn("cum", sum("n_tokens").over(w))
        .select(col("doc_id"), (col("cum") - col("n_tokens")).as("start_off"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(r.length == naive.size)
      r.foreach(x =>
        assert(x.getAs[Long]("start_off") == naive(x.getAs[Long]("doc_id"))))
      // layout is gapless: every doc starts where the previous one ended
      val sorted = r.sortBy(_.getAs[Long]("doc_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_off") ==
            a.getAs[Long]("start_off") + a.getAs[Long]("n_tokens"))
        case _ =>
      }
      // boundary-straddling docs exist at the fixture's ~54-token docs
      assert(r.exists(_.getAs[Long]("n_seqs") > 1))
      r.foreach { x =>
        val spans = x.getAs[Long]("seq_last") - x.getAs[Long]("seq_first") + 1
        assert(x.getAs[Long]("n_seqs") == spans)
      }
    }

    it("is invariant to input partitioning") {
      val base = Curation.packSequences(spark, TestSpark.Sf).collect().toSeq
      val shuffled = Curation.packSequencesFrom(
        graft.sources.Tables.documents(spark, TestSpark.Sf).repartition(7))
        .collect().toSeq
      assert(shuffled == base)
    }

    it("returns an empty manifest for an empty corpus") {
      assert(Curation.packSequencesFrom(docs()).collect().isEmpty)
    }

    it("stays correct and pid-balanced on clustered/sparse id spaces") {
      import org.apache.spark.sql.functions._
      // four ingest batches at 10M id strides — the retired fixed
      // `doc_id div width` grid would land each batch in one pid
      val rows = for { b <- 0 until 4; j <- 0 until 100 } yield
        (b * 10000000L + j, Seq.fill(12)("tok").mkString(" "),
          "en", s"src$b", 1L)
      val d = spark.createDataFrame(rows)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val r = Curation.packSequencesFrom(d).collect().sortBy(_.getAs[Long]("doc_id"))
      // offsets are the doc_id-ordered prefix sums regardless of id gaps
      r.zipWithIndex.foreach { case (x, i) =>
        assert(x.getAs[Long]("start_off") == 12L * i,
          s"doc ${x.getAs[Long]("doc_id")} off ${x.getAs[Long]("start_off")}")
      }
      // the driver-side re-grouping balances pids by DOC COUNT: no pid
      // may hold more than one batch's worth plus a fine bucket of slack
      val p = spark.sparkContext.defaultParallelism.toLong
      val fine = p * Curation.PackFineBucketsPerCore
      val fineWidth = math.max(1L, (30000000L + 99L + fine) / fine)
      val stats = d
        .select(col("doc_id"), expr(s"doc_id div $fineWidth").as("fine"))
        .groupBy("fine").agg(count(lit(1)).as("nd"), sum(lit(12L)).as("t"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(_._1)
      val fmap = Curation.packPidMap(stats, p)
      val byPid = stats.map(s => fmap.find(_._1 == s._1).get._2 -> s._2)
        .groupBy(_._1).map { case (pid, xs) => pid -> xs.map(_._2).sum }
      val target = (400L + p - 1) / p
      assert(byPid.size > 1, "clustered ids must still spread over pids")
      assert(byPid.values.max <= target + 100L,
        s"pid overshoot beyond one fine bucket of slack: $byPid")
    }
  }

  describe("tableProfile (q92)") {
    it("profiles nulls, cardinality, and bounds per column") {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val d = spark.createDataFrame(
        java.util.Arrays.asList(
          Row(7L, "abc", "en", "s1", 3L),
          Row(9L, "abcdef", null, "s1", 6L),
          Row(11L, "ab", "de", "s2", 2L)),
        schema)
      val r = Curation.tableProfileFrom(d).collect()
        .map(x => x.getAs[String]("col_name") -> x).toMap
      assert(r("lang").getAs[Long]("n_nulls") == 1L)
      assert(r("lang").getAs[Long]("n_distinct") == 2L)
      assert(r("doc_id").getAs[Long]("num_min") == 7L)
      assert(r("doc_id").getAs[Long]("num_max") == 11L)
      assert(r("doc_id").isNullAt(r("doc_id").fieldIndex("len_min")))
      assert(r("text").getAs[Long]("len_min") == 2L)
      assert(r("text").getAs[Long]("len_max") == 6L)
      assert(r("text").isNullAt(r("text").fieldIndex("num_min")))
      assert(r("source").getAs[Long]("n_distinct") == 2L)
      assert(r.values.forall(_.getAs[Long]("n_rows") == 3L))
    }

    it("prunes every audit scan to its single audited column") {
      val p = Curation.tableProfile(spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReadSchema: struct<text:string>"),
        s"the text audit must scan only the text column:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
        s"the doc_id audit must scan only the id column:\n$p")
    }
  }

  describe("datasetCard (q71)") {
    it("summarizes mass, cardinality, dup ratio, and split sizes in one row") {
      val r = Curation.datasetCardFrom(docs(
        (1L, "a b", "en", "s1", 3L),
        (2L, "a  b", "en", "s2", 4L),   // normalized exact dup of doc 1
        (3L, "c", "de", "s1", 1L)))
        .collect()(0)
      assert(r.getAs[Long]("n_docs") == 3L)
      assert(r.getAs[Long]("n_tokens") == 5L)
      assert(r.getAs[Long]("n_chars") == 8L)
      assert(r.getAs[Long]("n_sources") == 2L)
      assert(r.getAs[Long]("n_langs") == 2L)
      assert(r.getAs[Long]("n_distinct_fp") == 2L)
      assert(r.getAs[Double]("med_doc_tokens") == 2.0)
      assert(r.getAs[Double]("dup_ratio") == 0.333333333)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") +
        r.getAs[Long]("n_test") == 3L)
    }
  }

  describe("passageChunks (q70)") {
    it("tiles with overlap and stops once a passage reaches the end") {
      def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
      val r = Curation.passageChunksFrom(docs(
        (1L, words(50), "en", "s", 1L),   // 2 passages: [0,32) [24,50)
        (2L, words(56), "en", "s", 1L),   // 2 passages: [0,32) [24,56)
        (3L, words(57), "en", "s", 1L),   // 3 passages: third needed for tok 56
        (4L, words(5), "en", "s", 1L)))   // 1 short passage
        .collect()
        .groupBy(_.getAs[Long]("doc_id"))
        .view.mapValues(_.map(x =>
          (x.getAs[Int]("start_tok"), x.getAs[Int]("n_tokens"))).toSeq).toMap
      assert(r(1L) == Seq((0, 32), (24, 26)))
      assert(r(2L) == Seq((0, 32), (24, 32)))
      assert(r(3L) == Seq((0, 32), (24, 32), (48, 9)))
      assert(r(4L) == Seq((0, 5)))
      // coverage: every token of doc 3 is inside some passage
      assert(r(3L).map { case (s, n) => s + n }.max == 57)
    }
  }

  describe("mixtureSample (q52)") {
    it("downsamples every source near its rate, deterministically") {
      val r = Curation.mixtureSample(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        val bp = x.getAs[Long]("rate_bp")
        assert(bp > 0 && bp <= Curation.SampleBp, s"rate_bp $bp out of range")
        assert(x.getAs[Long]("n_kept") > 0)
      }
      // half-the-corpus budget: kept tokens must land well under the
      // full corpus and in the neighborhood of 50%
      val keptTokens = r.map(_.getAs[Long]("kept_tokens")).sum.toDouble
      val allTokens = Curation.sourceMixture(spark, TestSpark.Sf)
        .agg(org.apache.spark.sql.functions.sum("n_tokens"))
        .collect()(0).getLong(0).toDouble
      val frac = keptTokens / allTokens
      assert(frac > 0.3 && frac < 0.7, s"kept fraction $frac")
      val again = Curation.mixtureSample(spark, TestSpark.Sf).collect()
      assert(again.toSeq == r.toSeq)
    }
  }

  describe("stratifiedSample (q131)") {
    it("hits the exact ceil quota in every stratum, deterministically") {
      val r = Curation.stratifiedSample(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        val n = x.getAs[Long]("n_docs")
        val kept = x.getAs[Long]("n_kept")
        assert(kept == (n * Curation.StratPct + 99) / 100,
          s"stratum ${x.getAs[String]("lang")}/${x.getAs[String]("source")}: $kept of $n")
      }
      // the kept set is stable: a second run reproduces the checksums
      val again = Curation.stratifiedSample(spark, TestSpark.Sf).collect()
      assert(again.map(_.getAs[Long]("kept_id_sum")).toSeq ==
        r.map(_.getAs[Long]("kept_id_sum")).toSeq)
    }
  }

  describe("prioritySample (q141)") {
    it("keeps everything with ŵ = w and an exact estimate when n ≤ k") {
      val r = Curation.prioritySampleFrom(docs(
        (1L, "aaa", "en", "s", 3L), (2L, "bbbbb", "en", "s", 5L),
        (3L, "cc", "en", "s", 2L))).collect()
      assert(r.length == 3)
      r.foreach { x =>
        assert(x.getAs[Double]("w_hat") == x.getAs[Long]("weight").toDouble)
      }
      assert(r(0).getAs[Double]("est_total") == 10.0)
      assert(r(0).getAs[Long]("exact_total") == 10L)
      // ranks are 1..n by descending priority
      assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    }

    it("beyond k selects the top-k priorities with the DLT threshold estimator") {
      val d = (1L to 60L).map(i => (i, "x", "en", "s", 100L + i))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val r = Curation.prioritySampleFrom(d).collect()
      assert(r.length == Curation.PsK)
      // replicate priorities independently: top-(k+1) gives the sample
      // and the threshold
      val pri = d.selectExpr("doc_id", "greatest(n_chars, 1) AS wt",
          "(CAST(greatest(n_chars, 1) AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)) " +
            "/ CAST(conv(substring(md5(concat('ps|', CAST(doc_id AS STRING))), 1, 15), 16, 10) + 1 AS DOUBLE) AS pr")
        .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("wt"),
          x.getAs[Double]("pr")))
        .sortBy { case (id, _, pr) => (-pr, id) }
      val tau = pri(Curation.PsK)._3
      assert(r.map(_.getAs[Long]("doc_id")).toSeq ==
        pri.take(Curation.PsK).map(_._1).toSeq)
      r.zip(pri.take(Curation.PsK)).foreach { case (x, (_, wt, _)) =>
        assert(x.getAs[Double]("w_hat") == math.max(wt.toDouble, tau))
      }
      // the estimator is the sum of the adjusted weights
      val est = r(0).getAs[Double]("est_total")
      assert(math.abs(est - r.map(_.getAs[Double]("w_hat")).sum) < 1e-6)
      assert(r(0).getAs[Long]("exact_total") == (1L to 60L).map(100L + _).sum)
      // deterministic under repartitioning — the sample is a pure
      // function of (doc_id, weight), never of layout
      val again = Curation.prioritySampleFrom(d.repartition(7)).collect()
      assert(again.map(_.getAs[Long]("doc_id")).toSeq ==
        r.map(_.getAs[Long]("doc_id")).toSeq)
    }
  }

  describe("bloomDecontaminate (q126)") {
    it("the Bloom screen is a superset of the exact screen, never a miss") {
      val bloom = Curation.bloomDecontaminate(spark, TestSpark.Sf).collect()
      assert(bloom.nonEmpty)
      bloom.foreach { x =>
        // per doc the Bloom can only over-count (false positives add)
        assert(x.getAs[Long]("n_bloom_hits") >= x.getAs[Long]("n_exact_hits"))
      }
      // every exactly-contaminated doc from q46 is bloom-flagged
      val exact = Curation.decontaminate(spark, TestSpark.Sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val flagged = bloom.map(_.getAs[Long]("doc_id")).toSet
      assert(exact.subsetOf(flagged),
        s"bloom missed ${exact -- flagged}")
    }
  }

  describe("pitEnrichmentOf (q118)") {
    it("routes each fact to the version valid at its ship date") {
      val hist = Seq(
        // key 1 changed at 1999: superseded + current versions
        (1L, 10L, java.sql.Date.valueOf("1995-01-01"),
          Option(java.sql.Date.valueOf("1999-01-01")), false),
        (1L, 10L, java.sql.Date.valueOf("1999-01-01"),
          Option.empty[java.sql.Date], true),
        // key 2 never changed: one open current version
        (2L, 20L, java.sql.Date.valueOf("1995-01-01"),
          Option.empty[java.sql.Date], true))
        .toDF("s_suppkey", "s_nationkey", "valid_from", "valid_to", "is_current")
      val li = Seq(
        (1L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00"), 5.0),
        (1L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00"), 7.0),
        (2L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00"), 3.0))
        .toDF("l_suppkey", "l_shipdate", "l_quantity")
      val r = Curation.pitEnrichmentOf(li, hist).collect()
      val m = r.map(x => (x.getAs[Long]("s_nationkey"),
        x.getAs[Boolean]("is_current")) ->
        (x.getAs[Long]("n_lines"), x.getAs[Double]("sum_qty"))).toMap
      // the 1996 fact of key 1 hits the SUPERSEDED version, the 2000
      // fact the current one — a current-only join would misroute both
      assert(m == Map((10L, false) -> (1L, 5.0), (10L, true) -> (1L, 7.0),
        (20L, true) -> (1L, 3.0)))
    }

    it("every lineitem matches exactly one version on the corpus fixture") {
      val total = Curation.pitEnrichment(spark, TestSpark.Sf)
        .agg(org.apache.spark.sql.functions.sum("n_lines")).collect()(0).getLong(0)
      val lines = graft.sources.Tables.lineitem(spark, TestSpark.Sf).count()
      assert(total == lines)
    }
  }

  describe("domainCaps (q152)") {
    it("keeps min(cap, n) per domain and the arithmetic is consistent") {
      val r = Curation.domainCaps(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      r.foreach { x =>
        val n = x.getAs[Long]("n_docs")
        val kept = x.getAs[Long]("n_kept")
        assert(kept == math.min(Curation.DomainCap, n))
        assert(x.getAs[Long]("n_dropped") == n - kept)
        assert(x.getAs[Long]("cap") == Curation.DomainCap)
        assert(math.abs(x.getAs[Double]("kept_share") -
          kept.toDouble / n) < 1e-6)
      }
      // the fixture's uniform 25-doc domains all get capped
      assert(r.forall(_.getAs[Long]("n_dropped") > 0))
    }

    it("the kept set is stable under repartition and unrelated growth") {
      val base = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val a = Curation.domainCapsFrom(base)
        .collect().map(x => x.getString(0) -> x.getAs[Long]("kept_id_sum")).toMap
      val b = Curation.domainCapsFrom(base.repartition(7))
        .collect().map(x => x.getString(0) -> x.getAs[Long]("kept_id_sum")).toMap
      assert(a == b)
      // adding a NEW domain must not move any existing domain's kept set
      val grown = base.unionByName(docs(
        (100001L, "brand new domain doc", "en", "srcNEW", 21L)))
      val c = Curation.domainCapsFrom(grown)
        .collect().map(x => x.getString(0) -> x.getAs[Long]("kept_id_sum")).toMap
      assert((c - "srcNEW") == a)
      assert(c("srcNEW") == 100001L)
    }
  }

  describe("temperatureMixture (q157)") {
    it("allocations are integers summing exactly to the budget, weights are integer sqrt") {
      val r = Curation.temperatureMixture(spark, TestSpark.Sf).collect()
      assert(r.nonEmpty)
      assert(r.map(_.getAs[Long]("alloc_tokens")).sum == Curation.MixBudget)
      r.foreach { x =>
        assert(x.getAs[Long]("weight") ==
          math.floor(math.sqrt(x.getAs[Long]("n_tokens").toDouble)).toLong)
        assert(x.getAs[Long]("alloc_tokens") >= 0L)
      }
    }

    it("flattens the mixture: every pairwise mix ratio sits between the mass ratio and 1") {
      // sqrt weights: for sources a, b with n_a > n_b the allocation
      // ratio a:b must be <= the token-mass ratio and >= 1 — the
      // temperature property (head down-weighted, tail up-weighted,
      // order preserved)
      val docs = Seq(
        // big source: 64 docs x ~16 tokens; small source: 4 docs
        (1L to 64L).map(i => (i, ("tok " * 16).trim, "en", "srcBIG", 1L)),
        (1L to 4L).map(i => (100L + i, ("tok " * 16).trim, "en", "srcSMALL", 1L)))
        .flatten.toDF("doc_id", "text", "lang", "source", "n_lines")
      val r = Curation.temperatureMixtureFrom(docs)
        .collect().map(x => x.getAs[String]("source") ->
          (x.getAs[Long]("n_tokens"), x.getAs[Long]("alloc_tokens"))).toMap
      val (nBig, aBig) = r("srcBIG")
      val (nSmall, aSmall) = r("srcSMALL")
      assert(nBig == 16L * nSmall)
      // sqrt temperature: alloc ratio = 4:1 (+-1 rounding unit) vs mass 16:1
      assert(aBig > aSmall, "order must be preserved")
      assert(math.abs(aBig - 4L * aSmall) <= 5L,
        s"sqrt flattening should give ~4:1, got $aBig:$aSmall")
      assert(aBig + aSmall == Curation.MixBudget)
    }

    it("head mix_share < mass_share and tail mix_share > mass_share on the fixture") {
      val r = Curation.temperatureMixture(spark, TestSpark.Sf).collect()
      val byMass = r.sortBy(_.getAs[Long]("n_tokens"))
      val head = byMass.last
      val tail = byMass.head
      // equal-mass fixtures would make this vacuous; require real spread
      if (head.getAs[Long]("n_tokens") > 2 * tail.getAs[Long]("n_tokens")) {
        assert(head.getAs[Double]("mix_share") <=
          head.getAs[Double]("mass_share"))
        assert(tail.getAs[Double]("mix_share") >=
          tail.getAs[Double]("mass_share"))
      }
    }
  }

  describe("domainQuality (q153)") {
    it("rolls up exactly the q18 per-doc scores by source") {
      val base = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val r = Curation.domainQualityFrom(base).collect()
      assert(r.map(_.getAs[Long]("n_docs")).sum == base.count())
      // recompute the mean from the gated q18 per-doc relation
      val perDoc = TextAnalysis.qualityScoreFrom(base)
        .join(base.select("doc_id", "source"), "doc_id")
        .collect()
        .groupBy(_.getAs[String]("source"))
        .map { case (s, rows) =>
          val micro = rows.map(x =>
            math.round(x.getAs[Double]("quality_score") * 1e6)).sum
          s -> (micro.toDouble / (rows.length * 1000000L),
            rows.count(_.getAs[Double]("quality_score") < Curation.LowQuality))
        }
      r.foreach { x =>
        val (mean, nLow) = perDoc(x.getAs[String]("source"))
        assert(math.abs(x.getAs[Double]("mean_quality") -
          BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble) < 1e-9)
        assert(x.getAs[Long]("n_low") == nLow.toLong)
        assert(x.getAs[Double]("mean_quality") >= 0.0 &&
          x.getAs[Double]("mean_quality") <= 1.0)
      }
    }
  }

  describe("kAnonymity (q173)") {
    it("counts classes and rows below each k over the (lang,source,bucket) QI") {
      // 4 equivalence classes of sizes 1 / 2 / 5 / 10 (n_chars buckets
      // 0, 0, 100, 200) over 18 rows
      var id = 0L
      def mk(n: Int, lang: String, src: String, chars: Long) =
        (1 to n).map { _ => id += 1; (id, "t", lang, src, chars) }
      val d = docs((mk(1, "en", "A", 10L) ++ mk(2, "en", "B", 20L) ++
        mk(5, "de", "A", 150L) ++ mk(10, "de", "B", 250L)): _*)
      val r = Curation.kAnonymityFrom(d).collect()
      assert(r.map(_.getAs[Int]("k")).toSeq == Seq(2, 5, 10))
      assert(r.forall(_.getAs[Long]("n_classes") == 4L))
      assert(r.forall(_.getAs[Long]("n_rows") == 18L))
      val byK = r.map(x => x.getAs[Int]("k") ->
        (x.getAs[Long]("classes_at_risk"), x.getAs[Long]("rows_at_risk"))).toMap
      assert(byK(2) == (1L, 1L))
      assert(byK(5) == (2L, 3L))
      assert(byK(10) == (3L, 8L))
      assert(r.find(_.getAs[Int]("k") == 10).get
        .getAs[Double]("risk_rate") == math.rint(8.0 / 18.0 * 1e9) / 1e9)
    }
  }

  describe("compositionGrid (q195)") {
    it("one cell per (lang, source) with exact masses and shares") {
      val d = Seq(
          (1L, "data data data data", "en", "A", 19L),
          (2L, "data data", "en", "A", 9L),
          (3L, "data data data", "en", "B", 14L),
          (4L, "data", "de", "A", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val r = Curation.compositionGridFrom(d).collect()
      assert(r.map(x => (x.getAs[String]("lang"), x.getAs[String]("source"),
        x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toSeq ==
        Seq(("de", "A", 1L, 1L), ("en", "A", 2L, 6L), ("en", "B", 1L, 3L)))
      assert(r.map(_.getAs[Double]("doc_share")).toSeq ==
        Seq(0.25, 0.5, 0.25))
      // (en, B): 3 "data" tokens → 0.25·0.03 + 0.25·(12/3/8) + 0.5
      assert(r(2).getAs[Double]("mean_quality") == 0.6325)
    }
  }

  describe("truncationLoss (q188)") {
    it("clips exactly the tail mass at each context arm") {
      // docs of 10, 40, 100 tokens against arms 32/64/128
      def d(id: Long, k: Int) =
        (id, Seq.fill(k)("w").mkString(" "), "en", "s", k.toLong)
      val r = Curation.truncationLossFrom(Seq(d(1, 10), d(2, 40), d(3, 100))
          .toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
        .map(x => x.getAs[Long]("ctx") -> x).toMap
      assert(r(32L).getAs[Long]("n_truncated") == 2L)
      assert(r(32L).getAs[Long]("tokens_kept") == 10L + 32L + 32L)
      assert(r(32L).getAs[Long]("tokens_lost") == 150L - 74L)
      assert(r(64L).getAs[Long]("n_truncated") == 1L)
      assert(r(64L).getAs[Long]("tokens_kept") == 10L + 40L + 64L)
      assert(r(128L).getAs[Long]("n_truncated") == 0L)
      assert(r(128L).getAs[Double]("loss_rate") == 0.0)
      assert(r(64L).getAs[Double]("loss_rate") == 36.0 / 150.0)
    }
  }

  describe("curriculumFill (q186)") {
    it("fills whole sources in quality order, partial at the boundary") {
      // score is monotone in token count ("data" is no stopword):
      // A(8 tokens) > B(6) = C(6), tie broken by source name.
      // total=20 → budget=10: A full (8), B partial (2), C excluded.
      def d(id: Long, s: String, k: Int) =
        (id, Seq.fill(k)("data").mkString(" "), "en", s, 5L * k)
      val r = Curation.curriculumFillFrom(Seq(
          d(1, "A", 8), d(2, "B", 6), d(3, "C", 6))
        .toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
      assert(r.map(x => (x.getAs[String]("source"), x.getAs[Int]("qrank"),
        x.getAs[Long]("alloc_tokens"), x.getAs[String]("status"))).toSeq ==
        Seq(("A", 1, 8L, "full"), ("B", 2, 2L, "partial"),
          ("C", 3, 0L, "excluded")))
      // 0.25·(8/100) + 0.25·(4/8 mean-len ratio) + 0.5·(no stopwords)
      assert(r.head.getAs[Double]("mean_quality") == 0.645)
      assert(r(1).getAs[Double]("mean_quality") == 0.64)
    }

    it("allocations sum exactly to the budget when mass suffices") {
      def d(id: Long, s: String, k: Int) =
        (id, Seq.fill(k)("data").mkString(" "), "en", s, 5L * k)
      val r = Curation.curriculumFillFrom(Seq(
          d(1, "A", 7), d(2, "B", 5))
        .toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
      // total 12 → budget 6: A partial 6, B excluded
      assert(r.map(_.getAs[Long]("alloc_tokens")).sum == 6L)
      assert(r.map(_.getAs[String]("status")).toSeq ==
        Seq("partial", "excluded"))
    }
  }

  describe("sourceConcentration (q182)") {
    it("Gini over masses 1/2/3 by the sorted-rank identity") {
      val r = Curation.sourceConcentrationFrom(docs(
          (1L, "a", "en", "A", 1L),
          (2L, "b b", "en", "B", 3L),
          (3L, "c c c", "en", "C", 5L))).collect()(0)
      assert(r.getAs[Long]("n_sources") == 3L)
      assert(r.getAs[Long]("total_tokens") == 6L)
      // G = (2·(1+4+9) − 4·6) / (3·6) = 4/18 → 222222222 at 9 dp
      assert(r.getAs[Double]("gini") == 222222222.0 / 1.0e9)
      assert(r.getAs[Double]("top1_share") == 0.5)
      assert(r.getAs[Double]("topk_share") == 1.0)
    }

    it("perfectly balanced sources score zero") {
      val r = Curation.sourceConcentrationFrom(docs(
          (1L, "x y", "en", "A", 3L),
          (2L, "p q", "en", "B", 3L))).collect()(0)
      assert(r.getAs[Double]("gini") == 0.0)
      assert(r.getAs[Double]("top1_share") == 0.5)
    }
  }

  describe("orcMirror (q202)") {
    it("the ORC roundtrip preserves every row and value of the parquet original") {
      val pq = graft.sources.Tables.documents(spark, TestSpark.Sf)
      val orc = graft.sources.OrcMirror.documentsFor(spark, TestSpark.Sf)
      assert(orc.count() == pq.count())
      // the gated rollup agrees column-for-column with the same rollup
      // computed over the parquet original
      val viaOrc = Curation.orcMirror(spark, TestSpark.Sf).collect().toSeq
      val viaPq = Curation.orcRollupOf(pq).collect().toSeq
      assert(viaOrc == viaPq)
    }

    it("lands real .orc files behind a _SUCCESS marker and pushes source predicates") {
      graft.sources.OrcMirror.documentsFor(spark, TestSpark.Sf).count()
      // the layout landed under the materialization root
      val root = java.nio.file.Paths.get(graft.sources.Materialize.Root)
      val walk = java.nio.file.Files.walk(root)
      val files =
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.map(_.toString)
            .filter(_.contains("documents-orc")).toList
        } finally walk.close()
      assert(files.exists(_.endsWith("_SUCCESS")))
      assert(files.exists(f => f.endsWith(".orc") || f.contains(".orc")))
      // source predicate reaches the ORC scan
      val plan = graft.sources.OrcMirror.documentsFor(spark, TestSpark.Sf)
        .filter($"source" === "s0").queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("EqualTo(source"))
    }
  }

  describe("rendezvousShards (q204)") {
    // the operator's score/argmax math, re-derived independently
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def shardOf(id: Long, n: Int): Int =
      (0 until n).maxBy(k => h60(s"hrw|$id|$k"))

    it("assigns by highest score and movers all land on the NEW shard") {
      val ids = 0L until 200L
      val byShard = ids.groupBy(shardOf(_, Curation.HrwOld))
      val expected = byShard.map { case (s, ds) =>
        (s, ds.size.toLong,
          ds.count(d => shardOf(d, Curation.HrwNew) != s).toLong)
      }.toSeq.sortBy(_._1)
      // HRW contract, checked on the raw assignments: a doc moves iff
      // its 9th score wins, so every mover's new home IS shard 8
      ids.foreach { d =>
        val (s8, s9) = (shardOf(d, Curation.HrwOld), shardOf(d, Curation.HrwNew))
        assert(s9 == s8 || s9 == Curation.HrwOld)
      }
      val r = Curation.rendezvousShardsFrom(docs(
          ids.map(id => (id, "t", "en", "s", 1L)): _*))
        .collect().map(x => (x.getAs[Int]("shard"), x.getAs[Long]("n_docs"),
          x.getAs[Long]("n_moved")))
      assert(r.toSeq == expected)
    }

    it("moves ~1/9 of the fixture corpus when the fleet grows 8 to 9") {
      val r = Curation.rendezvousShards(spark, TestSpark.Sf).collect()
      val nDocs = r.map(_.getAs[Long]("n_docs")).sum
      val nMoved = r.map(_.getAs[Long]("n_moved")).sum
      assert(nDocs == graft.sources.Tables.documents(spark, TestSpark.Sf).count())
      val frac = nMoved.toDouble / nDocs
      assert(frac > 0.04 && frac < 0.20, s"moved frac $frac, expected ~1/9")
      assert(r.map(_.getAs[Int]("shard")).toSeq == (0 until Curation.HrwOld))
    }
  }

  describe("partitionEvolution (q228)") {
    it("the two vintages tile the corpus without loss or duplication") {
      val sf = TestSpark.Sf
      val raw = graft.sources.Tables.events(spark, sf)
      val r = Curation.partitionEvolution(spark, sf).collect()
      assert(r.map(_.getAs[Long]("n_events")).sum == raw.count())
      assert(r.map(_.getAs[String]("vintage")).distinct.sorted.toSeq ==
        Seq("daily", "monthly"))
      // vintage membership follows the migration instant exactly
      r.foreach { x =>
        val d = x.get(x.fieldIndex("event_date")).toString // ISO yyyy-MM-dd
        if (x.getAs[String]("vintage") == "monthly")
          assert(d < "2024-01-16", s"monthly row on $d")
        else assert(d >= "2024-01-16", s"daily row on $d")
      }
      // no (vintage, day) appears twice: the union deduplicates nothing
      val keys = r.map(x => (x.getAs[String]("vintage"),
        x.get(x.fieldIndex("event_date")).toString))
      assert(keys.distinct.length == keys.length)
    }
  }
}
