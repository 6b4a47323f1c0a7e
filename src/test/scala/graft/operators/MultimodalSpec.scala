package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class MultimodalSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  import spark.implicits._

  describe("mediaMeta (q30)") {
    it("derives bounded fake dimensions from payload hashes") {
      val rows = Multimodal.mediaMeta(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("width") < 64 + 1217)
        assert(r.getAs[Long]("height") >= 64 && r.getAs[Long]("height") < 64 + 961)
        assert(r.getAs[Long]("n_frames") >= 1 && r.getAs[Long]("n_frames") <= 32)
        assert(r.getAs[String]("sha").length == 64)
      }
    }
  }

  describe("decodeFeatures (typed mapPartitions pipeline)") {
    it("is deterministic and yields a probability histogram") {
      val feats = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val twice = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val a = feats.filter(_.doc_id == 1L).head()
      val b = twice.filter(_.doc_id == 1L).head()
      assert(a.width == b.width && a.height == b.height)
      assert(a.histogram.toSeq == b.histogram.toSeq)
      assert(math.abs(a.histogram.sum - 1.0) < 1e-9)
    }

    it("survives an empty payload") {
      val empty = Seq((99L, Array.emptyByteArray)).toDF("doc_id", "payload")
      val f = Multimodal.decodeFeatures(empty).head()
      assert(f.n_bytes == 0)
      assert(f.histogram.forall(_ == 0.0))
    }
  }

  describe("decodeImages / resizeImages (REAL ImageIO codec path)") {
    // build a real PNG in-memory: encode→decode must round-trip exactly
    // (PNG is lossless), making the decode parity check bit-exact
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }

    it("decodes real PNG payloads to exact dimensions and luma mass") {
      // solid black (luma 0 → bin 0) and solid white (luma 255 → bin 7)
      val rows = Seq(
        (1L, png(20, 10)((_, _) => 0x000000)),
        (2L, png(7, 33)((_, _) => 0xffffff)),
        (3L, "definitely not an image".getBytes("UTF-8")))
        .toDF("doc_id", "payload")
      val f = Multimodal.decodeImages(rows).collect()
        .map(r => r.doc_id -> r).toMap
      assert(f(1L).decode_ok && f(1L).width == 20 && f(1L).height == 10)
      assert(f(1L).luma_hist(0) == 1.0 && f(1L).luma_hist.sum == 1.0)
      assert(f(2L).decode_ok && f(2L).width == 7 && f(2L).height == 33)
      assert(f(2L).luma_hist(7) == 1.0)
      // the poisoned payload quarantines instead of killing the scan
      assert(!f(3L).decode_ok && f(3L).width == 0 &&
        f(3L).luma_hist.forall(_ == 0.0))
    }

    it("mixed-luma gradient lands mass in every bin, summing to 1") {
      // x ranges 0..255 → gray gradient covers all 8 luma bins evenly
      val g = Seq((1L, png(256, 2)((x, _) => (x << 16) | (x << 8) | x)))
        .toDF("doc_id", "payload")
      val f = Multimodal.decodeImages(g).head()
      assert(f.decode_ok && f.width == 256)
      assert(f.luma_hist.forall(b => math.abs(b - 0.125) < 1e-9), f.luma_hist.toSeq)
    }

    it("resizes with exact aspect-fit dims and a stable pixel hash") {
      val rows = Seq(
        (1L, png(200, 100)((x, y) => ((x * 7 + y * 13) % 256) << 16)),
        (2L, png(30, 20)((_, _) => 0x123456)),   // already inside the box
        (3L, "junk".getBytes("UTF-8")))          // dropped, not thrown
        .toDF("doc_id", "payload")
      val r = Multimodal.resizeImages(rows, 64, 64).collect()
        .map(x => x.doc_id -> x).toMap
      assert(r.keySet == Set(1L, 2L), "non-image must be dropped")
      assert(r(1L).out_width == 64 && r(1L).out_height == 32)
      assert(r(2L).out_width == 30 && r(2L).out_height == 20, "never upscales")
      // nearest-neighbor on integer indices: the pixel hash is a pure
      // function of the payload — rerun must reproduce it bit-exactly
      val again = Multimodal.resizeImages(rows, 64, 64).collect()
        .map(x => x.doc_id -> x.px_sha).toMap
      assert(r(1L).px_sha == again(1L) && r(2L).px_sha == again(2L))
      assert(r(1L).px_sha.length == 64)
    }
  }

  describe("imageAHash / imageNearDupPairs (perceptual image dedup)") {
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    // a half-dark/half-bright pattern gives a non-degenerate hash
    def pattern(x: Int, y: Int): Int = if ((x / 8 + y / 8) % 2 == 0) 0x202020 else 0xd0d0d0

    it("identical pixels at different sizes hash identically (scale invariance)") {
      val rows = Seq(
        (1L, png(64, 64)(pattern)),
        (2L, png(128, 128)((x, y) => pattern(x / 2, y / 2))))
        .toDF("doc_id", "payload")
      val h = Multimodal.imageAHash(rows).collect().map(r => r.doc_id -> r.ahash).toMap
      assert(h(1L) == h(2L), f"64px ${h(1L)}%x vs 128px ${h(2L)}%x")
    }

    it("pairs a lightly-edited copy, not an unrelated image, and quarantines junk") {
      val base = png(64, 64)(pattern)
      // flip a single 8x8 cell: exactly one aHash bit should move
      val edited = png(64, 64)((x, y) =>
        if (x < 8 && y < 8) 0xd0d0d0 else pattern(x, y))
      val inverse = png(64, 64)((x, y) => pattern(x, y) ^ 0xffffff)
      val rows = Seq(
        (1L, base), (2L, edited), (3L, inverse),
        (4L, "not an image at all".getBytes("UTF-8")))
        .toDF("doc_id", "payload")
      val pairs = Multimodal.imageNearDupPairs(rows).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(pairs.contains((1L, 2L)), s"edited copy must pair: $pairs")
      assert(pairs((1L, 2L)) <= 7 && pairs((1L, 2L)) >= 1)
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
        s"inverse image must not pair: $pairs")
      assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
        "non-image must be quarantined out of pairing")
    }
  }

  describe("resizeFeatures") {
    it("fits into the bounding box preserving aspect, never upscales") {
      val feats = Multimodal.decodeFeatures(Multimodal.payloads(spark, sf))
      val resized = Multimodal.resizeFeatures(feats, 224, 224).collect()
      assert(resized.nonEmpty)
      resized.foreach { r =>
        assert(r.out_width <= 224 && r.out_height <= 224)
        assert(r.scale <= 1.0)
        // aspect preserved within one pixel of the smaller output side
        // (floor quantization dominates for extreme aspect ratios)
        val ar0 = r.width.toDouble / r.height
        val ar1 = r.out_width.toDouble / r.out_height
        val tol = 1.0 / math.min(r.out_width, r.out_height)
        assert(math.abs(ar0 - ar1) / ar0 <= tol, s"$r")
        // one side saturates the box unless the source already fit
        assert(r.scale == 1.0 || r.out_width == 224 || r.out_height == 224 ||
          // floor can land one pixel under the box edge
          r.out_width == 223 || r.out_height == 223)
      }
    }
  }

  describe("sampleFrames") {
    it("emits at most perDoc evenly spaced frames, consistent with q30") {
      val frames = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 4)
        .collect().groupBy(_.doc_id)
      val meta = Multimodal.mediaMeta(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_frames")).toMap
      assert(frames.nonEmpty)
      frames.foreach { case (id, fs) =>
        assert(fs.length == math.min(4, meta(id)).toInt)
        assert(fs.forall(f => f.n_frames == meta(id)))
        assert(fs.map(_.frame_idx).distinct.length == fs.length)
        assert(fs.forall(f => f.frame_idx >= 0 && f.frame_idx < f.n_frames))
        assert(fs.forall(_.frame_sha.length == 64))
      }
    }

    it("is deterministic across runs") {
      val a = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 3)
        .collect().map(f => (f.doc_id, f.frame_idx, f.frame_sha)).toSet
      val b = Multimodal.sampleFrames(Multimodal.payloads(spark, sf), 3)
        .collect().map(f => (f.doc_id, f.frame_idx, f.frame_sha)).toSet
      assert(a == b)
    }
  }

  describe("decodeWav / audioAudit (q154, REAL javax.sound codec path)") {
    it("the real container decode agrees with the synthesis closed form") {
      val ids = Seq(0L, 5L, 12L, 499L)
      val feats = Multimodal.decodeWav(
          ids.map(id => (id, Multimodal.wavBytes(id))).toDF("doc_id", "payload"))
        .collect().map(f => f.doc_id -> f).toMap
      ids.foreach { id =>
        val f = feats(id)
        val n = (800L + (id * 37L) % 1600L).toInt
        val samples = (0 until n).map(i =>
          java.lang.Math.floorMod(128L + (1L + id % 13L) * i + id * 31L, 256L))
        assert(f.decode_ok)
        assert(f.sample_rate == Multimodal.WavRate && f.channels == 1 &&
          f.bits == 8)
        assert(f.n_frames == n.toLong && f.n_bytes == 44 + n)
        assert(f.duration_us == n.toLong * 125L)
        assert(f.peak_dev == samples.map(v => math.abs(v - 128L)).max)
        assert(f.sum_dev == samples.map(v => math.abs(v - 128L)).sum)
        assert(f.checksum ==
          samples.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum)
      }
    }

    it("quarantines poisoned payloads instead of killing the scan") {
      val good = Multimodal.wavBytes(7L)
      val poisoned = Seq(
        1L -> Array.emptyByteArray, // empty
        2L -> good.take(20), // truncated mid-header
        3L -> Array.fill[Byte](200)(0x41), // junk, no RIFF magic
        4L -> { val b = good.clone(); b(34) = 16; b }, // header lies: 16-bit
        5L -> good) // control: still decodes
      val f = Multimodal.decodeWav(poisoned.toDF("doc_id", "payload"))
        .collect().map(x => x.doc_id -> x).toMap
      assert(!f(1L).decode_ok && !f(2L).decode_ok && !f(3L).decode_ok)
      assert(!f(4L).decode_ok, "a lying bit-depth header must quarantine")
      assert(f(5L).decode_ok && f(5L).n_frames > 0)
      assert(Seq(1L, 2L, 3L, 4L).forall(id =>
        f(id).n_frames == 0L && f(id).checksum == 0L))
    }

    it("audits the whole corpus: one decoded row per document, all ok") {
      val r = Multimodal.audioAudit(spark, sf).collect()
      assert(r.length == graft.sources.Tables.documents(spark, sf).count())
      assert(r.forall(_.getAs[Boolean]("decode_ok")))
      assert(r.map(_.getAs[Long]("n_frames")).distinct.length > 1)
      assert(r.forall(x => x.getAs[Long]("duration_us") ==
        x.getAs[Long]("n_frames") * 125L))
    }
  }

  describe("sampleGifFrames / videoFrames (q172, REAL ImageReader frame seeks)") {
    /** The gifBytes closed form, re-derived independently. */
    def expected(id: Long, perDoc: Int): Seq[(Int, Int, Int, Int, Long, Long)] = {
      val n = (2 + java.lang.Math.floorMod(id, 7L)).toInt
      val w = (8 + java.lang.Math.floorMod(id, 9L)).toInt
      val h = (6 + java.lang.Math.floorMod(id, 5L)).toInt
      val take = math.min(perDoc, n)
      (0 until take).map { i =>
        val idx = (i.toLong * n / take).toInt
        val vs = (0 until w * h).map(p =>
          java.lang.Math.floorMod(id * 31L + idx * 17L + p, 256L))
        (idx, n, w, h, vs.sum,
          vs.zipWithIndex.map { case (v, p) => (p + 1).toLong * v }.sum)
      }
    }

    it("the real multi-frame decode agrees with the synthesis closed form") {
      val ids = Seq(0L, 1L, 5L, 13L, 123L, 499L)
      val rows = Multimodal.sampleGifFrames(
          ids.map(id => (id, Multimodal.gifBytes(id))).toDF("doc_id", "payload"),
          Multimodal.VideoPerDoc)
        .collect().groupBy(_.doc_id)
      ids.foreach { id =>
        val got = rows(id).sortBy(_.frame_idx)
          .map(f => (f.frame_idx, f.n_frames, f.width, f.height,
            f.sum_luma, f.checksum))
        assert(got.forall(_ => rows(id).forall(_.decode_ok)))
        assert(got.toSeq == expected(id, Multimodal.VideoPerDoc),
          s"doc $id: frame features must match the closed form")
      }
    }

    it("samples evenly: frame indices span the container, never repeat") {
      // id 13 → 2 + 13%7 = 8 frames, perDoc 4 → seeks 0,2,4,6 (true
      // random access: the evenly-spaced set skips frames, so a
      // sequential-only reader would decode the wrong ones)
      val r = Multimodal.sampleGifFrames(
          Seq((13L, Multimodal.gifBytes(13L))).toDF("doc_id", "payload"), 4)
        .collect().sortBy(_.frame_idx)
      assert(r.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
      assert(r.forall(_.n_frames == 8))
    }

    it("quarantines poisoned containers instead of killing the scan") {
      val good = Multimodal.gifBytes(3L)
      val poisoned = Seq(
        1L -> Array.emptyByteArray, // empty
        2L -> "not a gif, just text bytes".getBytes("UTF-8"), // no reader
        3L -> good.take(10), // truncated mid-header
        4L -> good) // control: still decodes
      val f = Multimodal.sampleGifFrames(
          poisoned.toDF("doc_id", "payload"), Multimodal.VideoPerDoc)
        .collect().groupBy(_.doc_id)
      Seq(1L, 2L, 3L).foreach { id =>
        assert(f(id).length == 1 && !f(id).head.decode_ok)
        assert(f(id).head.frame_idx == -1 && f(id).head.checksum == 0L)
      }
      assert(f(4L).forall(_.decode_ok) && f(4L).nonEmpty)
    }

    it("audits the whole corpus: sampled frames for every document") {
      val r = Multimodal.videoFrames(spark, sf).collect()
      val nDocs = graft.sources.Tables.documents(spark, sf).count()
      assert(r.forall(_.getAs[Boolean]("decode_ok")))
      assert(r.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
      // per doc: min(perDoc, n_frames) rows
      r.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, fs) =>
        assert(fs.length ==
          math.min(Multimodal.VideoPerDoc, fs.head.getAs[Int]("n_frames")))
      }
    }
  }

  describe("sampleAviFrames / aviFrames (q196, REAL AVI parse + MJPEG decode)") {
    /** The aviBytes closed form, re-derived independently. */
    def expected(id: Long, perDoc: Int): Seq[(Int, Int, Int, Int, Long, Long)] = {
      val n = (2 + java.lang.Math.floorMod(id, 6L)).toInt
      val w = 8 * (1 + java.lang.Math.floorMod(id, 3L)).toInt
      val h = 8 * (1 + java.lang.Math.floorMod(id, 2L)).toInt
      val take = math.min(perDoc, n)
      (0 until take).map { i =>
        val idx = (i.toLong * n / take).toInt
        val vs = (0 until w * h).map { p =>
          val b = ((p / w) / 8) * (w / 8) + (p % w) / 8
          java.lang.Math.floorMod(
            java.lang.Math.floorMod(id, 96L) * 31L + idx * 17L + b * 11L, 256L)
        }
        (idx, n, w, h, vs.sum,
          vs.zipWithIndex.map { case (v, p) => (p + 1).toLong * v }.sum)
      }
    }

    it("the real idx1-seek + lossy JPEG decode agrees with the closed form bit-exactly") {
      val ids = Seq(0L, 1L, 5L, 13L, 123L, 499L)
      val rows = Multimodal.sampleAviFrames(
          ids.map(id => (id, Multimodal.aviBytes(id))).toDF("doc_id", "payload"),
          Multimodal.AviPerDoc)
        .collect().groupBy(_.doc_id)
      ids.foreach { id =>
        assert(rows(id).forall(_.decode_ok), s"doc $id must decode")
        val got = rows(id).sortBy(_.frame_idx)
          .map(f => (f.frame_idx, f.n_frames, f.width, f.height,
            f.sum_luma, f.checksum))
        assert(got.toSeq == expected(id, Multimodal.AviPerDoc),
          s"doc $id: JPEG-decoded block-grid features must match the " +
            "closed form (constant 8×8 blocks roundtrip exactly)")
      }
    }

    it("samples evenly via the idx1 directory: skipping seeks, never a sequential drain") {
      // id 5 → 2 + 5%6 = 7 frames, perDoc 4 → seeks 0,1,3,5
      val r = Multimodal.sampleAviFrames(
          Seq((5L, Multimodal.aviBytes(5L))).toDF("doc_id", "payload"), 4)
        .collect().sortBy(_.frame_idx)
      assert(r.map(_.frame_idx).toSeq == Seq(0, 1, 3, 5))
      assert(r.forall(_.n_frames == 7))
    }

    it("q197: matches videos sharing all sampled fingerprints, cuts below the floor, skips poison") {
      // aviBytes features repeat exactly iff ids agree mod 96 (the
      // luma period, divisible by every geometry modulus). 1~769 (n=3
      // frames, take 3 — exactly the floor), 5~773 (n=7, take 4);
      // 11 shares geometry with 5 but different pixel values; 99 is
      // poison and must neither crash nor pair.
      val ids = Seq(5L, 773L, 11L, 1L, 769L)
      val payloads = ids.map(id => (id, Multimodal.aviBytes(id))) :+
        (99L -> "definitely not an avi".getBytes("UTF-8"))
      val r = Multimodal.videoNearDupFrom(
          payloads.toDF("doc_id", "payload")).collect()
        .map(x => (x.getAs[Long]("video_a"), x.getAs[Long]("video_b"),
          x.getAs[Long]("n_match"), x.getAs[Long]("n_sampled"),
          x.getAs[Boolean]("full_match")))
      assert(r.toSeq == Seq(
        (1L, 769L, 3L, 3L, true),
        (5L, 773L, 4L, 4L, true)))
    }

    it("q199: the real box-tree parse + keyframe JPEG decode agrees with the closed form") {
      /** The mp4Bytes closed form, re-derived independently. */
      def expected(id: Long, perDoc: Int): Seq[(Int, Int, Int, Int, Int, Long, Long, Long)] = {
        val n = (3 + java.lang.Math.floorMod(id, 5L)).toInt
        val w = 8 * (1 + java.lang.Math.floorMod(id, 2L)).toInt
        val h = 8 * (1 + java.lang.Math.floorMod(id, 3L)).toInt
        val sync = 0 until n by 3
        val take = math.min(perDoc, sync.length)
        (0 until take).map { i =>
          val kf = sync(i * sync.length / take)
          val vs = (0 until w * h).map { p =>
            val b = ((p / w) / 8) * (w / 8) + (p % w) / 8
            java.lang.Math.floorMod(
              java.lang.Math.floorMod(id, 48L) * 29L + kf * 13L + b * 7L, 256L)
          }
          (kf, n, sync.length, w, h, n * 100L, vs.sum,
            vs.zipWithIndex.map { case (v, p) => (p + 1).toLong * v }.sum)
        }
      }
      val ids = Seq(0L, 1L, 4L, 7L, 29L, 123L, 500L)
      val rows = Multimodal.sampleMp4Keyframes(
          ids.map(id => (id, Multimodal.mp4Bytes(id))).toDF("doc_id", "payload"),
          Multimodal.Mp4PerDoc)
        .collect().groupBy(_.doc_id)
      ids.foreach { id =>
        assert(rows(id).forall(f => f.decode_ok && f.codec == "jpeg"), s"doc $id")
        val got = rows(id).sortBy(_.sample_idx)
          .map(f => (f.sample_idx, f.n_frames, f.n_sync, f.width, f.height,
            f.duration_ms, f.sum_luma, f.checksum))
        assert(got.toSeq == expected(id, Multimodal.Mp4PerDoc),
          s"doc $id: stss-seeked keyframe decode must match the closed form")
      }
    }

    it("q199: decodes ONLY sync samples, evenly spaced over the stss list") {
      // id 4 → n = 7 frames, stss = {0,3,6}; perDoc 2 → keyframes 0, 3
      // (never a non-sync frame, never a sequential drain)
      val r = Multimodal.sampleMp4Keyframes(
          Seq((4L, Multimodal.mp4Bytes(4L))).toDF("doc_id", "payload"), 2)
        .collect().sortBy(_.sample_idx)
      assert(r.map(_.sample_idx).toSeq == Seq(0, 3))
      assert(r.forall(f => f.n_frames == 7 && f.n_sync == 3))
    }

    it("q199: quarantines poisoned MP4s: bad magic, truncated moov, corrupt sample bytes") {
      val good = Multimodal.mp4Bytes(6L)
      val corruptSample = good.clone()
      val soi = corruptSample.indices.find(i =>
        i + 2 < corruptSample.length &&
          (corruptSample(i) & 0xff) == 0xff &&
          (corruptSample(i + 1) & 0xff) == 0xd8 &&
          (corruptSample(i + 2) & 0xff) == 0xff).get
      java.util.Arrays.fill(corruptSample, soi, soi + 4, 0.toByte)
      val poisoned = Seq(
        1L -> Array.emptyByteArray,
        2L -> "not an mp4, just text bytes".getBytes("UTF-8"),
        3L -> good.dropRight(200), // moov truncated mid-box
        4L -> corruptSample, // sample table ok, JPEG bytes poisoned
        5L -> good)
      val f = Multimodal.sampleMp4Keyframes(
          poisoned.toDF("doc_id", "payload"), Multimodal.Mp4PerDoc)
        .collect().groupBy(_.doc_id)
      Seq(1L, 2L, 3L, 4L).foreach { id =>
        assert(f(id).length == 1 && !f(id).head.decode_ok, s"doc $id")
        assert(f(id).head.sample_idx == -1 && f(id).head.checksum == 0L)
      }
      assert(f(5L).forall(_.decode_ok) && f(5L).nonEmpty)
    }

    it("q199: survives byte-mutation fuzzing — every mutant decodes or quarantines, never throws") {
      // deterministic LCG so the fuzz corpus is reproducible
      var seed = 0x5eedL
      def nextInt(bound: Int): Int = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (((seed >>> 33) % bound + bound) % bound).toInt
      }
      val base = Multimodal.mp4Bytes(9L)
      val mutants = (0 until 64).map { i =>
        val b = base.clone()
        // flip 1-8 random bytes anywhere in the container
        (0 until 1 + nextInt(8)).foreach { _ =>
          b(nextInt(b.length)) = nextInt(256).toByte
        }
        (i.toLong, b)
      } ++ Seq((64L, base.take(nextInt(base.length))), (65L, base))
      val rows = Multimodal.sampleMp4Keyframes(
          mutants.toDF("doc_id", "payload"), Multimodal.Mp4PerDoc)
        .collect()
      // every mutant produced SOME row; the control still decodes
      assert(rows.map(_.doc_id).distinct.length == mutants.length)
      assert(rows.filter(_.doc_id == 65L).forall(_.decode_ok))
      rows.foreach(r => assert(r.decode_ok || r.sample_idx == -1))
    }

    it("q213: fragmented-MP4 trun walk + keyframe decode agrees with the closed form") {
      // same JPEG samples as q199, so the same luma/checksum closed
      // form; sync cadence now comes from trun sample flags and the
      // duration from elst (+500 ms on id%3==0) or mehd
      def expected(id: Long, perDoc: Int): Seq[(Int, Int, Int, Int, Int, Long, Long, Long)] = {
        val n = (3 + java.lang.Math.floorMod(id, 5L)).toInt
        val w = 8 * (1 + java.lang.Math.floorMod(id, 2L)).toInt
        val h = 8 * (1 + java.lang.Math.floorMod(id, 3L)).toInt
        val sync = 0 until n by 3
        val take = math.min(perDoc, sync.length)
        val dur = n * 100L +
          (if (java.lang.Math.floorMod(id, 3L) == 0L) Multimodal.Mp4ElstPadMs else 0L)
        (0 until take).map { i =>
          val kf = sync(i * sync.length / take)
          val vs = (0 until w * h).map { p =>
            val b = ((p / w) / 8) * (w / 8) + (p % w) / 8
            java.lang.Math.floorMod(
              java.lang.Math.floorMod(id, 48L) * 29L + kf * 13L + b * 7L, 256L)
          }
          (kf, n, sync.length, w, h, dur, vs.sum,
            vs.zipWithIndex.map { case (v, p) => (p + 1).toLong * v }.sum)
        }
      }
      val ids = Seq(0L, 1L, 3L, 4L, 7L, 29L, 123L, 500L)
      val rows = Multimodal.sampleMp4Keyframes(
          ids.map(id => (id, Multimodal.mp4FragBytes(id))).toDF("doc_id", "payload"),
          Multimodal.Mp4PerDoc)
        .collect().groupBy(_.doc_id)
      ids.foreach { id =>
        assert(rows(id).forall(f => f.decode_ok && f.codec == "jpeg"), s"doc $id")
        val got = rows(id).sortBy(_.sample_idx)
          .map(f => (f.sample_idx, f.n_frames, f.n_sync, f.width, f.height,
            f.duration_ms, f.sum_luma, f.checksum))
        assert(got.toSeq == expected(id, Multimodal.Mp4PerDoc),
          s"doc $id: trun-seeked keyframe decode must match the closed form")
      }
      // the elst-shifted file reads its duration from the edit list,
      // the moof-only file from mehd
      assert(rows(3L).head.duration_ms == 6 * 100L + Multimodal.Mp4ElstPadMs)
      assert(rows(4L).head.duration_ms == 7 * 100L)
    }

    it("q213: quarantines poisoned fragments: hostile counts, out-of-range offsets, truncation") {
      val good = Multimodal.mp4FragBytes(6L)
      // locate the FIRST trun box: [size][trun][verflags][count][data_offset]...
      val trunAt = good.indices.find(i =>
        i + 4 < good.length && good(i) == 't' && good(i + 1) == 'r' &&
          good(i + 2) == 'u' && good(i + 3) == 'n').get
      def withU32(base: Array[Byte], at: Int, v: Long): Array[Byte] = {
        val b = base.clone()
        b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
        b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
        b
      }
      val poisoned = Seq(
        // sample_count far beyond any structural bound: must be
        // REJECTED before anything count-sized allocates
        1L -> withU32(good, trunAt + 8, 0x7fffffffL),
        // data_offset pointing far outside the payload
        2L -> withU32(good, trunAt + 12, 0x7ffffff0L),
        // truncated mid-moov: no sample tables at all
        3L -> good.take(200),
        5L -> good)
      val f = Multimodal.sampleMp4Keyframes(
          poisoned.toDF("doc_id", "payload"), Multimodal.Mp4PerDoc)
        .collect().groupBy(_.doc_id)
      Seq(1L, 2L, 3L).foreach { id =>
        assert(f(id).length == 1 && !f(id).head.decode_ok, s"doc $id")
        assert(f(id).head.sample_idx == -1 && f(id).head.checksum == 0L)
      }
      assert(f(5L).forall(_.decode_ok) && f(5L).nonEmpty)
    }

    it("q213: a cleanly-cut trailing fragment leaves a decodable prefix (streaming semantics)") {
      // id 4 → n = 7 samples, 4 fragments {01}{23}{45}{6}, syncs
      // {0,3,6}; cutting the LAST moof+mdat leaves 6 samples whose
      // remaining syncs {0,3} still decode — the progressive-playback
      // property fMP4 exists for
      val good = Multimodal.mp4FragBytes(4L)
      val lastMoof = good.indices.reverse.find(i =>
        i + 4 < good.length && good(i) == 'm' && good(i + 1) == 'o' &&
          good(i + 2) == 'o' && good(i + 3) == 'f').get
      val prefix = good.take(lastMoof - 4)
      val rows = Multimodal.sampleMp4Keyframes(
          Seq((1L, prefix)).toDF("doc_id", "payload"), Multimodal.Mp4PerDoc)
        .collect().sortBy(_.sample_idx)
      assert(rows.forall(_.decode_ok))
      assert(rows.map(_.sample_idx).toSeq == Seq(0, 3))
      assert(rows.forall(f => f.n_frames == 6 && f.n_sync == 2))
    }

    it("q213: survives byte-mutation fuzzing over the fragmented layout") {
      var seed = 0xf4a6L
      def nextInt(bound: Int): Int = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (((seed >>> 33) % bound + bound) % bound).toInt
      }
      val base = Multimodal.mp4FragBytes(9L)
      val mutants = (0 until 64).map { i =>
        val b = base.clone()
        (0 until 1 + nextInt(8)).foreach { _ =>
          b(nextInt(b.length)) = nextInt(256).toByte
        }
        (i.toLong, b)
      } ++ Seq((64L, base.take(nextInt(base.length))), (65L, base))
      val rows = Multimodal.sampleMp4Keyframes(
          mutants.toDF("doc_id", "payload"), Multimodal.Mp4PerDoc)
        .collect()
      assert(rows.map(_.doc_id).distinct.length == mutants.length)
      assert(rows.filter(_.doc_id == 65L).forall(_.decode_ok))
      rows.foreach(r => assert(r.decode_ok || r.sample_idx == -1))
    }

    it("q217: Goertzel probe powers match an independent recursion over the closed form") {
      // independent reimplementation: sawtooth samples from the wavBytes
      // closed form, recursion replayed with the shared coefficients
      def expected(id: Long): Seq[(Int, Seq[Double], Int)] = {
        val n = (800L + java.lang.Math.floorMod(id * 37L, 1600L)).toInt
        val step = 1L + java.lang.Math.floorMod(id, 13L)
        val base = id * 31L
        (0 until n / Multimodal.AudioWin).map { w =>
          val ps = Multimodal.GoertzelC.map { c =>
            var s1 = 0.0; var s2 = 0.0
            (0 until Multimodal.AudioWin).foreach { i =>
              val j = w * Multimodal.AudioWin + i
              val x = (java.lang.Math.floorMod(128L + step * j + base, 256L) -
                128L).toDouble
              val s = (x + (c * s1)) - s2
              s2 = s1; s1 = s
            }
            math.max(((s1 * s1) + (s2 * s2)) - ((c * s1) * s2), 0.0)
          }
          def r6(v: Double) =
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val best = ps.zipWithIndex.reduceLeft((a, b) =>
            if (b._1 > a._1) b else a)._2
          (w, ps.map(v => r6(v / Multimodal.WinSq)),
            Multimodal.GoertzelBins(best) * 40)
        }
      }
      val ids = Seq(0L, 1L, 7L, 12L, 123L)
      val rows = Multimodal.toneWindows(
          ids.map(id => (id, Multimodal.wavBytes(id))).toDF("doc_id", "payload"),
          Multimodal.AudioWin)
        .collect().groupBy(_.doc_id)
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ids.foreach { id =>
        val got = rows(id).sortBy(_.win_idx).map(f =>
          (f.win_idx, Seq(r6(f.p_bin8 / Multimodal.WinSq),
            r6(f.p_bin16 / Multimodal.WinSq),
            r6(f.p_bin32 / Multimodal.WinSq)), f.dominant_hz))
        assert(got.toSeq == expected(id), s"doc $id")
        assert(rows(id).forall(f => f.decode_ok && f.n_frames == 200L))
      }
      // partial trailing windows are skipped: id 0 → n = 800 → 4 windows
      assert(rows(0L).length == 4)
    }

    it("q217: quarantines undecodable audio payloads") {
      val rows = Multimodal.toneWindows(
          Seq((1L, "not audio".getBytes("UTF-8")),
            (2L, Multimodal.wavBytes(2L))).toDF("doc_id", "payload"),
          Multimodal.AudioWin)
        .collect().groupBy(_.doc_id)
      assert(rows(1L).length == 1 && !rows(1L).head.decode_ok)
      assert(rows(2L).forall(_.decode_ok) && rows(2L).nonEmpty)
    }

    it("q208: window sums match the closed form, crossings stay within windows") {
      val ids = Seq(0L, 3L, 12L, 123L)
      val rows = Multimodal.windowAudio(
          ids.map(id => (id, Multimodal.wavBytes(id))).toDF("doc_id", "payload"),
          Multimodal.AudioWin)
        .collect().groupBy(_.doc_id)
      ids.foreach { id =>
        val n = (800L + java.lang.Math.floorMod(id * 37L, 1600L)).toInt
        val step = 1L + java.lang.Math.floorMod(id, 13L)
        val samples = (0 until n).map(i =>
          java.lang.Math.floorMod(128L + step * i + id * 31L, 256L) - 128L)
        val expected = samples.grouped(Multimodal.AudioWin).zipWithIndex.map {
          case (wsamples, w) =>
            val crossings = wsamples.sliding(2).count {
              case Seq(a, b) => a * b < 0L
              case _ => false
            }
            (w, wsamples.length.toLong, wsamples.map(math.abs).sum,
              wsamples.map(d => d * d).sum, crossings.toLong)
        }.toSeq
        val got = rows(id).sortBy(_.win_idx).map(x =>
          (x.win_idx, x.n_samples, x.sum_dev, x.sum_sq, x.crossings))
        assert(rows(id).forall(_.decode_ok), s"doc $id")
        assert(got.toSeq == expected, s"doc $id window features")
      }
    }

    it("q208: quarantines undecodable audio as one row, windows are AudioWin-sized") {
      val r = Multimodal.windowAudio(
          Seq((1L, "not audio".getBytes("UTF-8")),
            (2L, Multimodal.wavBytes(2L))).toDF("doc_id", "payload"),
          Multimodal.AudioWin)
        .collect().groupBy(_.doc_id)
      assert(r(1L).length == 1 && !r(1L).head.decode_ok &&
        r(1L).head.win_idx == -1)
      val full = r(2L).filter(_.n_samples == Multimodal.AudioWin.toLong)
      assert(full.length >= r(2L).length - 1) // at most one partial tail
    }

    it("quarantines poisoned containers: bad magic, truncation, corrupt frame bytes") {
      val good = Multimodal.aviBytes(3L)
      val corruptFrame = good.clone()
      // zap the first frame's JPEG SOI marker: the RIFF walk still
      // finds idx1, but the seeked bitstream is no longer a JPEG
      val soi = corruptFrame.indices.find(i =>
        i + 2 < corruptFrame.length &&
          (corruptFrame(i) & 0xff) == 0xff &&
          (corruptFrame(i + 1) & 0xff) == 0xd8 &&
          (corruptFrame(i + 2) & 0xff) == 0xff).get
      java.util.Arrays.fill(corruptFrame, soi, soi + 4, 0.toByte)
      val poisoned = Seq(
        1L -> Array.emptyByteArray, // empty
        2L -> "not an avi, just text bytes".getBytes("UTF-8"), // bad magic
        3L -> good.take(40), // truncated before movi/idx1
        4L -> corruptFrame, // directory ok, frame bytes poisoned
        5L -> good) // control: still decodes
      val f = Multimodal.sampleAviFrames(
          poisoned.toDF("doc_id", "payload"), Multimodal.AviPerDoc)
        .collect().groupBy(_.doc_id)
      Seq(1L, 2L, 3L, 4L).foreach { id =>
        assert(f(id).length == 1 && !f(id).head.decode_ok, s"doc $id")
        assert(f(id).head.frame_idx == -1 && f(id).head.checksum == 0L)
      }
      assert(f(5L).forall(_.decode_ok) && f(5L).nonEmpty)
    }
  }

  describe("h264MetaOf (q224, REAL avcC + SPS/PPS bit parse)") {
    def metaOf(payloads: (Long, Array[Byte])*): Map[Long, Multimodal.H264Meta] =
      Multimodal.h264MetaOf(payloads.toSeq.toDF("doc_id", "payload"))
        .collect().map(m => m.doc_id -> m).toMap

    it("decodes profile, level, entropy, and crop-adjusted geometry from the bits") {
      val m = metaOf((0L to 6L).map(id => id -> Multimodal.mp4AvcBytes(id)): _*)
      (0L to 6L).foreach { id =>
        val r = m(id)
        assert(r.parse_ok, s"id=$id must parse")
        assert(r.profile_idc == Seq(66, 77, 100)((id % 3).toInt))
        assert(r.level_idc == 30 + 10 * (id % 2).toInt)
        assert(r.entropy == (if (id % 2 == 1) "cabac" else "cavlc"))
        val crop = (id % 2).toInt
        assert(r.width == 16 * (4 + (id % 4).toInt) - 2 * crop)
        assert(r.height == 16 * (3 + (id % 3).toInt) - 2 * crop)
        assert(r.geometry_consistent && r.stss_consistent)
        assert(r.n_idr == (r.n_samples + 2) / 3)
      }
      // RFC 6381 codec strings: High@3.0 for id=2, Baseline@3.0 for id=0
      assert(m(0L).codec == "avc1.42001E")
      assert(m(2L).codec == "avc1.64001E")
      assert(m(1L).codec == "avc1.4D0028")
    }

    it("flags a sync table that disagrees with the sample NAL types") {
      // id=2 has 4 samples, IDR at {1, 4}: point stss at the non-IDR
      // sample 2 — the NAL scan must catch the lie
      val b = Multimodal.mp4AvcBytes(2L)
      val at = b.indexOfSlice("stss".getBytes("US-ASCII"))
      assert(at > 0)
      val tampered = b.clone()
      tampered(at + 12 + 3) = 2 // first 1-based sync entry: 1 → 2
      val r = metaOf(2L -> tampered)(2L)
      assert(r.parse_ok && !r.stss_consistent)
      assert(r.n_keyframes == 2 && r.n_idr == 2)
    }

    it("quarantines a truncated payload instead of guessing") {
      val b = Multimodal.mp4AvcBytes(3L)
      val r = metaOf(3L -> b.take(b.length / 2))(3L)
      assert(!r.parse_ok)
    }

    it("quarantines a non-AVC sample entry (the q199 JPEG corpus)") {
      val r = metaOf(4L -> Multimodal.mp4Bytes(4L))(4L)
      assert(!r.parse_ok)
    }
  }

  describe("exifMeta (q250)") {
    it("decodes both byte orders with field-exact values") {
      val even = Multimodal.exifJpegBytes(2L) // II
      val odd = Multimodal.exifJpegBytes(1L) // MM
      val df = Seq((2L, even), (1L, odd)).toDF("doc_id", "payload")
      val got = Multimodal.exifMetaFrom(df).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      val e = got(2L)
      assert(e.getAs[Boolean]("exif_ok"))
      assert(e.getAs[String]("byte_order") == "II")
      assert(e.getAs[String]("make") == "cam2")
      assert(e.getAs[String]("model") == "mod2")
      assert(e.getAs[Int]("orientation") == 3)
      assert(e.getAs[String]("taken_at") == "2024:03:03 02:00:00")
      assert(e.getAs[Long]("px_w") == 24L)
      assert(e.getAs[Long]("px_h") == 24L)
      assert(e.getAs[Int]("iso") == 300)
      val o = got(1L)
      assert(o.getAs[Boolean]("exif_ok"))
      assert(o.getAs[String]("byte_order") == "MM")
      assert(o.getAs[Int]("n_entries") == 8)
    }

    it("quarantines the three hostile arms and tampered magics") {
      val ids = Seq(17L, 19L, 23L) // truncation, count overrun, bad offset
      val rows = ids.map(i => (i, Multimodal.exifJpegBytes(i))) ++ Seq(
        (100L, { // tampered TIFF magic
          val b = Multimodal.exifJpegBytes(100L)
          // APP1 payload starts at 4; TIFF at 4+6; magic at +2
          b(4 + 6 + 2) = 0x13.toByte; b
        }),
        (101L, Array[Byte](1, 2, 3)), // not a JPEG
        (102L, Multimodal.exifJpegBytes(102L).take(20))) // truncated segment
      val got = Multimodal.exifMetaFrom(rows.toDF("doc_id", "payload"))
        .collect()
      got.foreach(r => assert(!r.getAs[Boolean]("exif_ok"),
        s"doc ${r.getAs[Long]("doc_id")} should quarantine"))
    }

    it("never throws under byte-flip fuzzing") {
      val rnd = new scala.util.Random(250)
      val rows = (0 until 60).map { i =>
        val b = Multimodal.exifJpegBytes(i.toLong + 1)
        val k = rnd.nextInt(b.length)
        b(k) = (b(k) ^ (1 << rnd.nextInt(8))).toByte
        (1000L + i, b)
      }
      val got = Multimodal.exifMetaFrom(rows.toDF("doc_id", "payload"))
        .collect()
      assert(got.length == 60) // every row lands, ok or quarantined
    }
  }
}
