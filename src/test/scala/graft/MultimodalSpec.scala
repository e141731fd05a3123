package graft

import org.apache.spark.sql.functions._
import graft.operators.{Asset, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "s0"),
    (1L, "some other doc with more text", "en", "s1"),
    (2L, "", "en", "s2"),
    (3L, "video content stand-in", "en", "s3"),
    (4L, "yet another", "en", "s4")
  ).toDF("doc_id", "text", "lang", "source")

  private lazy val assets = Multimodal.assetsFromDocuments(docs)

  test("asset corpus: schema, deterministic kinds/meta, payload round-trip") {
    assert(assets.columns.toSeq == Seq("asset_id", "kind", "content", "meta"))
    val a = assets.as[Asset].collect().sortBy(_.asset_id)
    assert(a.forall(x => Multimodal.kinds.contains(x.kind)))
    assert(new String(a(0).content, "UTF-8") == "hello world")
    assert(a.forall(x => x.meta.width >= 16 && x.meta.duration_ms >= 1000))
    // deterministic across evaluations (compare by value — Array[Byte]
    // equality on the case class is referential)
    def key(x: Asset) = (x.asset_id, x.kind, x.content.toSeq, x.meta)
    assert(assets.as[Asset].collect().sortBy(_.asset_id).map(key).toSeq
      == a.map(key).toSeq)
  }

  test("decode stage: mapPartitions batch pass emits stable features") {
    val f = Multimodal.decodeFeatures(assets.as[Asset]).collect()
      .map(x => x.asset_id -> x).toMap
    assert(f.size == 5)
    assert(f(0L).n_bytes == 11L)
    assert(f(2L).n_bytes == 0L)
    assert(f(0L).digest == // md5("hello world")
      "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(f.values.forall(x => math.abs(x.emb_0) <= 1.0))
    assert(f.values.forall(x => x.emb_norm >= 0.0))
  }

  test("resize: scale-to-fit never upscales and preserves bounds") {
    val r = Multimodal.resize(assets, 640, 360)
      .select(col("meta.width"), col("meta.height"))
      .as[(Int, Int)].collect()
    val orig = assets.select(col("meta.width"), col("meta.height"))
      .as[(Int, Int)].collect()
    r.zip(orig).foreach { case ((w, h), (ow, oh)) =>
      assert(w <= 640 && h <= 360)
      assert(w <= ow && h <= oh) // no upscale
    }
  }

  test("frame sample: only videos, stride-spaced, within duration") {
    val frames = Multimodal.frameSample(assets, 10000L)
      .as[(Long, Long)].collect()
    val vids = assets.filter(col("kind") === "video")
      .select(col("asset_id"), col("meta.duration_ms"))
      .as[(Long, Long)].collect().toMap
    assert(frames.forall { case (id, ms) =>
      vids.contains(id) && ms % 10000L == 0 && ms < vids(id) })
    vids.foreach { case (id, dur) =>
      assert(frames.count(_._1 == id) == (1 + (dur - 1) / 10000L))
    }
  }

  test("asset stats partition the corpus") {
    val n = Multimodal.assetStats(assets).agg(sum("n_assets")).as[Long].collect()(0)
    assert(n == 5L)
  }

  // ---------------------------------------------------- real image codec

  /** Closed-form channel sums for a full w×h image of asset `id`. */
  private def formulaSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    var (rs, gs, bs) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      rs += Multimodal.pixelR(id, x, y)
      gs += Multimodal.pixelG(id, x, y)
      bs += Multimodal.pixelB(id, x, y)
    }
    (rs, gs, bs)
  }

  test("image fixture: real PNG/BMP containers, lossless decode round-trip") {
    val imgs = Multimodal.imageAssets(docs).collect().sortBy(_.asset_id)
    assert(imgs.length == 5)
    // container magic proves real encoders ran, not a fake byte blob
    imgs.foreach { a =>
      if (a.format == "png")
        assert(a.content.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      else
        assert(a.format == "bmp" &&
          a.content.take(2).toSeq == Seq('B'.toByte, 'M'.toByte))
      assert((a.asset_id % 2 == 0) == (a.format == "png"))
    }
    // decode recovers EXACTLY the generated pixels (both codecs lossless)
    val stats = Multimodal.decodeImageStats(Multimodal.imageAssets(docs).toDF())
      .collect().map(s => s.asset_id -> s).toMap
    assert(stats.size == 5)
    stats.values.foreach { s =>
      assert(s.width >= Multimodal.ImgWMin && s.height >= Multimodal.ImgHMin)
      val (rs, gs, bs) = formulaSums(s.asset_id, s.width, s.height)
      assert((s.r_sum, s.g_sum, s.b_sum) == ((rs, gs, bs)),
        s"decoded sums drift from generated pixels for asset ${s.asset_id}")
    }
  }

  test("dhash: gradients pin the bits; perceptual identity survives recompression") {
    def encoded(fmt: String, w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos)); bos.toByteArray
    }
    val rising = (x: Int, _: Int) => x * 4          // monotone left->right
    val falling = (x: Int, _: Int) => 200 - x * 4
    val assets = Seq(
      (1L, encoded("png", 36, 14, rising)),
      (2L, encoded("bmp", 36, 14, rising)),        // same pixels, other codec
      (3L, encoded("png", 36, 14, (x, y) => math.min(255, rising(x, y) + 1))),
      (4L, encoded("png", 36, 14, falling))
    ).toDF("asset_id", "content")
    val got = Multimodal.imageDHash(assets).collect()
      .map(d => d.asset_id -> d.dhash).toMap
    val all56 = (1L << 56) - 1                      // every comparison rises
    assert(got(1L) == all56, f"rising hash ${got(1L)}%x")
    assert(got(4L) == 0L, f"falling hash ${got(4L)}%x")
    // recompression and +1 brightness keep the hash; md5 would differ
    assert(got(2L) == got(1L) && got(3L) == got(1L))
    val groups = Multimodal.imageDHashGroups(assets).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(groups(all56) == ((3L, 1L)) && groups(0L) == ((1L, 4L)))
  }

  test("image resample: nearest-neighbour sums match the formula at sampled coords") {
    val stats = Multimodal.resampleImageStats(
      Multimodal.imageAssets(docs).toDF(), 16, 12).collect()
    assert(stats.length == 5)
    val dims = Multimodal.decodeImageStats(Multimodal.imageAssets(docs).toDF())
      .collect().map(s => s.asset_id -> (s.width, s.height)).toMap
    stats.foreach { s =>
      val (w, h) = dims(s.asset_id)
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (y <- 0 until 12; x <- 0 until 16) {
        val (sx, sy) = (x * w / 16, y * h / 12)
        rs += Multimodal.pixelR(s.asset_id, sx, sy)
        gs += Multimodal.pixelG(s.asset_id, sx, sy)
        bs += Multimodal.pixelB(s.asset_id, sx, sy)
      }
      assert(s.width == 16 && s.height == 12)
      assert((s.r_sum, s.g_sum, s.b_sum) == ((rs, gs, bs)))
    }
  }

  test("undecodable payloads are dropped, not thrown") {
    val junk = Seq(
      (100L, Array[Byte](1, 2, 3, 4)),              // not an image
      (101L, Array.empty[Byte])                      // empty
    ).toDF("asset_id", "content")
    assert(Multimodal.decodeImageStats(junk).collect().isEmpty)
    // a valid image in the same frame still decodes
    val one = Multimodal.imageAssets(docs.filter(col("doc_id") === 0)).toDF()
      .select(col("asset_id"), col("content"))
    assert(Multimodal.decodeImageStats(junk.union(one)).collect().length == 1)
  }

  test("audio fixture: real WAV containers, lossless PCM decode round-trip") {
    val auds = Multimodal.audioAssets(docs).collect().sortBy(_.asset_id)
    assert(auds.length == 5)
    // RIFF/WAVE magic proves a real container, not raw PCM
    auds.foreach { a =>
      assert(new String(a.content.take(4), "US-ASCII") == "RIFF")
      assert(new String(a.content.slice(8, 12), "US-ASCII") == "WAVE")
      assert(a.n_samples >= Multimodal.AudNMin)
    }
    val stats = Multimodal.decodeAudioStats(Multimodal.audioAssets(docs).toDF())
      .collect().map(s => s.asset_id -> s).toMap
    assert(stats.size == 5)
    stats.values.foreach { s =>
      var (sum, abs, energy) = (0L, 0L, 0L)
      for (i <- 0 until s.n_samples.toInt) {
        val v = Multimodal.audioSample(s.asset_id, i)
        sum += v; abs += math.abs(v); energy += v.toLong * v
      }
      assert((s.sample_sum, s.abs_sum, s.energy) == ((sum, abs, energy)),
        s"decoded PCM drifts from generated samples for asset ${s.asset_id}")
    }
    // junk bytes are dropped, not thrown
    import spark.implicits._
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("asset_id", "content")
    assert(Multimodal.decodeAudioStats(junk).collect().isEmpty)
  }

  test("audio autocorrelation: decoded-sample lags match the closed form") {
    val feats = Multimodal.decodeAudioAutocorr(
      Multimodal.audioAssets(docs).toDF())
      .collect().map(s => s.asset_id -> s).toMap
    assert(feats.size == 5)
    feats.values.foreach { f =>
      val n = f.n_samples.toInt
      val s = (0 until n).map(i => Multimodal.audioSample(f.asset_id, i))
      def ac(lag: Int): Long =
        (0 until n - lag).map(j => s(j).toLong * s(j + lag)).sum
      assert((f.energy, f.ac1, f.ac8, f.ac64) == ((ac(0), ac(1), ac(8), ac(64))),
        s"autocorr drifts from generated samples for asset ${f.asset_id}")
      // Cauchy-Schwarz bounds every lag by the energy; the sawtooth
      // samples (period ≈ 65536/2003 ≈ 32.7) are strongly lag-1
      // correlated, which is exactly what the feature should expose
      assert(math.abs(f.ac1) <= f.energy && math.abs(f.ac64) <= f.energy)
      assert(f.ac1 > 0, "sawtooth signal must show positive lag-1 correlation")
    }
    import spark.implicits._
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("asset_id", "content")
    assert(Multimodal.decodeAudioAutocorr(junk).collect().isEmpty)
  }

  test("video fixture: real AVI container, per-frame DIB decode, free stride skips") {
    val vids = Multimodal.videoAssets(docs).collect().sortBy(_.asset_id)
    assert(vids.length == 5 && vids.forall(_.n_frames >= Multimodal.VidFMin))
    // the container is a genuine RIFF/AVI: magic, header list, index
    vids.foreach { v =>
      assert(new String(v.content, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(v.content, 8, 4, "US-ASCII") == "AVI ")
      val (info, frames) = graft.operators.Avi.demux(v.content).get
      assert(info.width == v.width && info.height == v.height)
      assert(info.compression == graft.operators.Avi.BiRgb && info.bitCount == 24)
      assert(frames.length == v.n_frames)
    }
    val frames = Multimodal.decodeFrameStats(
      Multimodal.videoAssets(docs).toDF(), stride = 2).collect()
    val byAsset = frames.groupBy(_.asset_id)
    vids.foreach { v =>
      val fs = byAsset(v.asset_id).sortBy(_.frame_idx)
      // only even frame indices sampled, count = ceil(n/2)
      assert(fs.map(_.frame_idx).toSeq == (0 until v.n_frames by 2).toSeq)
      fs.foreach { s =>
        assert(s.width == v.width && s.height == v.height)
        val k = Multimodal.frameKey(v.asset_id, s.frame_idx)
        var (rs, gs, bs) = (0L, 0L, 0L)
        for (y <- 0 until s.height; x <- 0 until s.width) {
          rs += Multimodal.pixelR(k, x, y)
          gs += Multimodal.pixelG(k, x, y)
          bs += Multimodal.pixelB(k, x, y)
        }
        assert((s.r_sum, s.g_sum, s.b_sum) == ((rs, gs, bs)),
          s"decoded frame ${s.frame_idx} of asset ${v.asset_id} drifts")
      }
    }
    // stride=1 decodes every frame
    val all = Multimodal.decodeFrameStats(
      Multimodal.videoAssets(docs).toDF(), stride = 1).collect()
    assert(all.length == vids.map(_.n_frames).sum)
    // malformed containers demux to nothing instead of throwing
    import spark.implicits._
    val junk = Seq((99L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))).toDF("asset_id", "content")
    assert(Multimodal.decodeFrameStats(junk, 1).collect().isEmpty)
    val truncated = Seq((98L, vids.head.content.take(40))).toDF("asset_id", "content")
    assert(Multimodal.decodeFrameStats(truncated, 1).collect().isEmpty)
  }

  test("MJPG AVI: '00dc' JPEG frame chunks demux and decode through imageio") {
    import spark.implicits._
    val (w, h) = (16, 12)
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x + y + f) % 2 == 0) 0xffffff else 0x000000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val avi = graft.operators.Avi.mux(frames.toIndexedSeq, w, h,
      graft.operators.Avi.FccMjpg)
    val (info, idx) = graft.operators.Avi.demux(avi).get
    assert(info.compression == graft.operators.Avi.FccMjpg && idx.length == 3)
    val stats = Multimodal.decodeFrameStats(
      Seq((7L, avi)).toDF("asset_id", "content"), stride = 1)
      .collect().sortBy(_.frame_idx)
    // JPEG is lossy: assert the demux/decode contract (count, dims, and
    // a sane luminance range), not exact sums
    assert(stats.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    stats.foreach { s =>
      assert(s.width == w && s.height == h)
      val maxSum = 255L * w * h
      assert(s.r_sum > maxSum / 4 && s.r_sum < 3 * maxSum / 4,
        "checkerboard frame should decode to mid-range channel sums")
    }
  }

  test("decodeFeatures dispatches png/bmp to the REAL codec, stub as fallback") {
    val img = Multimodal.imageAssets(docs).collect()
      .find(_.asset_id == 0L).get // png (even id)
    val meta = graft.operators.AssetMeta(1, 1, 0, 0L, "png")
    val real = Multimodal.decodeFeatures(
      Seq(graft.operators.Asset(0L, "image", img.content, meta)).toDS()).collect().head
    // real path: emb_0 is the decoded r-channel mean mapped to [-1,1]
    val stats = Multimodal.decodeImageStats(
      Multimodal.imageAssets(docs.filter(col("doc_id") === 0)).toDF()).collect().head
    val expected = (stats.r_sum.toDouble / (stats.width.toLong * stats.height)
      / 127.5 - 1.0).toFloat.toDouble
    assert(real.emb_0 == expected, s"real-codec path not taken: $real")
    // unknown format: identical bytes fall back to the deterministic stub
    val stub = Multimodal.decodeFeatures(
      Seq(graft.operators.Asset(0L, "image", img.content, meta.copy(format = "raw"))).toDS())
      .collect().head
    assert(stub.emb_0 != real.emb_0 || stub.emb_norm != real.emb_norm)
    assert(stub.digest == real.digest) // same bytes, same digest
  }
}
