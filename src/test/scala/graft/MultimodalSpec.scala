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
}
