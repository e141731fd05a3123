package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DetHash

/** Asset metadata carried alongside the opaque payload. */
case class AssetMeta(width: Int, height: Int, sample_rate: Int,
                     duration_ms: Long, format: String)

/** A multimodal asset: opaque binary payload + typed metadata. */
case class Asset(asset_id: Long, kind: String, content: Array[Byte],
                 meta: AssetMeta)

/** Per-asset decoded features (the output contract of the decode stage). */
case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                         digest: String, emb_0: Double, emb_norm: Double)

/** Multimodal-column operators — north-star extension (the reference has no
  * binary payloads; SURVEY.md §2.8 flags all extensions).
  *
  * Design for 100 TB: image/audio/video payloads are opaque `binary`
  * columns + a typed metadata struct; every transform below is either a
  * narrow codegen'd projection (metadata ops, frame sampling) or a
  * `mapPartitions` batch pass (decode) — embarrassingly parallel, no
  * shuffles, no driver round-trips. Real media codecs are NOT available in
  * this build sandbox, so the codec call sites are STUBS with a
  * deterministic md5-derived fake — the Spark-side plumbing (schemas,
  * Encoders, per-partition batch iteration, explode shapes) is real and
  * oracle-tested.
  */
object Multimodal {

  val kinds = Seq("image", "audio", "video")

  /** Deterministic fake asset corpus derived from the documents table:
    * payload = UTF-8 text bytes, kind/meta md5-derived from asset_id. Keeps
    * every downstream result oracle-checkable (TESTDATA ships no binary
    * columns).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    def h(salt: String) =
      DetHash.base60(concat(lit(salt + ":"), col("doc_id").cast("string")))
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(kinds.map(lit): _*),
        (pmod(h("kind"), lit(kinds.size)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        (pmod(h("w"), lit(1280)) + 16).cast("int").as("width"),
        (pmod(h("h"), lit(720)) + 16).cast("int").as("height"),
        (pmod(h("sr"), lit(2)) * 22050 + 22050).cast("int").as("sample_rate"),
        (pmod(h("dur"), lit(120000)) + 1000).as("duration_ms"),
        element_at(array(lit("raw"), lit("rle"), lit("chunked")),
          (pmod(h("fmt"), lit(3)) + 1).cast("int")).as("format")).as("meta"))
  }

  // ------------------------------------------------------------- decode

  val EmbDims = 8

  /** STUB — stands in for a real codec (libjpeg/ffmpeg/...) which is not in
    * this container. Deterministic md5-derived pseudo-features keep the
    * pipeline testable end-to-end; a production build swaps only this
    * function's body, the partition-batch plumbing stays.
    */
  private def decodeOneStub(assetId: Long, kind: String,
                            content: Array[Byte]): AssetFeatures = {
    val digest = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(content)
      d.map(b => f"$b%02x").mkString
    }
    // pseudo-embedding dim i ∈ [-1, 1]: float-rounded md5 affine
    val emb = Array.tabulate(EmbDims) { i =>
      ((DetHash.base60(s"$digest:$i") % 2001 - 1000) / 1000.0).toFloat
    }
    val norm = math.sqrt(
      emb.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    AssetFeatures(assetId, kind, content.length.toLong, digest,
      emb(0).toDouble, norm)
  }

  /** Decode stage: per-partition batch iteration over the typed Dataset —
    * the Scala analog of a vectorized-batch decode UDF. One codec init per
    * partition (the `iter =>` scope), streaming through rows without
    * materializing the partition.
    */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { iter =>
      // [codec/session init would go here — once per partition]
      iter.map(a => decodeOneStub(a.asset_id, a.kind, a.content))
    }
  }

  /** Untyped entry: documents → assets → decoded features. */
  def decodedFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeFeatures(assetsFromDocuments(docs).as[Asset]).toDF()
  }

  // ------------------------------------------- metadata / sampling ops

  /** Resize: pure metadata transform + payload passthrough (the pixel
    * resample itself is part of the decode stub's domain). Codegen'd —
    * no UDF.
    */
  def resize(assets: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    // integer scale-to-fit preserving aspect: scale = min(maxW/w, maxH/h, 1)
    val scale = least(lit(maxW).cast("double") / w,
      lit(maxH).cast("double") / h, lit(1.0))
    assets.withColumn("meta", struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.format").as("format")))
  }

  /** Frame sampling for video assets: one row per sampled frame timestamp,
    * every `strideMs` ms across the duration. sequence+explode — the frame
    * extraction itself would join this spine back to the decode stage.
    */
  def frameSample(assets: DataFrame, strideMs: Long = 10000L): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode_outer(sequence(lit(0L), col("meta.duration_ms") - 1,
          lit(strideMs))).as("frame_ms"))

  /** Corpus stats per kind — count, payload volume, mean dimensions. */
  def assetStats(assets: DataFrame): DataFrame =
    assets.groupBy(col("kind")).agg(
      count(lit(1)).as("n_assets"),
      sum(length(col("content")).cast("long")).as("total_bytes"),
      avg(col("meta.width").cast("double")).as("avg_width"),
      avg(col("meta.duration_ms").cast("double")).as("avg_duration_ms"))
}
