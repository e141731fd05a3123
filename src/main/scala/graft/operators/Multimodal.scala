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

  /** REAL decode for the formats `javax.imageio` ships with (png/bmp):
    * feature dims 0-2 are the decoded channel means affinely mapped to
    * [-1, 1], the rest 0 — a stand-in feature map over REAL pixels.
    * Returns None when the bytes don't decode (caller falls back).
    */
  private def decodeOneImage(assetId: Long, kind: String,
                             content: Array[Byte]): Option[AssetFeatures] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val digest = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(content)
        d.map(b => f"$b%02x").mkString
      }
      val (w, h) = (img.getWidth, img.getHeight)
      var (rs, gs, bs) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val emb = Array(rs, gs, bs).map(s => (s.toDouble / n / 127.5 - 1.0).toFloat)
      val norm = math.sqrt(
        emb.foldLeft(0.0)((acc, v) => acc + v.toDouble * v.toDouble))
      Some(AssetFeatures(assetId, kind, content.length.toLong, digest,
        emb(0).toDouble, norm))
    }
  }

  /** Decode stage: per-partition batch iteration over the typed Dataset —
    * the Scala analog of a vectorized-batch decode UDF. One codec init per
    * partition (the `iter =>` scope), streaming through rows without
    * materializing the partition. Formats with a REAL JDK codec (png/bmp)
    * decode actual pixels ([[decodeOneImage]]); everything else falls back
    * to the deterministic stub — the stub is the fallback, not the path.
    */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { iter =>
      // [heavier codec/session init would go here — once per partition]
      iter.map { a =>
        (a.meta.format match {
          case "png" | "bmp" => decodeOneImage(a.asset_id, a.kind, a.content)
          case _ => None
        }).getOrElse(decodeOneStub(a.asset_id, a.kind, a.content))
      }
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

  // --------------------------------------------------- real image codec

  /** REAL image assets: deterministic RGB pixels (closed-form per
    * (asset_id, x, y) — [[pixelR]]/[[pixelG]]/[[pixelB]]) encoded to
    * actual PNG/BMP bytes by `javax.imageio` at fixture-build time, then
    * DECODED (bytes → pixels) by [[decodeImageStats]]. Both codecs are
    * lossless for 24-bit RGB, so the decoded channel sums equal the
    * closed form — which is what lets DuckDB oracle-check a real binary
    * decode it cannot perform itself: the oracle recomputes the sums
    * from the formula, the engine recomputes them from the bytes.
    */
  case class ImageAsset(asset_id: Long, format: String, content: Array[Byte])

  /** Decoded per-image stats: dimensions read from the DECODED image
    * (not metadata) + per-channel pixel sums.
    */
  case class ImagePixelStats(asset_id: Long, width: Int, height: Int,
                             r_sum: Long, g_sum: Long, b_sum: Long)

  /** The shared pixel formula (engine generates + re-derives from decoded
    * bytes; OracleSqlGen renders the same arithmetic in SQL). All terms
    * non-negative, so `%` == pmod in both engines.
    */
  def pixelR(id: Long, x: Int, y: Int): Int = ((x * 7L + y * 11L + id) % 256L).toInt
  def pixelG(id: Long, x: Int, y: Int): Int = ((x * 13L + y * 3L + 2L * id) % 256L).toInt
  def pixelB(id: Long, x: Int, y: Int): Int = ((x * 1L + y * 17L + 5L * id) % 256L).toInt

  /** Image dimension bounds — small enough that a 100 TB corpus of these
    * is decode-bound, not allocation-bound; SQL mirrors the same md5
    * derivation (OracleSqlGen.imageDimsCte).
    */
  val ImgWMod = 48; val ImgWMin = 16 // width  ∈ [16, 63]
  val ImgHMod = 32; val ImgHMin = 16 // height ∈ [16, 47]

  /** Fixture build: one REAL encoded image per document — even asset_id →
    * PNG, odd → BMP (both `javax.imageio` writers ship in the JDK). The
    * encode runs in `mapPartitions` with one encoder lookup per partition;
    * at production scale this stage is the write side of an image-ingest
    * pipeline (embarrassingly parallel, no shuffle).
    */
  def imageAssets(docs: DataFrame): Dataset[ImageAsset] = {
    import docs.sparkSession.implicits._
    def h(salt: String) =
      DetHash.base60(concat(lit(salt + ":"), col("doc_id").cast("string")))
    docs.select(col("doc_id"),
      (pmod(h("iw"), lit(ImgWMod)) + ImgWMin).cast("int").as("w"),
      (pmod(h("ih"), lit(ImgHMod)) + ImgHMin).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions { iter =>
        iter.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (pixelR(id, x, y) << 16) | (pixelG(id, x, y) << 8) | pixelB(id, x, y))
              x += 1
            }
            y += 1
          }
          val fmt = if (id % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          if (!javax.imageio.ImageIO.write(img, fmt, bos))
            throw new IllegalStateException(s"no JDK ImageIO writer for $fmt")
          ImageAsset(id, fmt, bos.toByteArray)
        }
      }
  }

  /** The image fixture PERSISTED per corpus directory (ensure-once, same
    * discipline as the ANN indexes) — decode queries then measure DECODE,
    * not encode+decode.
    */
  def imageAssetsTable(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synchronized {
      val tag = java.lang.Long.toHexString(DetHash.base60(dir) & 0xffffffffL)
      val name = s"graft_imgassets_$tag"
      graft.Tables.ensurePersisted(spark, name) { path =>
        imageAssets(graft.Tables.load(spark, dir, "documents"))
          .write.option("path", path).mode("overwrite").saveAsTable(name)
      }
    }

  /** The REAL decode pass: `javax.imageio` reads the container format from
    * the bytes themselves (no per-row format dispatch needed), dimensions
    * and channel sums come from the DECODED raster. Undecodable payloads
    * are DROPPED, not thrown (a 100 TB corpus always contains corrupt
    * files; spec-pinned) — callers needing an audit trail anti-join the
    * output against the input ids.
    */
  def decodeImageStats(assets: DataFrame): Dataset[ImagePixelStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                x += 1
              }
              y += 1
            }
            Some(ImagePixelStats(id, w, h, rs, gs, bs))
          }
        }
      }
  }

  // ---------------------------------------------------- real audio codec

  /** REAL audio assets: 16-bit signed mono PCM with closed-form samples
    * ([[audioSample]]), wrapped in an actual WAV (RIFF) container by
    * `javax.sound.sampled.AudioSystem` — and decoded back through the
    * same API ([[decodeAudioStats]]), so the RIFF header parse and PCM
    * frame decode are real JDK codec work, oracle-checked the same way
    * as the images: DuckDB recomputes the sample statistics from the
    * closed form, the engine recomputes them from the bytes.
    */
  case class AudioAsset(asset_id: Long, content: Array[Byte], n_samples: Int)

  case class AudioStats(asset_id: Long, n_samples: Long, sample_sum: Long,
                        abs_sum: Long, energy: Long)

  val AudSampleRate = 8000f
  val AudNMod = 4000; val AudNMin = 1000 // n_samples ∈ [1000, 4999]

  /** The shared sample formula (16-bit range by construction). */
  def audioSample(id: Long, i: Int): Int =
    (((i.toLong * 2003L + id * 31L) % 65536L) - 32768L).toInt

  def audioAssets(docs: DataFrame): Dataset[AudioAsset] = {
    import docs.sparkSession.implicits._
    def h(salt: String) =
      DetHash.base60(concat(lit(salt + ":"), col("doc_id").cast("string")))
    docs.select(col("doc_id"),
      (pmod(h("ns"), lit(AudNMod)) + AudNMin).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions { iter =>
        val fmt = new javax.sound.sampled.AudioFormat(
          AudSampleRate, 16, 1, true, false) // signed, little-endian
        iter.map { case (id, n) =>
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = audioSample(id, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          AudioAsset(id, bos.toByteArray, n)
        }
      }
  }

  /** The audio fixture PERSISTED per corpus directory (ensure-once). */
  def audioAssetsTable(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synchronized {
      val tag = java.lang.Long.toHexString(DetHash.base60(dir) & 0xffffffffL)
      val name = s"graft_audassets_$tag"
      graft.Tables.ensurePersisted(spark, name) { path =>
        audioAssets(graft.Tables.load(spark, dir, "documents"))
          .write.option("path", path).mode("overwrite").saveAsTable(name)
      }
    }

  /** REAL WAV decode: `AudioSystem` parses the RIFF header (sample rate,
    * width, endianness all come from the CONTAINER, not from metadata),
    * the PCM frames stream through a bounded buffer, and the statistics
    * are integer-exact — sum, absolute sum and energy (Σ s²) of the
    * decoded samples plus the frame count the container declares.
    * Undecodable payloads are dropped, like the image path.
    */
  def decodeAudioStats(assets: DataFrame): Dataset[AudioStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => null
              case _: java.io.IOException => null
            }
          if (ais == null) None
          else {
            val fmt = ais.getFormat
            val le = !fmt.isBigEndian
            var (n, sum, abs, energy) = (0L, 0L, 0L, 0L)
            val buf = new Array[Byte](8192)
            var read = ais.read(buf)
            var carry = -1 // odd-byte boundary between reads
            while (read > 0) {
              var i = 0
              while (i < read) {
                if (carry < 0) { carry = buf(i) & 0xff }
                else {
                  val (lo, hi) = if (le) (carry, buf(i).toInt)
                                 else (buf(i) & 0xff, carry.toByte.toInt)
                  val s = (hi << 8) | lo
                  n += 1; sum += s; abs += math.abs(s)
                  energy += s.toLong * s
                  carry = -1
                }
                i += 1
              }
              read = ais.read(buf)
            }
            Some(AudioStats(id, n, sum, abs, energy))
          }
        }
      }
  }

  /** Temporal FEATURE EXTRACTION over real-decoded audio: lag
    * autocorrelations (lags 1, 8, 64) plus energy — the
    * periodicity/smoothness signals a speech-vs-noise or silence filter
    * keys on, computed from the DECODED samples (full RIFF parse + PCM
    * frame decode, same real-codec path as [[decodeAudioStats]]).
    * Integer products throughout (|s| < 2¹⁵, n < 5·10³ ⇒ sums < 2⁴³) so
    * the DuckDB oracle recomputes every value exactly from the
    * closed-form samples. Lags past the clip length yield 0. One
    * asset's samples materialize at a time inside `mapPartitions` —
    * O(clip) memory, the per-partition-codec shape of the whole
    * multimodal pillar.
    */
  case class AudioAutocorr(asset_id: Long, n_samples: Long, energy: Long,
                           ac1: Long, ac8: Long, ac64: Long)

  def decodeAudioAutocorr(assets: DataFrame): Dataset[AudioAutocorr] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => null
              case _: java.io.IOException => null
            }
          if (ais == null) None
          else {
            val le = !ais.getFormat.isBigEndian
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            val s = new Array[Int](n)
            var i = 0
            while (i < n) {
              val (lo, hi) = if (le) (pcm(2 * i) & 0xff, pcm(2 * i + 1).toInt)
                             else (pcm(2 * i + 1) & 0xff, pcm(2 * i).toInt)
              s(i) = (hi << 8) | lo
              i += 1
            }
            def ac(lag: Int): Long = {
              var acc = 0L; var j = 0
              while (j + lag < n) { acc += s(j).toLong * s(j + lag); j += 1 }
              acc
            }
            Some(AudioAutocorr(id, n.toLong, ac(0), ac(1), ac(8), ac(64)))
          }
        }
      }
  }

  // ----------------------------------------- real per-frame video decode

  /** Video assets: a length-prefixed sequence of REAL PNG frames. There
    * is no video demuxer in the JDK, so the CONTAINER is a stand-in
    * ([int32 frame length][png bytes] repeated — honestly labeled), but
    * the per-frame codec is the real thing: every sampled frame is
    * decoded bytes→pixels by `javax.imageio`, which is where the work
    * is in any frame-sampling pipeline. Frame f of asset `id` uses the
    * pixel formula keyed by `id·131 + f`, so every frame is distinct
    * and the oracle recomputes any frame's sums in closed form.
    */
  case class VideoAsset(asset_id: Long, content: Array[Byte],
                        n_frames: Int, width: Int, height: Int)

  case class FrameStats(asset_id: Long, frame_idx: Int, width: Int,
                        height: Int, r_sum: Long, g_sum: Long, b_sum: Long)

  val VidFMod = 6; val VidFMin = 3   // n_frames ∈ [3, 8]
  val VidWMod = 16; val VidWMin = 8  // width    ∈ [8, 23]
  val VidHMod = 12; val VidHMin = 8  // height   ∈ [8, 19]

  /** The per-frame pixel key — frames differ, deterministically. */
  def frameKey(id: Long, f: Int): Long = id * 131L + f

  def videoAssets(docs: DataFrame): Dataset[VideoAsset] = {
    import docs.sparkSession.implicits._
    def h(salt: String) =
      DetHash.base60(concat(lit(salt + ":"), col("doc_id").cast("string")))
    docs.select(col("doc_id"),
      (pmod(h("nf"), lit(VidFMod)) + VidFMin).cast("int").as("nf"),
      (pmod(h("vw"), lit(VidWMod)) + VidWMin).cast("int").as("w"),
      (pmod(h("vh"), lit(VidHMod)) + VidHMin).cast("int").as("h"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { iter =>
        iter.map { case (id, nf, w, h) =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          var f = 0
          while (f < nf) {
            val k = frameKey(id, f)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y,
                  (pixelR(k, x, y) << 16) | (pixelG(k, x, y) << 8) | pixelB(k, x, y))
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            val frame = fb.toByteArray
            out.writeInt(frame.length)
            out.write(frame)
            f += 1
          }
          VideoAsset(id, bos.toByteArray, nf, w, h)
        }
      }
  }

  /** The video fixture PERSISTED per corpus directory (ensure-once). */
  def videoAssetsTable(spark: SparkSession, dir: String): DataFrame =
    Multimodal.synchronized {
      val tag = java.lang.Long.toHexString(DetHash.base60(dir) & 0xffffffffL)
      val name = s"graft_vidassets_$tag"
      graft.Tables.ensurePersisted(spark, name) { path =>
        videoAssets(graft.Tables.load(spark, dir, "documents"))
          .write.option("path", path).mode("overwrite").saveAsTable(name)
      }
    }

  /** Frame-sampled REAL decode: demux the container, decode every
    * `stride`-th frame (plus frame 0) with `javax.imageio`, and report
    * the decoded dimensions + channel sums per sampled frame — the
    * keyframe-extraction shape of a video ingest pipeline, where skipped
    * frames are skipped CHEAPLY (length prefix → skip, no decode).
    */
  def decodeFrameStats(assets: DataFrame, stride: Int = 2): Dataset[FrameStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val out = scala.collection.mutable.ListBuffer[FrameStats]()
          var f = 0
          var ok = true
          while (ok && in.available() >= 4) {
            val len = in.readInt()
            if (len <= 0 || len > in.available()) ok = false
            else if (f % stride != 0) { in.skipBytes(len); f += 1 }
            else {
              val frame = new Array[Byte](len)
              in.readFully(frame)
              val img =
                try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
                catch { case _: java.io.IOException => null }
              if (img != null) {
                val (w, h) = (img.getWidth, img.getHeight)
                var (rs, gs, bs) = (0L, 0L, 0L)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val p = img.getRGB(x, y)
                    rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                    x += 1
                  }
                  y += 1
                }
                out += FrameStats(id, f, w, h, rs, gs, bs)
              }
              f += 1
            }
          }
          out
        }
      }
  }

  /** REAL pixel resample: decode, nearest-neighbour sample to a fixed
    * `tw`×`th` grid (srcX = x·w / tw, integer floor — the same mapping the
    * oracle renders in SQL), and report the resampled image's channel
    * sums. Upgrades [[resize]] (metadata-only scale-to-fit) to actual
    * pixel work on the decoded raster.
    */
  def resampleImageStats(assets: DataFrame, tw: Int = 16, th: Int = 12): Dataset[ImagePixelStats] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                val p = img.getRGB(x * w / tw, y * h / th)
                rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
                x += 1
              }
              y += 1
            }
            Some(ImagePixelStats(id, tw, th, rs, gs, bs))
          }
        }
      }
  }
}
