package graft.llm

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column plus a typed metadata struct; decode /
  * feature-extract run batch-wise over partitions.
  *
  * All three modalities now have REAL pure-JVM codecs in the loop:
  * images as PNG via `javax.imageio` ([[imageStats]]/[[imageResize]]),
  * audio as WAV/PCM via `javax.sound.sampled` ([[audioStats]]), video
  * as multi-frame animated GIF via ImageIO's sequence reader
  * ([[videoFrames]]) — each decode's output is oracle-checked
  * bit-for-bit against the same payload rebuilt in SQL. The generic
  * byte-level path ([[stubDecode]]) remains as the documented shape
  * for codecs the sandbox lacks (JPEG-XL, MP3, H.264, ...): swapping
  * it for a JNI/codec call changes no plan shape.
  */
object Multimodal {

  /** Typed record for the partition-wise decode path. */
  case class MediaRow(doc_id: Long, media: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                           mean_byte: Double, feature_hash: Long)

  /** STUB — stands in for a real image decode + feature extraction.
    * Deterministic pure function of the bytes: byte-mean as the "pixel
    * statistic", portable hash as the "embedding id". A real
    * implementation would decode `media` and pool actual pixels.
    */
  def stubDecode(bytes: Array[Byte]): (Double, Long) = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else s.toDouble / bytes.length
    (mean, s) // (mean byte value, additive checksum as fake feature id)
  }

  /** The media table: documents' text bytes standing in for encoded
    * media, with a typed metadata struct derived deterministically.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        (pmod(col("n_chars"), lit(640)) + lit(1)).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + lit(1)).cast("int").as("height"))

  /** m01 — column-level feature extraction over the binary column:
    * fully codegen'd (octet_length + aggregate over the byte array via
    * relational ops is not possible on BinaryType, so the byte-mean
    * runs through the typed partition path in [[decodePartitions]]);
    * this query keeps the *relational* subset that an oracle can check:
    * sizes, metadata, and the portable content hash.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("media")).as("n_bytes"),
        col("width"), col("height"),
        TextHash.phash(decode(col("media"), "UTF-8"), 5).as("content_hash"))
      .orderBy("doc_id")

  /** Partition-wise decode — the `mapPartitions` batch shape a real
    * codec would use (one codec init per partition, then a tight loop;
    * the analog of a vectorized/batched UDF in a JVM-only engine).
    */
  def decodePartitions(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      // real impl: init decoder once per partition here
      rows.map { r =>
        val (mean, checksum) = stubDecode(r.media)
        MediaFeatures(r.doc_id, r.media.length, r.width, r.height, mean, checksum)
      }
    }
  }

  /** STUB — byte-level resize placeholder kept for the generic media
    * path; the IMAGE leg has a real implementation ([[imageResize]],
    * m03) that decodes the PNG and resamples actual pixels. Plan shape
    * (partition-wise batch map, typed schema in/out) is the real one.
    */
  def stubResize(bytes: Array[Byte], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Byte] = {
    val ratio = math.max(1, math.round(srcW.toDouble * srcH / math.max(1, dstW * dstH)).toInt)
    bytes.grouped(ratio).map(_.head).toArray
  }

  case class ResizedMedia(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** Batch resize over partitions to a fixed thumbnail size. */
  def resizePartitions(spark: SparkSession, dir: String, dstW: Int = 32, dstH: Int = 24): Dataset[ResizedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        ResizedMedia(r.doc_id, stubResize(r.media, r.width, r.height, dstW, dstH), dstW, dstH)
      }
    }
  }

  /** STUB — frame sampling: treats the byte stream as `nFrames` fixed-
    * size "frames" and emits every `stride`-th one (a video decoder
    * would seek keyframes; the emitted (doc_id, frame_idx, frame_bytes)
    * fan-out schema is the real contract: 1 row in → k rows out).
    */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(spark: SparkSession, dir: String, frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        r.media.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => Frame(r.doc_id, i, chunk)
        }
      }
    }
  }

  // -- real image leg (m02) ---------------------------------------------------

  case class EncodedImage(doc_id: Long, media: Array[Byte], width: Int, height: Int)
  case class ImageStats(doc_id: Long, width: Int, height: Int, n_px: Int,
                        sum_px: Long, mean_px: Double, min_px: Int, max_px: Int)

  /** Deterministic grayscale pixels for a doc: byte `i` of the md5
    * chain `md5("<doc_id>:<i/16>")` — reproducible in DuckDB from hex
    * string ops, so REAL codec output is still oracle-checkable.
    */
  def pixelsOf(docId: Long, w: Int, h: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](w * h)
    var block = -1
    var digest: Array[Byte] = null
    var i = 0
    while (i < out.length) {
      if (i / 16 != block) {
        block = i / 16
        digest = md.digest(s"$docId:$block".getBytes("UTF-8"))
        md.reset()
      }
      out(i) = digest(i % 16) & 0xff
      i += 1
    }
    out
  }

  private def dims(docId: Long): (Int, Int) =
    (8 + (docId % 9).toInt, 8 + (docId % 7).toInt)

  /** Real encoded images as a binary column: pixels → PNG via the
    * JDK's `javax.imageio` (no native codec needed). One encoder per
    * partition-task lifetime, tight loop inside — the batch shape a
    * production codec stage uses.
    */
  /** The doc_id relation that drives every synthetic-blob codec loop,
    * spread across the cluster first: the fixture table is one parquet
    * split, and an opaque `mapPartitions` inherits its parallelism —
    * without the repartition one task pays the whole encode+decode
    * cost serially (m06 had the same fix; at 100 TB the blobs arrive
    * pre-partitioned and this hash exchange of bare longs disappears).
    * The partition count is EXPLICIT: AQE sizes coalescing by shuffle
    * bytes, and 5000 bare longs is far under the advisory size, so a
    * bare `repartition(col)` collapses right back to one task — byte
    * volume is the wrong cost model for a codec-bound stage.
    */
  private def docIds(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id")).as[Long]
  }

  /** Executor-side codec config, run once per JVM (object initializers
    * are lazy and idempotent; every codec task touches [[ready]]).
    * ImageIO's default stream cache backs each non-File read/write
    * with a TEMP FILE — two filesystem round trips per image and a
    * shared /tmp contention point across 32 codec tasks. Our blobs are
    * kilobytes; heap-backed streams are strictly better.
    */
  private[llm] object CodecInit {
    javax.imageio.ImageIO.setUseCache(false)
    def ready: Boolean = true
  }

  private def pngBytesOf(id: Long): Array[Byte] = {
    CodecInit.ready
    val (w, h) = dims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixelsOf(id, w, h))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def imageTable(spark: SparkSession, dir: String): Dataset[EncodedImage] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = dims(id)
        EncodedImage(id, pngBytesOf(id), w, h)
      }
    }
  }

  /** m02 — REAL image decode + pixel statistics: the PNG binary column
    * is decoded back with `ImageIO.read` and the stats come from the
    * decoded raster, not the metadata — PNG is lossless, so the oracle
    * (which rebuilds the same pixels from the md5 chain in SQL) must
    * match bit-for-bit. Dimensions are read from the DECODED image;
    * a codec bug or corrupt payload would break the oracle match.
    * `mean_px` is an int/int division of two exact values — bit-
    * deterministic across engines, so it ships unrounded.
    */
  def imageStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, dir).mapPartitions { rows =>
      CodecInit.ready
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        var sum = 0L; var mn = 255; var mx = 0
        px.foreach { p => sum += p; if (p < mn) mn = p; if (p > mx) mx = p }
        ImageStats(r.doc_id, w, h, px.length, sum, sum.toDouble / px.length, mn, mx)
      }
    }.toDF().orderBy("doc_id")
  }

  case class ResizedStats(doc_id: Long, src_w: Int, src_h: Int,
                          sum_px: Long, min_px: Int, max_px: Int, px_csv: String)

  val DstW = 4
  val DstH = 4

  /** m03 — REAL image resize: decode the PNG, nearest-neighbor
    * resample the decoded raster to [[DstW]]×[[DstH]] with pure
    * integer arithmetic (`sx = x·srcW / dstW` — deliberately NOT an
    * AWT interpolator, whose rounding is implementation-defined), and
    * emit the resized pixels both as stats and as an md5 over the
    * canonical CSV form. The oracle rebuilds the same source pixels
    * from the md5 chain and applies the same index arithmetic in SQL,
    * so a real codec or resample bug breaks the hash match.
    * Supersedes [[stubResize]] for the image leg.
    */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, dir).mapPartitions { rows =>
      CodecInit.ready
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        val (w, h) = (img.getWidth, img.getHeight)
        val src = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        val out = new Array[Int](DstW * DstH)
        var y = 0
        while (y < DstH) {
          var x = 0
          while (x < DstW) {
            out(y * DstW + x) = src((y * h / DstH) * w + (x * w / DstW))
            x += 1
          }
          y += 1
        }
        var sum = 0L; var mn = 255; var mx = 0
        out.foreach { p => sum += p; if (p < mn) mn = p; if (p > mx) mx = p }
        ResizedStats(r.doc_id, w, h, sum, mn, mx, out.mkString(","))
      }
    }.toDF()
      .select(col("doc_id"), col("src_w"), col("src_h"),
        lit(DstW).as("dst_w"), lit(DstH).as("dst_h"),
        col("sum_px"), col("min_px"), col("max_px"),
        md5(col("px_csv")).as("resized_md5"))
      .orderBy("doc_id")
  }

  val oracleImageResize: String =
    s"""WITH px AS (
       |  SELECT doc_id,
       |         (8 + doc_id % 9)::INT AS width,
       |         (8 + doc_id % 7)::INT AS height,
       |         i,
       |         ('0x' || substr(md5(doc_id || ':' || (i // 16)),
       |                         (i % 16) * 2 + 1, 2))::BIGINT AS px
       |  FROM documents,
       |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t),
       |dst AS (
       |  SELECT doc_id, width, height, j,
       |         ((j // $DstW) * height // $DstH) * width + ((j % $DstW) * width // $DstW) AS src_i
       |  FROM (SELECT DISTINCT doc_id, width, height FROM px),
       |       LATERAL (SELECT unnest(range(${DstW * DstH})) AS j) u),
       |res AS (
       |  SELECT d.doc_id, d.width, d.height, d.j, p.px
       |  FROM dst d JOIN px p ON p.doc_id = d.doc_id AND p.i = d.src_i)
       |SELECT doc_id, width AS src_w, height AS src_h,
       |  $DstW AS dst_w, $DstH AS dst_h,
       |  sum(px)::BIGINT AS sum_px, min(px)::INT AS min_px, max(px)::INT AS max_px,
       |  md5(string_agg(px::VARCHAR, ',' ORDER BY j)) AS resized_md5
       |FROM res
       |GROUP BY 1, 2, 3
       |ORDER BY doc_id""".stripMargin

  val oracleImageStats: String =
    """WITH px AS (
      |  SELECT doc_id,
      |         (8 + doc_id % 9)::INT AS width,
      |         (8 + doc_id % 7)::INT AS height,
      |         ('0x' || substr(md5(doc_id || ':' || (i // 16)),
      |                         (i % 16) * 2 + 1, 2))::BIGINT AS px
      |  FROM documents,
      |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t)
      |SELECT doc_id, width, height,
      |  count(*)::INT AS n_px, sum(px)::BIGINT AS sum_px,
      |  sum(px)::DOUBLE / count(*) AS mean_px,
      |  min(px)::INT AS min_px, max(px)::INT AS max_px
      |FROM px
      |GROUP BY 1, 2, 3
      |ORDER BY doc_id""".stripMargin

  // -- real LOSSY image leg (m10, JPEG) --------------------------------------

  case class JpegFidelity(doc_id: Long, width: Int, height: Int, n_px: Int,
                          max_abs_err: Int, within_tol: Boolean)

  /** |decoded − source| tolerance for the JPEG leg: generous against
    * encoder drift across JDK builds, far below the error a wrong
    * decode path (dimension swap, channel mixup, byte-order bug)
    * produces on these gradients.
    */
  val JpegTol = 24

  /** Smooth deterministic grayscale source for the lossy leg: a
    * clamped plane gradient parameterized by doc_id. The md5-chain
    * pixels ([[pixelsOf]]) are white noise — the adversarial worst
    * case for a DCT codec — while JPEG's contract is fidelity on
    * natural (low-frequency) content, which a gradient models.
    */
  def smoothPixelsOf(docId: Long, w: Int, h: Int): Array[Int] = {
    val base = (docId * 37 % 193).toInt
    val sx = 1 + (docId % 5).toInt
    val sy = 1 + (docId % 3).toInt
    Array.tabulate(w * h)(k => math.min(255, base + sx * (k % w) + sy * (k / w)))
  }

  private def jpegBytesOf(id: Long): Array[Byte] = {
    CodecInit.ready
    val (w, h) = dims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, smoothPixelsOf(id, w, h))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** The decoded-vs-source fidelity relation behind m10 (exposed so the
    * spec can pin the OBSERVED error distribution, not just the flag).
    */
  private[graft] def jpegFidelity(spark: SparkSession, dir: String): Dataset[JpegFidelity] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      CodecInit.ready
      ids.map { id =>
        val bytes = jpegBytesOf(id)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        val src = smoothPixelsOf(id, w, h)
        var maxErr = 0
        var i = 0
        while (i < px.length) {
          val e = math.abs(px(i) - src(i)); if (e > maxErr) maxErr = e; i += 1
        }
        JpegFidelity(id, w, h, px.length, maxErr, maxErr <= JpegTol)
      }
    }
  }

  /** m10 — REAL lossy decode (JPEG via the stock JDK `ImageIO` codec):
    * encode the smooth source to JPEG, decode it back, and report what
    * a lossy codec lets an engine-independent oracle check. PNG/WAV/GIF
    * (m02-m05) are lossless, so their oracles rebuild the exact payload
    * in SQL; DCT quantization is encoder-implementation-defined, so no
    * SQL can restate the decoded pixels. The honest projection: the
    * STRUCTURAL fields (decoded width/height/pixel count) compare
    * bit-for-bit, and pixel fidelity ships as a within-tolerance
    * predicate computed from the real decode — a codec bug flips the
    * flag and the hash match fails. The spec additionally pins the
    * observed max error. MP3/H.264 stay behind the stub shape (no JVM
    * codec exists); JPEG leaves that list with this leg.
    */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jpegFidelity(spark, dir)
      .map(f => (f.doc_id, f.width, f.height, f.n_px, f.within_tol))
      .toDF("doc_id", "width", "height", "n_px", "within_tol")
      .orderBy("doc_id")
  }

  val oracleJpegDecode: String =
    """SELECT doc_id,
      |  (8 + doc_id % 9)::INT AS width,
      |  (8 + doc_id % 7)::INT AS height,
      |  ((8 + doc_id % 9) * (8 + doc_id % 7))::INT AS n_px,
      |  true AS within_tol
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // -- real audio leg (m04) ---------------------------------------------------

  case class EncodedAudio(doc_id: Long, media: Array[Byte])
  case class AudioStats(doc_id: Long, sample_rate: Int, n_samples: Int,
                        duration_ms: Int, sum_abs: Long, sum_sq: Long,
                        min_s: Int, max_s: Int, samples_csv: String)

  val AudioRate = 8000

  /** Deterministic signed 16-bit PCM for a doc: sample `i` is the
    * big-endian byte pair `(2(i%8), 2(i%8)+1)` of `md5("<doc_id>:a:<i/8>")`
    * minus 32768 — reproducible in DuckDB from hex substrings, so REAL
    * codec output stays oracle-checkable (the audio analog of
    * [[pixelsOf]]).
    */
  def samplesOf(docId: Long, n: Int): Array[Int] = samplesChain(docId, n, "a")

  private def samplesChain(docId: Long, n: Int, tag: String): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](n)
    var block = -1
    var digest: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (i / 8 != block) {
        block = i / 8
        digest = md.digest(s"$docId:$tag:$block".getBytes("UTF-8"))
        md.reset()
      }
      val k = (i % 8) * 2
      out(i) = (((digest(k) & 0xff) << 8) | (digest(k + 1) & 0xff)) - 32768
      i += 1
    }
    out
  }

  private def audioLen(docId: Long): Int = 160 + (docId % 97).toInt

  /** Real encoded audio as a binary column: PCM16LE mono in a RIFF/WAVE
    * container, header written directly (byte-identical to what
    * `AudioSystem.write(..., Type.WAVE, ...)` emits for this fixed
    * format — asserted in LlmOpsSpec). The fixture GENERATOR avoids
    * `AudioSystem` deliberately: every javax.sound entry point funnels
    * through the JVM-global synchronized provider registry
    * (`JDK13Services.getProviders`), and 32 generator tasks convoy on
    * that lock (measured 3× slower than serial). The DECODE side — the
    * operator under test — stays on the real JDK codec.
    */
  private[graft] def wavBytesOf(id: Long): Array[Byte] =
    riffWav(samplesOf(id, audioLen(id)))

  /** The ONE RIFF/WAVE serializer behind every WAV fixture (m04's
    * wavBytesOf and m16's wavNdBytesOf): header + PCM16LE samples in a
    * single pass. Shared so a format tweak (sample rate, channel
    * count) can never desynchronize the two fixtures' containers.
    */
  private def riffWav(s: Array[Int]): Array[Byte] = {
    val dataLen = s.length * 2
    val out = new Array[Byte](44 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(AudioRate).putInt(AudioRate * 2)    // sample rate, byte rate
      .putShort(2).putShort(16)                   // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < s.length) {
      bb.putShort(s(i).toShort)
      i += 1
    }
    out
  }

  def audioTable(spark: SparkSession, dir: String): Dataset[EncodedAudio] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      ids.map(id => EncodedAudio(id, wavBytesOf(id)))
    }
  }

  /** javax.sound codec handles resolved through the public SPI
    * (`javax.sound.sampled.spi.AudioFileReader/Writer`) instead of the
    * `AudioSystem` facade: every AudioSystem entry point re-resolves
    * providers under a JVM-global `synchronized` registry
    * (`JDK13Services.getProviders`), so 32 decode tasks convoy on one
    * lock (measured: parallel slower than serial). Resolved ONCE per
    * executor JVM (lazy vals), not per partition: `ServiceLoader.load`
    * rescans META-INF/services across the full ~300-jar Spark
    * classpath, which at per-partition granularity cost more than the
    * decode work itself (m04 2.3 s vs 0.7 s for the same-shape image
    * leg). The facade shares one provider instance JVM-wide too —
    * same sharing model, minus its per-call lock; the codec doing the
    * work is the same JDK WAV implementation either way.
    */
  private object AudioSpi {
    lazy val readers: List[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      // RIFF/PCM WAV is the only audio container this engine emits, so
      // probe its reader FIRST: SPI probing is by-exception, and every
      // missed provider (Aiff/Au/Midi precede Wave in registry order)
      // constructs an UnsupportedAudioFileException with a filled-in
      // stack trace — at per-row granularity those three misses cost
      // more than the decode itself (measured 0.59 s vs 0.15 s per
      // 5000 blobs)
      val (wav, rest) = b.result().partition(
        _.getClass.getSimpleName == "WaveFileReader")
      wav ++ rest
    }
    lazy val writers: List[javax.sound.sampled.spi.AudioFileWriter] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
      while (it.hasNext) b += it.next()
      b.result()
    }
    lazy val converters: List[javax.sound.sampled.spi.FormatConversionProvider] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.FormatConversionProvider]).iterator()
      val b = List.newBuilder[javax.sound.sampled.spi.FormatConversionProvider]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private def audioReaders(): List[javax.sound.sampled.spi.AudioFileReader] =
    AudioSpi.readers

  private def audioWriters(): List[javax.sound.sampled.spi.AudioFileWriter] =
    AudioSpi.writers

  private def readAudio(readers: List[javax.sound.sampled.spi.AudioFileReader],
                        bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    readers.foreach { r =>
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new IllegalArgumentException("no SPI reader recognises the audio container")
  }

  private def writeWave(writers: List[javax.sound.sampled.spi.AudioFileWriter],
                        ais: javax.sound.sampled.AudioInputStream,
                        out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    writers.find(_.isFileTypeSupported(t, ais)) match {
      case Some(w) => w.write(ais, t, out)
      case None    => throw new IllegalArgumentException("no SPI writer supports WAVE")
    }
  }

  /** m04 — REAL audio decode + sample statistics: the WAV binary column
    * is parsed back with `AudioSystem.getAudioInputStream`; sample rate
    * and frame count come from the DECODED header, the amplitude stats
    * and the md5 from the decoded PCM payload. WAV PCM is lossless, so
    * the oracle (same samples rebuilt from the md5 chain in SQL) must
    * match bit-for-bit — a header-parsing or endianness bug breaks the
    * hash. Supersedes the audio half of [[stubDecode]]; only video
    * remains GIF-based ([[videoFrames]]) for want of a real codec.
    */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).mapPartitions { rows =>
      val readers = audioReaders() // JVM-cached SPI handles (see AudioSpi)
      rows.map { r =>
        val in = readAudio(readers, r.media)
        val fmt = in.getFormat
        val n = in.getFrameLength.toInt
        val pcm = in.readAllBytes()
        var sumAbs = 0L; var sumSq = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        val vals = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)) // LE signed 16-bit
          vals(i) = v
          sumAbs += math.abs(v); sumSq += v.toLong * v
          if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        val rate = fmt.getSampleRate.toInt
        AudioStats(r.doc_id, rate, n, n * 1000 / rate, sumAbs, sumSq, mn, mx,
          vals.mkString(","))
      }
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("duration_ms"), col("sum_abs"), col("sum_sq"),
        col("min_s"), col("max_s"), md5(col("samples_csv")).as("samples_md5"))
      .orderBy("doc_id")
  }

  val oracleAudioStats: String =
    s"""WITH s AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(doc_id || ':a:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS v
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + doc_id % 97)) AS i) t)
       |SELECT doc_id,
       |  $AudioRate AS sample_rate,
       |  count(*)::INT AS n_samples,
       |  (count(*) * 1000 // $AudioRate)::INT AS duration_ms,
       |  sum(abs(v))::BIGINT AS sum_abs,
       |  sum(v::BIGINT * v)::BIGINT AS sum_sq,
       |  min(v)::INT AS min_s, max(v)::INT AS max_s,
       |  md5(string_agg(v::VARCHAR, ',' ORDER BY i)) AS samples_md5
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- m23: frame-energy dynamic range -----------------------------------------

  /** Samples per m23 energy frame (32 @ 8 kHz = 4 ms). */
  val EnergyFrame = 32

  case class FrameEnergy(doc_id: Long, n_frames: Int, e_min: Long, e_max: Long,
                         e_total: Long)

  /** m23 — frame-energy dynamic range over the decoded PCM: per
    * document, the per-[[EnergyFrame]] energy extremes (Σv² per full
    * frame, trailing partial frame dropped) and their ratio. The
    * loudness-profile filter an audio ingest runs next to m20
    * (clipping) and m14 (silence): a near-1 dynamic range is
    * constant-energy tone/noise, an extreme ratio is a mastering
    * defect — both drop signals that per-sample stats (m04) average
    * away. Same real JDK WAV decode, same blobs-never-shuffle shape:
    * the frame fold runs where the bytes live and one fixed-width row
    * leaves the task.
    *
    * Frame energies are exact BIGINTs, so `dyn_range` is a quotient of
    * identical integers in both engines under the 6-dp round (NULL for
    * an all-zero quietest frame).
    */
  def frameEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).mapPartitions { rows =>
      val readers = audioReaders()
      rows.map { r =>
        val in = readAudio(readers, r.media)
        val n = in.getFrameLength.toInt
        val pcm = in.readAllBytes()
        val nf = n / EnergyFrame
        var eMin = Long.MaxValue; var eMax = Long.MinValue; var tot = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = f * EnergyFrame
          val end = i + EnergyFrame
          while (i < end) {
            val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8))
            e += v.toLong * v
            i += 1
          }
          if (e < eMin) eMin = e
          if (e > eMax) eMax = e
          tot += e
          f += 1
        }
        FrameEnergy(r.doc_id, nf, eMin, eMax, tot)
      }
    }.toDF()
      .select(col("doc_id"), col("n_frames"), col("e_min"), col("e_max"),
        col("e_total"),
        when(col("e_min") > 0,
          round(col("e_max").cast("double") / col("e_min"), 6)).as("dyn_range"))
      .orderBy("doc_id")
  }

  /** Same md5-chain sample rebuild as m04's oracle, folded per frame. */
  val oracleFrameEnergy: String =
    s"""WITH s AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(doc_id || ':a:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS v
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + doc_id % 97)) AS i) t),
       |fr AS (
       |  SELECT doc_id, i // $EnergyFrame AS f, sum(v::BIGINT * v)::BIGINT AS e
       |  FROM s
       |  WHERE i // $EnergyFrame < (160 + doc_id % 97) // $EnergyFrame
       |  GROUP BY 1, 2)
       |SELECT doc_id, count(*)::INT AS n_frames,
       |  min(e)::BIGINT AS e_min, max(e)::BIGINT AS e_max,
       |  sum(e)::BIGINT AS e_total,
       |  CASE WHEN min(e) > 0 THEN round(max(e)::DOUBLE / min(e), 6) END AS dyn_range
       |FROM fr GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // -- m20: clipping detection over the decoded PCM ---------------------------

  /** |sample| at or above this counts as clipped (~92% of full scale —
    * low enough that the uniform md5 fixture yields real clipped runs,
    * high enough that most samples stay clean).
    */
  val ClipThresh = 30000

  // public like AudioStats: a private case class breaks the codegen'd
  // encoder (Janino cannot reference private accessors → interpreted
  // fallback for every result row)
  case class AudioClip(doc_id: Long, n_samples: Int, n_clipped: Int,
                       max_run: Int, peak_abs: Int)

  /** m20 — audio clipping QA (the loudness-damage filter an audio
    * training pipeline runs at ingest): per document, how many decoded
    * samples sit at/above [[ClipThresh]], the clipped fraction, the
    * longest CONSECUTIVE clipped run (single outliers are transients;
    * runs are true clipping), and the absolute peak. Decode goes
    * through the same real JDK WAV codec as m04; the run-length scan
    * is a single forward pass per blob inside `mapPartitions`.
    *
    * Scale shape: bytes never shuffle — decode + scan are map-side per
    * partition (the m14 rule); only the fixed-width stats rows move.
    */
  def audioClipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).mapPartitions { rows =>
      val readers = audioReaders()
      rows.map { r =>
        val in = readAudio(readers, r.media)
        val n = in.getFrameLength.toInt
        val pcm = in.readAllBytes()
        var nClip = 0; var run = 0; var maxRun = 0; var peak = 0
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)) // LE signed 16-bit
          val a = math.abs(v)
          if (a > peak) peak = a
          if (a >= ClipThresh) { nClip += 1; run += 1; if (run > maxRun) maxRun = run }
          else run = 0
          i += 1
        }
        AudioClip(r.doc_id, n, nClip, maxRun, peak)
      }
    }.toDF()
      .select(col("doc_id"), col("n_samples"), col("n_clipped"),
        round(col("n_clipped").cast("double") / col("n_samples"), 6).as("clip_ratio"),
        col("max_run"), col("peak_abs"))
      .orderBy("doc_id")
  }

  /** Replays the md5 sample chain (the m04 CTE), then rebuilds runs of
    * clipped samples with the gaps-and-islands `i - row_number()` key.
    */
  val oracleAudioClipping: String =
    s"""WITH s AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(doc_id || ':a:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS v
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + doc_id % 97)) AS i) t),
       |c AS (SELECT doc_id, i, abs(v) AS a FROM s),
       |runs AS (
       |  SELECT doc_id, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM c WHERE a >= $ClipThresh),
       |rl AS (SELECT doc_id, count(*) AS run_len FROM runs GROUP BY doc_id, grp),
       |mr AS (SELECT doc_id, max(run_len) AS max_run FROM rl GROUP BY doc_id),
       |agg AS (
       |  SELECT doc_id, count(*)::INT AS n_samples,
       |         count(*) FILTER (a >= $ClipThresh)::INT AS n_clipped,
       |         max(a)::INT AS peak_abs
       |  FROM c GROUP BY doc_id)
       |SELECT agg.doc_id, n_samples, n_clipped,
       |  round(n_clipped::DOUBLE / n_samples, 6) AS clip_ratio,
       |  coalesce(mr.max_run, 0)::INT AS max_run, peak_abs
       |FROM agg LEFT JOIN mr USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // -- m14: silence-span detection (voice-activity shape) ---------------------

  /** Samples per m14 analysis window (25 @ 8 kHz ≈ 3 ms — fixture-
    * sized; the shape, not the constant, is the operator).
    */
  val SilWin = 25

  /** A window is deterministically SILENCED in the m14 fixture iff the
    * first byte of `md5("<id>:sil:<w>")` < 64 (¼ of windows) — the
    * same rule the oracle replays from hex substrings in SQL.
    */
  private def silentWin(docId: Long, w: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(s"$docId:sil:$w".getBytes("UTF-8"))(0) & 0xff) < 64
  }

  /** m14 fixture: the m04 WAV bytes with the silenced windows' samples
    * zeroed — real RIFF/PCM container, deterministic silence layout.
    */
  private[graft] def wavSilBytesOf(id: Long): Array[Byte] = {
    val s = samplesOf(id, audioLen(id))
    var i = 0
    while (i < s.length) {
      if (silentWin(id, i / SilWin)) s(i) = 0
      i += 1
    }
    val dataLen = s.length * 2
    val out = new Array[Byte](44 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(AudioRate).putInt(AudioRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var j = 0
    while (j < s.length) { bb.putShort(s(j).toShort); j += 1 }
    out
  }

  case class WinEnergy(doc_id: Long, w: Int, e: Long)

  /** m14 — silence-span detection (the voice-activity-detection shape
    * over a real decode): per clip, decode the WAV through the real
    * JDK codec, integrate energy `Σv²` per fixed [[SilWin]]-sample
    * window IN-ROW (integer-exact, so the SQL oracle reproduces it
    * bit-for-bit from the sample chain), then merge runs of zero-
    * energy windows into maximal silence spans with the t16 islands
    * idiom — decode and energy are map-side `mapPartitions` (codec
    * work Catalyst can't express), the span merge is a per-clip
    * spillable window over O(windows-per-clip) rows. At 100 TB the
    * audio bytes never shuffle: only the (doc, window, energy) triples
    * — three orders of magnitude smaller — enter the exchange.
    */
  def silenceSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wins = docIds(spark, dir).mapPartitions { ids =>
      val readers = audioReaders()
      ids.flatMap { id =>
        val in = readAudio(readers, wavSilBytesOf(id))
        val n = in.getFrameLength.toInt
        val pcm = in.readAllBytes()
        val nw = (n + SilWin - 1) / SilWin
        val e = new Array[Long](nw)
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toLong
          e(i / SilWin) += v * v
          i += 1
        }
        (0 until nw).map(w => WinEnergy(id, w, e(w)))
      }
    }.toDF()
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("w")
    wins.where(col("e") === 0L)
      .withColumn("grp", col("w") - row_number().over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(min("w").as("span_start"), max("w").as("span_end"))
      .select(col("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_wins"))
      .orderBy("doc_id", "span_start")
  }

  val oracleSilenceSpans: String =
    s"""WITH s AS (
       |  SELECT doc_id, i, i // $SilWin AS w,
       |    CASE WHEN ('0x' || substr(md5(doc_id || ':sil:' || (i // $SilWin)), 1, 2))::INT < 64
       |         THEN 0
       |         ELSE ('0x' || substr(md5(doc_id || ':a:' || (i // 8)),
       |                              (i % 8) * 4 + 1, 4))::INT - 32768 END AS v
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + doc_id % 97)) AS i) t),
       |wins AS (SELECT doc_id, w, sum(v::BIGINT * v) AS e FROM s GROUP BY 1, 2),
       |sil AS (
       |  SELECT doc_id, w,
       |         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
       |  FROM wins WHERE e = 0)
       |SELECT doc_id, min(w) AS span_start, max(w) AS span_end,
       |       max(w) - min(w) + 1 AS span_wins
       |FROM sil GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin

  // -- m16: audio near-dup fingerprinting --------------------------------------

  /** m16 fixture: clips sharing `doc_id % NdBases` share base samples;
    * odd `doc_id / NdBases` variants are amplitude-scaled ×7/8 — the
    * re-encoded-at-lower-gain copy an audio dedup must still catch.
    */
  val NdBases = 250
  /** Samples per envelope window (8 ⇒ ≤ 32 windows per fixture clip,
    * so the delta-sign fingerprint fits one BIGINT).
    */
  val EnvWin = 8
  /** Max fingerprint Hamming distance for an m16 near-dup verdict. */
  val NdHamMax = 3
  private val NdChunks = 4

  /** Truncate-toward-zero ×7/8 (matches both JVM `/` and the oracle's
    * sign-split `//` — DuckDB's `//` floors on negatives, so the SQL
    * splits on sign explicitly).
    */
  private def ndScale(v: Int): Int = if (v < 0) -((-v) * 7 / 8) else v * 7 / 8

  private[graft] def wavNdBytesOf(id: Long): Array[Byte] = {
    val base = id % NdBases
    val s = samplesOf(base, audioLen(base))
    if ((id / NdBases) % 2 == 1) {
      var i = 0
      while (i < s.length) { s(i) = ndScale(s(i)); i += 1 }
    }
    riffWav(s)
  }

  case class AudioFp(doc_id: Long, nw: Int, fp: Long)

  /** m16 — audio near-duplicate detection by acoustic fingerprint (the
    * Chromaprint/Shazam shape reduced to its Spark-relevant core): per
    * clip, decode the WAV through the real JDK codec, integrate energy
    * per [[EnvWin]]-sample window, take the energy-DELTA-SIGN bit
    * sequence as the fingerprint (gain-robust: scaling amplitude
    * scales every window energy together, so delta signs survive a
    * re-encoded-at-lower-gain copy up to truncation jitter), then find
    * pairs within Hamming ≤ [[NdHamMax]] — the audio sibling of m06's
    * image aHash banding and m15's cross-format raster join.
    *
    * Scale shape: decode + fingerprint are map-side `mapPartitions`
    * (the audio bytes never shuffle — only the (doc, nw, fp) triple,
    * 20 bytes/clip, enters any exchange). Candidate generation is the
    * d05 chunk-band pigeonhole on (chunk_idx, chunk_bits, nw): any
    * pair within Hamming ≤ 3 shares at least one of [[NdChunks]] = 4
    * untouched 8-bit chunks — LOSSLESS, never all-pairs. Verify is
    * one codegen'd `bit_count(xor)` on the banded candidates. The
    * DuckDB oracle is the algorithm-independent brute force: rebuild
    * the scaled sample chains in SQL, fingerprint, all-pairs Hamming.
    */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fps = docIds(spark, dir).mapPartitions { ids =>
      val readers = audioReaders()
      ids.map { id =>
        val in = readAudio(readers, wavNdBytesOf(id))
        val n = in.getFrameLength.toInt
        val pcm = in.readAllBytes()
        val nw = n / EnvWin
        val e = new Array[Long](nw)
        var w = 0
        while (w < nw) {
          var s = 0L
          var i = 0
          while (i < EnvWin) {
            val v = (pcm(2 * (w * EnvWin + i)) & 0xff) | (pcm(2 * (w * EnvWin + i) + 1) << 8)
            s += v.toLong * v
            i += 1
          }
          e(w) = s
          w += 1
        }
        var fp = 0L
        w = 1
        while (w < nw) {
          if (e(w) > e(w - 1)) fp |= 1L << (w - 1)
          w += 1
        }
        AudioFp(id, nw, fp)
      }
    }.toDF().localCheckpoint() // one 20-byte row per clip; feeds both band legs
    val chunks = fps.select(col("doc_id"), col("nw"), col("fp"),
        explode(sequence(lit(0), lit(NdChunks - 1))).as("c"))
      .withColumn("chunk", expr("shiftright(fp, 8 * c) & 255"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.nw") === col("b.nw") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(fa ^ fb) as int)").as("hamming"))
      .filter(col("hamming") <= NdHamMax)
      .orderBy("id_a", "id_b")
  }

  val oracleAudioNearDup: String =
    s"""WITH raw AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5((doc_id % $NdBases) || ':a:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS v0
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + (doc_id % $NdBases) % 97)) AS i) t),
       |s AS (
       |  SELECT doc_id, i,
       |    CASE WHEN (doc_id // $NdBases) % 2 = 1
       |         THEN CASE WHEN v0 < 0 THEN -(((-v0) * 7) // 8) ELSE (v0 * 7) // 8 END
       |         ELSE v0 END AS v
       |  FROM raw),
       |we AS (
       |  SELECT doc_id, i // $EnvWin AS w, sum(v::BIGINT * v) AS e
       |  FROM s GROUP BY 1, 2 HAVING count(*) = $EnvWin),
       |bits AS (
       |  SELECT doc_id, w,
       |         CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY w)
       |              THEN 1 ELSE 0 END AS b
       |  FROM we),
       |f AS (
       |  SELECT doc_id, count(*)::INT AS nw,
       |         coalesce(sum(CASE WHEN w >= 1 AND b = 1
       |                           THEN (1::BIGINT << (w - 1)) ELSE 0 END), 0)::BIGINT AS fp
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       bit_count(xor(a.fp, b.fp))::INT AS hamming
       |FROM f a JOIN f b ON a.nw = b.nw AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $NdHamMax
       |ORDER BY id_a, id_b""".stripMargin

  // -- m17: media integrity (corrupt-blob quarantine) --------------------------

  private def readIntBE(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** m17 fixture: the m02 PNGs with two deterministic damage classes —
    * every (id % 8 == 5) blob gets one byte XOR-flipped INSIDE the
    * first IDAT chunk's data (a bit-rot/bad-sector shape: structure
    * intact, payload CRC broken), every (id % 8 == 1) blob loses its
    * last 7 bytes (a truncated-upload shape: IEND cut mid-chunk).
    */
  private[graft] def pngDamagedBytesOf(id: Long): Array[Byte] = {
    val b = pngBytesOf(id)
    id % 8 match {
      case 5 =>
        var off = 8
        var done = false
        while (!done) {
          // fail fast if the generator's PNG shape ever changes: a walk
          // past the buffer or a zero-length IDAT (min(2, len-1) = -1
          // would flip a byte of the NEXT chunk's header) must abort,
          // not silently corrupt the wrong byte
          require(off + 8 <= b.length,
            s"pngDamagedBytesOf($id): chunk walk ran past ${b.length} bytes without an IDAT")
          val len = readIntBE(b, off)
          val typ = new String(b, off + 4, 4, "US-ASCII")
          require(off + 12 + len <= b.length,
            s"pngDamagedBytesOf($id): chunk $typ len=$len overruns the ${b.length}-byte blob")
          if (typ == "IDAT") {
            require(len >= 1, s"pngDamagedBytesOf($id): zero-length IDAT")
            val i = off + 8 + math.min(2, len - 1)
            b(i) = (b(i) ^ 0xff).toByte
            done = true
          } else off += 12 + len
        }
        b
      case 1 => java.util.Arrays.copyOf(b, b.length - 7)
      case _ => b
    }
  }

  /** m17 — media integrity scan (corrupt-blob quarantine, the q63
    * corrupt-record read's binary sibling): walk every PNG's chunk
    * table and validate each chunk's CRC32 over (type ‖ data) against
    * the stored value — classifying blobs as `ok`, `bad_crc` (with the
    * offending chunk type), or `truncated` (stream ends mid-chunk or
    * before IEND). A 100 TB media corpus ALWAYS contains bit-rot and
    * truncated uploads; decoding them crashes or, worse, silently
    * yields garbage pixels — curation runs exactly this scan first and
    * routes failures to a quarantine trail.
    *
    * Scale shape: pure map-side `mapPartitions` — one JDK CRC32 pass
    * per blob, no shuffle of the bytes, only the 3-column verdict
    * moves. The oracle is the fixture's ground-truth damage rule (the
    * engine must REDISCOVER the damage from the bytes alone); the
    * parser is real — a CRC bug, a bad chunk-length walk, or a missing
    * truncation guard misclassifies some blob and breaks the hash.
    */
  def mediaIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      ids.map { id =>
        val b = pngDamagedBytesOf(id)
        var status = "ok"
        var badType: String = null
        if (b.length < 8) status = "truncated"
        else {
          var off = 8
          var sawEnd = false
          while (status == "ok" && !sawEnd) {
            if (off + 8 > b.length) status = "truncated"
            else {
              val len = readIntBE(b, off)
              if (len < 0 || off + 12 + len > b.length) status = "truncated"
              else {
                val typ = new String(b, off + 4, 4, "US-ASCII")
                val crc = new java.util.zip.CRC32()
                crc.update(b, off + 4, 4 + len)
                if (crc.getValue.toInt != readIntBE(b, off + 8 + len)) {
                  status = "bad_crc"
                  badType = typ
                }
                if (typ == "IEND") sawEnd = true
                off += 12 + len
              }
            }
          }
        }
        (id, status, badType)
      }
    }.toDF("doc_id", "status", "bad_type").orderBy("doc_id")
  }

  val oracleMediaIntegrity: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 8 = 5 THEN 'bad_crc'
      |       WHEN doc_id % 8 = 1 THEN 'truncated'
      |       ELSE 'ok' END AS status,
      |  CASE WHEN doc_id % 8 = 5 THEN 'IDAT' END AS bad_type
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // -- real video leg (m05) ---------------------------------------------------

  case class EncodedVideo(doc_id: Long, media: Array[Byte])
  case class FrameStats(doc_id: Long, frame_idx: Int, n_frames: Int,
                        width: Int, height: Int, n_px: Int, sum_px: Long,
                        min_px: Int, max_px: Int, px_csv: String)

  /** Sample every [[FrameStride]]-th frame of each clip. */
  val FrameStride = 2

  private def videoDims(docId: Long): (Int, Int) =
    (6 + (docId % 5).toInt, 5 + (docId % 6).toInt)

  private def frameCount(docId: Long): Int = 4 + (docId % 5).toInt

  /** Frame `f`'s pixels: byte `i%16` of `md5("<doc_id>:v:<f>:<i/16>")` —
    * one independent md5 chain per frame.
    */
  def framePixelsOf(docId: Long, f: Int, w: Int, h: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](w * h)
    var block = -1
    var digest: Array[Byte] = null
    var i = 0
    while (i < out.length) {
      if (i / 16 != block) {
        block = i / 16
        digest = md.digest(s"$docId:v:$f:$block".getBytes("UTF-8"))
        md.reset()
      }
      out(i) = digest(i % 16) & 0xff
      i += 1
    }
    out
  }

  /** Real multi-frame "video" as a binary column: per-frame rasters →
    * one animated GIF via the JDK's ImageIO sequence writer. The
    * explicit 256-entry gray `IndexColorModel` makes the palette encode
    * bijective (a bare TYPE_BYTE_GRAY would leave palette construction
    * to the writer), so the container round-trips losslessly.
    */
  private def gifBytesOf(id: Long, icm: java.awt.image.IndexColorModel): Array[Byte] = {
    CodecInit.ready
    val (w, h) = videoDims(id)
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    var f = 0
    while (f < frameCount(id)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      img.getRaster.setSamples(0, 0, w, h, 0, framePixelsOf(id, f, w, h))
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    wr.endWriteSequence()
    ios.close()
    wr.dispose()
    bos.toByteArray
  }

  private def grayIcm(): java.awt.image.IndexColorModel = {
    val gray = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
  }

  def videoTable(spark: SparkSession, dir: String): Dataset[EncodedVideo] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      val icm = grayIcm()
      ids.map(id => EncodedVideo(id, gifBytesOf(id, icm)))
    }
  }

  /** m05 — REAL video frame sampling: the GIF container is decoded with
    * ImageIO's multi-image reader, the frame count comes from the
    * DECODED container (`getNumImages`), every [[FrameStride]]-th frame
    * is materialized, and the per-frame pixel stats + md5 come from the
    * decoded rasters. 1 clip in → k frame rows out — the fan-out
    * contract [[sampleFrames]] stubbed, now against a real container
    * format. A keyframe-seeking codec would replace only the
    * reader, not the plan.
    */
  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoTable(spark, dir).mapPartitions { rows =>
      CodecInit.ready
      rows.flatMap { r =>
        val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        rd.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media)))
        val n = rd.getNumImages(true)
        val out = (0 until n by FrameStride).map { f =>
          val img = rd.read(f)
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          var sum = 0L; var mn = 255; var mx = 0
          px.foreach { p => sum += p; if (p < mn) mn = p; if (p > mx) mx = p }
          FrameStats(r.doc_id, f, n, w, h, px.length, sum, mn, mx, px.mkString(","))
        }
        rd.dispose()
        out
      }
    }.toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"), col("n_px"), col("sum_px"),
        col("min_px"), col("max_px"), md5(col("px_csv")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  val oracleVideoFrames: String =
    s"""WITH px AS (
       |  SELECT doc_id, f, i,
       |    (6 + doc_id % 5)::INT AS width,
       |    (5 + doc_id % 6)::INT AS height,
       |    ('0x' || substr(md5(doc_id || ':v:' || f || ':' || (i // 16)),
       |                    (i % 16) * 2 + 1, 2))::BIGINT AS px
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(4 + doc_id % 5)) AS f) ff,
       |       LATERAL (SELECT unnest(range((6 + doc_id % 5) * (5 + doc_id % 6))) AS i) t
       |  WHERE f % $FrameStride = 0)
       |SELECT doc_id, f::INT AS frame_idx, (4 + doc_id % 5)::INT AS n_frames,
       |  width, height,
       |  count(*)::INT AS n_px, sum(px)::BIGINT AS sum_px,
       |  min(px)::INT AS min_px, max(px)::INT AS max_px,
       |  md5(string_agg(px::VARCHAR, ',' ORDER BY i)) AS frame_md5
       |FROM px GROUP BY doc_id, f, width, height
       |ORDER BY doc_id, frame_idx""".stripMargin

  val oracleMediaStats: String =
    s"""SELECT doc_id,
       |  octet_length(encode(text))::INT AS n_bytes,
       |  (n_chars % 640 + 1)::INT AS width,
       |  (n_chars % 480 + 1)::INT AS height,
       |  ${TextHash.phashSql("text", 5)} AS content_hash
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // -- m06: perceptual-hash image near-dup ------------------------------------

  /** dHash geometry: resize the DECODED raster to 8x8 with the same
    * integer nearest-neighbor as m03, then compare the 7 horizontally
    * adjacent pixel pairs per row -- 56 gradient-sign bits, matching
    * the engine's 56-bit hash convention (and staying far from signed
    * BIGINT overflow in the SQL oracle).
    */
  val PhashSide = 8
  val PhashBits = (PhashSide - 1) * PhashSide // 56

  /** Brightness shift applied to the twin images: a uniform +16 with
    * clamp at 255. dHash is built on gradient SIGNS, so a uniform
    * shift preserves almost every bit -- only comparisons where both
    * pixels clamp to 255 can flip -- giving the near-dup detector true
    * positives at Hamming distance 0-2 while different source images
    * stay at background distance (~28 expected bits).
    */
  val TwinBrightness = 16
  val ImgTwinOffset: Long = Dedup.TwinIdOffset

  val PhashHammingMax = 6
  val PhashChunks = 7 // > HammingMax, so >= 1 chunk matches exactly (d05 pigeonhole)
  val PhashChunkBits = PhashBits / PhashChunks // 8

  case class ImagePhash(doc_id: Long, phash: Long)

  /** Per-image 56-bit dHash, computed from the REAL PNG round trip:
    * synthesize pixels (twins brightness-shifted), encode with
    * ImageIO, decode back, resize the decoded raster, take gradient
    * signs. Entirely partition-parallel -- the phash relation is one
    * map-side pass, codec cost and all.
    */
  private def phashTable(spark: SparkSession, dir: String): Dataset[ImagePhash] = {
    import spark.implicits._
    docIds(spark, dir)
      .flatMap(id => Seq(id, id + ImgTwinOffset))
      .mapPartitions { ids =>
        CodecInit.ready
        ids.map { id =>
          val base = if (id >= ImgTwinOffset) id - ImgTwinOffset else id
          val (w, h) = dims(base)
          val raw = pixelsOf(base, w, h)
          val px0 = if (id >= ImgTwinOffset) raw.map(p => math.min(255, p + TwinBrightness)) else raw
          val enc = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          enc.getRaster.setSamples(0, 0, w, h, 0, px0)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(enc, "png", bos)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
          val src = img.getRaster.getSamples(0, 0, img.getWidth, img.getHeight, 0, null: Array[Int])
          var hash = 0L
          var y = 0
          while (y < PhashSide) {
            val rowBase = (y * h / PhashSide) * w
            var x = 0
            while (x < PhashSide - 1) {
              val cur = src(rowBase + x * w / PhashSide)
              val nxt = src(rowBase + (x + 1) * w / PhashSide)
              if (nxt > cur) hash |= 1L << (y * (PhashSide - 1) + x)
              x += 1
            }
            y += 1
          }
          ImagePhash(id, hash)
        }
      }
  }

  /** m06 -- image near-dup pairs via perceptual hash: the multimodal
    * composition of m02's real-codec decode and d05's pigeonhole
    * Hamming join. Candidate generation is the 7-chunk equi-join (a
    * pair within Hamming <= 6 must agree exactly on >= 1 of 7 chunks);
    * only candidates pay the bit_count verify. No all-pairs anything;
    * the chunk key shuffles like any hash join.
    */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sigs = phashTable(spark, dir).toDF()
      .persist() // already spread by docIds before the codec loop

    val chunkStructs = (0 until PhashChunks).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("phash"), c * PhashChunkBits)
          .bitwiseAND(lit((1L << PhashChunkBits) - 1)).as("cv"))
    }
    val chunks = sigs
      .select(col("doc_id"), col("phash"), explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("phash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunks.as("a").join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("cast(bit_count(a.phash ^ b.phash) as int)").as("hamming"))
      .filter(col("hamming") <= PhashHammingMax)
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** The oracle replays the whole chain in SQL: pixel synthesis (with
    * the twin brightness clamp), the 8x8 integer resize, gradient-sign
    * bits, chunking and the Hamming verify -- so a codec, resize or
    * join bug all break the hash match.
    */
  val oracleImageNearDup: String =
    s"""WITH ids AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL SELECT doc_id + $ImgTwinOffset FROM documents),
       |geo AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id >= $ImgTwinOffset THEN doc_id - $ImgTwinOffset ELSE doc_id END AS base
       |  FROM ids),
       |px AS (
       |  SELECT g.doc_id,
       |         (8 + g.base % 9)::INT AS width, (8 + g.base % 7)::INT AS height, t.i,
       |         CASE WHEN g.doc_id >= $ImgTwinOffset
       |           THEN least(255, ('0x' || substr(md5(g.base || ':' || (t.i // 16)),
       |                                           (t.i % 16) * 2 + 1, 2))::BIGINT + $TwinBrightness)
       |           ELSE ('0x' || substr(md5(g.base || ':' || (t.i // 16)),
       |                                (t.i % 16) * 2 + 1, 2))::BIGINT END AS px
       |  FROM geo g,
       |       LATERAL (SELECT unnest(range((8 + g.base % 9) * (8 + g.base % 7))) AS i) t),
       |res AS (
       |  SELECT d.doc_id, d.j, p.px
       |  FROM (SELECT doc_id, width, height, u.j,
       |          ((u.j // $PhashSide) * height // $PhashSide) * width
       |            + ((u.j % $PhashSide) * width // $PhashSide) AS src_i
       |        FROM (SELECT DISTINCT doc_id, width, height FROM px),
       |             LATERAL (SELECT unnest(range(${PhashSide * PhashSide})) AS j) u) d
       |  JOIN px p ON p.doc_id = d.doc_id AND p.i = d.src_i),
       |sig AS (
       |  SELECT r1.doc_id,
       |         sum(CASE WHEN r2.px > r1.px
       |               THEN (1::BIGINT << ((r1.j // $PhashSide) * ${PhashSide - 1} + (r1.j % $PhashSide)))
       |               ELSE 0 END)::BIGINT AS phash
       |  FROM res r1 JOIN res r2 ON r2.doc_id = r1.doc_id AND r2.j = r1.j + 1
       |  WHERE r1.j % $PhashSide < ${PhashSide - 1}
       |  GROUP BY r1.doc_id),
       |chunks AS (
       |  SELECT doc_id, phash, u.c, (phash >> (u.c * $PhashChunkBits)) & ${(1L << PhashChunkBits) - 1} AS cv
       |  FROM sig, LATERAL (SELECT unnest(range($PhashChunks)) AS c) u)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |       bit_count(xor(a.phash, b.phash))::INT AS hamming
       |FROM chunks a JOIN chunks b
       |  ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHammingMax
       |ORDER BY id_a, id_b""".stripMargin

  // -- m07: audio downsample (the resize analog for audio) --------------------

  case class ResampledAudio(doc_id: Long, sample_rate: Int, n_samples: Int,
                            sum_abs: Long, min_s: Int, max_s: Int,
                            samples_csv: String)

  /** m07 — REAL audio downsample 2:1: decode the WAV binary column
    * (same real `javax.sound.sampled` path as m04), average each
    * adjacent sample pair (`(s₂ⱼ + s₂ⱼ₊₁) / 2` — the 2-tap box
    * filter; TRUNCATING division, matching DuckDB's integer `//`,
    * which truncates toward zero — measured, not floor),
    * re-encode the half-rate signal through the codec,
    * and emit the stats of a SECOND decode — a full
    * decode→DSP→encode→decode round trip per row, so a header,
    * endianness or filter bug breaks the oracle hash. An odd trailing
    * sample is dropped (`n/2` output samples), as any 2:1 decimator
    * must.
    *
    * Scale shape: identical to m03/m04 — partition-parallel
    * `mapPartitions` over the binary column, no shuffle before the
    * presentation sort; codec work adds executors at 100 TB.
    */
  def audioResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val outRate = AudioRate / 2
    audioTable(spark, dir).mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(outRate.toFloat, 16, 1, true, false)
      val readers = audioReaders() // JVM-cached SPI handles (see AudioSpi)
      val writers = audioWriters()
      rows.map { r =>
        val in = readAudio(readers, r.media)
        val pcm = in.readAllBytes()
        val n = in.getFrameLength.toInt / 2
        val down = new Array[Byte](n * 2)
        var j = 0
        while (j < n) {
          val a = (pcm(4 * j) & 0xff) | (pcm(4 * j + 1) << 8)
          val b = (pcm(4 * j + 2) & 0xff) | (pcm(4 * j + 3) << 8)
          val v = (a + b) / 2
          down(2 * j) = (v & 0xff).toByte
          down(2 * j + 1) = ((v >> 8) & 0xff).toByte
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        writeWave(writers,
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(down), fmt, n.toLong), bos)
        // decode AGAIN from the fresh WAV bytes: stats come from what a
        // downstream consumer of the re-encoded column would read
        val in2 = readAudio(readers, bos.toByteArray)
        val rate2 = in2.getFormat.getSampleRate.toInt
        val pcm2 = in2.readAllBytes()
        val m = in2.getFrameLength.toInt
        var sumAbs = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        val vals = new Array[Int](m)
        var i = 0
        while (i < m) {
          val v = (pcm2(2 * i) & 0xff) | (pcm2(2 * i + 1) << 8)
          vals(i) = v
          sumAbs += math.abs(v)
          if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        ResampledAudio(r.doc_id, rate2, m, sumAbs, mn, mx, vals.mkString(","))
      }
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("sum_abs"), col("min_s"), col("max_s"),
        md5(col("samples_csv")).as("samples_md5"))
      .orderBy("doc_id")
  }

  // -- m08: heterogeneous media sniff + dispatch ------------------------------

  case class SniffedMedia(doc_id: Long, detected: String, n_units: Int, metric: Long)

  /** m08 — format sniffing over a MIXED binary column: each doc
    * carries ONE of the three real formats (doc_id mod 3 → PNG / WAV /
    * GIF), and the reader knows nothing about the assignment — it
    * detects the format from the blob's magic bytes (\x89PNG, RIFF,
    * GIF8) and dispatches to the matching real decoder. This is the
    * actual shape of a 100 TB media lake: heterogeneous blobs in one
    * column, format resolved per row at scan time, one codec-specific
    * metric emitted per kind (pixel sum / |sample| sum / frame-0 pixel
    * sum). The oracle re-derives the assignment arithmetically and
    * replays each kind's synthesis chain — a sniffing bug mislabels a
    * row and breaks the hash.
    */
  def mediaSniff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = docIds(spark, dir).mapPartitions { ids =>
      val icm = grayIcm()
      ids.map { id =>
        val bytes = (id % 3) match {
          case 0 => pngBytesOf(id)
          case 1 => wavBytesOf(id)
          case _ => gifBytesOf(id, icm)
        }
        (id, bytes)
      }
    }
    blobs.mapPartitions { rows =>
      CodecInit.ready
      val readers = audioReaders() // JVM-cached SPI handles (see AudioSpi)
      rows.map { case (id, b) =>
        val detected =
          if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
          else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "wav"
          else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
          else "unknown"
        detected match {
          case "png" =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
            val px = img.getRaster.getSamples(0, 0, img.getWidth, img.getHeight, 0, null: Array[Int])
            SniffedMedia(id, detected, px.length, px.foldLeft(0L)(_ + _))
          case "wav" =>
            val in = readAudio(readers, b)
            val pcm = in.readAllBytes()
            val n = in.getFrameLength.toInt
            var sumAbs = 0L
            var i = 0
            while (i < n) {
              sumAbs += math.abs((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)); i += 1
            }
            SniffedMedia(id, detected, n, sumAbs)
          case "gif" =>
            val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
            rd.setInput(javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(b)))
            val n = rd.getNumImages(true)
            val f0 = rd.read(0)
            val px = f0.getRaster.getSamples(0, 0, f0.getWidth, f0.getHeight, 0, null: Array[Int])
            rd.dispose()
            SniffedMedia(id, detected, n, px.foldLeft(0L)(_ + _))
          case _ => SniffedMedia(id, detected, 0, 0L)
        }
      }
    }.toDF().orderBy("doc_id")
  }

  val oracleMediaSniff: String =
    s"""WITH png AS (
       |  SELECT doc_id, 'png' AS detected,
       |         ((8 + doc_id % 9) * (8 + doc_id % 7))::INT AS n_units,
       |         sum(('0x' || substr(md5(doc_id || ':' || (i // 16)),
       |                             (i % 16) * 2 + 1, 2))::BIGINT)::BIGINT AS metric
       |  FROM documents,
       |       LATERAL (SELECT unnest(range((8 + doc_id % 9) * (8 + doc_id % 7))) AS i) t
       |  WHERE doc_id % 3 = 0
       |  GROUP BY doc_id),
       |wav AS (
       |  SELECT doc_id, 'wav' AS detected,
       |         (160 + doc_id % 97)::INT AS n_units,
       |         sum(abs(('0x' || substr(md5(doc_id || ':a:' || (i // 8)),
       |                                 (i % 8) * 4 + 1, 4))::INT - 32768))::BIGINT AS metric
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(160 + doc_id % 97)) AS i) t
       |  WHERE doc_id % 3 = 1
       |  GROUP BY doc_id),
       |gif AS (
       |  SELECT doc_id, 'gif' AS detected,
       |         (4 + doc_id % 5)::INT AS n_units,
       |         sum(('0x' || substr(md5(doc_id || ':v:0:' || (i // 16)),
       |                             (i % 16) * 2 + 1, 2))::BIGINT)::BIGINT AS metric
       |  FROM documents,
       |       LATERAL (SELECT unnest(range((6 + doc_id % 5) * (5 + doc_id % 6))) AS i) t
       |  WHERE doc_id % 3 = 2
       |  GROUP BY doc_id)
       |SELECT * FROM png
       |UNION ALL SELECT * FROM wav
       |UNION ALL SELECT * FROM gif
       |ORDER BY doc_id""".stripMargin

  // -- m15: cross-format duplicate detection ----------------------------------

  case class XfmtSig(doc_id: Long, fmt: String, width: Int, height: Int, sig: String)

  val XfmtIdOffset: Long = 10 * Dedup.TwinIdOffset
  val XfmtEvery = 4L

  /** m15 — cross-FORMAT image dedup: the same picture re-uploaded
    * behind a different container (every [[XfmtEvery]]-th image also
    * exists as a single-frame GIF re-encode of the PNG's exact
    * grayscale raster) must be caught by content, not by bytes — a
    * byte-level d01 sees two unrelated blobs. The reader sniffs each
    * blob's magic (the m08 dispatch), decodes through the REAL
    * matching codec, and joins on the md5 of the decoded
    * (width, height, pixels) tuple; PNG and 256-gray-palette GIF are
    * both lossless, so a true re-encode matches bit-for-bit.
    *
    * The oracle states the expected pair set arithmetically — the
    * engine only reproduces it by actually decoding both containers
    * to identical rasters, so a codec/palette/sniff bug breaks the
    * join. Scale shape: decode is per-row map-side (the m02/m08
    * discipline — pixels never shuffle, only the 16-byte signature
    * enters the exchange), and the pair join is an equi-join on the
    * signature.
    */
  def crossFormatDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = docIds(spark, dir).mapPartitions { ids =>
      val icm = grayIcm()
      ids.flatMap { id =>
        val png = (id, pngBytesOf(id))
        if (id % XfmtEvery == 0) Seq(png, (id + XfmtIdOffset, gifStillBytesOf(id, icm)))
        else Seq(png)
      }
    }
    val sigs = blobs.mapPartitions { rows =>
      CodecInit.ready
      rows.map { case (id, b) =>
        val fmt =
          if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P') "png"
          else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
          else "unknown"
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        val px = img.getRaster.getSamples(0, 0, img.getWidth, img.getHeight, 0, null: Array[Int])
        val bb = java.nio.ByteBuffer.allocate(px.length * 4 + 8)
        bb.putInt(img.getWidth).putInt(img.getHeight)
        px.foreach(bb.putInt)
        val sig = java.security.MessageDigest.getInstance("MD5")
          .digest(bb.array()).map("%02x".format(_)).mkString
        XfmtSig(id, fmt, img.getWidth, img.getHeight, sig)
      }
    }.toDF().localCheckpoint() // both join legs read it; decode once
    sigs.filter(col("fmt") === "png").as("a")
      .join(sigs.filter(col("fmt") === "gif").as("b"), col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("id_orig"), col("b.doc_id").as("id_reupload"),
        col("a.width").as("width"), col("a.height").as("height"))
      .orderBy("id_orig")
  }

  /** A 256-gray single-frame GIF of the SAME raster [[pngBytesOf]]
    * encodes — the lossless "re-upload".
    */
  private def gifStillBytesOf(id: Long, icm: java.awt.image.IndexColorModel): Array[Byte] = {
    CodecInit.ready
    val (w, h) = dims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setSamples(0, 0, w, h, 0, pixelsOf(id, w, h))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  val oracleCrossFormatDedup: String =
    s"""SELECT doc_id AS id_orig, doc_id + $XfmtIdOffset AS id_reupload,
       |       (8 + doc_id % 9)::INT AS width, (8 + doc_id % 7)::INT AS height
       |FROM documents
       |WHERE doc_id % $XfmtEvery = 0
       |ORDER BY id_orig""".stripMargin

  // -- m09: scene-change detection over decoded video frames ------------------

  case class SceneDelta(doc_id: Long, frame_idx: Int, n_frames: Int,
                        n_px: Int, diff_energy: Long)

  /** m09 — scene-change detection: every frame of the GIF container is
    * decoded (m05 samples every 2nd; a cut detector cannot skip), and
    * each consecutive pair is scored by its absolute-difference energy
    * `Σ|px_f(i) − px_{f−1}(i)|`. A frame is flagged as a cut when the
    * mean absolute difference exceeds 256/3 ≈ 85.3 — spelled as the
    * integer comparison `3·energy > 256·n_px` so the flag is exact in
    * both engines. This is the keyframe-selection primitive of a video
    * training pipeline (dedup near-identical frames, keep cuts).
    *
    * Scale shape (100 TB): per-clip local work inside one
    * `mapPartitions` — the frame pairs never leave the task, nothing
    * shuffles before the presentation sort; codec-bound and
    * embarrassingly partition-parallel like m02-m05.
    */
  def sceneChanges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoTable(spark, dir).mapPartitions { rows =>
      CodecInit.ready
      rows.flatMap { r =>
        val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        rd.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media)))
        val n = rd.getNumImages(true)
        var prev: Array[Int] = null
        val out = (0 until n).flatMap { f =>
          val img = rd.read(f)
          val px = img.getRaster.getSamples(0, 0, img.getWidth, img.getHeight, 0,
            null: Array[Int])
          val res =
            if (f == 0) None
            else {
              var s = 0L; var i = 0
              while (i < px.length) { s += math.abs(px(i) - prev(i)); i += 1 }
              Some(SceneDelta(r.doc_id, f, n, px.length, s))
            }
          prev = px
          res
        }
        rd.dispose()
        out
      }
    }.toDF()
      .withColumn("is_cut", col("diff_energy") * 3 > col("n_px").cast("long") * 256)
      .orderBy("doc_id", "frame_idx")
  }

  /** The oracle replays both frames' md5 pixel chains and joins them on
    * the pixel index — a decoder or compositing bug on ANY frame breaks
    * the energy sum.
    */
  val oracleSceneChanges: String =
    s"""WITH px AS (
       |  SELECT doc_id, f, i,
       |    ('0x' || substr(md5(doc_id || ':v:' || f || ':' || (i // 16)),
       |                    (i % 16) * 2 + 1, 2))::BIGINT AS px
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(4 + doc_id % 5)) AS f) ff,
       |       LATERAL (SELECT unnest(range((6 + doc_id % 5) * (5 + doc_id % 6))) AS i) t),
       |d AS (
       |  SELECT a.doc_id, a.f AS frame_idx, (4 + a.doc_id % 5)::INT AS n_frames,
       |         count(*)::INT AS n_px, sum(abs(a.px - b.px))::BIGINT AS diff_energy
       |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i AND b.f = a.f - 1
       |  GROUP BY a.doc_id, a.f)
       |SELECT doc_id, frame_idx::INT AS frame_idx, n_frames, n_px, diff_energy,
       |       diff_energy * 3 > n_px::BIGINT * 256 AS is_cut
       |FROM d ORDER BY doc_id, frame_idx""".stripMargin

  // -- real MJPEG/AVI video leg (m11) ----------------------------------------

  case class EncodedAvi(doc_id: Long, media: Array[Byte])
  case class MjpegFrame(doc_id: Long, frame_idx: Int, n_frames: Int,
                        width: Int, height: Int, n_px: Int,
                        max_abs_err: Int, within_tol: Boolean)

  /** Per-frame smooth source raster (the m10 pattern per frame): a
    * gradient a lossy DCT codec reproduces within [[JpegTol]].
    */
  def smoothFramePixelsOf(docId: Long, f: Int, w: Int, h: Int): Array[Int] = {
    val base = ((docId * 37 + f * 53) % 193).toInt
    val sx = 1 + (docId % 5).toInt
    val sy = 1 + ((docId + f) % 3).toInt
    Array.tabulate(w * h)(k => math.min(255, base + sx * (k % w) + sy * (k / w)))
  }

  private def mjpegFrameBytes(id: Long, f: Int): Array[Byte] = {
    CodecInit.ready
    val (w, h) = videoDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, smoothFramePixelsOf(id, f, w, h))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Real RIFF/AVI container around the per-frame JPEG payloads:
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * 00dc…) idx1)` with little-endian sizes, even-byte chunk padding,
    * an MJPG `vids` stream header, and an `idx1` keyframe index whose
    * offsets are relative to the `movi` fourcc — the standard layout a
    * real MJPEG consumer expects.
    */
  private[graft] def aviBytesOf(id: Long): Array[Byte] = {
    val (w, h) = videoDims(id)
    val n = frameCount(id)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id4) ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(body.length + 4) ++ fcc(kind) ++ body

    val avih = chunk("avih",
      le32(100000) ++ le32(0) ++ le32(0) ++ le32(0x10 /* AVIF_HASINDEX */) ++
        le32(n) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(n) ++ le32(0) ++
        le32(-1) ++ le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ fcc("MJPG") ++
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val payloads = (0 until n).map(f => mjpegFrameBytes(id, f))
    val frames = payloads.map(chunk("00dc", _))
    // idx1 offsets: position of each frame's '00dc' fourcc relative to
    // the 'movi' fourcc (offset 4 = first chunk, right after the kind);
    // the entry length is the UNPADDED payload size, not the chunk size
    val offsets = frames.scanLeft(4)((acc, c) => acc + c.length).init
    val moviBody = frames.toArray.flatten
    val movi = list("movi", moviBody)
    val idx1 = chunk("idx1",
      frames.indices.toArray.flatMap { f =>
        fcc("00dc") ++ le32(0x10 /* AVIIF_KEYFRAME */) ++
          le32(offsets(f)) ++ le32(payloads(f).length)
      })
    val riffBody = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  def aviTable(spark: SparkSession, dir: String): Dataset[EncodedAvi] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions(ids => ids.map(id => EncodedAvi(id, aviBytesOf(id))))
  }

  /** Minimal RIFF walker: top-level (and LIST-nested) chunk positions. */
  private def riffChunks(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = (b(pos + 4) & 0xff) | ((b(pos + 5) & 0xff) << 8) |
          ((b(pos + 6) & 0xff) << 16) | ((b(pos + 7) & 0xff) << 24)
        val body = pos + 8
        pos = body + len + (len & 1)
        (id, body, len)
      }
    }

  private def u32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** Parsed AVI: header frame count and the idx1-indexed frame chunks.
    * Frames are located by SEEKING via the idx1 offsets, not by walking
    * `movi` — the access pattern a sampling reader needs (decode 1-in-k
    * frames of a long clip without touching the rest).
    */
  private[graft] def parseAvi(bytes: Array[Byte]): (Int, Int, Int, Array[(Int, Int)]) = {
    require(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not a RIFF/AVI file")
    var nFrames = -1; var w = -1; var h = -1
    var moviFcc = -1
    var idx: Array[(Int, Int)] = null
    riffChunks(bytes, 12, bytes.length).foreach {
      case ("LIST", body, len) =>
        new String(bytes, body, 4, "US-ASCII") match {
          case "hdrl" =>
            riffChunks(bytes, body + 4, body + len).foreach {
              case ("avih", ab, _) =>
                nFrames = u32(bytes, ab + 16); w = u32(bytes, ab + 32); h = u32(bytes, ab + 36)
              case _ => ()
            }
          case "movi" => moviFcc = body
          case _ => ()
        }
      case ("idx1", body, len) =>
        idx = Array.tabulate(len / 16) { i =>
          val e = body + i * 16
          (u32(bytes, e + 8), u32(bytes, e + 12)) // (offset from movi fourcc, payload len)
        }
      case _ => ()
    }
    require(nFrames >= 0 && moviFcc >= 0 && idx != null, "missing avih/movi/idx1")
    require(idx.length == nFrames, s"idx1 has ${idx.length} entries, header says $nFrames")
    (nFrames, w, h, idx.map { case (off, len) => (moviFcc + off + 8, len) })
  }

  /** m11 — REAL video container sampling: MJPEG-in-AVI, the simplest
    * container a real video pipeline meets, riding m10's real lossy
    * JPEG decoder frame-by-frame. The RIFF structure (`hdrl`/`avih`,
    * `movi`, `idx1`) is parsed by hand, every [[FrameStride]]-th frame
    * is located via the `idx1` KEYFRAME INDEX (seek, not scan — the
    * 1-in-k sampling access pattern), and each sampled frame's JPEG
    * payload is decoded with the stock JDK codec. Structural fields
    * (header frame count, decoded dimensions, pixel count) are
    * bit-checked by the oracle; pixel fidelity ships as the m10-style
    * within-tolerance predicate — the honest projection a lossy codec
    * admits. This retires the "video is a stub" list: GIF (m05/m09)
    * covers lossless multi-frame, m11 covers the lossy-payload
    * container; no pure-JDK H.264/MP3 codec exists, so those formats
    * remain explicitly out of scope rather than faked.
    *
    * Scale shape (100 TB): one `mapPartitions` over the clip column —
    * container parse + sampled decodes stay inside the task,
    * codec-bound and partition-parallel; nothing shuffles before the
    * presentation sort.
    */
  def mjpegFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    aviTable(spark, dir).mapPartitions { rows =>
      CodecInit.ready
      rows.flatMap { r =>
        val (n, _, _, frames) = parseAvi(r.media)
        (0 until n by FrameStride).map { f =>
          val (at, len) = frames(f)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media, at, len))
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
          val src = smoothFramePixelsOf(r.doc_id, f, w, h)
          var maxErr = 0
          var i = 0
          while (i < px.length) {
            val e = math.abs(px(i) - src(i)); if (e > maxErr) maxErr = e; i += 1
          }
          MjpegFrame(r.doc_id, f, n, w, h, px.length, maxErr, maxErr <= JpegTol)
        }
      }
    }.toDF()
      .select("doc_id", "frame_idx", "n_frames", "width", "height", "n_px", "within_tol")
      .orderBy("doc_id", "frame_idx")
  }

  val oracleMjpegFrames: String =
    s"""SELECT doc_id, f::INT AS frame_idx, (4 + doc_id % 5)::INT AS n_frames,
       |  (6 + doc_id % 5)::INT AS width, (5 + doc_id % 6)::INT AS height,
       |  ((6 + doc_id % 5) * (5 + doc_id % 6))::INT AS n_px,
       |  true AS within_tol
       |FROM documents,
       |     LATERAL (SELECT unnest(range(4 + doc_id % 5)) AS f) t
       |WHERE f % $FrameStride = 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** The oracle rebuilds the decimated signal from the md5 sample
    * chain: pair (2j, 2j+1), truncate-divide the sum by 2 (DuckDB's
    * integer `//` truncates toward zero, like JVM int division).
    */
  val oracleAudioResample: String =
    s"""WITH s AS (
       |  SELECT doc_id, j,
       |    (('0x' || substr(md5(doc_id || ':a:' || ((2 * j) // 8)),
       |                     ((2 * j) % 8) * 4 + 1, 4))::INT - 32768
       |     + ('0x' || substr(md5(doc_id || ':a:' || ((2 * j + 1) // 8)),
       |                       ((2 * j + 1) % 8) * 4 + 1, 4))::INT - 32768) // 2 AS v
       |  FROM documents,
       |       LATERAL (SELECT unnest(range((160 + doc_id % 97) // 2)) AS j) t)
       |SELECT doc_id,
       |  ${AudioRate / 2} AS sample_rate,
       |  count(*)::INT AS n_samples,
       |  sum(abs(v))::BIGINT AS sum_abs,
       |  min(v)::INT AS min_s, max(v)::INT AS max_s,
       |  md5(string_agg(v::VARCHAR, ',' ORDER BY j)) AS samples_md5
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- companded audio leg (m12): G.711 µ-law --------------------------------

  case class UlawStats(doc_id: Long, n_samples: Int, sum_abs: Long, sum_sq: Long,
                       min_s: Int, max_s: Int, samples_csv: String)

  /** G.711 µ-law compand, public-spec closed form (ITU-T G.711): clip
    * magnitude to 32635, add the 0x84 bias, segment = position of the
    * top set bit, 4-bit mantissa, all bits inverted on the wire. Used
    * only by the fixture GENERATOR — the decode side under test is the
    * real JDK codec, whose expansion UlawSpec pins byte-for-byte
    * against [[ulawDecode]] over the full 256-value domain.
    */
  private[graft] def ulawEncode(pcm: Int): Int = {
    var s = pcm
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mantissa) & 0xff
  }

  /** The G.711 µ-law expansion the JDK codec implements. */
  private[graft] def ulawDecode(u: Int): Int = {
    val v = ~u & 0xff
    val exp = (v >> 4) & 7
    val man = v & 0x0f
    val mag = (((man << 3) + 0x84) << exp) - 0x84
    if ((v & 0x80) != 0) -mag else mag
  }

  private def ulawLen(docId: Long): Int = 120 + (docId % 83).toInt

  /** G.711 A-law compress (ITU-T G.711 / CCITT reference shape):
    * 13-bit magnitude, 8 segments with per-segment mantissa shifts,
    * even-bit inversion (0x55 / 0xD5) on the wire. Fixture-generator
    * only; AlawSpec pins the JDK expansion against [[alawDecode]] over
    * the full 256-value domain.
    */
  private[graft] def alawEncode(pcm: Int): Int = {
    var p = pcm >> 3 // 16-bit → 13-bit
    val mask = if (p >= 0) 0xd5 else { p = -p - 1; 0x55 }
    val seg =
      if (p <= 0x1f) 0 else if (p <= 0x3f) 1 else if (p <= 0x7f) 2
      else if (p <= 0xff) 3 else if (p <= 0x1ff) 4 else if (p <= 0x3ff) 5
      else if (p <= 0x7ff) 6 else if (p <= 0xfff) 7 else 8
    if (seg >= 8) 0x7f ^ mask
    else {
      val mant = if (seg < 2) (p >> 1) & 0x0f else (p >> seg) & 0x0f
      ((seg << 4) | mant) ^ mask
    }
  }

  /** The G.711 A-law expansion the JDK codec implements. Unlike
    * µ-law, the canonical A-law table already spans the 16-bit range
    * (peak ±32256 at segment 7) — the per-segment `<< (seg−1)` IS the
    * scaling; no further shift (pinned against the JDK over all 256
    * bytes in AlawSpec).
    */
  private[graft] def alawDecode(a0: Int): Int = {
    val a = (a0 & 0xff) ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t += 0x108; t <<= (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Real companded audio as a binary column: 8-bit G.711 bytes in a
    * RIFF/WAVE container (fmt tag 7 = µ-law / 6 = A-law, cbSize 0,
    * plus the `fact` chunk non-PCM WAV requires). Header hand-written
    * for the same provider-lock reason as [[wavBytesOf]]; the decode
    * under test is the real JDK `FormatConversionProvider` codec.
    */
  private def compandedWavBytes(s: Array[Int], fmtTag: Short, enc: Int => Int): Array[Byte] = {
    val dataLen = s.length
    val out = new Array[Byte](58 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(50 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(fmtTag).putShort(1)            // compander, mono
      .putInt(AudioRate).putInt(AudioRate)     // sample rate, byte rate
      .putShort(1).putShort(8)                 // block align, bits/sample
      .putShort(0)                             // cbSize
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(s.length)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < s.length) {
      bb.put(enc(s(i)).toByte)
      i += 1
    }
    out
  }

  private[graft] def ulawBytesOf(id: Long): Array[Byte] =
    compandedWavBytes(samplesChain(id, ulawLen(id), "u"), 7, ulawEncode)

  private def alawLen(docId: Long): Int = 110 + (docId % 71).toInt

  private[graft] def alawBytesOf(id: Long): Array[Byte] =
    compandedWavBytes(samplesChain(id, alawLen(id), "w"), 6, alawEncode)

  def ulawTable(spark: SparkSession, dir: String): Dataset[EncodedAudio] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      ids.map(id => EncodedAudio(id, ulawBytesOf(id)))
    }
  }

  def alawTable(spark: SparkSession, dir: String): Dataset[EncodedAudio] = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      ids.map(id => EncodedAudio(id, alawBytesOf(id)))
    }
  }

  private def toPcm16(ais: javax.sound.sampled.AudioInputStream)
      : javax.sound.sampled.AudioInputStream = {
    val f = ais.getFormat
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      f.getSampleRate, 16, f.getChannels, 2 * f.getChannels, f.getSampleRate, false)
    AudioSpi.converters.find(_.isConversionSupported(target, f)) match {
      case Some(c) => c.getAudioInputStream(target, ais)
      case None    => throw new IllegalArgumentException(
        s"no SPI converter expands ${f.getEncoding} to PCM16")
    }
  }

  /** m12 — REAL lossy-compander decode: the µ-law binary column is
    * container-parsed by the JDK WAV reader and EXPANDED to PCM16 by
    * the real JDK G.711 conversion codec; stats and the md5 come from
    * the expanded samples. Companding is deterministic (a 256-entry
    * table, unlike m10's DCT), so unlike JPEG the lossy round-trip is
    * still exactly SQL-replayable: the oracle re-derives the source
    * PCM from the md5 chain and applies the G.711 compress+expand
    * closed form. Scale shape: identical to m04 — partition-parallel
    * decode, one in-row pass, zero shuffle before the final sort.
    */
  def ulawStats(spark: SparkSession, dir: String): DataFrame =
    compandedStats(spark, ulawTable(spark, dir))

  /** m13 — the A-law sibling of m12: same container parse + real JDK
    * expansion, the G.711 A-law closed form replayed by the oracle
    * (AlawSpec pins the 256-value wire-domain parity).
    */
  def alawStats(spark: SparkSession, dir: String): DataFrame =
    compandedStats(spark, alawTable(spark, dir))

  private def compandedStats(spark: SparkSession,
      tbl: Dataset[EncodedAudio]): DataFrame = {
    import spark.implicits._
    tbl.mapPartitions { rows =>
      val readers = audioReaders()
      rows.map { r =>
        val in = toPcm16(readAudio(readers, r.media))
        val pcm = in.readAllBytes()
        val n = pcm.length / 2
        var sumAbs = 0L; var sumSq = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        val vals = new Array[Int](n)
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)) // LE signed 16-bit
          vals(i) = v
          sumAbs += math.abs(v); sumSq += v.toLong * v
          if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        UlawStats(r.doc_id, n, sumAbs, sumSq, mn, mx, vals.mkString(","))
      }
    }.toDF()
      .select(col("doc_id"), col("n_samples"), col("sum_abs"), col("sum_sq"),
        col("min_s"), col("max_s"), md5(col("samples_csv")).as("samples_md5"))
      .orderBy("doc_id")
  }

  /** m12 oracle — the G.711 compress+expand closed form over the same
    * md5-chain PCM, in SQL: clip+bias, segment by range CASE, 4-bit
    * mantissa, expansion `(((m<<3)+132)<<seg)-132` with the source
    * sign. The wire byte (bit inversion) cancels in the round trip, so
    * the oracle needs only the magnitude path.
    */
  val oracleUlawStats: String =
    s"""WITH raw AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(doc_id || ':u:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS pcm
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(120 + doc_id % 83)) AS i) t),
       |enc AS (
       |  SELECT doc_id, i,
       |    pcm < 0 AS neg,
       |    least(CASE WHEN pcm < 0 THEN -pcm ELSE pcm END, 32635) + 132 AS sb
       |  FROM raw),
       |seg AS (
       |  SELECT doc_id, i, neg, sb,
       |    CASE WHEN sb >= 16384 THEN 7 WHEN sb >= 8192 THEN 6
       |         WHEN sb >= 4096 THEN 5 WHEN sb >= 2048 THEN 4
       |         WHEN sb >= 1024 THEN 3 WHEN sb >= 512 THEN 2
       |         WHEN sb >= 256 THEN 1 ELSE 0 END AS e
       |  FROM enc),
       |dec AS (
       |  SELECT doc_id, i,
       |    CASE WHEN neg THEN -(((((sb >> (e + 3)) & 15) * 8 + 132) << e) - 132)
       |         ELSE (((((sb >> (e + 3)) & 15) * 8 + 132) << e) - 132) END AS v
       |  FROM seg)
       |SELECT doc_id,
       |  count(*)::INT AS n_samples,
       |  sum(abs(v))::BIGINT AS sum_abs,
       |  sum(v::BIGINT * v)::BIGINT AS sum_sq,
       |  min(v)::INT AS min_s, max(v)::INT AS max_s,
       |  md5(string_agg(v::VARCHAR, ',' ORDER BY i)) AS samples_md5
       |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** m13 oracle — G.711 A-law compress+expand closed form in SQL:
    * 13-bit floor shift (DuckDB `//` truncates toward zero, so the
    * negative side is `-((-pcm+7)//8)`), segment CASE, per-segment
    * mantissa shift, expansion `(mant·16 + {8|264}) << (seg−1)` scaled
    * to 16-bit. The 0x55/0xD5 wire inversion cancels in the round
    * trip, so only the magnitude path is replayed.
    */
  val oracleAlawStats: String =
    s"""WITH raw AS (
       |  SELECT doc_id, i,
       |    ('0x' || substr(md5(doc_id || ':w:' || (i // 8)),
       |                    (i % 8) * 4 + 1, 4))::INT - 32768 AS pcm
       |  FROM documents,
       |       LATERAL (SELECT unnest(range(110 + doc_id % 71)) AS i) t),
       |enc AS (
       |  SELECT doc_id, i, pcm < 0 AS neg,
       |    CASE WHEN pcm < 0 THEN ((-pcm + 7) // 8) - 1 ELSE pcm // 8 END AS m
       |  FROM raw),
       |seg AS (
       |  SELECT doc_id, i, neg, m,
       |    CASE WHEN m <= 31 THEN 0 WHEN m <= 63 THEN 1 WHEN m <= 127 THEN 2
       |         WHEN m <= 255 THEN 3 WHEN m <= 511 THEN 4 WHEN m <= 1023 THEN 5
       |         WHEN m <= 2047 THEN 6 ELSE 7 END AS e
       |  FROM enc),
       |mant AS (
       |  SELECT doc_id, i, neg, e,
       |    CASE WHEN e < 2 THEN (m >> 1) & 15 ELSE (m >> e) & 15 END AS q
       |  FROM seg),
       |dec AS (
       |  SELECT doc_id, i,
       |    CASE WHEN neg THEN -v16 ELSE v16 END AS v
       |  FROM (
       |    SELECT doc_id, i, neg,
       |      CASE WHEN e = 0 THEN q * 16 + 8
       |           WHEN e = 1 THEN q * 16 + 264
       |           ELSE (q * 16 + 264) << (e - 1) END AS v16
       |    FROM mant) x)
       |SELECT doc_id,
       |  count(*)::INT AS n_samples,
       |  sum(abs(v))::BIGINT AS sum_abs,
       |  sum(v::BIGINT * v)::BIGINT AS sum_sq,
       |  min(v)::INT AS min_s, max(v)::INT AS max_s,
       |  md5(string_agg(v::VARCHAR, ',' ORDER BY i)) AS samples_md5
       |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- EXIF metadata leg (m18) ------------------------------------------------

  private def exifOrientation(id: Long): Int = 1 + (id % 8).toInt
  private def exifMake(id: Long): String = "cam" + (id % 5)

  /** m18 fixture: the m10 JPEG with a REAL EXIF APP1 segment spliced
    * after SOI — "Exif\0\0" + a TIFF structure (byte-order marker,
    * IFD0 with four entries sorted by tag: 0x0100 ImageWidth, 0x0101
    * ImageLength, 0x010F Make, 0x0112 Orientation; the ASCII Make
    * value lives past-the-IFD via a value offset, exactly as the TIFF
    * 6.0 layout prescribes). Even doc_ids write little-endian ("II"),
    * odd ones big-endian ("MM"), so the parser's byte-order handling
    * is exercised on every run. Writer and parser share NO code: the
    * writer builds the structure with ByteBuffer puts; the parser
    * ([[parseExif]]) walks JPEG markers and decodes the IFD from raw
    * bytes.
    */
  private[graft] def exifJpegBytesOf(id: Long): Array[Byte] = {
    val jpeg = jpegBytesOf(id)
    val le = id % 2 == 0
    val (w, h) = dims(id)
    val make = (exifMake(id) + " ").getBytes("US-ASCII")
    val nEntries = 4
    val valOff = 8 + 2 + nEntries * 12 + 4 // header + count + entries + nextIFD
    val tiff = java.nio.ByteBuffer.allocate(valOff + make.length)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    tiff.put((if (le) "II" else "MM").getBytes("US-ASCII"))
    tiff.putShort(42)      // TIFF magic, in the declared byte order
    tiff.putInt(8)         // IFD0 offset
    tiff.putShort(nEntries.toShort)
    def shortEntry(tag: Int, value: Int): Unit = {
      tiff.putShort(tag.toShort); tiff.putShort(3); tiff.putInt(1)
      tiff.putShort(value.toShort); tiff.putShort(0) // left-justified SHORT
    }
    shortEntry(0x0100, w)
    shortEntry(0x0101, h)
    tiff.putShort(0x010F.toShort); tiff.putShort(2) // ASCII
    tiff.putInt(make.length); tiff.putInt(valOff)
    shortEntry(0x0112, exifOrientation(id))
    tiff.putInt(0) // next IFD: none
    tiff.put(make)
    val payload = "Exif  ".getBytes("US-ASCII") ++ tiff.array()
    val segLen = payload.length + 2
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2) // splice after SOI
  }

  /** The m18 parser: walk the JPEG marker stream to APP1/"Exif\0\0",
    * then decode the TIFF header and IFD0 from raw bytes in the
    * declared byte order. Returns (byte_order, n_entries, orientation,
    * make, exif_w, exif_h); ("none", 0, -1, "", -1, -1) when no EXIF
    * segment exists.
    */
  private[graft] def parseExif(bytes: Array[Byte]): (String, Int, Int, String, Int, Int) = {
    var off = 2 // past SOI
    while (off + 4 <= bytes.length && (bytes(off) & 0xff) == 0xFF) {
      val marker = bytes(off + 1) & 0xff
      if (marker == 0xDA) return ("none", 0, -1, "", -1, -1) // SOS: entropy data follows
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (marker == 0xE1 && len >= 16 &&
          new String(bytes, off + 4, 6, "US-ASCII") == "Exif  ") {
        val t0 = off + 10 // TIFF origin
        val le = bytes(t0) == 'I'.toByte
        def u16(p: Int): Int =
          if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
          else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
        def u32(p: Int): Int =
          if (le) u16(p) | (u16(p + 2) << 16) else (u16(p) << 16) | u16(p + 2)
        require(u16(t0 + 2) == 42, "not a TIFF structure")
        val ifd = t0 + u32(t0 + 4)
        val n = u16(ifd)
        var orientation = -1; var make = ""; var w = -1; var h = -1
        var i = 0
        while (i < n) {
          val e = ifd + 2 + i * 12
          val tag = u16(e)
          val cnt = u32(e + 4)
          tag match {
            case 0x0100 => w = u16(e + 8)
            case 0x0101 => h = u16(e + 8)
            case 0x0112 => orientation = u16(e + 8)
            case 0x010F =>
              val vo = if (cnt <= 4) e + 8 else t0 + u32(e + 8)
              make = new String(bytes, vo, cnt - 1, "US-ASCII")
            case _ => ()
          }
          i += 1
        }
        return (if (le) "II" else "MM", n, orientation, make, w, h)
      }
      off += 2 + len
    }
    ("none", 0, -1, "", -1, -1)
  }

  case class ExifMeta(doc_id: Long, byte_order: String, n_entries: Int,
                      orientation: Int, make: String, exif_w: Int, exif_h: Int)

  /** m18 — EXIF metadata extraction: the first question a multimodal
    * ingest asks of every image (orientation decides whether pixels
    * need a rotate before any resize/embed; camera make drives source
    * attribution and dedup blocking). The fixture embeds a real TIFF
    * IFD in both byte orders; the operator is a genuine marker-walk +
    * IFD decode over the binary column (partition-parallel map, bytes
    * never shuffle — the m14/m17 discipline), and every extracted
    * field is restated arithmetically by the DuckDB oracle, so a
    * parser that misreads an offset, a byte order, or a value type
    * breaks the hash.
    */
  def exifMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docIds(spark, dir).mapPartitions { ids =>
      CodecInit.ready
      ids.map { id =>
        val (bo, n, o, mk, w, h) = parseExif(exifJpegBytesOf(id))
        ExifMeta(id, bo, n, o, mk, w, h)
      }
    }.toDF().orderBy("doc_id")
  }

  val oracleExifMeta: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  4::INT AS n_entries,
      |  (1 + doc_id % 8)::INT AS orientation,
      |  'cam' || (doc_id % 5) AS make,
      |  (8 + doc_id % 9)::INT AS exif_w,
      |  (8 + doc_id % 7)::INT AS exif_h
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
