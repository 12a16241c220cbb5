package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run batched
  * per-partition feature extraction over them.
  *
  * Scale shape: everything here is map-side (scan → narrow transform →
  * optional aggregation); the binary payloads are never shuffled except
  * by an explicit aggregation on their (small) derived features. At
  * 100 TB the feature extraction parallelizes per input split exactly
  * like any other scan.
  *
  * All three modalities now run REAL JDK codecs end-to-end on
  * executors: PNG via ImageIO ([[pngAssets]]/[[decodeImageStats]]),
  * WAV/PCM via javax.sound ([[wavAssets]]/[[decodeWavStats]]), and
  * multi-frame video as a length-prefixed container of real PNG
  * frames ([[videoAssets]]/[[decodeVideoStats]] — PNG as the
  * intra-frame codec, since that is the codec this JVM carries; a
  * hardware-accelerated H.264 path would slot into the same
  * mapPartitions shape). [[byteHistogramFeatures]] is a genuine
  * content feature (byte histograms/entropy), not a decode.
  */
object Multimodal {

  /** ImageIO's default stream cache is DISK-backed — every
    * read/write through an InputStream/OutputStream creates (and
    * deletes) a temp file in java.io.tmpdir, so per-call file churn
    * dominates small-image codec work and collapses under concurrent
    * tasks on container filesystems (measured 3x single-threaded,
    * ~8-10x at local[32] on this class of box). Memory-backed streams
    * produce byte-identical codec output. JVM-global and idempotent;
    * called at the head of every ImageIO-using task closure so
    * executor JVMs get it too, not just the driver. */
  private def disableImageIoDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** javax.sound's AudioSystem facade consults its provider registry
    * on EVERY read/write call, with registry-level synchronization —
    * at 32 concurrent tasks over tiny WAV payloads the codec work is
    * microseconds and the serialized registry walk dominates
    * (measured 9.5x on this box: 973 ms → 102 ms for 20k round trips
    * at 32 threads). The provider lists are cached here once per JVM
    * through the PUBLIC ServiceLoader SPI — the same providers
    * AudioSystem consults, in the same order, with the same
    * try-next-on-UnsupportedAudioFileException dispatch — so encode
    * and decode bytes are identical, only the per-call registry walk
    * is gone. */
  private lazy val audioReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .forEach(r => b += r)
    b.result()
  }
  private lazy val audioWriters: Array[javax.sound.sampled.spi.AudioFileWriter] = {
    val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .forEach(w => b += w)
    b.result()
  }

  /** AudioSystem.getAudioInputStream(InputStream) semantics over the
    * cached provider list. */
  private def readAudioStream(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    var i = 0
    while (i < audioReaders.length) {
      try return audioReaders(i).getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "Stream of unsupported format")
  }

  /** AudioSystem.write(ais, type, OutputStream) semantics over the
    * cached provider list. */
  private def writeAudioStream(ais: javax.sound.sampled.AudioInputStream,
      tpe: javax.sound.sampled.AudioFileFormat.Type,
      out: java.io.OutputStream): Unit = {
    var i = 0
    while (i < audioWriters.length) {
      if (audioWriters(i).isFileTypeSupported(tpe, ais)) {
        audioWriters(i).write(ais, tpe, out)
        return
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"could not write audio file: file type not supported: $tpe")
  }

  /** Lift a text column into the binary-asset schema
    * (id, content: binary, mime) — the testdata has no real media, so
    * documents stand in as assets. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("asset_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("text/plain").as("mime"))

  /** Typed-metadata stats over the binary column: per-mime count, total
    * and max payload bytes, distinct payload fingerprints. All
    * DuckDB-expressible (octet_length/md5 over BLOBs).
    */
  def stats(assets: DataFrame): DataFrame =
    assets.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_assets"),
        sum(octet_length(col("content"))).as("total_bytes"),
        max(octet_length(col("content"))).as("max_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct"))
      .orderBy("mime")

  // DuckDB's md5 takes VARCHAR (it hashes the UTF-8 bytes, which is
  // exactly Spark's md5(encode(text,'UTF-8'))); octet_length takes BLOB.
  def statsSql(table: String, id: String, text: String): String =
    s"SELECT 'text/plain' AS mime, count(*) AS n_assets, " +
      s"CAST(sum(octet_length(encode($text))) AS BIGINT) AS total_bytes, " +
      s"CAST(max(octet_length(encode($text))) AS INTEGER) AS max_bytes, " +
      s"count(DISTINCT md5($text)) AS n_distinct FROM $table"

  private def featureSchema(dim: Int) = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("byte_entropy", DoubleType, nullable = false)))

  /** Batched per-partition feature extraction: normalized `bins`-bucket
    * byte histogram + byte entropy per asset. This is the real
    * mapPartitions plumbing a decode pipeline uses — one row in, one
    * fixed-shape vector out, no shuffle.
    */
  /** Shared per-blob histogram+entropy core — the exact arithmetic both
    * the feature path and the oracle projection run, factored so the
    * hash-checked entry exercises the same code the extractor uses. */
  private[ops] def histEntropy(bytes: Array[Byte], bins: Int): (Array[Int], Double) = {
    val hist = new Array[Int](bins)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) * bins / 256) += 1
      i += 1
    }
    val n = math.max(1, bytes.length).toDouble
    var ent = 0.0
    hist.foreach { h =>
      if (h > 0) { val p = h / n; ent -= p * math.log(p) / math.log(2) }
    }
    (hist, ent)
  }

  def byteHistogramFeatures(assets: DataFrame, bins: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (hist, ent) = histEntropy(bytes, bins)
          val n = math.max(1, bytes.length).toDouble
          Row(id, hist.map(h => (h / n).toFloat).toSeq, ent)
        }
      }
    spark.createDataFrame(rdd, featureSchema(bins))
  }

  /** Oracle-izable projection of [[byteHistogramFeatures]]: bins=16 so
    * a bin is exactly a byte's HIGH NIBBLE — one hex character of the
    * payload's hex dump, which DuckDB can tally without blob indexing.
    * Emits integer bin-0 count + payload size + 6-decimal-rounded
    * entropy; runs the SAME mapPartitions plumbing and [[histEntropy]]
    * core as the feature path. The float normalization step stays out
    * of the checked surface (rounding a Float to decimals is the one
    * non-portable operation); everything upstream of it is hash-gated.
    */
  def byteHistogramOracle(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (hist, ent) = histEntropy(bytes, 16)
          Row(id, hist(0).toLong, bytes.length.toLong,
            math.round(ent * 1e6) / 1e6)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("c0", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("byte_entropy", DoubleType, nullable = false))))
      .orderBy("asset_id")
  }

  /** DuckDB oracle for [[byteHistogramOracle]]: hex() the UTF-8 payload,
    * count high-nibble characters per 16-bucket bin, entropy over the
    * bin distribution. Empty payloads (no hex rows) left-join back in
    * with (0, 0, 0.0) — matching the n=max(1,len) guard in
    * [[histEntropy]]. */
  def byteHistogramOracleSql(table: String, id: String, text: String): String =
    s"""WITH b AS (
  SELECT $id AS asset_id, octet_length(encode($text)) AS len,
    hex(encode($text)) AS hx
  FROM $table
), nib AS (
  SELECT asset_id, len,
    strpos('0123456789ABCDEF', substring(hx, CAST(2*i - 1 AS INTEGER), 1)) - 1 AS bin
  FROM b, unnest(range(1, len + 1)) u(i)
), cnt AS (
  SELECT asset_id, len, bin, count(*) AS c FROM nib GROUP BY asset_id, len, bin
), agg AS (
  SELECT asset_id, len,
    COALESCE(sum(CASE WHEN bin = 0 THEN c END), 0) AS c0,
    ROUND(sum(-(c / CAST(len AS DOUBLE)) * LOG2(c / CAST(len AS DOUBLE))), 6) AS ent
  FROM cnt GROUP BY asset_id, len
)
SELECT b.asset_id, CAST(COALESCE(agg.c0, 0) AS BIGINT) AS c0,
  CAST(b.len AS BIGINT) AS n_bytes, COALESCE(agg.ent, 0.0) AS byte_entropy
FROM b LEFT JOIN agg ON b.asset_id = agg.asset_id
ORDER BY b.asset_id"""

  /** DuckDB oracle for the rounded bins=16 FEATURE projection (entropy
    * + first normalized histogram bin): same CTE skeleton as
    * [[byteHistogramOracleSql]], with f0 reproducing the Float
    * normalization exactly — divide as DOUBLE, round to REAL (the
    * `(h / n).toFloat` step), widen back (exact), round to 6 decimals.
    * With that cast chain mirrored, the "non-portable" Float step
    * becomes portable and the feature path itself is hash-checked. */
  def featureProjectionSql(table: String, id: String, text: String): String =
    s"""WITH b AS (
  SELECT $id AS asset_id, octet_length(encode($text)) AS len,
    hex(encode($text)) AS hx
  FROM $table
), nib AS (
  SELECT asset_id, len,
    strpos('0123456789ABCDEF', substring(hx, CAST(2*i - 1 AS INTEGER), 1)) - 1 AS bin
  FROM b, unnest(range(1, len + 1)) u(i)
), cnt AS (
  SELECT asset_id, len, bin, count(*) AS c FROM nib GROUP BY asset_id, len, bin
), agg AS (
  SELECT asset_id, len,
    COALESCE(sum(CASE WHEN bin = 0 THEN c END), 0) AS c0,
    ROUND(sum(-(c / CAST(len AS DOUBLE)) * LOG2(c / CAST(len AS DOUBLE))), 6) AS ent
  FROM cnt GROUP BY asset_id, len
)
SELECT b.asset_id, COALESCE(agg.ent, 0.0) AS byte_entropy,
  ROUND(CAST(CAST(CAST(COALESCE(agg.c0, 0) AS DOUBLE)
    / greatest(b.len, 1) AS REAL) AS DOUBLE), 6) AS f0
FROM b LEFT JOIN agg ON b.asset_id = agg.asset_id
ORDER BY b.asset_id"""

  /** Frame sampling over binary payloads — the video keyframe-sampling
    * plumbing: the payload is read as a sequence of fixed-size
    * `frameBytes` frames and every `stride`-th FULL frame becomes its
    * own row (a trailing partial frame is dropped, as a decoder drops a
    * truncated frame). Pure map-side: one asset row in, ≤ len/frameBytes
    * rows out, no shuffle — at 100 TB this parallelizes per input split
    * exactly like the feature extractor, and downstream per-frame
    * decode/embed stages start from an already-exploded, evenly-sized
    * row stream. Frames are emitted as lowercase hex so the artifact is
    * engine-portable (DuckDB: substring over lower(hex(payload))). */
  def frameSample(assets: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = bytes.length / frameBytes
          (0 until n).iterator.filter(_ % stride == 0).map { f =>
            val sb = new java.lang.StringBuilder(frameBytes * 2)
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) {
              val b = bytes(i) & 0xff
              sb.append(Character.forDigit(b >> 4, 16))
              sb.append(Character.forDigit(b & 0xf, 16))
              i += 1
            }
            Row(id, f, sb.toString)
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_hex", StringType, nullable = false))))
  }

  /** DuckDB oracle for [[frameSample]]: the i-th frame's bytes are the
    * substring of the payload's hex dump at [2·i·frameBytes+1,
    * 2·frameBytes] — `//` (integer division) for the full-frame count
    * and lower() to match the Scala side's lowercase digits. */
  def frameSampleSql(table: String, id: String, text: String,
      frameBytes: Int = 64, stride: Int = 4): String =
    s"""WITH b AS (
  SELECT $id AS asset_id, octet_length(encode($text)) AS len,
    lower(hex(encode($text))) AS hx FROM $table
)
SELECT asset_id, CAST(i AS INTEGER) AS frame_idx,
  substring(hx, CAST(i * ${2 * frameBytes} + 1 AS BIGINT),
    ${2 * frameBytes}) AS frame_hex
FROM b, unnest(range(0, len // $frameBytes)) u(i)
WHERE i % $stride = 0
ORDER BY asset_id, frame_idx"""

  /** Per-frame pixel channel for the video container: frame f shifts
    * the offset by 3·f, so consecutive frames differ deterministically
    * and a frame-indexing bug (off-by-one, dropped frame, reversed
    * order) changes the closed-form sums loudly. Id bounded first. */
  private[ops] def videoPixelChannel(id: Long, x: Int, y: Int, f: Int,
      channelOffset: Int): Int =
    (((id % 1000003L) * 31 + x * 7 + y * 13 + f * 3 +
      channelOffset) % 256).toInt

  /** REAL multi-frame video ENCODE: `nFrames` deterministic RGB frames
    * per asset, each independently compressed to actual PNG bytes by
    * ImageIO, packed into a length-prefixed container
    * ([4-byte BE frame length][PNG bytes])* — the motion-JPEG/NAL-unit
    * stream shape, with PNG as the intra-frame codec since that is the
    * real codec this JVM carries. This retires the former
    * deterministic-fake decode stub: every byte of the payload now
    * passes through a genuine compressor. mapPartitions, map-side. */
  def videoAssets(df: DataFrame, idCol: String, edge: Int = 8,
      nFrames: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      disableImageIoDiskCache()
      it.map { r =>
        val id = r.getLong(0)
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.io.DataOutputStream(bos)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(edge, edge,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < edge) {
            var x = 0
            while (x < edge) {
              img.setRGB(x, y,
                (videoPixelChannel(id, x, y, f, 0) << 16) |
                  (videoPixelChannel(id, x, y, f, 85) << 8) |
                  videoPixelChannel(id, x, y, f, 170))
              x += 1
            }
            y += 1
          }
          val frame = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", frame)
          val bytes = frame.toByteArray
          dos.writeInt(bytes.length)
          dos.write(bytes)
          f += 1
        }
        dos.flush()
        Row(id, bos.toByteArray, "video/x-mjpng")
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false))))
  }

  /** REAL multi-frame video DECODE: walk the length-prefixed container,
    * run ImageIO on every frame, and reduce to exact integer stats —
    * frame count, dimensions, all-frame channel sums, and the last
    * frame's red sum (pins frame ORDER: a reversed or re-indexed walk
    * matches the totals but not the tail frame). PNG frames are
    * lossless, so the closed-form oracle must match exactly; a
    * mis-parsed length prefix fails the decode loudly rather than
    * drifting. Map-side, no shuffle — the per-split shape a 100 TB
    * media pipeline runs. */
  def decodeVideoStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(bytes))
          var (nf, w, h) = (0, 0, 0)
          var (rs, gs, bs, lastR) = (0L, 0L, 0L, 0L)
          while (in.available() >= 4) {
            val len = in.readInt()
            val frame = new Array[Byte](len)
            in.readFully(frame)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frame))
            w = img.getWidth; h = img.getHeight
            var fr = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                fr += (p >> 16) & 0xff
                gs += (p >> 8) & 0xff
                bs += p & 0xff
                x += 1
              }
              y += 1
            }
            rs += fr; lastR = fr
            nf += 1
          }
          Row(id, nf, w, h, rs, gs, bs, lastR)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("last_frame_r", LongType, nullable = false))))
  }

  /** Closed-form oracle of the video round trip: the per-frame pixel
    * arithmetic evaluated over the (x, y, f) grid. */
  def decodeVideoStatsSql(table: String, id: String, edge: Int = 8,
      nFrames: Int = 4): String = {
    def ch(off: Int, fExpr: String) =
      s"(($id % 1000003) * 31 + x * 7 + y * 13 + $fExpr * 3 + $off) % 256"
    s"""SELECT $id AS asset_id, $nFrames AS n_frames,
  $edge AS width, $edge AS height,
  CAST(sum(${ch(0, "f")}) AS BIGINT) AS r_sum,
  CAST(sum(${ch(85, "f")}) AS BIGINT) AS g_sum,
  CAST(sum(${ch(170, "f")}) AS BIGINT) AS b_sum,
  CAST(sum(CASE WHEN f = ${nFrames - 1} THEN ${ch(0, "f")} ELSE 0 END)
    AS BIGINT) AS last_frame_r
FROM $table,
  LATERAL (SELECT unnest(generate_series(0, ${edge - 1})) AS x) xs,
  LATERAL (SELECT unnest(generate_series(0, ${edge - 1})) AS y) ys,
  LATERAL (SELECT unnest(generate_series(0, ${nFrames - 1})) AS f) fs
GROUP BY $id ORDER BY asset_id"""
  }

  /** Deterministic per-pixel channel value — shared by the PNG
    * generator and the closed-form oracle. The id is bounded FIRST
    * (mod 1000003) so the arithmetic can never overflow at
    * derived-scale ids (the r10 lesson). */
  private[ops] def pixelChannel(id: Long, x: Int, y: Int,
      channelOffset: Int): Int =
    (((id % 1000003L) * 31 + x * 7 + y * 13 + channelOffset) % 256).toInt

  /** REAL image ENCODE on executors: a deterministic `edge`×`edge` RGB
    * image per asset id, compressed to actual PNG bytes by the JDK's
    * ImageIO codec (headless-safe, no native libs needed) — the
    * binary-asset column a crawl pipeline would carry. mapPartitions,
    * map-side only.
    */
  def pngAssets(df: DataFrame, idCol: String, edge: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      disableImageIoDiskCache()
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(edge, edge,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < edge) {
          var x = 0
          while (x < edge) {
            img.setRGB(x, y,
              (pixelChannel(id, x, y, 0) << 16) |
                (pixelChannel(id, x, y, 85) << 8) |
                pixelChannel(id, x, y, 170))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, "image/png")
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false))))
  }

  /** REAL image DECODE on executors: ImageIO parses the PNG bytes back
    * to pixels and the stats are exact integer channel sums — PNG is
    * lossless, so decode(encode(image)) must reproduce the generator's
    * pixels EXACTLY, which is what the closed-form oracle checks.
    * This is the genuine codec round-trip the former stub could not
    * give: a decoder bug, a byte-order mistake, or a color-model mixup
    * all break the integer sums loudly.
    */
  def decodeImageStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          var (rs, gs, bs) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xff
              gs += (p >> 8) & 0xff
              bs += p & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, img.getWidth, img.getHeight, rs, gs, bs)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false))))
  }

  /** Decode + NEAREST-NEIGHBOR resize (factor-of-2 downsample): the
    * thumbnailing stage of an image pipeline, with the sampling rule
    * chosen so the result is CLOSED-FORM — output pixel (x, y) is
    * input pixel (2x, 2y), so the oracle evaluates the generator at
    * the sampled grid directly (area-averaging resamplers have
    * platform-dependent rounding; nearest-neighbor is exact).
    * Runs the REAL PNG decode first — same mapPartitions shape. */
  def decodeResizeStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val (w2, h2) = (img.getWidth / 2, img.getHeight / 2)
          var (rs, gs, bs) = (0L, 0L, 0L)
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val p = img.getRGB(2 * x, 2 * y)
              rs += (p >> 16) & 0xff
              gs += (p >> 8) & 0xff
              bs += p & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, w2, h2, rs, gs, bs)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false))))
  }

  def decodeResizeStatsSql(table: String, id: String,
      edge: Int = 8): String = {
    val half = edge / 2
    s"""SELECT $id AS asset_id, $half AS width, $half AS height,
  CAST(sum((($id % 1000003) * 31 + (2 * x) * 7 + (2 * y) * 13 + 0) % 256)
    AS BIGINT) AS r_sum,
  CAST(sum((($id % 1000003) * 31 + (2 * x) * 7 + (2 * y) * 13 + 85) % 256)
    AS BIGINT) AS g_sum,
  CAST(sum((($id % 1000003) * 31 + (2 * x) * 7 + (2 * y) * 13 + 170) % 256)
    AS BIGINT) AS b_sum
FROM $table,
  LATERAL (SELECT unnest(generate_series(0, ${half - 1})) AS x) xs,
  LATERAL (SELECT unnest(generate_series(0, ${half - 1})) AS y) ys
GROUP BY $id ORDER BY asset_id"""
  }

  /** REAL audio ENCODE: deterministic 16-bit mono PCM samples wrapped
    * as actual WAV bytes by the JDK's javax.sound codec (headless, no
    * sound card touched — pure container IO). Sample k of asset id is
    * ((id mod 1000003)·17 + k·11) mod 65536 − 32768, id-bounded first.
    */
  def wavAssets(df: DataFrame, idCol: String,
      nSamples: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val pcm = new Array[Byte](nSamples * 2)
        var k = 0
        while (k < nSamples) {
          val s = ((((id % 1000003L) * 17 + k.toLong * 11) % 65536L)
            - 32768L).toShort
          pcm(2 * k) = (s & 0xff).toByte            // little-endian
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writeAudioStream(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray, "audio/wav")
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false))))
  }

  /** REAL audio DECODE: javax.sound parses the WAV container back to
    * PCM frames; n_frames, sample-rate, and the exact integer sample
    * sum must equal the generator's closed form (PCM in WAV is
    * lossless). Frame-count, header parsing, endianness, and sign
    * handling all gate here. */
  def decodeWavStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val ais = readAudioStream(r.getAs[Array[Byte]](1))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sum = 0L
          var k = 0
          while (k < n) {
            val lo = bytes(2 * k) & 0xff
            val hi = bytes(2 * k + 1).toInt // sign-extends
            sum += (hi << 8) | lo
            k += 1
          }
          Row(id, n.toLong, fmt.getSampleRate.toInt, sum)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("pcm_sum", LongType, nullable = false))))
  }

  def decodeWavStatsSql(table: String, id: String,
      nSamples: Int = 64): String =
    s"""SELECT $id AS asset_id, CAST($nSamples AS BIGINT) AS n_samples,
  8000 AS sample_rate,
  CAST(sum((($id % 1000003) * 17 + k * 11) % 65536 - 32768) AS BIGINT)
    AS pcm_sum
FROM $table,
  LATERAL (SELECT unnest(generate_series(0, ${nSamples - 1})) AS k) ks
GROUP BY $id ORDER BY asset_id"""

  /** Closed-form oracle of the PNG encode→decode round trip: the same
    * bounded-id pixel arithmetic, evaluated directly in SQL over an
    * (x, y) grid cross join. */
  def decodeImageStatsSql(table: String, id: String, edge: Int = 8): String =
    s"""SELECT $id AS asset_id, $edge AS width, $edge AS height,
  CAST(sum((($id % 1000003) * 31 + x * 7 + y * 13 + 0) % 256) AS BIGINT)
    AS r_sum,
  CAST(sum((($id % 1000003) * 31 + x * 7 + y * 13 + 85) % 256) AS BIGINT)
    AS g_sum,
  CAST(sum((($id % 1000003) * 31 + x * 7 + y * 13 + 170) % 256) AS BIGINT)
    AS b_sum
FROM $table,
  LATERAL (SELECT unnest(generate_series(0, ${edge - 1})) AS x) xs,
  LATERAL (SELECT unnest(generate_series(0, ${edge - 1})) AS y) ys
GROUP BY $id ORDER BY asset_id"""
}
