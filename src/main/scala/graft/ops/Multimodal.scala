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
  * Real media decoding (JPEG/PNG/audio frames) needs native libraries
  * that are absent in this environment, so [[decodeStubFeatures]] STUBS
  * the decode step with a deterministic fake (documented below) while
  * keeping the Spark-side plumbing real: binary in, fixed-shape float
  * vector out, batched via mapPartitions. [[byteHistogramFeatures]] is
  * NOT a stub — byte histograms/entropy are genuine content features.
  */
object Multimodal {

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
  def byteHistogramFeatures(assets: DataFrame, bins: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Int](bins)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) * bins / 256) += 1
            i += 1
          }
          val n = math.max(1, bytes.length).toDouble
          val feat = hist.map(h => (h / n).toFloat)
          var ent = 0.0
          hist.foreach { h =>
            if (h > 0) { val p = h / n; ent -= p * math.log(p) / math.log(2) }
          }
          Row(id, feat.toSeq, ent)
        }
      }
    spark.createDataFrame(rdd, featureSchema(bins))
  }

  /** STUBBED media decode: a real pipeline would decode the payload
    * (JPEG→pixels, audio→PCM frames) with native libs and emit a
    * fixed-shape tensor (e.g. a thumbnail or mel spectrogram). Those
    * libs aren't in this container, so the decode is replaced by a
    * DETERMINISTIC FAKE — an `edge`×`edge` grid where cell (i,j) is a
    * hash-derived float of the payload slice it "covers" — while the
    * batch shape, schema, and partition-parallel plumbing match the real
    * thing exactly.
    */
  def decodeStubFeatures(assets: DataFrame, edge: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val cells = edge * edge
    val rdd = assets.select(col("asset_id").cast("long"), col("content"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feat = new Array[Float](cells)
          val slice = math.max(1, bytes.length / cells)
          var c = 0
          while (c < cells) {
            // ??? real decode goes here; deterministic fake instead:
            var h = 1125899906842597L
            var i = c * slice
            val end = math.min(bytes.length, (c + 1) * slice)
            while (i < end) { h = 31 * h + bytes(i); i += 1 }
            feat(c) = ((h & 0xffff) / 65535.0).toFloat
            c += 1
          }
          Row(id, feat.toSeq, 0.0)
        }
      }
    spark.createDataFrame(rdd, featureSchema(cells))
      .withColumnRenamed("byte_entropy", "pad")
      .drop("pad")
  }
}
