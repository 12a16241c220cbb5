package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming near-duplicate detection: an ONLINE MinHash/LSH banded
  * index maintained in stream state — the continuous-crawl ingestion
  * counterpart of the batch [[graft.ops.Dedup.minhashLshPortable]]
  * pipeline. Documents arrive in id order (a crawler landing segments);
  * each is banded MAP-SIDE (signature minima over its own shingle set,
  * no per-doc aggregation shuffle), and a stateful operator keyed by
  * (band, bucket) holds each bucket's first-`cap` member ids, emitting a
  * candidate pair the moment a new document lands in a non-empty bucket.
  *
  * Cap semantics are FIRST-K-BY-ID per bucket — chosen because it is
  * identical between the stream (ids arrive ascending, state keeps the
  * first K) and a batch/SQL formulation (rank ids per bucket, keep
  * rn <= K), which is what lets the streamed pair set be hash-compared
  * against a DuckDB oracle (`q_neardup_stream`). The batch twin's
  * whole-bucket-drop cap (`maxBucketSize`) is NOT stream-expressible:
  * the stream cannot retract pairs it emitted before a bucket ran hot.
  *
  * Scale shape: state is (band, bucket)-keyed — shuffles only 16-byte
  * band keys plus ids, text never leaves the map side — and bounded at
  * `cap` longs per bucket; each arrival does O(|bucket|) work. Emitted
  * pairs are the output, never stored.
  */
object DocStream {

  case class BandRow(id: Long, band: Int, bk: String)
  case class CandPair(band: Int, id_a: Long, id_b: Long)

  /** Map-side banding of a (doc_id, text) frame (batch OR streaming):
    * per-hash signature = min md5 over the doc's shingles (a min over
    * the distinct set equals the min over occurrences, so this matches
    * the exploded-shingle batch path bit-for-bit); band key = md5 of
    * the band's signature slice. Docs with no shingles (< n tokens)
    * produce no rows, matching the batch GROUP BY absence.
    *
    * Implemented as a tight mapPartitions loop, NOT transform/array_min
    * lambdas: higher-order functions evaluate interpreted per element,
    * and numHashes md5s per shingle across a corpus is exactly the
    * measured ~7 µs/element interpreter tax that made the first
    * declarative version blow the 10× replay budget (the same
    * pathology PLANS.md documents for quantizeInt8). Hex md5 strings
    * compare identically under JVM String ordering, Spark UTF8String
    * ordering, and DuckDB varchar min — all ASCII.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val bands = numHashes / rowsPerBand
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String = {
          val b = md.digest(s.getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          var i = 0
          while (i < b.length) {
            sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
            sb.append(Character.forDigit(b(i) & 0xf, 16))
            i += 1
          }
          sb.toString
        }
        it.flatMap { case (id, text) =>
          val toks = text.trim.split("\\s+")
          if (toks.length < n || text.trim.isEmpty) Iterator.empty
          else {
            val mins = Array.fill[String](numHashes)(null)
            var i = 0
            while (i <= toks.length - n) {
              val sh = toks.slice(i, i + n).mkString(" ")
              var k = 0
              while (k < numHashes) {
                val h = md5hex(s"$k:$sh")
                if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
                k += 1
              }
              i += 1
            }
            (0 until bands).iterator.map { b =>
              val key = (0 until rowsPerBand)
                .map(r => mins(b * rowsPerBand + r)).mkString("|")
              BandRow(id, b, md5hex(key))
            }
          }
        }
      }
      .toDF("id", "band", "bk")
  }

  /** The stateful index: per (band, bucket), keep the first-`cap` ids;
    * each new member emits one candidate pair per existing member.
    * Requires ascending-id arrival across micro-batches for the
    * first-K = smallest-K equivalence the oracle relies on (the replay
    * harness slices by doc_id to guarantee it); within a micro-batch
    * the group's rows are sorted here.
    *
    * Out-of-order arrival (a production crawler): BELOW the cap the
    * emitted pair set is arrival-order-INVARIANT — every bucket member
    * pairs with every other eventually, so a shuffled crawl still
    * matches the id-ranked batch oracle. Divergence happens only in
    * buckets that CROSS the cap: the kept set becomes first-K-by-
    * arrival instead of smallest-K-by-id (already-emitted pairs cannot
    * be retracted in Append mode). Both regimes are spec-pinned
    * (DocStreamSpec "out-of-order arrival"). For a crawl where capped
    * buckets must still agree with a batch reconciliation, run the
    * batch twin's rank-based cap over the landed corpus instead.
    */
  def lshCandidates(banded: Dataset[BandRow], cap: Int): Dataset[CandPair] = {
    import banded.sparkSession.implicits._
    banded.groupByKey(r => (r.band, r.bk))
      .flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          val have = state.getOption.getOrElse(Array.empty[Long])
          val haveSet = have.toSet
          val newIds = rows.map(_.id).toArray.distinct.sorted
            .filterNot(haveSet.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var cur = have
          newIds.foreach { nid =>
            if (cur.length < cap) {
              cur.foreach { a =>
                out += CandPair(band, math.min(a, nid), math.max(a, nid))
              }
              cur = cur :+ nid
            }
          }
          if (cur.length != have.length) state.update(cur)
          out.iterator
      }
  }

  /** DuckDB twin of the replayed stream: same md5 signatures and band
    * keys as [[graft.ops.Dedup.minhashLshPortableSql]], but the bucket
    * cap is rank-based first-K (see cap-semantics note above); n_bands
    * counts the bands in which a pair was co-kept.
    */
  def neardupStreamSql(table: String, id: String, text: String,
      n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      cap: Int = 50): String = {
    val bands = numHashes / rowsPerBand
    val mins = (0 until numHashes)
      .map(k => s"min(md5('$k:' || shingle)) AS h$k").mkString(", ")
    val bandRowsSql = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).map(r => s"h${b * rowsPerBand + r}")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bk FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH sh AS (
${Dedup.shinglesSql(table, id, text, n)}
), sig AS (
  SELECT id, $mins FROM sh GROUP BY id
), banded AS (
  $bandRowsSql
), bounded AS (
  SELECT id, band, bk FROM banded
  QUALIFY row_number() OVER (PARTITION BY band, bk ORDER BY id) <= $cap
)
SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_bands
FROM bounded a JOIN bounded b
  ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
GROUP BY a.id, b.id ORDER BY id_a, id_b"""
  }
}
