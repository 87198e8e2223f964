package graft.ext

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — the opaque-binary pattern a training-data
  * pipeline uses for image/audio/video payloads (north-star extension):
  * a `binary` payload column + typed metadata, with decode/feature-extract
  * running partition-wise over the typed Dataset.
  *
  * The decode step is STUBBED behind [[Multimodal.MediaDecoder]] with a
  * deterministic fake (this container has no image/audio codecs); the
  * Spark-side plumbing — schema, binary encoding, partition-wise batch
  * shape, typed Encoders — is real and oracle-tested. `mapPartitions` is
  * the Scala analog of PySpark's `mapInPandas` batch UDF: the decoder is
  * instantiated once per partition (where a real codec would amortize
  * model/library init) and streams records without materializing the
  * partition.
  *
  * Scale design: payloads stay opaque bytes end-to-end (no row-level
  * base64/string conversions), metadata travels in fixed-width columns so
  * filters on it are pushed to the parquet scan without touching payload
  * bytes, and feature extraction is a narrow map — no shuffle at any
  * stage.
  */
object Multimodal {

  /** Partition-wise media decoder. A real deployment plugs a codec here
    * (JPEG decode, audio resample, video frame-sample); the engine's
    * contract is only this signature.
    */
  trait MediaDecoder extends Serializable {
    /** (n_bytes, cp_sum) — stand-ins for (decoded size, luminance). */
    def features(payload: Array[Byte]): (Int, Long)
  }

  /** Deterministic fake decode: byte count + sum of decoded codepoints.
    * It actually DECODES the payload (UTF-8 -> codepoints) rather than
    * folding raw octets, so the oracle's per-character `ord` fold matches
    * for any corpus, not just ASCII (round-1 review finding).
    */
  object FakeDecoder extends MediaDecoder {
    def features(payload: Array[Byte]): (Int, Long) = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      var sum = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        sum += cp
        i += Character.charCount(cp)
      }
      (payload.length, sum)
    }
  }

  final case class MediaRec(
      doc_id: Long, payload: Array[Byte], width: Int, height: Int, format: String)
  // all-int64 feature row: DuckDB arithmetic yields BIGINT, and exact
  // arrow-type parity with the oracle keeps the driver's value hash stable
  final case class MediaFeat(
      doc_id: Long, width: Long, height: Long, n_bytes: Long, cp_sum: Long,
      aspect_milli: Long)

  /** The media table: documents' text bytes standing in for an image
    * payload, with synthetic-but-deterministic dimensions derived from
    * `n_chars`.
    */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("n_chars") % 640) + 32).cast("int").as("width"),
      (((col("n_chars") * 7) % 480) + 32).cast("int").as("height"),
      lit("fake").as("format"))

  def features(spark: SparkSession, dir: String, decoder: MediaDecoder = FakeDecoder): DataFrame =
    media(spark, dir).as(Encoders.product[MediaRec])
      .mapPartitions { it =>
        // one decoder per partition — where a real codec loads its libs
        val d = decoder
        it.map { r =>
          val (nBytes, cpSum) = d.features(r.payload)
          MediaFeat(r.doc_id, r.width.toLong, r.height.toLong, nBytes.toLong,
            cpSum, r.width.toLong * 1000L / r.height)
        }
      }(Encoders.product[MediaFeat])
      .toDF()

  /** Frames sampled per payload in m2. */
  val FramesPerDoc = 4

  final case class FrameFeat(
      doc_id: Long, frame_no: Long, frame_off: Long, luma: Long)

  /** m2: frame sampling — decode emits MULTIPLE rows per input (the
    * video pattern: k evenly-spaced frames per payload), so the
    * partition-wise decode is a flatMap, not a map. The fake "frame" at
    * slot f is the codepoint at offset floor(f * len / k) of the decoded
    * payload; a real deployment swaps in keyframe extraction with the
    * identical batch shape. Still a narrow operator: no shuffle, output
    * is k x input rows with fixed-width columns.
    */
  def frames(spark: SparkSession, dir: String,
      k: Int = FramesPerDoc): org.apache.spark.sql.Dataset[FrameFeat] =
    media(spark, dir).as(Encoders.product[MediaRec])
      .mapPartitions { it =>
        it.flatMap { r =>
          val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
          val n = s.codePointCount(0, s.length)
          if (n == 0) Iterator.empty
          else (0 until k).iterator.map { f =>
            val off = f.toLong * n / k
            val idx = s.offsetByCodePoints(0, off.toInt)
            FrameFeat(r.doc_id, f.toLong, off, s.codePointAt(idx).toLong)
          }
        }
      }(Encoders.product[FrameFeat])

  // Oracle mirror of the fake decode: per-character `ord` fold == UTF-8
  // decode + codepoint sum on any corpus. COALESCE pins the empty-text
  // edge (list_sum over an empty list is NULL in DuckDB, 0 in the
  // decoder); CAST collapses HUGEINT -> BIGINT for arrow-type parity.
  def queries: Seq[Q] = Seq(
    Q("m2_frame_sample",
      s"""SELECT doc_id, f AS frame_no,
        |       (f * length(text)) // $FramesPerDoc AS frame_off,
        |       CAST(ord(substr(text, CAST((f * length(text)) // $FramesPerDoc AS INT) + 1, 1)) AS BIGINT) AS luma
        |FROM documents CROSS JOIN (SELECT unnest(range(0, $FramesPerDoc)) AS f) r
        |WHERE length(text) > 0
        |ORDER BY doc_id, frame_no""".stripMargin) {
      (s, dir) =>
        frames(s, dir).toDF().transform(d => graft.Q.sorted(d, "doc_id", "frame_no"))
    },

    // m3: aspect-preserving resize planning — the metadata half of a
    // real resize (the pixel half plugs into MediaDecoder): fit each
    // payload's (width, height) into a 256-box, integer math only so
    // both engines agree exactly. Pure per-row projection; at scale the
    // plan is a narrow scan emitting resize jobs, with the byte-level
    // work behind the partition-wise decoder.
    Q("m3_resize_plan",
      """SELECT doc_id,
        |       (n_chars % 640) + 32 AS width,
        |       ((n_chars * 7) % 480) + 32 AS height,
        |       CASE WHEN (n_chars % 640) + 32 >= ((n_chars * 7) % 480) + 32 THEN 256
        |            ELSE ((n_chars % 640) + 32) * 256 // (((n_chars * 7) % 480) + 32) END AS out_w,
        |       CASE WHEN (n_chars % 640) + 32 >= ((n_chars * 7) % 480) + 32
        |            THEN (((n_chars * 7) % 480) + 32) * 256 // ((n_chars % 640) + 32)
        |            ELSE 256 END AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val m = media(s, dir).select(col("doc_id"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"))
        val landscape = col("width") >= col("height")
        m.select(col("doc_id"), col("width"), col("height"),
            when(landscape, lit(256L))
              .otherwise(col("width") * 256L / col("height")).cast("long").as("out_w"),
            when(landscape, col("height") * 256L / col("width"))
              .otherwise(lit(256L)).cast("long").as("out_h"))
          .transform(d => graft.Q.sorted(d, "doc_id"))
      }
    },

    // m4: audio-style chunk planning — overlapped fixed-byte windows
    // (512-byte window, 384-byte hop) over the opaque payload, emitted
    // as (chunk_idx, start, len) plans WITHOUT touching payload bytes:
    // the planner runs on metadata only, and the downstream partition-
    // wise decoder (the m1/m2 machinery) seeks to the byte ranges. Pure
    // integer arithmetic; one explode, no shuffle.
    Q("m4_chunk_plan",
      """WITH m AS (SELECT doc_id, strlen(text) AS n_bytes
        |           FROM documents WHERE strlen(text) > 0),
        |c AS (SELECT doc_id, n_bytes,
        |             unnest(range(0, (n_bytes + 383) // 384)) AS chunk_idx
        |      FROM m)
        |SELECT doc_id, chunk_idx,
        |       chunk_idx * 384 AS start_byte,
        |       least(512, n_bytes - chunk_idx * 384) AS chunk_bytes
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) {
      (s, dir) => {
        val m = media(s, dir)
          .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"))
          .where(col("n_bytes") > 0)
        m.select(col("doc_id"), col("n_bytes"),
            explode(sequence(lit(0L),
              floor((col("n_bytes") + 383L) / 384L).cast("long") - 1L)).as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            (col("chunk_idx") * 384L).as("start_byte"),
            least(lit(512L), col("n_bytes") - col("chunk_idx") * 384L).as("chunk_bytes"))
          .transform(d => graft.Q.sorted(d, "doc_id", "chunk_idx"))
      }
    },

    Q("m1_media_features",
      """SELECT doc_id,
        |       (n_chars % 640) + 32 AS width,
        |       ((n_chars * 7) % 480) + 32 AS height,
        |       octet_length(encode(text)) AS n_bytes,
        |       CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |                i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS cp_sum,
        |       (((n_chars % 640) + 32) * 1000) // (((n_chars * 7) % 480) + 32) AS aspect_milli
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) => features(s, dir).transform(d => graft.Q.sorted(d, "doc_id"))
    })
}
