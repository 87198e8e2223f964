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
    /** (n_bytes, byte_sum) — stand-ins for (decoded size, luminance). */
    def features(payload: Array[Byte]): (Int, Long)
  }

  /** Deterministic fake decode: byte count + unsigned byte sum. */
  object FakeDecoder extends MediaDecoder {
    def features(payload: Array[Byte]): (Int, Long) =
      (payload.length, payload.foldLeft(0L)((s, b) => s + (b & 0xff)))
  }

  final case class MediaRec(
      doc_id: Long, payload: Array[Byte], width: Int, height: Int, format: String)
  final case class MediaFeat(
      doc_id: Long, width: Int, height: Int, n_bytes: Int, byte_sum: Long,
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
          val (nBytes, byteSum) = d.features(r.payload)
          MediaFeat(r.doc_id, r.width, r.height, nBytes, byteSum,
            r.width.toLong * 1000L / r.height)
        }
      }(Encoders.product[MediaFeat])
      .toDF()

  // Oracle mirror of the fake decode. byte_sum == codepoint sum only for
  // ASCII corpora (true for the synthetic testdata); documented stub.
  def queries: Seq[Q] = Seq(
    Q("m1_media_features",
      """SELECT doc_id,
        |       (n_chars % 640) + 32 AS width,
        |       ((n_chars * 7) % 480) + 32 AS height,
        |       octet_length(encode(text)) AS n_bytes,
        |       list_sum(list_transform(range(1, length(text) + 1),
        |                i -> ord(substr(text, i, 1)))) AS byte_sum,
        |       (((n_chars % 640) + 32) * 1000) // (((n_chars * 7) % 480) + 32) AS aspect_milli
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) => features(s, dir).orderBy("doc_id")
    })
}
