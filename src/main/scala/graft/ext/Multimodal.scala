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
  * The decode step is REAL: [[Multimodal.PpmDecoder]] is a complete
  * pure-JVM binary PPM (P6) codec — magic check, whitespace/comment
  * header tokenizer, 8-bit RGB raster walk with integer BT.709 luminance
  * — running inside `mapPartitions`, the Scala analog of PySpark's
  * `mapInPandas` batch UDF: the decoder is bound once per partition
  * (where a heavier codec would amortize library init) and streams
  * records without materializing the partition. Payloads are
  * deterministic P6 images synthesized from document metadata
  * ([[Multimodal.buildPpm]]), so the DuckDB oracle can recompute every
  * decoded feature from first principles and adjudicate the codec's
  * output cell-exactly. A deployment swaps [[Multimodal.MediaDecoder]]
  * for JPEG/audio/video with the identical batch shape.
  *
  * Scale design: payloads stay opaque bytes end-to-end (no row-level
  * base64/string conversions), metadata travels in fixed-width columns so
  * filters on it are pushed to the parquet scan without touching payload
  * bytes, and feature extraction is a narrow map — no shuffle at any
  * stage.
  */
object Multimodal {

  /** Decoded whole-image features: header dimensions, payload size, and
    * the integer BT.709 luminance sum over the raster. */
  final case class MediaFeatures(
      width: Long, height: Long, nBytes: Long, lumaSum: Long)

  /** Partition-wise media decoder. The engine's contract is only this
    * signature; [[PpmDecoder]] is the shipped implementation, and a real
    * deployment plugs JPEG decode / audio resample / video frame-sample
    * here with the same partition-wise batch shape.
    */
  trait MediaDecoder extends Serializable {
    /** Whole-payload decode. */
    def features(payload: Array[Byte]): MediaFeatures
    /** Luma of the pixel at raster index `idx` (frame sampling). */
    def sample(payload: Array[Byte], idx: Long): Long
  }

  /** Binary PPM (P6) codec — an actual pixel-parsing decoder, pure JVM
    * (this container has no image libraries; PPM needs none). Header
    * grammar per the netpbm spec: `P6`, then three whitespace-separated
    * decimal fields (width, height, maxval) with `#`-to-newline comments
    * allowed between tokens, then exactly ONE whitespace byte, then the
    * w*h*3-byte big-endian RGB raster. Luminance is the integer BT.709
    * weighting (2126 R + 7152 G + 722 B) / 10000 per pixel — exact long
    * arithmetic, so the DuckDB oracle reproduces it bit-for-bit.
    */
  object PpmDecoder extends MediaDecoder {
    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'

    /** Parse the P6 header: (width, height, maxval, raster offset). */
    def header(p: Array[Byte]): (Int, Int, Int, Int) = {
      require(p.length >= 2 && p(0) == 'P' && p(1) == '6', "not a P6 PPM")
      var i = 2
      val vals = new Array[Int](3)
      var vi = 0
      while (vi < 3) {
        while (i < p.length && isWs(p(i))) i += 1
        if (i < p.length && p(i) == '#') {
          while (i < p.length && p(i) != '\n') i += 1
        } else {
          require(i < p.length && p(i) >= '0' && p(i) <= '9',
            s"bad PPM header token at byte $i")
          var v = 0
          while (i < p.length && p(i) >= '0' && p(i) <= '9') {
            v = v * 10 + (p(i) - '0'); i += 1
          }
          vals(vi) = v; vi += 1
        }
      }
      require(i < p.length && isWs(p(i)), "missing raster separator")
      i += 1
      (vals(0), vals(1), vals(2), i)
    }

    /** Luma of pixel `pix` given a pre-parsed raster offset — the
      * per-frame hot path (header parses once per record, not per
      * frame). */
    def lumaAt(p: Array[Byte], rasterOff: Int, pix: Int): Long = {
      val base = rasterOff + 3 * pix
      val r = p(base) & 0xff
      val g = p(base + 1) & 0xff
      val b = p(base + 2) & 0xff
      (2126L * r + 7152L * g + 722L * b) / 10000L
    }

    def features(p: Array[Byte]): MediaFeatures = {
      val (w, h, maxv, off) = header(p)
      require(maxv == 255, s"only 8-bit PPM supported, got maxval $maxv")
      require(p.length - off >= w * h * 3, "truncated raster")
      var sum = 0L
      var j = 0
      while (j < w * h) { sum += lumaAt(p, off, j); j += 1 }
      MediaFeatures(w.toLong, h.toLong, p.length.toLong, sum)
    }

    def sample(p: Array[Byte], idx: Long): Long = {
      val (w, h, _, off) = header(p)
      require(idx >= 0 && idx < w.toLong * h, s"pixel $idx out of raster")
      lumaAt(p, off, idx.toInt)
    }
  }

  /** Deterministic P6 payload for a document: dimensions from `n_chars`
    * (1-9 each — single-digit, so the oracle's header-length arithmetic
    * is closed-form), pixel bytes from the linear generator
    * `(seed + 7 i) mod 256` with `seed = doc_id mod 251`. The ENCODE side
    * is test-data synthesis; the decode side never sees these formulas —
    * it parses the actual bytes.
    */
  def buildPpm(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars % 8 + 1).toInt
    val h = (nChars * 7 % 8 + 1).toInt
    val seed = (docId % 251).toInt
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < raster.length) {
      raster(i) = ((seed + 7 * i) % 256).toByte; i += 1
    }
    val out = new Array[Byte](header.length + raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raster, 0, out, header.length, raster.length)
    out
  }

  final case class PpmRec(doc_id: Long, payload: Array[Byte])
  // all-int64 feature row: DuckDB arithmetic yields BIGINT, and exact
  // arrow-type parity with the oracle keeps the driver's value hash stable
  final case class MediaFeat(
      doc_id: Long, width: Long, height: Long, n_bytes: Long, luma_sum: Long,
      aspect_milli: Long)

  /** The image table: one deterministic P6 payload per document. The
    * payload synthesis is a narrow typed map during the scan; at 100 TB
    * this is the parquet `binary` column itself and the map disappears.
    */
  final case class DocDims(doc_id: Long, n_chars: Long)

  def ppmMedia(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[PpmRec] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as(Encoders.product[DocDims])
      .mapPartitions(_.map(d => PpmRec(d.doc_id, buildPpm(d.doc_id, d.n_chars))))(
        Encoders.product[PpmRec])

  /** The media metadata table for the PLANNER queries (m3 resize, m4
    * chunking): text bytes standing in for an opaque payload, with
    * synthetic display dimensions derived from `n_chars`. Planners read
    * metadata only — payload bytes never leave the scan.
    */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((col("n_chars") % 640) + 32).cast("int").as("width"),
      (((col("n_chars") * 7) % 480) + 32).cast("int").as("height"),
      lit("fake").as("format"))

  def features(spark: SparkSession, dir: String,
      decoder: MediaDecoder = PpmDecoder): DataFrame =
    ppmMedia(spark, dir)
      .mapPartitions { it =>
        // one decoder per partition — where a heavier codec loads its libs
        val d = decoder
        it.map { r =>
          val f = d.features(r.payload)
          MediaFeat(r.doc_id, f.width, f.height, f.nBytes, f.lumaSum,
            f.width * 1000L / f.height)
        }
      }(Encoders.product[MediaFeat])
      .toDF()

  /** Frames sampled per payload in m2. */
  val FramesPerDoc = 4

  final case class FrameFeat(
      doc_id: Long, frame_no: Long, frame_off: Long, luma: Long)

  /** m2: frame sampling — decode emits MULTIPLE rows per input (the
    * video pattern: k evenly-spaced samples per payload), so the
    * partition-wise decode is a flatMap, not a map. Sample f is the
    * decoded luma of the pixel at raster index floor(f * npix / k) —
    * real pixel access through the codec; a video deployment swaps in
    * keyframe extraction with the identical batch shape. Still a narrow
    * operator: no shuffle, output is k x input rows with fixed-width
    * columns. The header parses ONCE per record, not once per frame.
    */
  def frames(spark: SparkSession, dir: String,
      k: Int = FramesPerDoc): org.apache.spark.sql.Dataset[FrameFeat] =
    ppmMedia(spark, dir)
      .mapPartitions { it =>
        it.flatMap { r =>
          val (w, h, _, off) = PpmDecoder.header(r.payload)
          val npix = w.toLong * h
          (0 until k).iterator.map { f =>
            val fo = f * npix / k
            FrameFeat(r.doc_id, f.toLong, fo,
              PpmDecoder.lumaAt(r.payload, off, fo.toInt))
          }
        }
      }(Encoders.product[FrameFeat])

  // Oracle mirrors: the oracle recomputes every decoded feature from the
  // SYNTHESIS formulas (dimensions from n_chars, the (seed + 7i) mod 256
  // pixel generator, integer BT.709 luma), while the engine path parses
  // the actual P6 bytes — two independent derivations meeting cell-exact.
  // Pixel j's channels sit at raster bytes 3j, 3j+1, 3j+2, so its luma is
  // a function of (seed + 21j), (seed + 21j + 7), (seed + 21j + 14).
  private def lumaSql(pix: String): String =
    s"""(2126 * ((seed + 21 * ($pix)) % 256)
       | + 7152 * ((seed + 21 * ($pix) + 7) % 256)
       | +  722 * ((seed + 21 * ($pix) + 14) % 256)) // 10000""".stripMargin

  private val mediaCte =
    """m AS (SELECT doc_id,
      |              (n_chars % 8) + 1 AS w,
      |              ((n_chars * 7) % 8) + 1 AS h,
      |              doc_id % 251 AS seed
      |       FROM documents)""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("m2_frame_sample",
      s"""WITH $mediaCte
         |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
         |       CAST((f * (w * h)) // $FramesPerDoc AS BIGINT) AS frame_off,
         |       CAST(${lumaSql(s"(f * (w * h)) // $FramesPerDoc")} AS BIGINT) AS luma
         |FROM m CROSS JOIN (SELECT unnest(range(0, $FramesPerDoc)) AS f) r
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

    // m1: whole-image decode — width/height come from the PARSED P6
    // header and luma_sum from the raster walk (header length is
    // 11 bytes: "P6\n" + 1-digit w + " " + 1-digit h + "\n255\n").
    Q("m1_media_features",
      s"""WITH $mediaCte
         |SELECT doc_id,
         |       CAST(w AS BIGINT) AS width,
         |       CAST(h AS BIGINT) AS height,
         |       CAST(11 + w * h * 3 AS BIGINT) AS n_bytes,
         |       CAST(COALESCE(list_sum(list_transform(range(0, w * h), j ->
         |         ${lumaSql("j")})), 0) AS BIGINT) AS luma_sum,
         |       CAST(w * 1000 // h AS BIGINT) AS aspect_milli
         |FROM m ORDER BY doc_id""".stripMargin) {
      (s, dir) => features(s, dir).transform(d => graft.Q.sorted(d, "doc_id"))
    })
}
