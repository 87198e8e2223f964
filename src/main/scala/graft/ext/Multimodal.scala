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
    /** Number of sampleable units (pixels / audio samples / frames) —
      * the grid [[frames]] spaces its k offsets over. */
    def pixelCount(payload: Array[Byte]): Long
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
          var v = 0L
          while (i < p.length && p(i) >= '0' && p(i) <= '9') {
            v = v * 10 + (p(i) - '0'); i += 1
            // a hostile header can't push the parse past Int range: the
            // decode contract is LOUD failure, never a silent wrap
            require(v <= Int.MaxValue, s"PPM header value overflows at byte $i")
          }
          vals(vi) = v.toInt; vi += 1
        }
      }
      require(i < p.length && isWs(p(i)), "missing raster separator")
      i += 1
      // bound the raster size in Long math BEFORE any Int product: a
      // declared 100000x100000 frame would wrap w*h*3 negative and turn
      // the truncation require into a silent no-op
      require(vals(0).toLong * vals(1) * 3 <= Int.MaxValue,
        s"raster ${vals(0)}x${vals(1)} exceeds the supported size")
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

    def pixelCount(p: Array[Byte]): Long = {
      val (w, h, _, _) = header(p)
      w.toLong * h
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
  def frames(spark: SparkSession, dir: String, k: Int = FramesPerDoc,
      d: MediaDecoder = PpmDecoder): org.apache.spark.sql.Dataset[FrameFeat] =
    ppmMedia(spark, dir)
      .mapPartitions { it =>
        // everything goes through the MediaDecoder trait — a video
        // deployment swaps in keyframe extraction with the identical
        // batch shape (the k+1 header re-parses per record are tens of
        // header BYTES each; a decoder for which that matters overrides
        // sample with an internal header cache)
        it.flatMap { r =>
          val npix = d.pixelCount(r.payload)
          (0 until k).iterator.map { f =>
            val fo = f * npix / k
            FrameFeat(r.doc_id, f.toLong, fo, d.sample(r.payload, fo))
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
    },

    // m5: whole-clip audio decode — sample_rate/n_samples come from the
    // PARSED RIFF chunks (fmt /data) and peak/abs-sum from the LE16
    // sample walk; the oracle recomputes everything from the synthesis
    // formulas, never seeing the bytes (same adjudication scheme as m1).
    Q("m5_audio_features",
      s"""WITH a AS (SELECT doc_id,
         |             (n_chars % 64) + 16 AS n,
         |             8000 + (doc_id % 4) * 4000 AS sr,
         |             doc_id % 509 AS seed,
         |             CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 0 END AS junk
         |      FROM documents),
         |s AS (SELECT doc_id, n, sr, junk,
         |             list_transform(range(0, n),
         |               i -> abs(((seed + 173 * i) % 4096) - 2048)) AS absv
         |      FROM a)
         |SELECT doc_id,
         |       CAST(sr AS BIGINT) AS sample_rate,
         |       CAST(n AS BIGINT) AS n_samples,
         |       CAST(44 + 2 * n + junk AS BIGINT) AS n_bytes,
         |       CAST(list_max(absv) AS BIGINT) AS peak_abs,
         |       CAST(list_sum(absv) AS BIGINT) AS abs_sum,
         |       CAST(list_sum(absv) * 1000 // n AS BIGINT) AS mean_abs_milli
         |FROM s ORDER BY doc_id""".stripMargin) {
      (s, dir) => audioFeatures(s, dir).transform(d => graft.Q.sorted(d, "doc_id"))
    })

  // --- Audio modality: RIFF/WAVE PCM16 codec (the m1 scheme, second
  // modality) ---

  /** Decoded whole-clip features — all exact integers. */
  final case class AudioFeatures(
      sampleRate: Long, nSamples: Long, nBytes: Long,
      peakAbs: Long, absSum: Long)

  /** Pure-JVM RIFF/WAVE PCM16 decoder: validates the RIFF/WAVE magic,
    * then WALKS the chunk list (id + LE32 size, content, odd sizes
    * padded to even per the RIFF spec) — unknown chunks are skipped, so
    * payloads carrying extra metadata chunks (cue/LIST/fact, common in
    * the wild) decode identically to minimal ones. `fmt ` must declare
    * PCM mono 16-bit; `data` samples are signed little-endian int16.
    */
  object WavDecoder extends Serializable {
    private def le32(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    private def le16s(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) | (p(i + 1) << 8)).toShort.toInt
    private def tag(p: Array[Byte], i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse chunks: (sampleRate, data offset, data byte length). */
    def header(p: Array[Byte]): (Int, Int, Int) = {
      require(p.length >= 12 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE",
        "not a RIFF/WAVE payload")
      var i = 12
      var sampleRate = -1
      var dataOff = -1
      var dataLen = -1
      while (i + 8 <= p.length && (sampleRate < 0 || dataOff < 0)) {
        val id = tag(p, i)
        val sz = le32(p, i + 4)
        require(sz >= 0 && i + 8 + sz <= p.length, s"chunk $id overruns payload")
        if (id == "fmt ") {
          require(sz >= 16, "fmt chunk too short")
          // PCM fmt content layout: format@0, channels@2, rate@4,
          // byteRate@8, blockAlign@12, bitsPerSample@14 (offsets from
          // content start = i + 8)
          require(le16s(p, i + 8) == 1, "only PCM supported")
          require(le16s(p, i + 10) == 1, "only mono supported")
          require(le16s(p, i + 22) == 16, "only 16-bit supported")
          sampleRate = le32(p, i + 12)
        } else if (id == "data") {
          dataOff = i + 8
          dataLen = sz
        }
        i += 8 + sz + (sz & 1) // RIFF pads odd-sized chunks to even
      }
      require(sampleRate > 0, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      (sampleRate, dataOff, dataLen)
    }

    def features(p: Array[Byte]): AudioFeatures = {
      val (sr, off, len) = header(p)
      require(len % 2 == 0, "odd PCM16 data length")
      val n = len / 2
      var peak = 0L
      var sum = 0L
      var j = 0
      while (j < n) {
        val a = math.abs(le16s(p, off + 2 * j).toLong)
        if (a > peak) peak = a
        sum += a
        j += 1
      }
      AudioFeatures(sr.toLong, n.toLong, p.length.toLong, peak, sum)
    }
  }

  /** Deterministic PCM16 payload for a document: sample count from
    * `n_chars`, rate/seed from `doc_id`; sample i is
    * `((seed + 173 i) mod 4096) - 2048` (wraps several times per clip,
    * so signs mix). Every third payload carries a 12-byte `cue ` chunk
    * between `fmt ` and `data` — the decoder must chunk-walk past it,
    * not assume the canonical 44-byte layout. As with [[buildPpm]], the
    * decode side never sees these formulas — it parses the bytes.
    */
  def buildWav(docId: Long, nChars: Long): Array[Byte] = {
    val n = (nChars % 64 + 16).toInt
    val sr = (8000 + (docId % 4) * 4000).toInt
    val seed = (docId % 509).toInt
    val junk = if (docId % 3 == 0) 12 else 0
    val out = new Array[Byte](44 + junk + 2 * n)
    def put4(i: Int, s: String): Unit = {
      var k = 0; while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def le32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    put4(0, "RIFF"); le32(4, 36 + junk + 2 * n); put4(8, "WAVE")
    put4(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sr)
    le32(28, sr * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    var off = 36
    if (junk > 0) { put4(off, "cue "); le32(off + 4, 4); off += 12 }
    put4(off, "data"); le32(off + 4, 2 * n)
    var i = 0
    while (i < n) {
      le16(off + 8 + 2 * i, ((seed + 173 * i) % 4096) - 2048); i += 1
    }
    out
  }

  final case class WavRec(doc_id: Long, payload: Array[Byte])
  final case class AudioFeat(
      doc_id: Long, sample_rate: Long, n_samples: Long, n_bytes: Long,
      peak_abs: Long, abs_sum: Long, mean_abs_milli: Long)

  /** The audio table: one deterministic WAV payload per document (at
    * 100 TB this is the parquet `binary` column; the synthesis map
    * disappears). */
  def wavMedia(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[WavRec] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as(Encoders.product[DocDims])
      .mapPartitions(_.map(d => WavRec(d.doc_id, buildWav(d.doc_id, d.n_chars))))(
        Encoders.product[WavRec])

  def audioFeatures(spark: SparkSession, dir: String): DataFrame =
    wavMedia(spark, dir)
      .mapPartitions { it =>
        it.map { r =>
          val f = WavDecoder.features(r.payload)
          AudioFeat(r.doc_id, f.sampleRate, f.nSamples, f.nBytes,
            f.peakAbs, f.absSum, f.absSum * 1000L / f.nSamples)
        }
      }(Encoders.product[AudioFeat])
      .toDF()
}
