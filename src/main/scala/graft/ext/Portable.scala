package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic primitives, each defined TWICE — as a Spark
  * `Column` builder and as the DuckDB SQL fragment the oracle uses — so
  * the driver's cell-exact compare holds bit-for-bit.
  *
  * Determinism rules (same discipline as [[graft.ops.Sql]]):
  *   - Hashes are sha256-prefix based: identical hex output in both
  *     engines, converted to integers via hex-string cast. No engine-native
  *     hash (Spark xxhash64 vs DuckDB murmur differ).
  *   - Floating-point reductions are sequential left folds in array index
  *     order on BOTH sides (`aggregate` HOF / `list_reduce`), never
  *     engine-native SUM/AVG over groups, so accumulation order is pinned.
  *   - Integer math only where possible (minhash, simhash, jaccard counts);
  *     integer ops are order-independent and exact.
  *
  * Scale design: every primitive here is a *per-row* Column expression —
  * no shuffle, no UDF, fully codegen-friendly — so the heavy lifting
  * (LSH banding joins, inverted-index joins) stays in relational operators
  * Catalyst can plan and AQE can re-balance.
  */
object Portable {

  /** Spread a small-file scan across the cluster before per-row kernel
    * work. The test tables are single parquet files — one input split —
    * so without this every sha256/shingle/cosine pipeline runs on ONE
    * core while 31 idle. Hash-partitioning on the row key costs one tiny
    * shuffle (O(rows), upstream of all the heavy per-row work) and is the
    * same operation a 100 TB run gets for free from many input splits.
    *
    * Round-16 fix (guide §2.5/§7.2, measured): `repartition(col)` with no
    * explicit count is ShuffleOrigin REPARTITION_BY_COL, which AQE's
    * partition coalescing happily folds back to ONE partition when the
    * shuffled BYTES are small — and these rows are small precisely
    * because the heavy work (sha256 per window/shingle, dot products)
    * happens AFTER the exchange. Measured at sf0.1: x_substr_dedup's
    * window-hash stage ran as a single 1.9 s task on one core with 31
    * idle. AQE sizes by bytes and cannot see downstream CPU cost, so the
    * width must be pinned: REPARTITION_BY_NUM (explicit count) is exempt
    * from coalescing. The count is the session's shuffle width — which
    * Bench/production derive from input size — NOT a local constant, so
    * the spread stays scale-adaptive.
    */
  def spread(df: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt,
      col(key))

  /** 32-bit portable hash: first 8 hex chars of sha256 as a long. */
  def hash32(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 8), 16, 10).cast("long")
  def sqlHash32(x: String): String =
    s"CAST(concat('0x', substr(sha256($x), 1, 8)) AS BIGINT)"

  /** 60-bit portable hash (15 hex chars) for low-collision keys. */
  def hash60(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")
  def sqlHash60(x: String): String =
    s"CAST(concat('0x', substr(sha256($x), 1, 15)) AS BIGINT)"

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, " ")
  def sqlTokens(x: String): String = s"string_split($x, ' ')"

  /** Distinct 3-word shingles of a token array (empty when < 3 tokens).
    * Kernel ([[graft.functions.Shingles3K]]): the HOF form re-evaluated
    * the tokenisation inside every per-index lambda. Output order is
    * first-occurrence on the Spark side vs DuckDB `list_distinct`'s
    * unspecified order — immaterial: shingle arrays feed only
    * order-insensitive consumers (counts, min-hash, intersections).
    */
  def shingles3(toks: Column): Column = graft.functions.ArrayOps.shingles3(toks)
  def sqlShingles3(toks: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($toks) - 1, 1)), i -> array_to_string(($toks)[i:i+2], ' ')))"

  // --- MinHash (SURVEY.md north-star dedup) ---
  // k=32 permutations h_i(v) = ((2i+1)*v + b_i) mod P over 32-bit shingle
  // hashes; (2i+1)*v < 2^38 so the modular math never overflows int64 in
  // either engine. b_i = (2654435761*(i+1)) mod P (Knuth multiplicative).
  val MinhashK = 32
  val LshBands = 8
  val LshRows = 4
  val P32 = 4294967311L // smallest prime > 2^32

  /** k-element minhash signature of a (distinct) shingle array.
    * Codegen kernel ([[graft.functions.MinHashSig]]): the equivalent
    * nested-`transform` HOF re-evaluates the sha256 of every shingle once
    * per permutation (32x) because inner lambda expressions re-run per
    * outer element — the kernel hashes once and loops in generated Java,
    * bit-identical output.
    */
  def minhashSig(sh: Column): Column =
    graft.functions.ArrayOps.minhashSig(transform(sh, s => hash32(s)), MinhashK)
  def sqlMinhashSig(sh: String): String =
    s"list_transform(range(0, $MinhashK), i -> list_min(list_transform(" +
      s"list_transform($sh, s -> ${sqlHash32("s")}), " +
      s"v -> ((2*i + 1)*v + (2654435761*(i + 1)) % $P32) % $P32)))"

  /** LSH band keys: signature rows joined 4-at-a-time into 8 band strings. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(LshBands - 1)), j =>
      concat_ws("-", slice(sig, j * LshRows + 1, lit(LshRows))))
  def sqlBandKeys(sig: String): String =
    s"list_transform(range(0, $LshBands), j -> array_to_string(($sig)[j*$LshRows + 1 : j*$LshRows + $LshRows], '-'))"

  // --- SimHash: 32-bit signature over (multiset of) token hashes ---
  // Codegen kernel; the oracle's bit_j(v) = floor(v / 2^j) % 2 is exact
  // (v < 2^32 fits a double, 2^j is an exact power) and equals the
  // kernel's (v >> j) & 1 for non-negative v.
  def simhash32(toks: Column): Column =
    graft.functions.ArrayOps.simhash32(transform(toks, t => hash32(t)))
  // outer CAST: DuckDB list_sum yields HUGEINT -> arrow decimal128, which
  // the driver's value hash formats differently from Spark's int64 even
  // when numerically equal (round-1 d3 hash-red root cause)
  def sqlSimhash32(toks: String): String =
    s"CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN " +
      s"list_sum(list_transform(list_transform($toks, t -> ${sqlHash32("t")}), " +
      s"v -> (CAST(floor(v / power(2.0, j)) AS BIGINT) % 2) * 2 - 1)) >= 0 " +
      s"THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END)) AS BIGINT)"

  // --- Embedding math (sequential double folds, identical order) ---

  /** Dot product of two float arrays as a sequential double fold —
    * codegen kernel ([[graft.functions.DotProductF]]) with the identical
    * index-ascending IEEE accumulation as the `aggregate`-HOF/`list_reduce`
    * definition.
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayOps.dotF(a, b)
  def sqlDot(a: String, b: String): String =
    s"list_reduce(array_concat([0.0], list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)"

  /** Cosine similarity (NULL when either norm is zero). */
  def cosine(a: Column, b: Column): Column = {
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(dot(a, b) / (na * nb))
  }
  def sqlCosine(a: String, b: String): String = {
    val na = s"sqrt(${sqlDot(a, a)})"
    val nb = s"sqrt(${sqlDot(b, b)})"
    s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN NULL ELSE ${sqlDot(a, b)} / ($na * $nb) END"
  }

  /** Polynomial rolling hash of a string's codepoints, mod 1e9+7 —
    * kernel ([[graft.functions.PolyHash]]); the oracle folds
    * `ord(substr(x, i, 1))` per position, same codepoint sequence.
    */
  def fingerprint(c: Column): Column = graft.functions.ArrayOps.polyHash(c)
  def sqlFingerprint(x: String): String =
    s"list_reduce(array_concat([CAST(0 AS BIGINT)], list_transform(range(1, length($x) + 1), " +
      s"i -> ord(substr($x, i, 1)))), (h, v) -> (h * 31 + v) % 1000000007)"
}
