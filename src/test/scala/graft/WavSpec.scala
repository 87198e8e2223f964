package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.WavDecoder

/** The WAV codec contract: decode(buildWav) recovers exactly what the
  * synthesis formulas say (the two derivations the m5 oracle gate pits
  * against each other), the chunk walk skips unknown and odd-sized
  * chunks per the RIFF spec, and malformed payloads fail loudly.
  */
class WavSpec extends SparkTestBase {

  test("decode(buildWav) matches the synthesis formulas, junk-chunk and canonical layouts alike") {
    for (docId <- 0L to 20L; nChars <- Seq(0L, 1L, 63L, 64L, 1000L)) {
      val p = Multimodal.buildWav(docId, nChars)
      val f = WavDecoder.features(p)
      val n = nChars % 64 + 16
      val seed = docId % 509
      val junk = if (docId % 3 == 0) 12 else 0
      assert(f.sampleRate == 8000 + (docId % 4) * 4000)
      assert(f.nSamples == n)
      assert(f.nBytes == 44 + junk + 2 * n)
      val abs = (0L until n).map(i => math.abs((seed + 173 * i) % 4096 - 2048))
      assert(f.peakAbs == abs.max, s"doc $docId")
      assert(f.absSum == abs.sum, s"doc $docId")
    }
  }

  test("chunk walk skips an ODD-sized unknown chunk via the RIFF pad byte") {
    // hand-build: RIFF | WAVE | fmt (16) | junk 'LIST' sz=3 (+1 pad) | data
    val samples = Seq[Int](-2048, 0, 2047, 173)
    val n = samples.length
    val out = new Array[Byte](44 + 8 + 3 + 1 + 2 * n)
    def put4(i: Int, s: String): Unit = (0 until 4).foreach(k => out(i + k) = s.charAt(k).toByte)
    def le32(i: Int, v: Int): Unit = (0 until 4).foreach(k => out(i + k) = (v >> (8 * k)).toByte)
    def le16(i: Int, v: Int): Unit = (0 until 2).foreach(k => out(i + k) = (v >> (8 * k)).toByte)
    put4(0, "RIFF"); le32(4, out.length - 8); put4(8, "WAVE")
    put4(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    put4(36, "LIST"); le32(40, 3) // odd size: content 3 bytes + 1 pad
    put4(48, "data"); le32(52, 2 * n)
    samples.zipWithIndex.foreach { case (s, i) => le16(56 + 2 * i, s) }
    val f = WavDecoder.features(out)
    assert(f.sampleRate == 8000 && f.nSamples == n)
    assert(f.peakAbs == 2048 && f.absSum == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("malformed payloads fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      WavDecoder.features("RIFFxxxxNOPE".getBytes)
    }
    // truncated: data chunk claims more bytes than the payload holds
    val p = Multimodal.buildWav(1L, 10L)
    intercept[IllegalArgumentException] {
      WavDecoder.features(p.take(p.length - 2))
    }
    // stereo declared: decoder only supports mono
    val s = Multimodal.buildWav(1L, 10L).clone()
    s(22) = 2
    intercept[IllegalArgumentException] { WavDecoder.features(s) }
  }
}
