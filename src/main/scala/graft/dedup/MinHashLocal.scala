package graft.dedup

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.engine.TextOps

/** Row-local MinHash signing — the per-document computation
  * (tokenize → word 3-gram shingles → per-seed min of
  * md5("h|shingle") → per-band md5 of concatenated minhashes) as pure
  * Scala, byte-identical to the DataFrame pipeline in [[DedupOps]]
  * (proven by StreamingDedupSpec). Used by the native Catalyst
  * expressions (`graft.functions.MinHashSigs` / `BandSigs`) and the
  * streaming dedup operator: signing needs no shuffle at all — the
  * whole corpus is signed map-side and only bucket joins shuffle.
  */
object MinHashLocal {

  private val tokenRe = TextOps.TokenPattern.r

  // one digest per task thread: getInstance does a provider lookup and
  // allocation, and signing calls this millions of times per partition
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  def md5hex(s: String): String = {
    val md = digests.get()
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct word 3-gram shingles; empty for null docs or docs under
    * 3 tokens (null tolerance matches the DataFrame pipeline and the
    * null-safe native expressions — a null text must not kill a
    * streaming query). */
  def shingles(text: String): Set[String] = {
    if (text == null) return Set.empty
    val toks = tokenRe.findAllIn(text.toLowerCase).toArray
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  /** The 16 minhashes, seed order. Empty array for shingle-less docs
    * (mirrors the DataFrame pipeline, where such docs produce no
    * signature rows). */
  def minhashes(text: String): Array[String] = {
    val sh = shingles(text)
    if (sh.isEmpty) Array.empty
    else (0 until DedupOps.NumHashes).map { h =>
      sh.iterator.map(s => md5hex(s"$h|$s")).min
    }.toArray
  }

  /** The 4 band signatures (md5 of each band's concatenated
    * minhashes), band order; empty for shingle-less docs. */
  def bandSigs(text: String): Array[String] = {
    val mh = minhashes(text)
    if (mh.isEmpty) Array.empty
    else {
      val rowsPerBand = DedupOps.NumHashes / DedupOps.Bands
      (0 until DedupOps.Bands).map { b =>
        md5hex(mh.slice(b * rowsPerBand, (b + 1) * rowsPerBand).mkString)
      }.toArray
    }
  }
}
