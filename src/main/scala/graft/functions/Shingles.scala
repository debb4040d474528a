package graft.functions

/** Code-point shingling shared by the text kernels (MinHash, SimHash,
  * Jaccard).
  *
  * Both Spark's `substring()` (UTF8String counts code points) and
  * DuckDB's `substr()` index by Unicode CODE POINT, so the oracle
  * replays of every kernel shingle by code point. `java.lang.String`,
  * however, indexes by UTF-16 code unit — shingling with
  * `String.substring` would split surrogate pairs on non-BMP text
  * (emoji, rare CJK) and silently diverge from the oracles. Kernels
  * therefore address grams through this offset table. For BMP-only
  * text the offsets are the identity and results are unchanged.
  */
object Shingles {

  /** Start offset (in UTF-16 units) of each code point of `s`, plus the
    * end offset — `starts.length - 1` is the code-point length, and the
    * i-th 3-gram is `s.substring(starts(i), starts(i + 3))`. */
  def starts(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n + 1)
    var off = 0
    var idx = 0
    while (idx < n) {
      out(idx) = off
      off = s.offsetByCodePoints(off, 1)
      idx += 1
    }
    out(n) = s.length
    out
  }
}
