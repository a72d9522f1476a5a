package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Single-pass text kernels used by the dedup/fingerprint pipelines.
  *
  * These exist because the declarative formulation — `transform(
  * sequence(1, size(w)-2), i -> array_join(slice(w, i, 3), ' '))` with
  * `w = filter(split(text), ...)` — is QUADRATIC under Catalyst:
  * CollapseProject inlines `w` into the lambda (no common-subexpression
  * elimination inside lambdas), so the split+filter re-runs once per
  * shingle position. A typed flatMap/map with these kernels is one pass
  * per document and produces byte-identical results (verified against
  * the DuckDB oracle, which still uses the declarative definition).
  */
object TextKernels {

  /** Whitespace tokens, empties dropped — same as split(' ')+filter. */
  def words(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)

  /** Distinct 3-word shingles in first-occurrence order (matches
    * array_distinct over the positional shingle array). */
  def shingles3(text: String): Array[String] = shingles3Of(words(text))

  /** As [[shingles3]] over an already-tokenized document (lets fused
    * kernels tokenize once). */
  def shingles3Of(w: Array[String]): Array[String] = {
    if (w.length < 3) return Array.empty
    val seen = collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i + 2 < w.length) {
      seen += s"${w(i)} ${w(i + 1)} ${w(i + 2)}"
      i += 1
    }
    seen.toArray
  }

  /** Thread-local digest: `MessageDigest.getInstance` does a provider
    * lookup per call, and the md5 kernels run it once per shingle /
    * feature — tens of millions of times per query at bench scale.
    * One instance per task thread, `reset()` between uses. */
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // manual nibble→char expansion: the previous f"${b}%02x" built a
    // java.util.Formatter PER BYTE (32 per hash) and dominated the
    // digest itself ~5× in profiles
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 31-bit shingle hash: first 15 hex digits of md5, masked — equal to
    * `conv(substring(md5(s),1,15),16,10) & 0x7fffffff`. */
  def shingleHash31(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16) & 0x7fffffffL

  /** Uniform 0..99 bucket: first 16 bits of md5(s) mod 100 — equal to
    * `Sampling.hashBucket` (`conv(substr(md5(s),1,4),16,10)::int % 100`). */
  def md5Bucket100(s: String): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 100
  }

  /** Positional (non-distinct) `n`-word-gram md5s of a document — the
    * scan-side key stream of dupSpanFraction. One tokenization pass;
    * the declarative `transform(sequence..., i -> md5(array_join(
    * slice(w,i,n))))` form re-inlines `w = split(text)` per position
    * (no CSE inside lambdas) and is quadratic per document. */
  def gramMd5s(text: String, n: Int): Array[String] = {
    val w = words(text)
    if (w.length < n) return Array.empty
    val sb = new java.lang.StringBuilder
    Array.tabulate(w.length - (n - 1)) { i =>
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(w(j))
        j += 1
      }
      md5Hex(sb.toString)
    }
  }

  /** Per-document 64-bit SimHash signed bit sums over DISTINCT tokens
    * (order-free: the sums commute) — bit i of a token is bit (3−i%4)
    * of hex digit i/4 of md5(token), i.e. bit (7−i%8) of digest byte
    * i/8. Replaces the explode→groupBy(64 conditional sums) plan with
    * a zero-shuffle scan-side pass; sums are integer so the result is
    * exactly the old aggregate's. */
  def simhashSums(text: String): Array[Int] = {
    val sums = new Array[Int](64)
    val seen = collection.mutable.HashSet.empty[String]
    val md = md5Local.get()
    words(text).foreach { t =>
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(StandardCharsets.UTF_8))
        var i = 0
        while (i < 64) {
          if (((d(i >> 3) >> (7 - (i & 7))) & 1) == 1) sums(i) += 1
          else sums(i) -= 1
          i += 1
        }
      }
    }
    sums
  }

  /** SimHash sums → 16-char hex string: hex digit j packs bits 4j..4j+3,
    * bit = 1 iff its sum is > 0 (ties → 0, matching `when(b > 0, ...)`). */
  def simhashHex(sums: Array[Int]): String = {
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        if (sums(4 * j + b) > 0) v |= 1 << (3 - b)
        b += 1
      }
      out(j) = HexChars(v)
      j += 1
    }
    new String(out)
  }

  /** SimHash sums → 64-bit signature (bit 63−i set iff sums(i) > 0 —
    * the same fixed bijection simhashLong always used). */
  def simhashSig(sums: Array[Int]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) sig |= 1L << (63 - i)
      i += 1
    }
    sig
  }

  /** Winnowing fingerprint: positional (non-distinct) 3-word shingle
    * md5s → window-of-4 minima → sorted distinct minima → one md5 over
    * their concatenation. Returns (fingerprint, n_grams). Matches
    * TextAnalysis.fingerprint's declarative definition. */
  def winnow(text: String): (String, Int) = {
    val w = words(text)
    val hashes =
      if (w.length < 3) Array.empty[String]
      else Array.tabulate(w.length - 2)(i => md5Hex(s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
    val winMins =
      if (hashes.length < 4) hashes
      else Array.tabulate(hashes.length - 3) { p =>
        var m = hashes(p)
        var j = p + 1
        while (j <= p + 3) { if (hashes(j) < m) m = hashes(j); j += 1 }
        m
      }
    val fps = winMins.distinct.sorted
    (md5Hex(fps.mkString("")), fps.length)
  }

  /** Within-document repetition stats (the Gopher-style repetition
    * filter): (n_tokens, count of the most frequent token, count of the
    * most frequent 2-gram; 0 if fewer than 2 tokens). One pass, two
    * small hash maps — fractions are derived declaratively so the
    * rounding matches the oracle. */
  def repetitionStats(text: String): (Long, Long, Long) = {
    val w = words(text)
    if (w.isEmpty) return (0L, 0L, 0L)
    val tok = collection.mutable.HashMap.empty[String, Long]
    val big = collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < w.length) {
      tok.update(w(i), tok.getOrElse(w(i), 0L) + 1L)
      if (i + 1 < w.length) {
        val b = s"${w(i)} ${w(i + 1)}"
        big.update(b, big.getOrElse(b, 0L) + 1L)
      }
      i += 1
    }
    (w.length.toLong, tok.values.max, if (big.isEmpty) 0L else big.values.max)
  }
}
