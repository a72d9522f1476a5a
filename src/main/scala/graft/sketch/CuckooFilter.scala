package graft.sketch

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}

/** Cuckoo filter (Fan et al., CoNEXT'14 — public paper): approximate
  * membership with the SAME superset contract as a Bloom filter
  * ("might contain" is never false for an inserted key) plus two
  * things a Bloom cannot do: DELETE support and ~2-probe lookups.
  * The north-rule's URL-seen structure names "bloom/cuckoo" — this is
  * the cuckoo half, pluggable wherever the sharded seen-filter store
  * uses a Bloom shard (`FilterShardStore(kind = "cuckoo")`).
  *
  * Layout: `numBuckets` buckets × 4 slots of 16-bit fingerprints
  * (0 = empty; fingerprint 0 remaps to 1). Partial-key cuckoo hashing:
  * a key hashes to bucket i1 and fingerprint fp; its alternate bucket
  * is i2 = i1 XOR h(fp) — an involution, so eviction never needs the
  * original key. Displacement loops bound at `MaxKicks`; if a kick
  * chain overflows, the evicted fingerprint goes to a small overflow
  * stash that `mightContain` also probes — the no-false-negative
  * contract survives overload instead of silently breaking (the
  * classic construction just fails the insert).
  *
  * Space: 16 bits × 4 / 0.95 load ≈ 8.4 bits/key at FPP ≈ 2·4/2^16 ≈
  * 0.012% — an order of magnitude below a 1%-FPP Bloom's ~9.6
  * bits/key FPP, or ~half the bits of a Bloom at equal FPP. At the
  * 10^10-URL design point a 0.01%-class FPP matters: with 10^10 probes
  * a 1% filter forwards 10^8 rows to the exact anti-join, a 0.01%
  * filter 10^6.
  *
  * Determinism: eviction victims come from a per-instance LCG seeded
  * constantly, so the same insert sequence always yields the same
  * table — shard files are byte-reproducible.
  *
  * NOT thread-safe (same as the Spark BloomFilter it substitutes:
  * one writer task builds a shard, readers only probe).
  */
final class CuckooFilter private (
    private val numBuckets: Int, // power of two
    private val table: Array[Short],
    private var stash: List[Long], // full 64-bit key hashes
    private var nItems: Long,
    private var rngState: Long
) {
  import CuckooFilter._

  def this(expectedItems: Long) = this(
    CuckooFilter.bucketCountFor(expectedItems),
    new Array[Short](CuckooFilter.bucketCountFor(expectedItems) * CuckooFilter.SlotsPerBucket),
    Nil, 0L, 0x9E3779B97F4A7C15L)

  def cardinality: Long = nItems
  def stashSize: Int = stash.size
  def sizeBytes: Long = table.length.toLong * 2

  private def mask: Int = numBuckets - 1

  /** i2 = i1 XOR h(fp): an involution over the bucket space. `fp` is
    * masked to its unsigned 16-bit value so Short sign-extension can
    * never split the pair. */
  private def altBucket(b: Int, fp: Int): Int = {
    val f = fp & 0xFFFF
    (b ^ (scala.util.hashing.MurmurHash3.finalizeHash(f, 1) & mask)) & mask
  }

  private def slotBase(b: Int): Int = b * SlotsPerBucket

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def nextRand(bound: Int): Int = {
    rngState = rngState * 6364136223846793005L + 1442695040888963407L
    (((rngState >>> 33) % bound).toInt + bound) % bound
  }

  def put(key: String): Unit = {
    val h = keyHash(key)
    val fp = fingerprintOf(h)
    val b1 = bucketOf(h, mask)
    if (tryInsertAt(b1, fp) || tryInsertAt(altBucket(b1, fp), fp)) { nItems += 1; return }
    // displace: walk a kick chain from a pseudo-randomly chosen start
    var b = if (nextRand(2) == 0) b1 else altBucket(b1, fp)
    var cur = fp
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = slotBase(b) + nextRand(SlotsPerBucket)
      val evicted = table(slot)
      table(slot) = cur
      cur = evicted
      b = altBucket(b, cur & 0xFFFF)
      if (tryInsertAt(b, cur)) { nItems += 1; return }
      kicks += 1
    }
    // overload: stash the displaced FINGERPRINT's full key hash is
    // unknown (it may be a prior key's), so stash the fingerprint+bucket
    // pair packed in a long — probed by the same (fp, bucket-or-alt) rule
    stash = packStash(b, cur & 0xFFFF) :: stash
    nItems += 1
  }

  def mightContain(key: String): Boolean = {
    val h = keyHash(key)
    val fp = fingerprintOf(h)
    val b1 = bucketOf(h, mask)
    containsAt(b1, fp) || containsAt(altBucket(b1, fp), fp) || stashHas(b1, fp)
  }

  private def containsAt(b: Int, fp: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  private def stashHas(b1: Int, fp: Short): Boolean =
    stash.nonEmpty && {
      val f = fp & 0xFFFF
      val p1 = packStash(b1, f)
      val p2 = packStash(altBucket(b1, fp), f)
      stash.exists(e => e == p1 || e == p2)
    }

  /** Delete ONE copy of the key's fingerprint (the cuckoo advantage a
    * Bloom lacks). Only sound for keys that were actually inserted —
    * deleting a never-inserted key may evict a colliding key's
    * fingerprint, exactly as the published construction specifies. */
  def remove(key: String): Boolean = {
    val h = keyHash(key)
    val fp = fingerprintOf(h)
    val b1 = bucketOf(h, mask)
    val hit = removeAt(b1, fp) || removeAt(altBucket(b1, fp), fp) || {
      val f = fp & 0xFFFF
      val p1 = packStash(b1, f)
      val p2 = packStash(altBucket(b1, fp), f)
      val before = stash.size
      var dropped = false
      stash = stash.filter { e =>
        if (!dropped && (e == p1 || e == p2)) { dropped = true; false } else true
      }
      stash.size != before
    }
    if (hit) nItems -= 1
    hit
  }

  private def removeAt(b: Int, fp: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  def writeTo(os: OutputStream): Unit = {
    val d = new DataOutputStream(os)
    d.writeInt(Magic)
    d.writeInt(numBuckets)
    d.writeLong(nItems)
    d.writeLong(rngState)
    d.writeInt(stash.size)
    stash.foreach(d.writeLong)
    var i = 0
    while (i < table.length) { d.writeShort(table(i).toInt); i += 1 }
    d.flush()
  }
}

object CuckooFilter {
  private[sketch] val SlotsPerBucket = 4
  private val MaxKicks = 500
  private val Magic = 0x43554b46 // "CUKF"

  /** buckets = next power of two ≥ items / (slots × 0.95 load). */
  def bucketCountFor(expectedItems: Long): Int = {
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * 0.95)).toLong)
    var b = 1
    while (b < needed && b < (1 << 30)) b <<= 1
    b
  }

  private def keyHash(key: String): Long = {
    // two independent 32-bit murmur3 passes → 64 bits (public algorithm,
    // scala-library implementation; no Spark-internal dependency)
    val lo = scala.util.hashing.MurmurHash3.stringHash(key, 0x12345678)
    val hi = scala.util.hashing.MurmurHash3.stringHash(key, 0x87654321)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }

  private def fingerprintOf(h: Long): Short = {
    val fp = ((h >>> 48) & 0xFFFF).toInt
    (if (fp == 0) 1 else fp).toShort
  }

  private def bucketOf(h: Long, mask: Int): Int = (h & mask).toInt

  private def packStash(bucket: Int, fp: Int): Long =
    (bucket.toLong << 16) | fp.toLong

  def readFrom(is: InputStream): CuckooFilter = {
    val d = new DataInputStream(is)
    val magic = d.readInt()
    require(magic == Magic, f"not a cuckoo filter file (magic 0x$magic%08x)")
    val numBuckets = d.readInt()
    val nItems = d.readLong()
    val rngState = d.readLong()
    val nStash = d.readInt()
    val stash = List.fill(nStash)(d.readLong())
    val table = new Array[Short](numBuckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = d.readShort(); i += 1 }
    new CuckooFilter(numBuckets, table, stash, nItems, rngState)
  }
}
