package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {

  private def keys(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"https://host${i % 97}.example/$tag/page-$i")

  test("no false negatives at design load, FPP far below bloom-class 1%") {
    val n = 200000
    val cf = new CuckooFilter(n)
    val ins = keys(n, "in")
    ins.foreach(cf.put)
    assert(ins.forall(cf.mightContain), "false negative on an inserted key")
    val probes = keys(200000, "out")
    val fp = probes.count(cf.mightContain)
    // 16-bit fingerprints, 4-slot buckets: theoretical FPP ≈ 8/2^16 ≈ 0.012%
    assert(fp < 200, s"FPP ${fp / 200000.0} not in the 16-bit-fingerprint class")
    assert(cf.cardinality == n)
  }

  test("overload beyond design capacity keeps the superset contract via the stash") {
    val cf = new CuckooFilter(1000)
    // 4× the design load: kick chains must overflow into the stash,
    // and every inserted key must STILL probe true
    val ins = keys(4000, "over")
    ins.foreach(cf.put)
    assert(cf.stashSize > 0, "expected stash use at 4x overload (test premise)")
    assert(ins.forall(cf.mightContain), "overflow broke the no-false-negative contract")
  }

  test("delete removes a key (the operation a bloom cannot do)") {
    val cf = new CuckooFilter(10000)
    val ins = keys(5000, "del")
    ins.foreach(cf.put)
    val victims = ins.take(500)
    victims.foreach(k => assert(cf.remove(k), s"remove($k) missed"))
    assert(cf.cardinality == 4500)
    // removed keys MAY still collide-probe true, but the survivors must
    // all remain present, and most removals must actually clear
    assert(ins.drop(500).forall(cf.mightContain))
    val stillThere = victims.count(cf.mightContain)
    assert(stillThere < 25, s"$stillThere/500 deleted keys still probe true")
  }

  test("serialization round-trips bit-identically and deterministically") {
    val cf = new CuckooFilter(50000)
    keys(50000, "ser").foreach(cf.put)
    val out = new java.io.ByteArrayOutputStream()
    cf.writeTo(out)
    val bytes = out.toByteArray
    val back = CuckooFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(back.cardinality == cf.cardinality)
    assert(keys(50000, "ser").forall(back.mightContain))
    // same insert sequence → byte-identical shard file (LCG seeded
    // constantly), so shard files are reproducible across rebuilds
    val cf2 = new CuckooFilter(50000)
    keys(50000, "ser").foreach(cf2.put)
    val out2 = new java.io.ByteArrayOutputStream()
    cf2.writeTo(out2)
    assert(java.util.Arrays.equals(bytes, out2.toByteArray))
    // and the reader rejects a bloom-format file instead of misreading
    val junk = Array.fill[Byte](64)(7)
    intercept[IllegalArgumentException] {
      CuckooFilter.readFrom(new java.io.ByteArrayInputStream(junk))
    }
  }

  test("space: ~8.4 bits/key at design load — about half a 1%-FPP bloom") {
    val n = 1000000L
    val cf = new CuckooFilter(n)
    val bitsPerKey = cf.sizeBytes * 8.0 / n
    // next-pow2 rounding can at worst double the table; at n = 10^6 the
    // rounding lands close to the ideal 16/0.95 ≈ 16.8 bits... per SLOT
    // pair; with 4 slots/bucket the per-key figure is ≤ 2× the ideal
    assert(bitsPerKey <= 34, s"$bitsPerKey bits/key — sizing off")
  }
}
