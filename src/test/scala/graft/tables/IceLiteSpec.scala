package graft.tables

import graft.SparkSpec

/** IceLite snapshot-table invariants, focused on compaction: a long
  * append history must keep a bounded physical file count without
  * changing content or invalidating older snapshot reads.
  */
class IceLiteSpec extends SparkSpec {
  import spark.implicits._

  test("compaction bounds file count over a long append history; content and old reads intact") {
    val t = new IceLite(spark, tmpDir("icelite"))
    val appendsPerCycle = 50
    val cycles = 6
    var expect = Set.empty[Long]
    var maxFiles = 0
    var preCompactVersion = 0
    (0 until cycles).foreach { c =>
      (0 until appendsPerCycle).foreach { i =>
        val base = (c * appendsPerCycle + i) * 10L
        t.append((base until base + 10L).toDF("id"), s"delta c=$c i=$i", coalesceTo = 2)
        expect ++= (base until base + 10L)
      }
      preCompactVersion = t.currentVersion
      maxFiles = math.max(maxFiles, t.filesAt(t.currentVersion).length)
      // tiny target → compacts to a handful of files regardless of cycle
      t.compact(targetFileBytes = 64L << 20, lineage = s"compact c=$c")
      val after = t.filesAt(t.currentVersion)
      assert(after.length <= 2, s"cycle $c left ${after.length} files")
      // content unchanged
      assert(t.read().as[Long].collect().toSet == expect)
      // the pre-compaction snapshot still reads (old files remain)
      assert(t.readAt(preCompactVersion).as[Long].collect().toSet == expect)
    }
    // without compaction the table would hold cycles×appendsPerCycle×2
    // files; with it, growth resets every cycle
    assert(maxFiles <= appendsPerCycle * 2 + 2)
    assert(t.filesAt(t.currentVersion).length <= 2)
  }

  test("compact is a no-op near the target file count and on empty tables") {
    val t = new IceLite(spark, tmpDir("icelite2"))
    assert(t.compact(1L << 20) == 0)
    t.append(Seq(1L, 2L).toDF("id"), "d1", coalesceTo = 1)
    val v = t.currentVersion
    // 1 file ≤ 2×target-count ⇒ no new version
    assert(t.compact(1L << 30) == v)
    assert(t.currentVersion == v)
  }
}
