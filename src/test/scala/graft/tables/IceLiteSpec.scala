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

  test("vacuum deletes only files exclusive to expired versions; retained reads intact") {
    val t = new IceLite(spark, tmpDir("icelite_vac"))
    (0 until 10).foreach { i =>
      t.append(Seq(i.toLong).toDF("id"), s"d$i", coalesceTo = 1)
    }
    t.compact(64L << 20, "compact")      // v11 rewrites everything
    val preFiles = t.filesAt(11)
    // keep 2: v10's delta files are all still referenced → nothing dies
    assert(t.vacuum(keepVersions = 2) == 0)
    assert(t.readAt(10).as[Long].collect().toSet == (0L until 10L).toSet)
    // keep 1: only the compacted v11 survives; the 10 pre-compaction
    // delta files are exclusive to expired versions and are deleted
    assert(t.vacuum(keepVersions = 1) == 10)
    assert(t.read().as[Long].collect().toSet == (0L until 10L).toSet)
    assert(t.filesAt(11) == preFiles)
    // expired manifests are gone
    intercept[Exception] { t.readAt(5) }
    // vacuuming again is a no-op
    assert(t.vacuum(keepVersions = 1) == 0)
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
