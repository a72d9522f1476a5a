package graft

/** The whole-surface executed-plan audit as a TEST GATE: every
  * SparkEntry query runs at sf0.001 and its post-AQE plan must be free
  * of cartesian products and unsanctioned BroadcastNestedLoopJoins —
  * an accidental all-pairs plan can never land silently.
  *
  * Runtime: ~60-90 s at sf0.001 on the 4-core test session (the whole
  * 50+-query surface executes once); the per-query counts stay
  * available via `runMain graft.PlanAudit <sfDir>` for by-hand audits
  * at bigger scale factors.
  */
class PlanAuditSpec extends SparkSpec {

  test("no SparkEntry query plans a cartesian product or an unsanctioned BNLJ") {
    val sfDir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sfDir)),
      s"driver testdata missing at $sfDir")
    val flagged = PlanAudit.auditAll(spark, sfDir)
    assert(flagged.isEmpty, s"flagged plans:\n  ${flagged.mkString("\n  ")}")
  }
}
