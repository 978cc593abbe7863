package graft

import java.nio.file.{Files, Paths}

/** The Verify dump must be self-describing about failures: errors.json is
  * always written, empty on a green run, and names the query + exception on
  * a failed one (r10's regression was invisible because failed queries were
  * simply absent from the artifacts).
  */
class VerifyErrorsSpec extends SparkSuite {

  test("Verify.run writes an empty errors.json when the selected queries pass") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    val errs = Verify.run(spark, sf0001, out, Some(Set("q1_pricing_summary")))
    assert(errs.isEmpty)
    assert(Files.readString(Paths.get(s"$out/errors.json")) === "{}")
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    assert(Files.exists(Paths.get(s"$out/q1_pricing_summary")))
  }

  test("Verify.run records a failing query in errors.json instead of dropping it") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    // Nonexistent sfDir → every selected query throws at plan time.
    val errs = Verify.run(spark, s"$out/does-not-exist", out,
      Some(Set("q1_pricing_summary")))
    assert(errs.keySet === Set("q1_pricing_summary"))
    val json = Files.readString(Paths.get(s"$out/errors.json"))
    assert(json.contains("\"q1_pricing_summary\""))
    assert(json !== "{}")
  }
}
