package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM units for the measurement-harness mains (no Spark session):
  * Verify's extra-conf env parsing and ScaleSuite's SCALE.md splicing. */
class HarnessSpec extends AnyFunSuite {

  test("parseExtraConf splits simple k=v pairs") {
    assert(Verify.parseExtraConf("spark.speculation=true,spark.speculation.quantile=0.5") ==
      Seq("spark.speculation" -> "true", "spark.speculation.quantile" -> "0.5"))
  }

  test("parseExtraConf re-joins commas inside a value onto the preceding pair") {
    assert(Verify.parseExtraConf("spark.sql.optimizer.excludedRules=ruleA,ruleB") ==
      Seq("spark.sql.optimizer.excludedRules" -> "ruleA,ruleB"))
    assert(Verify.parseExtraConf("a=1,b=x,y,z,c=2") ==
      Seq("a" -> "1", "b" -> "x,y,z", "c" -> "2"))
  }

  test("parseExtraConf drops a leading no-'=' token instead of crashing") {
    assert(Verify.parseExtraConf("spark.speculation").isEmpty)
    assert(Verify.parseExtraConf("garbage,a=1") == Seq("a" -> "1"))
    assert(Verify.parseExtraConf("") == Seq.empty)
    assert(Verify.parseExtraConf(" , ,a=1, ") == Seq("a" -> "1"))
  }

  test("parseExtraConf keeps '=' inside values intact (split on first only)") {
    assert(Verify.parseExtraConf("spark.driver.extraJavaOptions=-Da=b") ==
      Seq("spark.driver.extraJavaOptions" -> "-Da=b"))
  }

  test("spliceSection replaces an existing marked section in place") {
    val existing = "# SCALE\n\nintro\n\n" +
      s"${ScaleSuite.SectionStart}\nold body\n${ScaleSuite.SectionEnd}\n\ntrailer\n"
    val out = ScaleSuite.spliceSection(existing, "new body")
    assert(out.contains("new body") && !out.contains("old body"))
    assert(out.startsWith("# SCALE\n\nintro"))
    assert(out.contains("trailer"))
    // idempotent: splicing again yields exactly one marked section
    val again = ScaleSuite.spliceSection(out, "newer")
    assert(again.split(java.util.regex.Pattern.quote(ScaleSuite.SectionStart)).length == 2)
    assert(again.contains("newer") && !again.contains("new body"))
    // tiers coexist: the 16x section splices WITHOUT touching the 4x one,
    // and re-splicing either replaces only its own block
    val with16 = ScaleSuite.spliceSection(again, "sixteen body", mult = 16)
    assert(with16.contains("newer") && with16.contains("sixteen body"))
    assert(with16.contains(ScaleSuite.sectionStart(16)))
    val re4 = ScaleSuite.spliceSection(with16, "four again", mult = 4)
    assert(re4.contains("four again") && re4.contains("sixteen body") && !re4.contains("newer"))
    val re16 = ScaleSuite.spliceSection(re4, "sixteen again", mult = 16)
    assert(re16.contains("four again") && re16.contains("sixteen again") &&
      !re16.contains("sixteen body"))
  }

  test("spliceSection appends the section when no markers exist") {
    val out = ScaleSuite.spliceSection("# SCALE\n\nprose only\n", "body")
    assert(out.contains("prose only"))
    assert(out.indexOf(ScaleSuite.SectionStart) > out.indexOf("prose only"))
    assert(out.contains("body\n" + ScaleSuite.SectionEnd))
  }
}
