package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention-defense triggers (Bench.triggerReason): which
  * first-pass timings earn a fresh re-measurement, and why. Pinned here so
  * a floor/ratio tweak that silently exempts a regression class (the
  * round-8 review found exactly that: `med > 0.15` exempted every
  * sub-150 ms query) breaks a test instead of an audit. */
class BenchTriggerSpec extends AnyFunSuite {

  test("regressed: a sub-150 ms query slowing 12x now trips the trigger") {
    // 0.01 s -> 0.12 s is a genuine 12x regression the old 0.15 floor hid
    assert(Bench.triggerReason(Seq(0.12, 0.12, 0.12), Some(0.01)).contains("regressed"))
    // below the 0.10 s floor stays exempt — noise-dominated territory
    assert(Bench.triggerReason(Seq(0.09, 0.09, 0.09), Some(0.01)).isEmpty)
    // at exactly 1.25x of the previous median: boundary stays exempt
    assert(Bench.triggerReason(Seq(0.5, 0.5, 0.5), Some(0.4)).isEmpty)
    // the round-13 contention band (1.3-1.6x, code unchanged) now trips:
    // q67 shipped 2.44 -> 3.17 (1.3x) while soaking 1x-flat
    assert(Bench.triggerReason(Seq(3.17, 3.17, 3.17), Some(2.44)).contains("regressed"))
    // no previous artifact: the regression leg cannot fire
    assert(Bench.triggerReason(Seq(5.0, 5.0, 5.0), None).isEmpty)
  }

  test("spread: reps spanning >4x flag in-run contention without any previous file") {
    assert(Bench.triggerReason(Seq(0.4, 0.5, 2.5), None).contains("spread"))
    // median below the 0.3 s spread floor: exempt
    assert(Bench.triggerReason(Seq(0.05, 0.06, 0.25), None).isEmpty)
  }

  test("both triggers at once report the combined reason") {
    // med 0.6 > 2 * 0.2 (regressed) and 2.8/0.4 = 7x span (spread)
    assert(Bench.triggerReason(Seq(0.4, 0.6, 2.8), Some(0.2)).contains("regressed+spread"))
  }

  test("empty timings (all-error query) never trigger") {
    assert(Bench.triggerReason(Seq.empty, Some(0.1)).isEmpty)
  }

  test("bestOf takes the key-wise minimum across history (r20 verdict #1)") {
    // the q163 laundering scenario: r19 recorded 7.30 (loaded host), r20
    // then read 6.15 as an "improvement" — min over history keeps the
    // 2.36 idle-era baseline in force, so 6.15 trips the trigger
    val hist = Bench.bestOf(Seq(
      Map("q163" -> 2.36, "q01" -> 0.10),
      Map("q163" -> 7.30, "q01" -> 0.09),
      Map("q163" -> 6.15)))
    assert(hist("q163") == 2.36)
    assert(hist("q01") == 0.09)
    assert(Bench.triggerReason(Seq(6.15, 6.15, 6.15), hist.get("q163"))
      .contains("regressed"))
  }

  test("parsePrev rejects pre-full_plan artifacts (not comparable)") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec")
    val old = dir.resolve("BENCH_r05.json")
    java.nio.file.Files.write(old,
      """{"metric":"total","action":"count","queries":{"q163":0.40}}""".getBytes("UTF-8"))
    assert(Bench.parsePrev(old).isEmpty)
    val nw = dir.resolve("BENCH_r19.json")
    java.nio.file.Files.write(nw,
      """{"metric":"total","action":"full_plan","queries":{"q163":7.30}}""".getBytes("UTF-8"))
    assert(Bench.parsePrev(nw) == Map("q163" -> 7.30))
  }
}
