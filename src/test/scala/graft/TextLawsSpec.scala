package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Law-style invariants for the text-pipeline Column functions, evaluated
  * through the real Spark execution path over generated inputs (one
  * DataFrame pass — scalacheck supplies the strings, Spark the engine). */
class TextLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val genString: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf(" ", "  ", "\t", "\n", ""),
      Gen.const("user@ex-ample.org"),
      Gen.const("https://h.io/p?x=1"),
      Gen.const("555-123-4567"),
      Gen.oneOf("<EMAIL>", "&x;", "é漢字", "..."))
    Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, piece).map(_.mkString(" ")))
  }

  private def samples(n: Int): Seq[String] =
    Gen.listOfN(n, genString).apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)

  test("laws hold over generated strings through the Spark path") {
    val rows = samples(300)
    val df = rows.toDF("t").select(col("t"),
      TextFunctions.normalizeText(col("t")).as("n1"),
      TextFunctions.normalizeText(TextFunctions.normalizeText(col("t"))).as("n2"),
      TextFunctions.redactPii(col("t")).as("r1"),
      TextFunctions.redactPii(TextFunctions.redactPii(col("t"))).as("r2"),
      TextFunctions.dupNgramFraction(col("t"), 2).as("frac"),
      TextFunctions.tokenCount(col("t")).as("tc"),
      TextFunctions.tokenCount(TextFunctions.normalizeText(col("t"))).as("tcn"),
      TextFunctions.dupLineFraction(col("t")).as("lfrac"),
      TextFunctions.fingerprintU(col("t")).as("fp"))
    df.collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getString(1) == r.getString(2), s"normalize not idempotent on ${t.take(40)}")
      assert(r.getString(3) == r.getString(4), s"redact not idempotent on ${t.take(40)}")
      val frac = r.getDouble(5)
      assert(frac >= 0.0 && frac <= 1.0, s"dupNgramFraction out of range: $frac")
      assert(r.getInt(6) == r.getInt(7), s"normalize changed token count on ${t.take(40)}")
      val lf = r.getDouble(8)
      assert(lf >= 0.0 && lf <= 1.0)
      val fp = r.getLong(9)
      assert(fp >= 0L && fp < 2147483647L, s"fingerprint out of range: $fp")
    }
  }
}
