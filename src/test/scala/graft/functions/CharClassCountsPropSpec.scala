package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the one-pass char census: hundreds of random
  * strings mixing ASCII, multi-byte BMP chars, and supplementary
  * (surrogate-pair) code points, against an independent
  * java.util.regex reference — the exact semantics the expression
  * replaced. Direct expression eval, no Spark job. Seeded. */
class CharClassCountsPropSpec extends AnyFunSuite {

  private def ref(s: String): (Long, Long, Long, Long) = {
    val nChars = s.codePointCount(0, s.length).toLong
    def kept(re: String) = {
      val r = s.replaceAll(re, "")
      r.codePointCount(0, r.length).toLong
    }
    (nChars,
      nChars - kept("[^A-Za-z0-9 ]"),
      nChars - kept("[0-9]"),
      nChars - kept("[{}()\\[\\];=<>]"))
  }

  test("expression counts equal the regex reference on random unicode strings") {
    val genChar: Gen[String] = Gen.frequency(
      5 -> Gen.asciiPrintableChar.map(_.toString),
      2 -> Gen.oneOf('{', '}', '(', ')', '[', ']', ';', '=', '<', '>')
        .map(_.toString),
      2 -> Gen.oneOf("é", "ü", "中", "文", "ß", "ñ"),
      1 -> Gen.oneOf("😀", "🚀"), // emoji (surrogate pairs)
      1 -> Gen.oneOf("\t", "\n", " "))
    val genStr: Gen[String] =
      Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(300)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      Prop.forAll(genStr) { s =>
        val row = CharClassCountsExpr.compute(UTF8String.fromString(s))
        val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
        got == ref(s)
      })
    assert(res.passed, res.toString)
  }
}
