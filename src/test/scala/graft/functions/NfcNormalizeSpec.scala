package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NFC semantics: canonical composition, non-composable residuals,
  * idempotence, the already-normalized fast path, and Column parity.
  * Every non-ASCII codepoint is an EXPLICIT escape -- source-literal
  * composed/decomposed forms are indistinguishable to a reader and at
  * the mercy of editor normalization.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val acute = "\u0301" // combining acute
  private val diaer = "\u0308" // combining diaeresis
  private val eAcuteComposed = "\u00e9" // e-acute, one codepoint
  private val aUmlComposed = "\u00e4" // a-diaeresis, one codepoint

  private def nfc(s: String): String =
    NfcNormalize.compute(UTF8String.fromString(s)).toString

  test("composition, residuals, idempotence") {
    assert(nfc("e" + acute) == eAcuteComposed)
    assert(nfc("a" + diaer) == aUmlComposed)
    // consonant + diaeresis has no composed form: stays two codepoints
    assert(nfc("b" + diaer) == "b" + diaer)
    // double mark: base+diaeresis composes, the acute stays residual
    assert(nfc("a" + diaer + acute) == aUmlComposed + acute)
    // already-NFC text passes through identically (fast path)
    assert(nfc("plain ascii") == "plain ascii")
    assert(nfc(eAcuteComposed) == eAcuteComposed)
    // idempotent
    val messy = "e" + acute + "a" + diaer + acute + "b" + diaer
    assert(nfc(nfc(messy)) == nfc(messy))
    assert(nfc("") == "")
  }

  test("Column path == driver; composed and decomposed spellings unify") {
    val cafeComposed = "caf" + eAcuteComposed
    val cafeDecomposed = "cafe" + acute
    val rows = Seq("e" + acute, eAcuteComposed, "b" + diaer,
      cafeComposed, cafeDecomposed).toDF("s")
      .select(call_function("nfc_normalize", col("s")).as("n"))
      .as[String].collect().toSeq
    assert(rows === Seq(eAcuteComposed, eAcuteComposed, "b" + diaer,
      cafeComposed, cafeComposed))
    // the dedup consequence: both spellings of cafe now compare equal
    assert(rows(3) == rows(4))
  }

  test("strip_accents: marks removed from decomposed AND precomposed " +
    "forms, non-decomposable letters pass, recomposition, fast path") {
    def strip(s: String): String =
      StripAccents.compute(UTF8String.fromString(s)).toString
    val cedilla = "\u0327"
    val cCedilComposed = "\u00e7" // one codepoint c-cedilla
    val oSlash = "\u00f8" // o-slash: no canonical decomposition
    assert(strip("e" + acute) == "e")
    assert(strip(eAcuteComposed) == "e") // precomposed decomposes first
    assert(strip("c" + cedilla) == "c")
    assert(strip(cCedilComposed) == "c")
    assert(strip("b" + diaer) == "b") // non-composable mark still removed
    assert(strip("a" + diaer + acute) == "a") // every stacked mark goes
    assert(strip(oSlash) == oSlash) // nothing to decompose: untouched
    assert(strip("plain ascii") == "plain ascii") // fast path
    assert(strip("re" + acute + "sume" + acute) == "resume")
    assert(strip("") == "")
    // idempotent, and output is NFC (recomposed)
    val messy = "Mu" + diaer + "nchen " + cCedilComposed + oSlash
    assert(strip(strip(messy)) == strip(messy))
    // Column path parity
    val got = Seq("e" + acute, cCedilComposed, oSlash).toDF("s")
      .select(call_function("strip_accents", col("s")).as("n"))
      .as[String].collect().toSeq
    assert(got === Seq("e", "c", oSlash))
  }
}
