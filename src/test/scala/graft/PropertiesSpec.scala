package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Norm

/** Property-based invariants (SURVEY §5.2) — plan-time functions; runs under
  * sbt's native ScalaCheck framework (no scalatestplus bridge needed).
  */
object NormProperties extends Properties("graft.norm") {

  private val anyString: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    1 -> Gen.alphaNumStr,
    1 -> Gen.listOf(Gen.oneOf(' ', '-', '_', '(', ')', 'a', 'Z', '9', 'é', '中'))
      .map(_.mkString))

  property("normIdentifier idempotent") = Prop.forAll(anyString) { s =>
    val once = Norm.normIdentifier(s)
    Norm.normIdentifier(once) == once
  }

  property("normIdentifier charset [a-z0-9_], clean edges") =
    Prop.forAll(anyString) { s =>
      val out = Norm.normIdentifier(s)
      out.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == '_') &&
        !out.startsWith("_") && !out.endsWith("_") && !out.contains("__")
    }

  property("tableNameFromFile strips extension then normalizes") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { stem =>
      Norm.tableNameFromFile(s"$stem.csv") == Norm.normIdentifier(stem) &&
        Norm.tableNameFromFile(s"$stem.CSV") == Norm.normIdentifier(stem)
    }

  property("minhash coefficients in range, a_j odd") =
    Prop.forAll(Gen.choose(0, 63)) { j =>
      val (a, b) = graft.ops.Dedup.minhashCoeffs(j)
      a > 0 && a <= graft.ops.Dedup.MinhashP && a % 2 == 1 &&
        b >= 0 && b < graft.ops.Dedup.MinhashP
    }

  property("hyperplane signs deterministic and balanced-ish") = Prop {
    val s1 = graft.functions.Vectors.hyperplaneSigns(8, 64)
    val s2 = graft.functions.Vectors.hyperplaneSigns(8, 64)
    val pos = s1.flatten.count(_ > 0)
    s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq &&
      pos > 8 * 64 / 4 && pos < 8 * 64 * 3 / 4
  }

  private def jw(a: String, b: String): Double =
    graft.plans.JaroWinkler.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  property("jaro-winkler symmetric and bounded to [0,1]") =
    Prop.forAll(anyString, anyString) { (a, b) =>
      val s = jw(a, b)
      s == jw(b, a) && s >= 0.0 && s <= 1.0
    }

  property("jaro-winkler identity: nonempty self-similarity is 1") =
    Prop.forAll(anyString.suchThat(_.nonEmpty)) { s =>
      jw(s, s) == 1.0
    }
}
