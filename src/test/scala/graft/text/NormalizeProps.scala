package graft.text

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * ScalaCheck laws for the normalization contract (SURVEY.md §5.3):
 * idempotence, closure over the survivor alphabet, the title-key prefix
 * relation, ISBN-13 shape, authorMatch symmetry, levenshtein metric laws.
 */
object NormalizeProps extends Properties("Normalize") {
  import Normalize._

  private val edgeChar: Gen[Char] = Gen.oneOf(
    'ä', 'å', 'ö', 'Ä', 'Å', 'Ö', 'ß', 'é', 'Š', '€', '日', ' ', '.', '[', '`')
  private val anyText: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.frequency(3 -> Gen.alphaNumChar, 2 -> edgeChar)).map(_.mkString),
    1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)
      .suchThat(c => !Character.isSurrogate(c))).map(_.mkString))

  private val survivors: Set[Int] =
    ((0x30 to 0x39) ++ (0x41 to 0x7A) ++ Seq(0xC4, 0xC5, 0xD6, 0xE4, 0xE5, 0xF6)).toSet

  property("idempotent") = forAll(anyText) { s =>
    normalize(normalize(s)) == normalize(s)
  }

  property("output closed over survivor alphabet, lowercased") = forAll(anyText) { s =>
    normalize(s).codePoints().toArray.forall(cp =>
      survivors.contains(cp) && !(cp >= 'A' && cp <= 'Z') &&
        cp != 0xC4 && cp != 0xC5 && cp != 0xD6)
  }

  property("createTitleKey is a prefix of normalize (both strip spaces)") =
    forAll(anyText) { s =>
      normalize(s).startsWith(createTitleKey(s))
    }

  property("isbn10to13 yields 978 + 9 digits + check") =
    forAll(Gen.listOfN(9, Gen.numChar).map(_.mkString),
      Gen.oneOf(Gen.numChar, Gen.const('X'))) { (nine, last) =>
      val out = isbn10to13(nine + last)
      out.isDefined && out.get.length == 13 && out.get.startsWith("978" + nine) &&
        out.get.forall(_.isDigit)
    }

  property("authorMatch symmetric") =
    forAll(Gen.alphaStr, Gen.alphaStr) { (a, b) =>
      authorMatch(a, b) == authorMatch(b, a)
    }

  property("levenshtein: identity, symmetry, bounded") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val d = levenshteinBytes(ab, bb)
      levenshteinBytes(ab, ab) == 0 &&
        d == levenshteinBytes(bb, ab) &&
        d <= math.max(ab.length, bb.length)
    }

  property("minhash signature deterministic and length-k") = {
    val (a1, b1) = graft.functions.SignatureCoefficients.linearPerms(16, 42L)
    val (a2, b2) = graft.functions.SignatureCoefficients.linearPerms(16, 42L)
    Prop(a1.sameElements(a2) && b1.sameElements(b2) && a1.forall(x => (x & 1L) == 1L))
  }
}
