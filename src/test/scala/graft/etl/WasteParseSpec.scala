package graft.etl

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class WasteParseSpec extends AnyFunSuite {
  import WasteParse._

  /** Raw-ScalaCheck bridge (scalatestplus is not in the offline cache). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
  private def forAll(f: String => Boolean): Unit = check(Prop.forAll(f))

  test("simple stream target passes through") {
    assert(parseTargets("Biotonne") === Seq("Biotonne"))
    assert(parseTargets("Altpapiertonne") === Seq("Altpapiertonne"))
  }

  test("dash and empty yield no targets") {
    assert(parseTargets("-") === Seq.empty)
    assert(parseTargets("") === Seq.empty)
    assert(parseTargets(null) === Seq.empty)
    assert(parseTargets("  -  ") === Seq.empty)
  }

  test("synonym normalization: Restmülltonne → Restabfalltonne") {
    assert(parseTargets("Restmülltonne") === Seq("Restabfalltonne"))
  }

  test("typo normalization in multiline cell") {
    assert(parseTargets("Fachhandel / Herstelle\nSchadstoffsammlung FES") ===
      Seq("Fachhandel / Hersteller", "Schadstoffsammlung"))
  }

  test("long single-line concat splits consume-once, longest-first") {
    assert(parseTargets("Wertstoffhof Nord Wertstoffhof West Schadstoffsammlung") ===
      Seq("Schadstoffsammlung", "Wertstoffhof Nord", "Wertstoffhof West"))
  }

  test("consume-once: composite pattern does not double-match its prefix") {
    // 'Verpackungstonne (Gelbe Tonne)' must not also yield bare 'Verpackungstonne'
    assert(extractFromConcat("Verpackungstonne (Gelbe Tonne)") ===
      Seq("Verpackungstonne (Gelbe Tonne)"))
    // 'Self Service am Wertstoffhof Nord' must not also yield 'Wertstoffhof Nord'
    assert(extractFromConcat("Self Service am Wertstoffhof Nord") ===
      Seq("Self Service am Wertstoffhof Nord"))
  }

  test("note lines are filtered, extraction fallback still runs") {
    assert(parseTargets("Biotonne\nLaut FES: Kleinmengen") === Seq("Biotonne"))
    // short invalid line with an embedded known name → extracted
    assert(parseTargets("1 Stück = Sperrmüll") === Seq("Sperrmüll"))
  }

  test("' oder ' combined names are rejected") {
    assert(!isValidFacilityName("Biotonne oder Restabfalltonne"))
  }

  test("case-insensitive matching preserves found casing, then normalizes") {
    assert(extractFromConcat("BIOTONNE") === Seq("BIOTONNE"))
  }

  test("section markers: single letter + empty disposal") {
    assert(isSectionMarker("A", ""))
    assert(isSectionMarker(" Ä ", " "))
    assert(!isSectionMarker("A", "Biotonne"))
    assert(!isSectionMarker("AB", ""))
    assert(!isSectionMarker("1", ""))
  }

  test("property: parse output is distinct and contains no invalid names") {
    forAll { s =>
      val out = parseTargets(s)
      out == out.distinct &&
        out.forall(t => isValidFacilityName(t) || facilityNameMap.values.exists(_ == t))
    }
  }

  test("property: every extracted name is (a normalization of) a known pattern") {
    val canon = knownFacilityNames.map(n => n.toLowerCase(java.util.Locale.ROOT)).toSet
    forAll { s =>
      extractFromConcat(s).forall { name =>
        val deNorm = facilityNameMap.find(_._2 == name).map(_._1).getOrElse(name)
        canon.contains(deNorm.toLowerCase(java.util.Locale.ROOT)) ||
          canon.contains(name.toLowerCase(java.util.Locale.ROOT))
      }
    }
  }

  test("property: extraction consumes — match count bounded by input length") {
    forAll { s =>
      extractFromConcat(s).size <= (s.length / 4 + 1)
    }
  }
}
