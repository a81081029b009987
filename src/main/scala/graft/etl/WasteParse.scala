package graft.etl

import java.util.Locale

/** Pure parse/normalize functions for the phase-2 waste-item ETL —
  * behavioral parity with `waste_items.py:45-248` (SURVEY.md §2.2 P3/P4,
  * §2.8 F5/F6/F9).
  *
  * Kept as plain Scala (no Spark types) so the semantics are unit- and
  * property-testable in isolation; the pipeline wraps [[parseTargets]]
  * in a UDF (SURVEY §2.9 — v1 UDF; candidate custom codegen Expression
  * later). All comparisons are Locale.ROOT-lowercased: German umlauts
  * must fold identically across JVMs (SURVEY §7 hard-part 6).
  */
object WasteParse {

  /** Targets that are WasteStream nodes, not facilities
    * (`waste_items.py:35-41`). */
  val wasteStreams: Set[String] = Set(
    "Restabfalltonne", "Biotonne", "Altpapiertonne",
    "Verpackungstonne", "Verpackungstonne (Gelbe Tonne)")

  /** CSV-variant → canonical facility name (`waste_items.py:45-58`):
    * typo fixes, embedded tab variants, synonyms. */
  val facilityNameMap: Map[String, String] = Map(
    "Fachhandel/Hersteller" -> "Fachhandel / Hersteller",
    "Fachhandel / Herstelle" -> "Fachhandel / Hersteller",
    "Mobile Elektrokleingerätesam-mlung" -> "Mobile Elektrokleingerätesammlung",
    "Abfallumladeanlage FES" -> "FES-Abfallumladeanlage",
    "Abfallumladeanlage (FES)" -> "FES-Abfallumladeanlage",
    "Abfallumladeanlage" -> "FES-Abfallumladeanlage",
    "Abfallumladeanlage \tFES" -> "FES-Abfallumladeanlage",
    "Schadstoffsammlung FES" -> "Schadstoffsammlung",
    "Schadstoffsammlung \tFES" -> "Schadstoffsammlung",
    "Schadstoffsammlung\t FES" -> "Schadstoffsammlung",
    "Schadstoffmobil FES" -> "Schadstoffsammlung",
    "Restmülltonne" -> "Restabfalltonne")

  /** Known facility names, longest-first — order is a *semantic*
    * requirement of the consume-once extraction, not an optimization
    * (`waste_items.py:181-182`, SURVEY §4). Literal strings; matching is
    * case-insensitive substring search.
    */
  val knownFacilityNames: Seq[String] = Seq(
    "Altkleidercontainer im öffentlichen Straßenraum",
    "Self Service am Wertstoffhof Nord",
    "Mobile Elektrokleingerätesam-mlung",
    "Mobile Elektrokleingerätesammlung",
    "Verpackungstonne (Gelbe Tonne)",
    "Öffentliche Gebäude / Einzelhandel",
    "Öffentliche Gebäude/Einzelhandel",
    "Fachhandel / Hersteller",
    "Fachhandel/Hersteller",
    "Abfallumladeanlage FES",
    "FES-Abfallumladeanlage",
    "Altpapiersortieranlage",
    "FES-Aktenvernichtung",
    "Deponiepark Wicker",
    "Rhein-Main-Deponie",
    "FES-Servicecenter",
    "Containergestellung",
    "Schadstoffsammlung",
    "Wertstoffhof Nord",
    "Wertstoffhof West",
    "Wertstoffhof Süd",
    "Wertstoffhof Ost",
    "Kofferraumservice",
    "Recyclingzentrum",
    "Verpackungstonne",
    "Altglascontainer",
    "Restabfalltonne",
    "Altpapiertonne",
    "Kleiderspende",
    "Möbelspende",
    "Sachspende",
    "Wertstoffinsel",
    "Altölverordnung",
    "Klamoddekurier",
    "Betriebshöfe FES",
    "Auf Anfrage",
    "Sperrmüll",
    "GWR GmbH",
    "RMB GmbH",
    "FFR GmbH",
    "Biotonne",
    "easi")

  private val stopSubstrings = Seq(
    "laut ", "hinweis", " = ", "stück", "mengen", "kartons", "polizei",
    "elektrische zahnbürste", "sonst ", "selbstgebaut", "aus dem handel",
    "haushaltsübliche", "saubere ", "größere ", "kleinere ")

  private val stopPrefixes = Seq("laut", "ab ", "bis ", "lauut")

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** F5: canonical facility name with identity fallback
    * (`waste_items.py:66-69`). */
  def normalizeFacilityName(name: String): String = {
    val t = name.trim
    facilityNameMap.getOrElse(t, t)
  }

  /** P4: facility-name-vs-note predicate (`waste_items.py:72-120`). */
  def isValidFacilityName(raw: String): Boolean = {
    val name = raw.trim
    if (name.isEmpty || name.length < 3) return false
    val l = lower(name)
    if (stopSubstrings.exists(l.contains)) return false
    if (stopPrefixes.exists(l.startsWith)) return false
    if (l.contains(" oder ")) return false
    true
  }

  /** F6: ordered, case-insensitive, consume-once multi-pattern
    * extraction (`waste_items.py:174-237`). Each found occurrence is
    * blanked (replaced by a single space) before later—shorter—patterns
    * run, so "Verpackungstonne (Gelbe Tonne)" never also matches the
    * bare "Verpackungstonne".
    */
  def extractFromConcat(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var remaining = text
    for (pattern <- knownFacilityNames) {
      val pl = lower(pattern)
      var idx = lower(remaining).indexOf(pl)
      while (idx >= 0) {
        val matched = remaining.substring(idx, idx + pattern.length)
        out += normalizeFacilityName(matched)
        remaining = remaining.substring(0, idx) + " " + remaining.substring(idx + pattern.length)
        idx = lower(remaining).indexOf(pl)
      }
    }
    out.result()
  }

  /** The full target parse (`waste_items.py:123-171`): newline split,
    * note filtering, concat extraction for long single-line cells,
    * normalization, set-dedup. Returns distinct targets (order:
    * first occurrence).
    */
  def parseTargets(disposalText: String): Seq[String] = {
    if (disposalText == null || disposalText.trim == "-" || disposalText.trim.isEmpty)
      return Seq.empty
    val multiline = disposalText.contains("\n")
    val parts = if (multiline) disposalText.split("\n").toSeq else Seq(disposalText)
    val targets = Seq.newBuilder[String]
    for (p0 <- parts) {
      val part = p0.trim
      if (part.nonEmpty && part != "-") {
        if (!multiline && part.length > 30) {
          targets ++= extractFromConcat(part)
            .filter(isValidFacilityName).map(normalizeFacilityName)
        } else if (isValidFacilityName(part)) {
          targets += normalizeFacilityName(part)
        } else {
          targets ++= extractFromConcat(part)
            .filter(isValidFacilityName).map(normalizeFacilityName)
        }
      }
    }
    targets.result().distinct
  }

  /** P3: section-marker rows — single letter, empty disposal column
    * (`waste_items.py:240-248`). */
  def isSectionMarker(abfallart: String, entsorgungsweg: String): Boolean = {
    val a = Option(abfallart).getOrElse("").trim
    val e = Option(entsorgungsweg).getOrElse("").trim
    a.length == 1 && a.charAt(0).isLetter && e.isEmpty
  }
}
