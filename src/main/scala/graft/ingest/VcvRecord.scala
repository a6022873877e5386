package graft.ingest

/** Canonical nested record emitted by the VCV XML parser — the Spark
  * analog of the reference's in-flight `Record` (Record.java:15-25):
  * one variant core + five child collections (SURVEY §1.1/§2.9).
  */
final case class GeneAssoc(geneId: String, symbol: String)

final case class XdbIdRec(xdbKey: Int, accId: String, notes: String)

final case class MapPosRec(
    assembly: String,
    chromosome: String,
    startPos: Option[Long],
    stopPos: Option[Long],
    cytoBand: String)

final case class HgvsRec(hgvsType: String, name: String)

final case class AliasRec(value: String, notes: String)

final case class VcvRecord(
    symbol: String,               // "CV" + AlleleID (Parser.java:100-103,48-59)
    variationId: String,
    rcvAcc: String,               // first RCVList/RCVAccession (Parser.java:107-120)
    name: String,                 // SimpleAllele/Name (Parser.java:122-127)
    objectType: String,           // lowercased VariantType (Parser.java:129-132)
    altName: String,              // OtherNameList/Name (Parser.java:134-140)
    traitName: String,            // preferred trait + " [RCV]" suffix (Parser.java:431-447)
    clinicalSignificance: String, // TreeSet pipe-merge across assertions (Record.java:114-117)
    reviewStatus: String,
    methodType: String,
    submitter: String,
    notes: String,
    molecularConsequence: String,
    soAccId: String,              // from XML or inferred (Parser.handleSoAccId:610-702)
    refNuc: String,
    varNuc: String,
    dateLastEvaluated: String,    // yyyy-MM-dd (Parser.java:322-329); last assertion wins
    genes: Seq[GeneAssoc],
    xdbIds: Seq[XdbIdRec],
    mapPositions: Seq[MapPosRec],
    hgvsNames: Seq[HgvsRec],
    aliases: Seq[AliasRec])

/** Parse outcome: `status` mirrors the reference skip counters
  * (MULTI_ALLELE_VARIANTS_SKIPPED etc., Parser.java:66-94); `record`
  * is present only for status "ok"; `counters` carries the per-record
  * named-counter increments (classification types, unknown xref DBs —
  * GlobalCounters.java semantics, aggregated relationally downstream).
  */
final case class ParseResult(
    status: String,
    record: Option[VcvRecord],
    counters: Map[String, Long] = Map.empty)

object ParseResult {
  val Ok = "ok"
  val MultiAlleleSkipped = "MULTI_ALLELE_VARIANTS_SKIPPED"
  val GenotypeSkipped = "GENOTYPE_VARIANTS_SKIPPED"
  val HaplotypeSkipped = "HAPLOTYPE_VARIANTS_SKIPPED"
  val NoSimpleAllele = "NO_SIMPLE_ALLELE"
  val ParseError = "PARSE_ERROR"
}
