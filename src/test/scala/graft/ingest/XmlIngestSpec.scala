package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class XmlIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val samplePath =
    graft.SparkEntry.fixturePath("data/fixtures/vcv_sample.xml")

  private lazy val parsed = XmlIngest.parseRecords(XmlIngest.readRecords(spark, samplePath))
  private lazy val vars = XmlIngest.variants(parsed)

  test("record splitter: 5 VariationArchive records, release wrapper dropped (S2)") {
    val raw = XmlIngest.readRecords(spark, samplePath).collect()
    assert(raw.length === 5)
    assert(raw.forall(_.startsWith("<VariationArchive")))
    assert(raw.forall(_.endsWith("</VariationArchive>")))
  }

  test("skip logic + counters: statuses + named classification counters (F1/F2/F4/K7)") {
    val counts = XmlIngest.counters(parsed).as[(String, Long)].collect().toMap
    assert(counts === Map(
      "ok" -> 3L,
      ParseResult.MultiAlleleSkipped -> 1L,
      ParseResult.GenotypeSkipped -> 1L,
      // CLASSIFICATION_AGGREGATE_<type> (Parser.java:272): record 1 only
      "CLASSIFICATION_AGGREGATE_GermlineClassification" -> 1L,
      // per-submission (Parser.java:341): 2 assertions in record 1 + 1 in record 5
      "CLASSIFICATION_PER_SUBMISSION_GermlineClassification" -> 3L))
  }

  test("full record: variant core fields (§2.9)") {
    val r = parsed.filter(_.status == "ok").flatMap(_.record)
      .collect().find(_.symbol == "CV15091").get
    assert(r.variationId === "2")
    assert(r.rcvAcc === "RCV000000012")
    assert(r.objectType === "indel")
    assert(r.altName === "AP5Z1, 4-BP DEL/22-BP INS, NT80")
    // TreeSet pipe-merges across the two assertions (Record.java:120-143)
    assert(r.clinicalSignificance === "likely pathogenic|pathogenic")
    assert(r.reviewStatus === "criteria provided, single submitter|no assertion criteria provided")
    assert(r.methodType === "clinical testing|literature only")
    assert(r.submitter === "LT|Lab Two|OMIM")
    assert(r.notes === "A curator note.")
    assert(r.dateLastEvaluated === "2015-01-02") // last assertion wins
    assert(r.molecularConsequence === "indel")
    assert(r.soAccId === "SO:1000032") // from the XML MolecularConsequence ID
    assert(r.refNuc === "GGAT")
    assert(r.varNuc === "TGCTGTAAACTGTAACTGTAAA")
    assert(r.traitName === "HEREDITARY SPASTIC PARAPLEGIA 48 [RCV000000012]")
  }

  test("child collections: genes, positions (swap-normalized), hgvs (type canonicalized)") {
    val r = parsed.filter(_.status == "ok").flatMap(_.record)
      .collect().find(_.symbol == "CV15091").get
    assert(r.genes === Seq(GeneAssoc("9907", "AP5Z1")))
    // GRCh37 row had start>stop in the fixture -> swap-normalized (X10)
    val g37 = r.mapPositions.find(_.assembly == "GRCh37").get
    assert(g37.startPos === Some(4820844L) && g37.stopPos === Some(4820847L))
    assert(r.mapPositions.exists(_.cytoBand == "7p22.1"))
    // "HGVS, protein, RefSeq" -> protein_refseq (X4)
    assert(r.hgvsNames.map(_.hgvsType).toSet === Set("coding", "protein_refseq"))
  }

  test("xref routing: OMIM allele split, dbSNP, ORPHA strip, ignore list, PubMed (F8/X2/X5/X6)") {
    val r = parsed.filter(_.status == "ok").flatMap(_.record)
      .collect().find(_.symbol == "CV15091").get
    val xdb = r.xdbIds.map(x => (x.xdbKey, x.accId)).toSet
    assert(xdb.contains((52, "RCV000000012")))  // RCV
    assert(xdb.contains((53, "613653.0001")))   // OMIM allele
    assert(xdb.contains((6, "613653")))         // OMIM gene from allele id
    assert(xdb.contains((6, "613647")))         // assertion trait OMIM
    assert(xdb.contains((48, "397704705")))     // dbSNP rs
    assert(xdb.contains((62, "306511")))        // Orphanet, ORPHA stripped
    assert(xdb.contains((54, "C3150901")))      // MedGen (trait Name XRef + CUI)
    assert(xdb.contains((145, "MONDO:0013342")))
    assert(xdb.contains((11, "20613862")))      // PubMed citation
    assert(xdb.contains((3, "9907")))           // NCBI gene
    assert(xdb.contains((21, "HGNC:22197")))
    assert(!xdb.exists(_._2.contains("VAR_064583"))) // UniProtKB ignored
  }

  test("aliases: MedGen name admitted with RCV note (F7)") {
    val r = parsed.filter(_.status == "ok").flatMap(_.record)
      .collect().find(_.symbol == "CV15091").get
    assert(r.aliases === Seq(AliasRec("Hereditary spastic paraplegia 48", "RCV000000012")))
  }

  test("minimal record: SO inference from variant type (X11)") {
    val r = parsed.filter(_.status == "ok").flatMap(_.record)
      .collect().find(_.symbol == "CV99").get
    assert(r.soAccId === "SO:0001483") // single nucleotide variant
    assert(r.traitName === "")
    assert(r.rcvAcc === "")
  }

  test("flattened child views explode without re-parse (§1.3)") {
    assert(XmlIngest.xdbIds(vars).filter($"xdbKey" === 52).count() === 2)
    assert(XmlIngest.geneAssociations(vars).count() === 2)
    assert(XmlIngest.mapPositions(vars).count() === 4)
    assert(XmlIngest.hgvsNames(vars).count() === 2)
    assert(XmlIngest.aliases(vars).count() === 1)
  }

  test("SO inference unit cases (Parser.handleSoAccId:610-702)") {
    assert(VcvParser.inferSoAccId("", "deletion", "", "") === "SO:0000159")
    assert(VcvParser.inferSoAccId("SO:1000064", "deletion", "", "") === "SO:0000159") // obsolete dropped
    assert(VcvParser.inferSoAccId("SO:0001583", "deletion", "", "") === "SO:0001583") // XML wins
    assert(VcvParser.inferSoAccId("", "variation", "missense_variant", "") === "SO:0001583")
    assert(VcvParser.inferSoAccId("", "variation", "", "EXON 2 DUPLICATION") === "SO:1000035")
    assert(VcvParser.inferSoAccId("", "variation", "", "weird") === "SO:0001059")
    assert(VcvParser.inferSoAccId("", "protein only", "", "") === "SO:0001816")
  }

  test("concept-to-OMIM TSV dim scan (S6)") {
    val tsv = java.nio.file.Files.createTempFile("gene_condition", ".tsv")
    java.nio.file.Files.writeString(tsv,
      "#GeneID\tGeneSymbol\tConceptID\tDiseaseName\tSourceName\tSourceID\tDiseaseMIM\n" +
        "9907\tAP5Z1\tC3150901\tSPG48\tOMIM\tx\t613647\n" +
        "9907\tAP5Z1\tC3150901\tSPG48b\tOMIM\ty\t613648\n" +
        "123\tOTHER\tC999\tz\tOMIM\tz\t600000\n")
    val dim = XmlIngest.conceptToOmim(spark, tsv.toString)
      .as[(String, String, Seq[String])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(dim(("C3150901", "9907")) === Seq("613647", "613648"))
    assert(dim(("C999", "123")) === Seq("600000"))
  }
}
