package graft.pipelines

import graft.SparkSpec

class VcfReconcileSpec extends SparkSpec {
  import spark.implicits._

  // store: unpadded alleles, keyed at the shifted position for indels
  private def store = Seq(
    ("1", 100L, 10L, "snv", "A", "G"),
    ("1", 100L, 11L, "snv", "T", "C"),       // ref disagrees with the VCF's A
    ("1", 201L, 12L, "deletion", "TTC", "-"), // del probe lands at pos+1
    ("1", 301L, 13L, "insertion", "-", "GG"), // ins probe lands at pos+1
    ("1", 401L, 14L, "duplication", "-", "CC")
  ).toDF("chr", "pos", "rgd_id", "var_type", "ref_nuc", "var_nuc")

  private def vcf = Seq(
    ("1", 100L, "A", "G", "single_nucleotide_variant", "rs1"), // snv w/ bad-ref row 11
    ("1", 150L, "C", "T", "single_nucleotide_variant", null),  // not in rgd
    ("1", 200L, "GTTC", "G", "Deletion", null),                // pad-stripped match
    ("1", 300L, "G", "GGG", "Insertion", null),                // non-empty list -> match
    ("1", 400L, "C", "CCC", "Microsatellite", null),           // re-routed to insertion
    ("1", 500L, "GAA", "G", "Microsatellite", null),           // re-routed to deletion
    ("1", 600L, "G", "GT", "Indel", null),
    ("1", 700L, "A", ".", "Variation", null)
  ).toDF("chr", "pos", "ref", "alt", "var_class", "rs_id")

  test("handler routing + pad-shift probes + counters (fixRefAndAllele)") {
    val r = VcfReconcile.run(vcf, store)
    val c = r.counters.as[(String, Long)].collect().toMap
    assert(c("clinvar snv - updated") === 1L)
    assert(c("clinvar snv - not in rgd") === 1L)
    assert(c("clinvar deletion matches rgd") === 1L)
    assert(c("clinvar insertion matches rgd") === 1L)
    assert(c("clinvar ms-insertion matches rgd") === 1L)
    assert(c("clinvar ms-deletion not in rgd") === 1L)
    assert(c("clinvar indel -- not handled") === 1L)
    assert(c("clinvar variation - allele is '.'") === 1L)
  }

  test("snv repair batch carries the first disagreeing store row") {
    val updates = VcfReconcile.run(vcf, store).snvUpdates
      .as[(Long, String, String)].collect().toSet
    assert(updates === Set((11L, "A", "G")))
  }
}
