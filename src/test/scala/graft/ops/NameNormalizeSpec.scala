package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NameNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String*): Seq[String] =
    s.toDF("v").select(NameNormalize.normalizeName($"v")).as[String].collect().toSeq

  test("lowercase, punctuation to space, word-sort, dot-join (TermNameMatcher:135-150)") {
    assert(norm("Usher Syndrome, Type 2") === Seq("2.syndrome.type.usher"))
    // '-' ',' '(' ')' '/' all become spaces; the empty tokens they create
    // are absorbed (Utils.concatenate never emits a leading separator)
    assert(norm("alpha-beta (gamma)/delta") === Seq("alpha.beta.delta.gamma"))
  }

  test("same normalized form = duplicate detection key") {
    assert(norm("Type 2 Usher Syndrome") === norm("Usher Syndrome, Type 2"))
  }

  test("T/B/NK-Cell special case keeps the three terms distinct (TermNameMatcher:141-144)") {
    val a = norm("Severe T Cell- B Cell- NK Cell- SCID")
    val b = norm("Severe T Cell- B Cell+ NK Cell- SCID")
    assert(a !== b)
  }

  test("stripRcvSuffix removes the parser-appended accession (X15)") {
    val out = Seq("Some disease [RCV000123]", "plain").toDF("v")
      .select(NameNormalize.stripRcvSuffix($"v")).as[String].collect().toSeq
    assert(out === Seq("Some disease", "plain"))
  }

  test("termIndex groups accessions by normalized name") {
    val terms = Seq(("DOID:1", "Usher Syndrome, Type 2"), ("DOID:2", "Type 2 Usher Syndrome"),
      ("DOID:3", "other")).toDF("acc", "name")
    val idx = NameNormalize.termIndex(terms, "acc", "name")
      .as[(String, Seq[String])].collect().toMap
    assert(idx("2.syndrome.type.usher") === Seq("DOID:1", "DOID:2"))
    assert(idx("other") === Seq("DOID:3"))
  }
}
