package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ClinVar VCV XML ingest (SURVEY §2.1 S2-S5, §3.1).
  *
  * The reference hand-rolls input splitting: it stream-reads the ~70 GB
  * .xml.gz single-threaded, cuts it into ~35 MB gz chunks at
  * `</VariationArchive>` boundaries, writes XML header/trailer wrappers,
  * then fork-joins over chunks (ParseGroup.splitInputFileIntoChunks,
  * ParseGroup.java:156-216). In Spark that entire mechanism is the text
  * source with a custom record delimiter: the scan splits on HDFS block
  * boundaries and the reader re-synchronizes on the delimiter, so every
  * partition gets whole records with no wrapper files, no staging chunks
  * and no single-threaded pre-pass. (For one giant .gz the first stage
  * is still single-stream — gzip is not splittable — so production runs
  * stage the raw feed to an uncompressed/zstd landing dir once; after
  * that every scan is fully parallel.)
  *
  * Parsing is a pure `flatMap` per record (VcvParser) and skip handling
  * becomes a status column aggregated relationally — the Spark version
  * of GlobalCounters (K7).
  */
object XmlIngest {

  val RecordEnd = "</VariationArchive>"

  /** Raw record strings: one row per `<VariationArchive>...</...>`.
    * Splits on the record-end tag (the reference's `recordEnd` config,
    * AppConfigure.xml:28); header/trailer fragments (anything without a
    * record-start tag) are dropped; the Unicode-minus fixup
    * (ParseGroup.readLine, ParseGroup.java:218-229, S4) is applied here.
    */
  def readRecords(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read
      .option("lineSep", RecordEnd)
      .textFile(path)
      .filter(_.contains("<VariationArchive"))
      .map { frag =>
        val start = frag.indexOf("<VariationArchive")
        frag.substring(start).replace('−', '-') + RecordEnd
      }
  }

  /** Parse raw records into (status, nested record) rows. */
  def parseRecords(raw: Dataset[String]): Dataset[ParseResult] = {
    import raw.sparkSession.implicits._
    raw.map(VcvParser.parse)
  }

  /** The canonical nested variants frame (status == ok only). */
  def variants(parsed: Dataset[ParseResult]): DataFrame = {
    import parsed.sparkSession.implicits._
    parsed.filter(_.status == ParseResult.Ok).flatMap(_.record).toDF()
  }

  /** The relational GlobalCounters dump (K7, GlobalCounters.java:10-30):
    * skip/ok statuses UNIONed with the per-record named counters
    * (classification types, unknown xref DBs), alphabetical.
    */
  def counters(parsed: Dataset[ParseResult]): DataFrame = {
    import parsed.sparkSession.implicits._
    val statusCounts = parsed.groupBy(col("status").as("counter")).count()
    val namedCounts = parsed
      .flatMap(_.counters.toSeq)
      .toDF("counter", "n")
      .groupBy("counter")
      .agg(sum(col("n")).as("count"))
    statusCounts.unionByName(namedCounts).orderBy("counter")
  }

  /** Flat child views mirroring the Oracle child tables (§1.3): each
    * derives from the same nested frame by explode — no re-parse.
    */
  def geneAssociations(variants: DataFrame): DataFrame =
    variants.select(col("symbol"), explode(col("genes")).as("g"))
      .select(col("symbol"), col("g.geneId"), col("g.symbol").as("geneSymbol"))

  def xdbIds(variants: DataFrame): DataFrame =
    variants.select(col("symbol"), explode(col("xdbIds")).as("x"))
      .select(col("symbol"), col("x.xdbKey"), col("x.accId"), col("x.notes"))

  def mapPositions(variants: DataFrame): DataFrame =
    variants.select(col("symbol"), explode(col("mapPositions")).as("m"))
      .select(col("symbol"), col("m.assembly"), col("m.chromosome"),
        col("m.startPos"), col("m.stopPos"), col("m.cytoBand"))

  def hgvsNames(variants: DataFrame): DataFrame =
    variants.select(col("symbol"), explode(col("hgvsNames")).as("h"))
      .select(col("symbol"), col("h.hgvsType"), col("h.name"))

  def aliases(variants: DataFrame): DataFrame =
    variants.select(col("symbol"), explode(col("aliases")).as("a"))
      .select(col("symbol"), col("a.value"), col("a.notes"))

  /** S6: the `gene_condition_source_id` TSV dim — skip `#` comments,
    * project (concept CUI, gene id, OMIM id), aggregate the CUI+gene ->
    * [OMIM] multimap (VariantAnnotator.loadConceptToOmimMap,
    * VariantAnnotator.java:636-688). Returned as a DataFrame to be
    * broadcast into the annotate join (J8).
    */
  def conceptToOmim(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)
      .select(
        col("_c0").as("gene_id"),
        col("_c2").as("concept_cui"),
        col("_c6").as("omim_id"))
      .filter(col("omim_id").isNotNull && col("concept_cui").isNotNull)
      .groupBy("concept_cui", "gene_id")
      .agg(array_sort(collect_set(col("omim_id"))).as("omim_ids"))
}
