package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for CO-LOCATED joins — the third leg of the
  * join strategy triad (broadcast small dims / shuffle + AQE / bucketed
  * co-location) the engine leans on at 100 TB.
  *
  * A pipeline's per-document side tables (quality scores, language tags,
  * near-dup cluster labels, MinHash signature snapshots) are joined back to
  * the corpus on the SAME key over and over. Writing both sides bucketed by
  * that key (`bucketBy` + `sortBy`, hash-partitioned into a fixed bucket
  * count recorded in the catalog) makes every subsequent equi-join
  * shuffle-free: Spark matches bucket specs and plans a SortMergeJoin with
  * NO Exchange on either side — the 100 TB corpus is never re-partitioned
  * for a join it was already laid out for. `BucketedJoinSpec` pins exactly
  * that plan shape (zero Exchange operators, join present).
  *
  * Scale notes:
  *  - pick `buckets` once per key domain (≈ total-cores × small multiple;
  *    both sides must match for the exchange-free plan);
  *  - `sortBy` on the key lets the merge join skip the per-task sort when
  *    bucket files are single-file (spark.sql.sources.v1 bucketing reads
  *    sorted buckets; with multiple files per bucket Spark inserts only a
  *    local sort, never a shuffle);
  *  - bucket pruning: equality filters on the bucket key scan 1/buckets of
  *    the files.
  */
object Bucketed {

  /** Validate + backtick-quote a (possibly dotted db.table) name.
    * Quoting lets RESERVED WORDS (`table`, `order`, …) survive the DDL and
    * identifier parsers; validation catches characters Spark's catalog
    * rejects regardless of quoting (SessionCatalog.validateName allows only
    * [A-Za-z0-9_]) — an unquoted/unvalidated `crawl-2026` otherwise fails
    * deep inside CTAS with a confusing parse or catalog error. */
  private def quoted(table: String): String = {
    val parts = table.split('.')
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z0-9_]+")),
      s"invalid table name '$table': Spark's session catalog only accepts " +
        "letters, digits and underscores in table/schema names " +
        "(use corpus_2026, not corpus-2026)")
    parts.map(p => "`" + p + "`").mkString(".")
  }

  /** Write `df` as a bucketed (and in-bucket sorted) table at `path`,
    * registered as `table` in the session catalog. Overwrites. */
  def write(df: DataFrame, table: String, path: String,
            keyCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(table)}")
    df.write
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .option("path", path)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(quoted(table))
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * reading the parquet path directly would LOSE the bucket spec and
    * reintroduce the shuffle). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(quoted(table))

  /** Append a batch to an existing bucketed table (the per-batch posture
    * of the incremental snapshot tiers: each batch's projection lands in
    * its hash bucket, schema and bucket spec validated by Spark against
    * the catalog). Each append adds one file per non-empty bucket — run
    * the table's compactor periodically so bucket scans stay
    * few-files-per-bucket (see [[graft.ops.Dedup.compactWindowSnapshot]]). */
  def append(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    // the writer must redeclare the table's exact bucket spec or Spark
    // rejects the append — read it from the catalog so callers can't drift
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val bs = spark.sessionState.catalog.getTableMetadata(ident).bucketSpec
      .getOrElse(throw new IllegalArgumentException(
        s"table $table is not bucketed — append is for Bucketed.write tables"))
    val w = df.write
      .bucketBy(bs.numBuckets, bs.bucketColumnNames.head, bs.bucketColumnNames.tail: _*)
    val ws = if (bs.sortColumnNames.isEmpty) w
      else w.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
    ws.format("parquet").mode("append").saveAsTable(quoted(table))
  }
}
