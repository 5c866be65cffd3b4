package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink surface (SURVEY.md §2b "File formats /
  * connectors": the reference reads plain text + JSON config and writes
  * one JSON file — everything else is new engine surface on Spark's
  * built-in connectors).
  *
  * Conventions for scale:
  *  - readers take an explicit schema where the format can't carry one
  *    (csv/json) — schema inference is a full extra pass over the data,
  *    never acceptable at 100 TB;
  *  - csv/json writers exist for interchange; parquet is the engine's
  *    native format (columnar, predicate pushdown, column pruning — the
  *    things §4's plans rely on).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: `path/col=value/...`. At scale this
    * is what turns a predicate on the partition column into directory
    * pruning — the scan never opens non-matching files (PartitionFilters
    * in the plan; asserted in AdvancedSpec).
    */
  def writePartitionedParquet(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC: the other columnar format warehouses hand over — same
    * pushdown/pruning properties as parquet through Spark's native
    * reader, so ingesting an ORC-resident corpus needs no conversion
    * pass.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Small-files hygiene: write parquet with the file count sized to
    * `targetBytes` per file from the optimizer's size estimate. At
    * 100 TB both failure modes are real — thousands of KB-files per
    * partition drown the driver in listing/task overhead, and one
    * giant file serializes downstream scans — and the fix is the same
    * repartition-before-write. The estimate is the logical plan's
    * (pre-compression) sizeInBytes, so actual files land smaller by
    * roughly the parquet compression ratio; `targetBytes` is a ceiling
    * knob, not a promise. Uses round-robin repartition: even file sizes,
    * no ordering assumption.
    */
  def writeCompacted(df: DataFrame, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes.max(BigInt(1))
    val ceilDiv = (estimated + targetBytes - 1) / targetBytes
    // without CBO, join/agg plans estimate sizeInBytes multiplicatively
    // (can overshoot by orders of magnitude) — clamp by the physical
    // partition count, which tracks actual data volume: more than 8
    // output files per input partition means the estimate, not the data,
    // is big
    val partitionClamp = math.max(df.rdd.getNumPartitions * 8, 1)
    val nFiles = ceilDiv.min(BigInt(partitionClamp)).max(BigInt(1)).toInt
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed-table storage (r9 verdict item 3): persist a table
    * hash-bucketed AND per-bucket-sorted on its join key, so every later
    * join between tables bucketed the same way runs SHUFFLE-FREE — the
    * scan itself satisfies the join's required distribution. This is the
    * standard 100 TB answer for a key joined repeatedly (doc_id,
    * user_id, vec_id): pay the shuffle once at write time, never again
    * per query. Registered as an external parquet table (metadata in the
    * session catalog, data at `path`); read it back with
    * `spark.table(table)` — a plain `spark.read.parquet` would see the
    * data but not the bucket spec, and re-shuffle.
    *
    * The pre-write `repartition(buckets, key)` aligns the write tasks
    * with the bucket hash (both are pmod(Murmur3)), yielding ONE file
    * per bucket — the layout where Spark can also elide the SMJ's sort.
    * Plan shape (SortMergeJoin, zero Exchange on either side) is pinned
    * in PlanSpec's q458 test.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, bucketCol: String): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Zone-map (data-skipping) storage — the Delta/Iceberg file-skipping
    * pattern without a table format: data is range-clustered on
    * `zoneCol` at write time (`repartitionByRange` + within-file sort,
    * so each file owns a narrow value band), and a tiny per-file
    * [min, max] manifest is persisted next to it. A later range
    * predicate consults the manifest FIRST and hands Spark only the
    * intersecting files — at 100 TB a selective band touches a handful
    * of files instead of listing-and-opening all of them, and parquet's
    * own row-group min/max pushdown then prunes within each file. The
    * manifest is file-count-sized (KBs for thousands of files), read
    * once per query on the driver.
    *
    * The manifest pass re-reads ONLY the zone column of the just-written
    * data (column-pruned scan) because Spark surfaces no per-file
    * footer-stats API at write time; at cluster scale this costs one
    * narrow scan per table write, amortized over every pruned read.
    */
  def writeWithZoneMap(df: DataFrame, path: String, zoneCol: String,
                       nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    df.repartitionByRange(nFiles, col(zoneCol))
      .sortWithinPartitions(zoneCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    spark.read.parquet(s"$path/data")
      .select(input_file_name().as("file"),
        col(zoneCol).cast("double").as("z"))
      .groupBy("file")
      .agg(min("z").as("zmin"), max("z").as("zmax"),
        count(lit(1)).cast("long").as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_zonemap")
  }

  /** Manifest consultation for [lo, hi): returns (files whose
    * [zmin, zmax] zone intersects the band, total file count). Exposed
    * separately so tests pin the pruning ratio. The collect is bounded
    * by the manifest's file count — fail loudly if a caller points this
    * at something manifest-shaped but huge.
    */
  def zoneMapFiles(spark: SparkSession, path: String, lo: Double,
                   hi: Double): (Seq[String], Int) = {
    val cap = 1000000
    val rows = spark.read.parquet(s"$path/_zonemap")
      .select("file", "zmin", "zmax").limit(cap + 1).collect()
    require(rows.length <= cap,
      s"zone-map manifest at $path exceeds $cap files")
    // a file whose zone column is entirely NULL has null min/max stats:
    // it can never match a range predicate, so skip it instead of NPEing
    // on getDouble (r10 ADVICE)
    val sel = rows.toSeq
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getDouble(2) >= lo && r.getDouble(1) < hi)
      .map(_.getString(0))
    (sel, rows.length)
  }

  /** Zone-map-pruned range read: only manifest-intersecting files enter
    * the scan; the residual row predicate still applies (zones are
    * file-granular). Empty intersection short-circuits to an empty
    * frame with the table's schema — no file is opened at all.
    */
  def readZoneMapped(spark: SparkSession, path: String, zoneCol: String,
                     lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val (files, _) = zoneMapFiles(spark, path, lo, hi)
    val pred = col(zoneCol) >= lo && col(zoneCol) < hi
    if (files.isEmpty)
      spark.read.parquet(s"$path/data").where(lit(false))
    else
      spark.read.parquet(files: _*).where(pred)
  }

  /** TWO-dimensional zone maps via Z-ORDER clustering (the Delta
    * `OPTIMIZE ZORDER BY` shape): rows are range-clustered on the
    * Morton interleave of both columns min-max-stretched into 16 bits
    * (graft.functions.ZOrder), so each file owns a compact BOX in
    * (x, y) space, and the manifest records per-file min/max of BOTH
    * columns. A conjunctive box predicate then prunes on both
    * dimensions at once — the case single-column clustering can't
    * serve: sorted-by-x data answers x-bands but every x-band file
    * spans all of y. Z-order trades a little per-dimension locality so
    * BOTH predicates skip; a box query touches ~O(perimeter) files
    * instead of a full stripe.
    */
  def writeWithZoneMap2(df: DataFrame, path: String, colX: String,
                        colY: String, nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    // one tiny agg pass for the stretch bounds (4 doubles to the driver)
    val b = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    def stretch(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(65535.0), greatest(lit(0.0),
        (col(c).cast("double") - lit(lo)) / lit(span) * 65535.0))
        .cast("long")
    }
    val z = graft.functions.ZOrder.interleave16(
      stretch(colX, b.getDouble(0), b.getDouble(1)),
      stretch(colY, b.getDouble(2), b.getDouble(3)))
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    spark.read.parquet(s"$path/data")
      .select(input_file_name().as("file"),
        col(colX).cast("double").as("zx"), col(colY).cast("double").as("zy"))
      .groupBy("file")
      .agg(min("zx").as("xmin"), max("zx").as("xmax"),
        min("zy").as("ymin"), max("zy").as("ymax"),
        count(lit(1)).cast("long").as("n_rows"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_zonemap")
  }

  /** Manifest consultation for the box [loX,hiX)×[loY,hiY): files whose
    * per-file (x, y) ranges intersect BOTH bands, plus the total count.
    */
  def zoneMapFiles2(spark: SparkSession, path: String,
                    loX: Double, hiX: Double,
                    loY: Double, hiY: Double): (Seq[String], Int) = {
    val cap = 1000000
    val rows = spark.read.parquet(s"$path/_zonemap")
      .select("file", "xmin", "xmax", "ymin", "ymax")
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"zone-map manifest at $path exceeds $cap files")
    // all-null stats on either dimension can never match the box (see
    // zoneMapFiles) — skip rather than NPE
    val sel = rows.toSeq
      .filter(r => (1 to 4).forall(i => !r.isNullAt(i)) &&
        r.getDouble(2) >= loX && r.getDouble(1) < hiX &&
        r.getDouble(4) >= loY && r.getDouble(3) < hiY)
      .map(_.getString(0))
    (sel, rows.length)
  }

  /** Box read over a 2-D zone-mapped table: manifest-pruned files, then
    * the residual conjunctive predicate.
    */
  def readZoneMapped2(spark: SparkSession, path: String,
                      colX: String, colY: String,
                      loX: Double, hiX: Double,
                      loY: Double, hiY: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val (files, _) = zoneMapFiles2(spark, path, loX, hiX, loY, hiY)
    val pred = col(colX) >= loX && col(colX) < hiX &&
      col(colY) >= loY && col(colY) < hiY
    if (files.isEmpty)
      spark.read.parquet(s"$path/data").where(lit(false))
    else
      spark.read.parquet(files: _*).where(pred)
  }
}
