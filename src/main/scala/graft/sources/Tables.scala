package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Schema-declared readers for the driver test tables.
  *
  * Schemas are explicit (no inference in production paths — SURVEY.md §1.2):
  * at 100 TB, schema inference means an extra full-footer listing pass over
  * millions of files; a declared StructType makes the scan plan-able
  * immediately and guarantees stable types across scale factors.
  *
  * Timestamp columns are unit-aware: the physical encoding (µs/ms/ns) is
  * read from ONE parquet footer at plan time, never assumed. A regeneration
  * of the data in either direction (ns→µs or back) is a no-op for every
  * consumer — the r11 incident where a hard-coded ns→µs division silently
  * shrank every event time 1000× cannot recur. µs/ms files are read
  * natively as TimestampType (so time predicates still push down to the
  * scan and prune row groups — the property that matters at 100 TB); only
  * ns files, which Spark's reader cannot map to TimestampType, fall back to
  * a raw-long read plus an explicit µs conversion.
  *
  * All readers return plain scans; Catalyst pushes filters/projection into
  * the Parquet reader (verified in RelationalSpec via
  * `PushedFilters`/`ReadSchema` assertions).
  */
object Tables {

  /** Physical encoding of an INT64 time column, sniffed from the footer. */
  private[graft] sealed trait TsPhysical
  /** TIMESTAMP(MICROS|MILLIS) — Spark reads natively as TimestampType. */
  private[graft] case object TsNative extends TsPhysical
  /** TIMESTAMP(NANOS) — read as raw long, divide to µs. */
  private[graft] case object TsNanos extends TsPhysical
  /** Unannotated INT64 — treated as epoch-µs by convention. */
  private[graft] case object TsRawMicros extends TsPhysical

  /** Sniff the physical timestamp encoding of `columns` from one parquet
    * footer under `path` (file or directory). O(1) driver-side work — one
    * footer, not a listing of millions of files. A missing path (e.g. an
    * empty streaming source directory) defaults every column to
    * [[TsNative]], the encoding Spark itself writes.
    *
    * CONTRACT: one physical unit per table directory — the sniffed unit
    * is applied to every file in the scan, so a directory whose writer
    * switched units mid-append must be normalized at write time (mixed
    * units inside one scan cannot be expressed with a single declared
    * read schema; ns files would need the raw-long read while µs files
    * reject it). Spark's native reader fails loudly on the mismatched
    * files rather than silently misreading them. */
  private[graft] def sniffTs(spark: SparkSession, path: String,
                             columns: Seq[String]): Map[String, TsPhysical] = {
    val native: Map[String, TsPhysical] = columns.map(_ -> (TsNative: TsPhysical)).toMap
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) return native
    // Descend into subdirectories (depth-bounded) when a level holds no
    // parquet file directly — a hive-partitioned layout (table/date=.../
    // part-*.parquet) otherwise found nothing and silently defaulted to
    // TsNative, turning an ns-encoded nested table into a confusing
    // scan-time failure instead of a sniffed conversion (ADVICE r12).
    def findParquet(dir: Path, depth: Int): Option[Path] = {
      val entries = fs.listStatus(dir)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
      entries.collectFirst {
        case s if !s.isDirectory && s.getPath.getName.endsWith(".parquet") => s.getPath
      }.orElse {
        if (depth <= 0) None
        else entries.iterator.filter(_.isDirectory)
          .map(s => findParquet(s.getPath, depth - 1))
          .collectFirst { case Some(f) => f }
      }
    }
    val file =
      if (fs.getFileStatus(p).isDirectory) findParquet(p, depth = 3)
      else Some(p)
    file.fold(native) { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, hconf))
      try {
        val fileSchema = reader.getFooter.getFileMetaData.getSchema
        columns.map { c =>
          val phys: TsPhysical =
            if (!fileSchema.containsField(c)) TsNative
            else {
              val t = fileSchema.getType(fileSchema.getFieldIndex(c))
              t.getLogicalTypeAnnotation match {
                case ann: TimestampLogicalTypeAnnotation =>
                  if (ann.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS) TsNanos else TsNative
                case _ =>
                  // legacy INT96 timestamps carry no annotation but Spark
                  // reads them natively; only unannotated INT64 falls back
                  // to the epoch-µs convention
                  if (t.isPrimitive && t.asPrimitiveType().getPrimitiveTypeName ==
                    org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96) TsNative
                  else TsRawMicros
              }
            }
          c -> phys
        }.toMap
      } finally reader.close()
    }
  }

  /** The ONE place that turns a physical timestamp encoding into the
    * canonical TimestampType(µs) column — batch and streaming both go
    * through here (VERDICT r11 item 5: the conversion must not fork).
    * Returns the schema to hand the scan (ns demotes the column to raw
    * long) and the finishing projection back to the canonical schema. */
  private[graft] def tsReadPlan(spark: SparkSession, path: String,
                                canonical: StructType, tsCols: Seq[String])
      : (StructType, DataFrame => DataFrame) = {
    val phys = sniffTs(spark, path, tsCols)
    val readSchema = StructType(canonical.map { f =>
      if (tsCols.contains(f.name) && phys(f.name) != TsNative)
        f.copy(dataType = LongType)
      else f
    })
    val finish = (df: DataFrame) => tsCols.foldLeft(df) { (d, c) =>
      phys(c) match {
        case TsNative => d
        // FLOOR division, in pure long arithmetic (a double floor(x/1000)
        // loses precision past 2^53 — every modern epoch-ns value): `div`
        // truncates toward zero, so a pre-1970 instant with a non-zero
        // sub-µs remainder would round UP 1µs where DuckDB/Arrow floor
        // (ADVICE r12). Subtracting 1 when the remainder is negative is
        // exactly floor for a positive divisor.
        case TsNanos => d.withColumn(c, timestamp_micros(expr(
          s"`$c` div 1000 - (CASE WHEN `$c` % 1000 < 0 THEN 1 ELSE 0 END)")))
        case TsRawMicros => d.withColumn(c, timestamp_micros(col(c)))
      }
    }
    (readSchema, finish)
  }

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** Canonical events schema: `ts` is a µs TimestampType. The file's
    * physical unit is read from the footer at plan time ([[tsReadPlan]]) —
    * ns files are transparently converted; µs/ms files read natively. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def read(spark: SparkSession, dir: String, name: String,
                   schema: StructType, tsCols: Seq[String] = Nil): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (tsCols.isEmpty) spark.read.schema(schema).parquet(path)
    else {
      val (readSchema, finish) = tsReadPlan(spark, path, schema, tsCols)
      finish(spark.read.schema(readSchema).parquet(path))
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem", lineitemSchema, tsCols = Seq("l_shipdate"))
  def orders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders", ordersSchema, tsCols = Seq("o_orderdate"))
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part", partSchema)
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation", nationSchema)
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region", regionSchema)
  def events(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "events", eventsSchema, tsCols = Seq("ts"))
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", embeddingsSchema)
}
