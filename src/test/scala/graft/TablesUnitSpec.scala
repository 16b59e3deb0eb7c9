package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser

import graft.sources.Tables

/** Pinned unit contract for the events source (VERDICT r11 item 3).
  *
  * The r11 regression — the driver regenerated `events.parquet` from
  * physical TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the reader's
  * hard-coded ÷1000 silently shrank every event time 1000× — proved the
  * events family's correctness rested entirely on the driver's oracle.
  * This spec writes one tiny file per physical encoding (µs, ms, ns,
  * unannotated int64) and asserts `Tables.events` round-trips the SAME
  * wall-clock instant from each: a future regeneration in ANY direction
  * fails here first, not in CORRECTNESS_r{N}.
  */
class TablesUnitSpec extends SparkSpec {

  // one known instant: 2024-01-15T12:34:56.789012Z, as epoch micros
  private val epochMicros = 1705322096789012L

  /** Write `dir/events.parquet` with `ts` annotated per `tsAnnotation`
    * (None → plain INT64) holding `tsValue`, via parquet-mr directly —
    * Spark cannot write NANOS, which is exactly the encoding we must pin. */
  private def writeRaw(tsAnnotation: Option[String], tsValue: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_unit").toString
    val ann = tsAnnotation.map(u => s" (TIMESTAMP($u,true))").getOrElse("")
    val schema = MessageTypeParser.parseMessageType(
      s"""message events {
         |  required int64 event_id;
         |  required int64 ts$ann;
         |  required int64 user_id;
         |  required binary event_type (STRING);
         |  required double value;
         |  required binary props (STRING);
         |}""".stripMargin)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    try {
      val g = factory.newGroup()
      g.add("event_id", 1L)
      g.add("ts", tsValue)
      g.add("user_id", 7L)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
    dir
  }

  private def readBack(dir: String): Timestamp = {
    val rows = Tables.events(spark, dir).collect()
    assert(rows.length == 1)
    rows(0).getAs[Timestamp]("ts")
  }

  private val expected = new Timestamp(epochMicros / 1000)

  test("events reads TIMESTAMP(MICROS) natively to the same wall-clock instant") {
    val got = readBack(writeRaw(Some("MICROS"), epochMicros))
    assert(got.getTime == expected.getTime && got.getNanos == 789012000,
      s"micros file: $got")
  }

  test("events reads TIMESTAMP(MILLIS) natively to the same wall-clock instant") {
    val got = readBack(writeRaw(Some("MILLIS"), epochMicros / 1000))
    assert(got.getTime == expected.getTime, s"millis file: $got")
  }

  test("events converts TIMESTAMP(NANOS) to the same wall-clock instant") {
    val got = readBack(writeRaw(Some("NANOS"), epochMicros * 1000))
    assert(got.getTime == expected.getTime && got.getNanos == 789012000,
      s"nanos file: $got")
  }

  test("events treats unannotated INT64 as epoch-micros by convention") {
    val got = readBack(writeRaw(None, epochMicros))
    assert(got.getTime == expected.getTime && got.getNanos == 789012000,
      s"raw int64 file: $got")
  }

  test("edge-case instants round-trip through every encoding") {
    // pre-1970 (negative epoch), epoch itself, sub-millisecond precision,
    // far future — the values a hard-coded unit assumption mangles first
    val edgeMicros = Seq(
      -1000000000000L,      // 1938, negative epoch
      0L,                   // the epoch
      1L,                   // 1 µs after
      999999L,              // sub-second, sub-ms tail
      1705322096789012L,    // 2024 with µs precision
      4102444800000000L)    // 2100-01-01
    def writeMany(ann: Option[String], vs: Seq[Long]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_unit_edge").toString
      val annStr = ann.map(u => s" (TIMESTAMP($u,true))").getOrElse("")
      val schema = MessageTypeParser.parseMessageType(
        s"""message events {
           |  required int64 event_id;
           |  required int64 ts$annStr;
           |}""".stripMargin)
      val factory = new SimpleGroupFactory(schema)
      val writer = ExampleParquetWriter
        .builder(new Path(s"$dir/events.parquet")).withType(schema).build()
      try vs.zipWithIndex.foreach { case (v, i) =>
        val g = factory.newGroup()
        g.add("event_id", i.toLong)
        g.add("ts", v)
        writer.write(g)
      } finally writer.close()
      dir
    }
    def micros(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
    Seq((Some("MICROS"), 1L), (Some("NANOS"), 1000L), (None, 1L)).foreach {
      case (ann, scale) =>
        val dir = writeMany(ann, edgeMicros.map(_ * scale))
        val got = Tables.events(spark, dir).orderBy("event_id").collect()
          .map(r => micros(r.getAs[Timestamp]("ts")))
        assert(got.toSeq == edgeMicros,
          s"encoding $ann mangled edge instants: ${got.toSeq} vs $edgeMicros")
    }
  }

  test("NANOS with a sub-microsecond remainder FLOORS across the epoch") {
    // ADVICE r12: `div` truncates toward zero, so a pre-1970 ns value
    // with a non-zero sub-µs remainder (-X.5 µs) would read -X µs where
    // DuckDB/Arrow floor to -(X+1) µs. Only negative values with a
    // NON-ZERO remainder can catch it — the prior edge test's negative
    // value was exactly divisible.
    val nsValues = Seq(
      -1000000000000500L, // 1938-era, -500 ns remainder → floors down 1 µs
      -1499L,             // -1.499 µs → floor -2 µs (truncation says -1)
      -1L,                // -0.001 µs → floor -1 µs (truncation says 0)
      999L,               // +0.999 µs → floor 0 (same under both)
      1500L)              // +1.5 µs → floor 1 (same under both)
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |}""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft_unit_floor").toString
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet")).withType(schema).build()
    try nsValues.zipWithIndex.foreach { case (v, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", v)
      writer.write(g)
    } finally writer.close()
    def micros(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
    val got = Tables.events(spark, dir).orderBy("event_id").collect()
      .map(r => micros(r.getAs[Timestamp]("ts"))).toSeq
    val want = nsValues.map(v => Math.floorDiv(v, 1000L))
    assert(got == want, s"ns remainder handling diverged from floor: $got vs $want")
  }

  test("unit sniffing descends into a hive-partitioned table directory") {
    // ADVICE r12: a nested layout (events.parquet/d=1/part-*.parquet)
    // held no parquet file at the top level, so the sniff silently
    // defaulted to TsNative and an ns-encoded nested table failed at
    // scan time instead of being converted.
    val dir = java.nio.file.Files.createTempDirectory("graft_unit_nested").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/d=1/part-0.parquet"))
      .withType(schema).build()
    try {
      val g = factory.newGroup()
      g.add("event_id", 1L)
      g.add("ts", epochMicros * 1000)
      g.add("user_id", 7L)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
    val got = readBack(dir)
    assert(got.getTime == expected.getTime && got.getNanos == 789012000,
      s"nested nanos file: $got")
  }

  test("the driver testdata itself reads as 2024 wall-clock, whatever its physical unit") {
    // the assertion that would have caught r11: real event times live in
    // the data's declared 2024 span, not near the epoch
    val r = Tables.events(spark, sfDir)
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (r.getTimestamp(0), r.getTimestamp(1))
    val y2020 = Timestamp.valueOf("2020-01-01 00:00:00")
    val y2100 = Timestamp.valueOf("2100-01-01 00:00:00")
    assert(lo.after(y2020) && hi.before(y2100),
      s"events span [$lo, $hi] is outside any plausible wall-clock range — " +
        "physical-unit handling is broken")
  }
}
