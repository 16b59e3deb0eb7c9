package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R2 fetch stage + R17 per-parameter error isolation.
  *
  * Reference behavior (dmi_ingestor/ingestor.py:192-198): GET the cube for
  * one parameter inside try/except — an HTTPError logs and SKIPS that
  * parameter, leaving its previously-published output untouched; only the
  * `else` (success) branch deletes old forecasts and writes new ones.
  *
  * Engine shape: the fetch is edge work (a handful of small HTTP requests,
  * SURVEY.md §7.3), so it runs driver-side with `Try` isolation per
  * request. The ordering guarantee — truncate old output only AFTER a
  * successful fetch — falls out of the sink, not hand-sequenced code:
  * failed parameters contribute no rows, and dynamic partition overwrite
  * truncates exactly the partitions that receive new rows
  * ([[Ingest.writeCube]]). URLs resolve through `java.net.URL`, so
  * `file://` fixtures exercise the whole path offline.
  */
object Fetch {

  /** One parameter's fetch outcome: staged bytes or the recorded error. */
  case class FetchOutcome(parameter: String, url: String, result: Either[String, Array[Byte]]) {
    def ok: Boolean = result.isRight
  }

  /** Staged-bytes validation at the FETCH boundary. The DMI EDR API can
    * serve NetCDF-4 — an HDF5 container (magic `\x89HDF`) — and R17's
    * skip semantics say an undecodable parameter must be SKIPPED here
    * (error recorded, old partitions preserved), exactly like an HTTP
    * failure, rather than surfacing as a decode throw later in the job.
    * HDF5 streams inside the [[graft.sources.NetCdf4]] subset (flat
    * classic-model files — contiguous, compact, or chunked with
    * deflate/shuffle) pass through to decode; the header-only probe
    * rejects anything beyond the subset (exotic filters, "latest
    * format", nested groups, …) with the probe's reason in the skip
    * message. Returns the rejection message, or None when the bytes
    * may proceed to decode. */
  def containerGuard(bytes: Array[Byte]): Option[String] =
    if (graft.sources.NetCdf4.isHdf5(bytes))
      graft.sources.NetCdf4.probe(bytes).left.toOption.map(reason =>
        s"unsupported NetCDF-4/HDF5 container ($reason); parameter skipped")
    else None

  /** GET every (parameter, url) in the request plan, isolating failures
    * per parameter — the reference's try/except loop. Staged bytes pass
    * through `validate` (default [[containerGuard]]): a rejection is a
    * per-parameter failure, same as an HTTP error. Connect/read timeouts
    * bound every request so ONE stalled endpoint cannot hang the whole
    * ingest — the timeout surfaces as that parameter's recorded error
    * and the loop moves on (the reference inherits the same property
    * from `requests`' timeout). Non-2xx statuses, redirects (followed by
    * the URL layer for same-protocol GETs), and connection failures all
    * resolve through the same Try. Never throws. */
  def fetchAll(plan: Seq[(String, String)],
               validate: Array[Byte] => Option[String] = containerGuard,
               connectTimeoutMs: Int = 10000,
               readTimeoutMs: Int = 60000): Seq[FetchOutcome] =
    plan.map { case (param, url) =>
      val result = Try {
        val conn = new java.net.URI(url).toURL.openConnection()
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn match {
          // surface the status itself (HttpURLConnection would bury a 404
          // in FileNotFoundException) — the reference's raise_for_status.
          // >= 300, not 400: followed redirects already resolved to their
          // final status here, so a remaining 3xx is one the URL layer
          // did NOT follow (e.g. cross-protocol http→https) — its body is
          // the redirect page, which must never stage as cube bytes
          case http: java.net.HttpURLConnection if http.getResponseCode >= 300 =>
            val code = http.getResponseCode
            // the error path must release the connection too
            Option(http.getErrorStream).foreach(_.close())
            http.disconnect()
            throw new java.io.IOException(s"HTTP $code")
          case _ => ()
        }
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      } match {
        case Success(bytes) => validate(bytes).toLeft(bytes)
        case Failure(e) => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      FetchOutcome(param, url, result)
    }

  /** Decode boundary for staged cube bytes. The offline stand-in for the
    * NetCDF codec is a CSV cube (`time,x,y,value` header); everything
    * downstream of the returned long-format frame is codec-agnostic. */
  def decodeCsvCube(
      spark: SparkSession, collection: String, parameter: String,
      bytes: Array[Byte]): DataFrame = {
    import spark.implicits._
    val lines = spark.createDataset(new String(bytes, UTF_8).linesIterator.toSeq)
    spark.read
      .option("header", "true")
      .schema("time TIMESTAMP, x DOUBLE, y DOUBLE, value DOUBLE")
      .csv(lines)
      .select(
        lit(collection).as("collection"), lit(parameter).as("parameter"),
        col("time"), col("x"), col("y"), col("value"))
  }

  /** Format-sniffing decode — the engine dual of the reference's
    * `xarray.open_dataset(BytesIO(...))` (ingestor.py:200): classic
    * NetCDF magic (`CDF\x01|02|05`) routes to
    * [[graft.sources.NetCdf.decodeCube]], HDF5 magic (`\x89HDF`,
    * NetCDF-4) to the [[graft.sources.NetCdf4]] subset codec (whose parse
    * rejects out-of-subset files explicitly rather than misparsing), and
    * anything else falls back to the CSV cube stand-in. */
  def decodeAuto(
      spark: SparkSession, collection: String, parameter: String,
      bytes: Array[Byte]): DataFrame =
    if (bytes.length >= 4 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F')
      graft.sources.NetCdf.decodeCube(spark, collection, parameter, bytes)
    else if (graft.sources.NetCdf4.isHdf5(bytes))
      graft.sources.NetCdf4.decodeCube(spark, collection, parameter, bytes)
    else decodeCsvCube(spark, collection, parameter, bytes)

  /** Full fetch → ingest pipeline with R17 isolation: fetch every planned
    * parameter, decode and ingest ONLY the successes (their partitions are
    * the only ones dynamic overwrite truncates — a failed parameter's old
    * output survives, per the reference's ordering guarantee), and return
    * the manifest of what was written plus every outcome for telemetry.
    * Decode failures (an HDF5 container, malformed classic bytes, an
    * unsupported CF time unit) are isolated exactly like fetch failures:
    * the outcome records the error and the other parameters still ingest.
    * No successes → no write at all, `None` manifest. */
  def fetchAndIngest(
      spark: SparkSession,
      cfg: Ingest.IngestConfig,
      plan: Seq[(String, String)],
      outPath: String,
      decode: (SparkSession, String, String, Array[Byte]) => DataFrame = decodeAuto)
      : (Option[DataFrame], Seq[FetchOutcome]) = {
    val decoded = fetchAll(plan).map {
      case o @ FetchOutcome(param, url, Right(bytes)) =>
        Try(decode(spark, cfg.collection, param, bytes)) match {
          case Success(df) => (o, Some(df))
          case Failure(e) => (FetchOutcome(param, url,
            Left(s"decode ${e.getClass.getSimpleName}: ${e.getMessage}")), None)
        }
      case o => (o, None)
    }
    val outcomes = decoded.map(_._1)
    val staged = decoded.flatMap(_._2)
    if (staged.isEmpty) (None, outcomes)
    else (Some(Ingest.ingest(
      // by NAME with missing-column fill, not positional: cube schemas
      // vary since r20 (CF aux lat/lon columns appear only when the file
      // carries them), so a positional union of a curvilinear and a
      // regular cube would crash — or, with two aux cubes whose
      // `coordinates` lists order lat/lon differently, silently swap
      // them. Missing aux fills null; cubeToLong's per-row coalesce
      // falls back to the derived mapping exactly for those rows.
      staged.reduce(_.unionByName(_, allowMissingColumns = true)),
      cfg, outPath)), outcomes)
  }
}
