package graft.ops

import java.net.{InetSocketAddress, URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpServer

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2 fidelity — the reference's defining source is a REST GET whose
  * `select` / `where` / `limit` are pushed to the server as request
  * params (reference `0_insert_conso_an_ville_in_bq.py:20-34`: the
  * OpenDataSoft export API, `params = {"limit": -1, "select": ...,
  * "where": "(annee=... OR ...) AND code_grand_secteur='RESIDENTIEL'"}`),
  * the JSON payload staged to a local file and re-read with a declared
  * schema. This module is that adapter, end to end:
  *
  *   pushdown spec → request params → fetch (paginated) → staged JSON
  *   → declared-schema `spark.read.json` → DataFrame
  *
  * Scale shape: fetches are paginated (`limit`+`offset` pages, the ODS
  * records-API convention) with ONE staged file per page, so the
  * Spark-side read parallelizes per page file even though each payload
  * is a (non-splittable) JSON array; at real scale the page size is the
  * parallelism knob and the staged dir is the replayable raw zone. The
  * filter/projection run ON THE SERVER — the adapter's contract is that
  * un-selected columns and non-matching rows never cross the wire.
  *
  * The fixture endpoint below (`FixtureServer`) binds 127.0.0.1 on an
  * ephemeral port and serves a driver-provided row set with server-side
  * `select`/`where`/`limit`/`offset` — test scaffolding standing in for
  * the public API (this environment has zero egress), honoring the same
  * param grammar the reference pushes.
  */
object RestExtract {

  /** The pushdown spec: projected columns, an ODS-style where clause
    * (top-level ANDs of `col=lit` terms or parenthesized OR-groups —
    * exactly the grammar the reference pushes), and a row cap
    * (−1 = unbounded, as in the reference).
    */
  case class RestQuery(select: Seq[String], where: String, limit: Int = -1)

  val PageSize = 512

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** The query string for one page — the adapter's actual pushdown. */
  private[graft] def paramString(q: RestQuery, offset: Int, pageSize: Int): String =
    s"select=${enc(q.select.mkString(", "))}&where=${enc(q.where)}" +
      s"&limit=$pageSize&offset=$offset"

  // ---- fixture endpoint -----------------------------------------------------

  /** Evaluate the pushed where-grammar against one row: top-level
    * ` AND `-joined clauses, each either `col=lit` or `(t OR t OR ...)`
    * of equality terms; string literals single-quoted, numerics bare.
    * (AND inside parens is not part of the reference's pushed grammar
    * and is rejected loudly.)
    */
  private[graft] def evalWhere(where: String, row: Map[String, Any]): Boolean = {
    def term(t: String): Boolean = {
      val Array(colName, lit) = t.split("=", 2).map(_.trim)
      val v = row.getOrElse(colName, sys.error(s"unknown column in where: $colName"))
      if (lit.startsWith("'") && lit.endsWith("'"))
        v.toString == lit.substring(1, lit.length - 1)
      else v match {
        case n: Number => n.longValue == lit.toLong
        case other     => other.toString == lit
      }
    }
    where.trim.isEmpty || where.split(" AND ").forall { clause =>
      val c = clause.trim
      if (c.startsWith("(") && c.endsWith(")")) {
        val body = c.substring(1, c.length - 1)
        require(!body.contains(" AND "), s"AND inside OR-group unsupported: $c")
        body.split(" OR ").exists(t => term(t.trim))
      } else term(c)
    }
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case d: Double => d.toString // shortest round trip: parses back bit-exact
    case f: Float  => f.toDouble.toString
    case other     => other.toString
  }

  /** Local stand-in for the public dataset API: serves `rows` as a JSON
    * array with server-side select/where/limit/offset. Records every
    * request URI so specs can assert what was actually pushed.
    */
  class FixtureServer(rows: Seq[Map[String, Any]]) {
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = scala.collection.mutable.Buffer[String]()

    def start(): Int = {
      server.createContext("/exports/json", exchange => {
        val uri = exchange.getRequestURI.toString
        requests.synchronized { requests += uri }
        val params = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty)
          .map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> URLDecoder.decode(v, UTF_8)
          }.toMap
        val selected = params.get("select").map(_.split(",").map(_.trim).toSeq)
        val where = params.getOrElse("where", "")
        val limit = params.get("limit").map(_.toInt).getOrElse(-1)
        val offset = params.get("offset").map(_.toInt).getOrElse(0)
        val matched = rows.filter(r => evalWhere(where, r)).drop(offset)
        val page = if (limit < 0) matched else matched.take(limit)
        val body = page.map { r =>
          val cols = selected.getOrElse(r.keys.toSeq)
          cols.map(c => s"${jsonValue(c)}: ${jsonValue(r(c))}").mkString("{", ", ", "}")
        }.mkString("[", ",\n", "]").getBytes(UTF_8)
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, body.length.toLong)
        exchange.getResponseBody.write(body)
        exchange.close()
      })
      server.start()
      server.getAddress.getPort
    }

    def stop(): Unit = server.stop(0)
  }

  // ---- the client-side adapter ----------------------------------------------

  /** Fetch `query` from `baseUrl` page by page and stage one JSON file
    * per page. Returns (staging dir, request URIs issued). The staged
    * dir is keyed by digest+pid like every other staging location.
    */
  def stageFetch(baseUrl: String, query: RestQuery): (String, Seq[String]) = {
    val stage = Staging.stagePath("rest_extract", baseUrl + query.toString)
    val dir = new java.io.File(stage)
    if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
    val client = HttpClient.newHttpClient()
    val uris = scala.collection.mutable.Buffer[String]()
    var offset = 0
    var page = 0
    var done = false
    while (!done) {
      val pageCap =
        if (query.limit < 0) PageSize else math.min(PageSize, query.limit - offset)
      val uri = s"$baseUrl?${paramString(query, offset, pageCap)}"
      uris += uri
      val body = client.send(
        HttpRequest.newBuilder(URI.create(uri)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()
      val n = if (body.replaceAll("\\s", "") == "[]") 0
              else body.count(_ == '\n') + 1 // fixture emits one object per line
      // page 0 is written even when empty ("[]"): an all-empty extract
      // must stage SOMETHING or the downstream declared-schema read has
      // no file to glob and fails loudly on a legitimately empty result
      if (n > 0 || page == 0)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$stage/page_$page.json"), body.getBytes(UTF_8))
      done = n < pageCap || (query.limit >= 0 && offset + n >= query.limit)
      offset += n
      page += 1
    }
    (stage, uris.toSeq)
  }

  // ---- q36: the reference extract shape over the fixture tables --------------

  /** Declared schema for the staged payload — the dtype-map analog
    * (reference `0_insert_conso_an_ville_in_bq.py:43-47`): never
    * inferred, so a drifting payload fails loudly at read time.
    */
  val restCustomerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_mktsegment", StringType),
    StructField("c_acctbal", DoubleType)))

  /** The pushed query — same shape as the reference's: a 3-value OR on
    * a numeric column AND an equality on a category column, 5 columns
    * selected, no row cap.
    */
  val customerQuery: RestQuery = RestQuery(
    select = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"),
    where = "(c_nationkey=1 OR c_nationkey=2 OR c_nationkey=3)" +
      " AND c_mktsegment='BUILDING'",
    limit = -1)

  /** q36 — REST staged extract end to end: fixture endpoint up, pushdown
    * fetch, staged-JSON declared-schema read, then the downstream
    * aggregate. The returned frame is materialized from the STAGED
    * files, so the endpoint only lives for the fetch.
    */
  def restStage(spark: SparkSession, dir: String): DataFrame = {
    val cols = restCustomerSchema.map(_.name)
    val serverRows = Tables.customer(spark, dir)
      .select(cols.map(col): _*)
      .collect()
      .map(r => cols.map(c => c -> r.getAs[Any](c)).toMap)
      .toSeq
    val server = new FixtureServer(serverRows)
    val port = server.start()
    val stage =
      try stageFetch(s"http://127.0.0.1:$port/exports/json", customerQuery)._1
      finally server.stop()
    spark.read.schema(restCustomerSchema)
      .option("multiLine", "true") // each page file is one JSON array
      .json(s"$stage/*.json")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
           round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_nationkey")
  }

  val oracleRestStage: String =
    """SELECT c_nationkey, count(*) AS n_cust,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |WHERE c_nationkey IN (1, 2, 3) AND c_mktsegment = 'BUILDING'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
}
