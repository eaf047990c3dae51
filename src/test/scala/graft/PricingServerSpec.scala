package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.{Pricing, PricingServer, PricingService}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end serving-loop contract, mirroring the reference's API
  * tests: every served price equals the q13 batch price bit-for-bit,
  * concurrent clients are served correctly, and per-request latency is
  * far inside the reference's < 6 s SLO (`tests/test_api.py:32`).
  */
class PricingServerSpec extends AnyFunSuite {
  import SparkTestBase.{Sf, spark}

  private def quote(out: PrintWriter, in: BufferedReader, mapper: ObjectMapper,
                    region: String, persons: Int, m2: Int): (Double, Long) = {
    val t0 = System.nanoTime()
    out.println(s"""{"libelle_region":${mapper.writeValueAsString(region)},"nb_personne":$persons,"nb_m2":$m2}""")
    val resp = in.readLine()
    val elapsed = System.nanoTime() - t0
    val node = mapper.readTree(resp)
    assert(node.has("price"), s"expected a price, got $resp")
    (node.get("price").asDouble(), elapsed)
  }

  test("served prices over the socket equal the q13 batch prices; latency well under the 6 s SLO") {
    val srv = new PricingServer(PricingService.build(spark, Sf))
    try {
      val batch = Pricing.priceBatch(spark, Sf).collect()
      assert(batch.length == 150)
      val sock = new Socket("127.0.0.1", srv.port)
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val mapper = new ObjectMapper()
      // the first requests pay one-time JIT + Jackson classload (~10 ms);
      // warm past that so the SLO assertion measures the serving loop
      (1 to 5).foreach(_ => quote(out, in, mapper, "EUROPE", 2, 50))
      val latencies = batch.map { r =>
        val (price, ns) = quote(out, in, mapper, r.getString(1), r.getInt(2), r.getInt(3))
        assert(price == r.getDouble(6),
          s"custkey ${r.getLong(0)}: served $price != batch ${r.getDouble(6)}")
        ns
      }
      sock.close()
      // the reference's SLO is 6 s per request; a warm request here is
      // parse + map lookup + arithmetic — assert a 100x margin even on
      // a loaded CI box (typical warm round trip is tens of µs)
      assert(latencies.max < 6e7, s"slowest request ${latencies.max / 1e6} ms, expected < 60 ms")
    } finally srv.close()
  }

  test("10 concurrent clients each get correct prices (the test_api.py:36 simultaneous probe)") {
    val srv = new PricingServer(PricingService.build(spark, Sf))
    try {
      val batch = Pricing.priceBatch(spark, Sf).collect()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (0 until 10).map { t =>
        new Thread(() => {
          try {
            val sock = new Socket("127.0.0.1", srv.port)
            val out = new PrintWriter(sock.getOutputStream, true)
            val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
            val mapper = new ObjectMapper()
            // each client quotes a rotated slice so the 10 streams interleave
            batch.drop(t * 15).take(30).foreach { r =>
              val (price, _) = quote(out, in, mapper, r.getString(1), r.getInt(2), r.getInt(3))
              if (price != r.getDouble(6))
                errors.add(s"client $t custkey ${r.getLong(0)}: $price != ${r.getDouble(6)}")
            }
            sock.close()
          } catch { case e: Throwable => errors.add(s"client $t: $e") }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(30000))
      assert(errors.isEmpty, errors.toArray.mkString("; "))
    } finally srv.close()
  }

  test("incomplete and malformed bodies get the reference's error responses") {
    val srv = new PricingServer(PricingService.build(spark, Sf))
    try {
      val sock = new Socket("127.0.0.1", srv.port)
      val out = new PrintWriter(sock.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      out.println("""{"libelle_region":"EUROPE"}""")
      assert(in.readLine() == """{"error":"Missing fields."}""")
      out.println("""not json at all""")
      val resp = in.readLine()
      assert(resp.startsWith("""{"error":"""), s"expected an error, got $resp")
      // the connection survives bad requests: a good one still works
      val mapper = new ObjectMapper()
      val (price, _) = quote(out, in, mapper, "EUROPE", 2, 50)
      assert(price > 0)
      sock.close()
    } finally srv.close()
  }
}
