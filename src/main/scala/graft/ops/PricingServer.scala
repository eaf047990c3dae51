package graft.ops

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.{ExecutorService, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import com.fasterxml.jackson.databind.ObjectMapper

/** The request/response serving loop around [[PricingService]] — the
  * end-to-end analog of the reference's Flask `/price` endpoint
  * (reference `api.py:95-132`) with its SLO contract
  * (`tests/test_api.py:32`: every request < 6 s; the concurrent probe
  * at `tests/test_api.py:36-58` fires 10 simultaneous requests).
  *
  * Protocol: JSON lines over a local TCP socket — one request object
  * per line in, one response object per line out on the same
  * connection (connections are reusable, so a client can stream many
  * quotes). Request fields mirror the reference body
  * (`api.py:106-108`): `{"libelle_region":…,"nb_personne":N,
  * "nb_m2":N}`; response `{"price":N}` on success or
  * `{"error":"Missing fields."}` for an incomplete body
  * (`api.py:107-109`'s 400 path).
  *
  * Serving shape: the heavy lifting (two distributed aggregates over
  * the events fact) happened ONCE in `PricingService.build`; each
  * request here is pure driver-side arithmetic over the O(regions)
  * collected state, so the per-request cost is parsing + a map lookup
  * + a dozen double ops — microseconds against a 6-second SLO, and
  * INDEPENDENT of fact-table size. At 100 TB the build-time aggregates
  * get slower; the serving loop does not. Refreshing state after a
  * daily ingest is `PricingServer(PricingService.build(...))` again —
  * state swap, not server restart, if the handle is made volatile.
  *
  * Concurrency: a daemon accept loop hands each connection to a fixed
  * thread pool. [[PricingService.price]] is pure (immutable Map +
  * arithmetic), so requests need no synchronization.
  */
final class PricingServer(svc: PricingService, poolSize: Int = 8) {

  private val server = new ServerSocket(0) // ephemeral port, loopback-only use
  private val pool: ExecutorService = Executors.newFixedThreadPool(poolSize)
  private val running = new AtomicBoolean(true)

  /** The bound ephemeral port clients connect to. */
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        pool.execute(() => handle(sock))
      } catch {
        case _: java.net.SocketException => // closed during shutdown
      }
    }
  }, "pricing-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val mapper = new ObjectMapper() // per-connection: ObjectMapper config is not thread-free
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new PrintWriter(sock.getOutputStream, true)
      var line = in.readLine()
      while (line != null) {
        out.println(respond(mapper, line))
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => // client went away mid-stream
    } finally sock.close()
  }

  /** One request → one response line. Mirrors the reference's three
    * outcomes: 200 `{"price":…}`, 400 `{"error":"Missing fields."}`,
    * 500 `{"error":…}` for malformed bodies (`api.py:130-132`).
    */
  private def respond(mapper: ObjectMapper, line: String): String = {
    try {
      val node = mapper.readTree(line)
      val ok = node != null && node.has("libelle_region") &&
        node.has("nb_personne") && node.has("nb_m2")
      if (!ok) """{"error":"Missing fields."}"""
      else {
        val req = PriceRequest(node.get("libelle_region").asText(),
          node.get("nb_personne").asInt(), node.get("nb_m2").asInt())
        s"""{"price":${svc.price(req)}}"""
      }
    } catch {
      case e: Exception =>
        s"""{"error":${new ObjectMapper().writeValueAsString(e.getMessage)}}"""
    }
  }

  def close(): Unit = {
    running.set(false)
    server.close()
    pool.shutdown()
    pool.awaitTermination(5, TimeUnit.SECONDS)
  }
}
