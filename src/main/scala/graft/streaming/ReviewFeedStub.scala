package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process stub of the reference's review REST endpoint
  * (FunctionApp1/hotel_reviews/__init__.py:35-37): serves the SAME
  * deterministic feed as [[ReviewReplaySource.row]] as JSON pages
  * (`GET /reviews?offset=N&limit=M` → `{"result": [...], "count": M}`),
  * so the HTTP fetch path and the in-memory generator path are
  * byte-for-byte comparable.
  *
  * Failure injection (`failFirst`): the first N requests answer 503 — the
  * knob the retry/backoff spec turns. The request counter is shared across
  * all partitions' fetches, which is exactly what makes "the stream
  * succeeded AND the server saw the retries" assertable.
  *
  * JDK `HttpServer` only — no dependency, hermetic, port 0 (ephemeral). */
object ReviewFeedStub {

  final class Stub private[ReviewFeedStub] (server: HttpServer,
                                            counter: AtomicInteger,
                                            pool: java.util.concurrent.ExecutorService) {
    def endpoint: String =
      s"http://localhost:${server.getAddress.getPort}/reviews"
    def requestCount: Int = counter.get()
    def stop(): Unit = {
      server.stop(0)
      // the worker pool's threads are NON-daemon: without this, a JVM that
      // started many stubs (the replay fuzzer starts one per HTTP plan)
      // never exits — main returns and the process hangs on the leaked
      // pools (caught live by ReplayFuzzMain's first 40-plan smoke run)
      pool.shutdownNow(); ()
    }
  }

  def start(failFirst: Int = 0): Stub = {
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    val counter = new AtomicInteger(0)
    val mapper = new ObjectMapper()
    server.createContext("/reviews", (exchange: HttpExchange) => {
      try {
        val n = counter.incrementAndGet()
        if (n <= failFirst) {
          exchange.sendResponseHeaders(503, -1)
        } else {
          val params = Option(exchange.getRequestURI.getQuery).getOrElse("")
            .split("&").filter(_.contains("="))
            .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toMap
          val offset = params.getOrElse("offset", "0").toLong
          val limit = params.getOrElse("limit", "10").toLong
          val root = mapper.createObjectNode()
          val arr = root.putArray("result")
          (offset until offset + limit).foreach { i =>
            val (id, hotel, lang, score, text) = ReviewReplaySource.row(i)
            arr.addObject()
              .put("review_id", id).put("hotel_id", hotel)
              .put("languagecode", lang).put("average_score", score)
              .put("text", text)
          }
          root.put("count", limit)
          val bytes = mapper.writeValueAsBytes(root)
          exchange.getResponseHeaders.add("Content-Type", "application/json")
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        }
      } finally exchange.close()
    })
    // a couple of worker threads so concurrent partition fetches don't
    // serialize behind one another
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    new Stub(server, counter, pool)
  }
}
