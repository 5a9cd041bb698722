package graft

import graft.sources.RestDim
import graft.sources.RestDim._

/** The S7 REST dimension envelope: shared-key header construction,
  * transient-vs-permanent retry classification, bounded exponential
  * backoff, and the fetched-payload → DataFrame path. All transports
  * are injected fakes — no network in the sandbox, same as production
  * tests for an HTTP client seam.
  */
class RestDimSpec extends SparkSpec {

  private val req = Request("http://example.invalid/v2.0/config/metricmappings")
    .withSharedKey("test-key")

  test("shared-key header uses the reference's header name") {
    req.headers shouldBe Map("sharedKey" -> "test-key")
  }

  test("first-try success does not sleep") {
    var sleeps = 0L
    val body = fetch(req, _ => Ok("""{"a":1}"""), ms => sleeps += ms)
    body shouldBe """{"a":1}"""
    sleeps shouldBe 0L
  }

  test("transient failures retry with exponential backoff then succeed") {
    var calls = 0
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    val transport: Transport = { r =>
      r.headers("sharedKey") shouldBe "test-key" // header sent every attempt
      calls += 1
      if (calls < 3) Transient("HTTP 502") else Ok("ok")
    }
    fetch(req, transport, sleeps += _) shouldBe "ok"
    calls shouldBe 3
    sleeps.toList shouldBe List(250L, 1000L) // 250 * 4^k
  }

  test("permanent failure throws immediately, no retry, no sleep") {
    var calls = 0
    var slept = false
    val e = intercept[RuntimeException] {
      fetch(req, { _ => calls += 1; Permanent("HTTP 401") }, _ => slept = true)
    }
    calls shouldBe 1
    slept shouldBe false
    e.getMessage should include("permanent")
    e.getMessage should include("HTTP 401")
  }

  test("transient exhaustion throws with the full attempt history") {
    val e = intercept[RuntimeException] {
      fetch(req.copy(maxAttempts = 3), _ => Transient("HTTP 503"), _ => ())
    }
    e.getMessage should include("all 3 attempts")
    e.getMessage should include("attempt 1: HTTP 503")
    e.getMessage should include("attempt 3: HTTP 503")
  }

  test("loadDim parses the fetched payload into a DataFrame") {
    val payload =
      """[{"Id":1,"Name":"SNR","Unit":"dB"},{"Id":2,"Name":"Power","Unit":"dBm"}]"""
    val df = RestDim.loadDim(spark, req, _ => Ok(payload), _ => ())
    df.count() shouldBe 2
    df.columns.sorted.toSeq shouldBe Seq("Id", "Name", "Unit")
    val flaky = { var n = 0; (_: Request) =>
      { n += 1; if (n == 1) Transient("reset") else Ok(payload) } }
    RestDim.loadDim(spark, req, flaky, _ => ()).count() shouldBe 2
  }

  test("request validation rejects nonsense policies") {
    intercept[IllegalArgumentException](Request("u", maxAttempts = 0))
    intercept[IllegalArgumentException](Request("u", backoffFactor = 0.5))
    intercept[IllegalArgumentException](Request("u", initialBackoffMs = -1))
  }

  test("url transport classifies a malformed URL as permanent") {
    urlTransport()(Request("not a url")) match {
      case Permanent(_) => succeed
      case other => fail(s"expected Permanent, got $other")
    }
  }

  test("url transport classifies a non-http scheme as permanent, not retried") {
    // file: URLs open a FileURLConnection — a misconfiguration that can
    // never heal, so it must be Permanent (one attempt), not a
    // ClassCastException burning the whole retry/backoff budget
    urlTransport()(Request("file:///etc/hostname")) match {
      case Permanent(reason) => reason should include("not an http(s) URL")
      case other => fail(s"expected Permanent, got $other")
    }
    var slept = false
    val e = intercept[RuntimeException] {
      fetch(Request("file:///etc/hostname"), urlTransport(), _ => slept = true)
    }
    e.getMessage should include("attempt 1")
    slept shouldBe false
  }
}
