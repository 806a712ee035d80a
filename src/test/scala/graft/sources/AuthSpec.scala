package graft.sources

import graft.SparkSpec

/** S16/S17/A3: credential plumbing, OAuth 1.0a signing, the fetch
  * debug command, the auth prompt, and ingest progress estimation —
  * the last three reference behaviors previously scoped out.
  */
class AuthSpec extends SparkSpec {

  private val creds = AuthFile.Credentials(
    "xvz1evFS4wEEPTGEFPHBog",
    "kAcSOqF21Fu85e7zjz7ZN2U4ZRhfV3WpwPAoE3Z7kBw",
    "370773112-GmHxMAgYyLbNEtIKZeRNFsMKPR9EyMZeS9weJAEb",
    "LswwdoUaIvS8ltyTt5jkRh4J50vUPVVHtR2YPi5kE")

  test("OAuth1 signing reproduces the published HMAC-SHA1 example") {
    // the standard published OAuth 1.0a worked example (the one every
    // client library verifies against): POST statuses/update.json
    // with fixed nonce/timestamp must produce this exact signature
    val params = Seq(
      "status" -> "Hello Ladies + Gentlemen, a signed OAuth request!",
      "include_entities" -> "true")
    val header = OAuth1.authorizationHeader(
      "POST", "https://api.twitter.com/1.1/statuses/update.json", params,
      creds,
      nonce = "kYjzVBB8Y0ZFabxSWbWovY3uYSQ2pTgmZeNu2VS4cg",
      timestamp = 1318622958L)
    assert(header.contains(
      """oauth_signature="hCtSmYh%2BiHYCEqBWrE7C7hYmtUk%3D""""), header)
    assert(header.startsWith("OAuth "))
    // protocol params are all present, sorted, quoted
    for (k <- Seq("oauth_consumer_key", "oauth_nonce", "oauth_signature",
        "oauth_signature_method", "oauth_timestamp", "oauth_token",
        "oauth_version"))
      assert(header.contains(s"""$k="""), s"missing $k")
  }

  test("percent-encoding is RFC 3986 strict (OAuth variant)") {
    assert(OAuth1.percentEncode("Ladies + Gentlemen") === "Ladies%20%2B%20Gentlemen")
    assert(OAuth1.percentEncode("An encoded string!") === "An%20encoded%20string%21")
    assert(OAuth1.percentEncode("Dogs, Cats & Mice") === "Dogs%2C%20Cats%20%26%20Mice")
    assert(OAuth1.percentEncode("☃") === "%E2%98%83")
    assert(OAuth1.percentEncode("safe-._~AZaz09") === "safe-._~AZaz09")
  }

  test("fetch signs the url's own query params and pretty-prints indent-4") {
    var seenUrl: String = null
    var seenAuth: String = null
    val http = (url: String, headers: Map[String, String]) => {
      seenUrl = url
      seenAuth = headers("Authorization")
      """{"b":[1,2],"a":{"x":null,"y":true},"s":"t\"xt","n":1.5,"e":{},"l":[]}"""
    }
    val out = new StringBuilder
    Fetch.run(
      "https://api.twitter.com/1.1/users/show.json?screen_name=simonw&x=a+b",
      creds, http, s => out.append(s),
      nonce = () => "fixednonce", now = () => 1318622958L)
    assert(seenUrl.contains("users/show.json"))
    assert(seenAuth.startsWith("OAuth "))
    // same inputs → same signature: the query params entered the base
    // string (a signature over a paramless base would differ)
    val headerNoParams = OAuth1.authorizationHeader(
      "GET", "https://api.twitter.com/1.1/users/show.json", Nil, creds,
      "fixednonce", 1318622958L)
    assert(seenAuth !== headerNoParams,
      "query params must participate in the signature")
    // python json.dumps(indent=4) shape, field order preserved
    assert(out.toString ===
      """{
        |    "b": [
        |        1,
        |        2
        |    ],
        |    "a": {
        |        "x": null,
        |        "y": true
        |    },
        |    "s": "t\"xt",
        |    "n": 1.5,
        |    "e": {},
        |    "l": []
        |}""".stripMargin)
  }

  test("json rendering matches python's ensure_ascii default") {
    assert(Json.quote("café ☃") === "\"caf\\u00e9 \\u2603\"")
    assert(Json.quote("a\bb\fc") === "\"a\\bb\\fc\"")
    // astral char → surrogate pair, as python emits
    assert(Json.quote("\ud83d\ude00") === "\"\\ud83d\\ude00\"")
  }

  test("jdk transport returns bodies for 200 AND error statuses (loopback)") {
    // in-JDK loopback server — the whole fetch command runs offline,
    // including the 429 error-body branch the reference also prints
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(status: Int, body: String) =
      new com.sun.net.httpserver.HttpHandler {
        override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          // echo the auth header back so the test can assert it arrived
          val auth = ex.getRequestHeaders.getFirst("Authorization")
          ex.getResponseHeaders.add("X-Seen-Auth",
            if (auth == null) "none" else auth.take(5))
          ex.sendResponseHeaders(status, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      }
    server.createContext("/ok.json", handler(200, """{"ok": true}"""))
    server.createContext("/limited.json",
      handler(429, """{"errors": [{"code": 88, "message": "Rate limit exceeded"}]}"""))
    server.start()
    try {
      val port = server.getAddress.getPort
      val okOut = new StringBuilder
      Fetch.run(s"http://127.0.0.1:$port/ok.json", creds,
        Fetch.jdkHttp, s => okOut.append(s),
        nonce = () => "n", now = () => 1L)
      assert(okOut.toString ===
        """{
          |    "ok": true
          |}""".stripMargin)
      val errOut = new StringBuilder
      Fetch.run(s"http://127.0.0.1:$port/limited.json", creds,
        Fetch.jdkHttp, s => errOut.append(s),
        nonce = () => "n", now = () => 1L)
      // the 429 payload is printed, not thrown — the reference shape
      assert(errOut.toString.contains("\"code\": 88"))
      assert(errOut.toString.contains("Rate limit exceeded"))
    } finally server.stop(0)
  }

  test("auth prompt writes the reference's exact auth.json shape") {
    val answers = scala.collection.mutable.Queue(
      "my-key", "my-secret", "my-token", "my-token-secret")
    val echoed = Seq.newBuilder[String]
    var written: String = null
    AuthPrompt.run(
      prompt = p => { echoed += p; answers.dequeue() },
      echo = echoed += _,
      write = written = _)
    assert(written ===
      """{
        |    "api_key": "my-key",
        |    "api_secret_key": "my-secret",
        |    "access_token": "my-token",
        |    "access_token_secret": "my-token-secret"
        |}
        |""".stripMargin)
    // and the written file round-trips through the loader the other
    // commands use
    val back = AuthFile.parse(written)
    assert(back === AuthFile.Credentials(
      "my-key", "my-secret", "my-token", "my-token-secret"))
    assert(echoed.result().exists(_.contains("developer.twitter.com")))
  }

  test("auth file parsing names missing keys") {
    val ex = intercept[IllegalArgumentException] {
      AuthFile.parse("""{"api_key": "k"}""")
    }
    assert(ex.getMessage.contains("api_secret_key"))
    assert(ex.getMessage.contains("access_token_secret"))
  }

  test("progress clamps to the estimated total and formats like click") {
    assert(Progress.importLabel(1234567L, "followers", "simonw") ===
      "Importing 1,234,567 followers for @simonw")
    assert(Progress.grouped(999L) === "999")
    assert(Progress.grouped(1000L) === "1,000")
    assert(Progress.grouped(-1234L) === "-1,234")
    assert(Progress.grouped(Long.MinValue) === "-9,223,372,036,854,775,808")
    val lines = Seq.newBuilder[String]
    val p = new Progress("x", expected = 450L, out = lines += _)
    p.update(200); assert(p.percent === 44)
    p.update(200); assert(p.percent === 88)
    // the API count was an estimate; the real list ran longer — clamp
    p.update(200); assert(p.percent === 100)
    assert(lines.result().size === 3)
    val silent = new Progress("x", 10L, lines += _, silent = true)
    silent.update(10)
    assert(lines.result().size === 3, "silent mode must not emit")
  }

  test("cursor pages tick the progress bar by chunk size") {
    val chunks = Iterator(Seq("a", "b"), Seq("c"), Seq("d", "e", "f"))
    val lines = Seq.newBuilder[String]
    val p = new Progress(
      Progress.importLabel(6L, "followers", "x"), 6L, lines += _)
    val seen = Paginate.withProgress(chunks, p).toList
    assert(seen.map(_.size) === List(2, 1, 3))
    assert(p.percent === 100)
    assert(lines.result().map(_.split("  ").last) ===
      Seq("[2/6]", "[3/6]", "[6/6]"))
  }

  test("expected totals come from the stored profile row") {
    import spark.implicits._
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-prog").toString)
    store.upsert("users",
      Seq((42L, "simonw", 5000L, 300L))
        .toDF("id", "screen_name", "followers_count", "friends_count"),
      Seq("id"))
    assert(Progress.expectedFor(store, 42L, "followers") === Some(5000L))
    assert(Progress.expectedFor(store, 42L, "friends") === Some(300L))
    assert(Progress.expectedFor(store, 99L, "followers") === None)
    assert(Progress.expectedFor(store, 42L, "listed") === None)
  }
}
