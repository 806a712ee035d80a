package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** S16/S17 — the reference's credential plumbing, made engine-shaped:
  *
  *  - `AuthFile`: the auth.json contract (cli.py:55-83 writes it,
  *    utils.py:69-75 consumes it) — exactly four keys: api_key,
  *    api_secret_key, access_token, access_token_secret.
  *  - `OAuth1`: RFC 5849 HMAC-SHA1 request signing, the real work
  *    OAuth1Session does for `session_for_auth` (utils.py:69-75).
  *    Pure JDK crypto — verified in OAuthSpec against the standard
  *    published signing example.
  *  - `Fetch`: cli.py:39-52 `fetch` — authenticated GET of an
  *    arbitrary API URL, response pretty-printed as JSON with
  *    4-space indentation (python json.dumps(indent=4) shape). The
  *    HTTP transport is injected, the same seam every network-bound
  *    source in this package uses (TimelineIngest et al.), so the
  *    command is fully testable offline and swaps in a real client
  *    one lambda away.
  *  - `AuthPrompt`: cli.py:55-83 `auth` — prompt the four
  *    credentials and write auth.json (indent=4, trailing newline,
  *    reference key order).
  */
object AuthFile {

  final case class Credentials(
      apiKey: String, apiSecretKey: String,
      accessToken: String, accessTokenSecret: String)

  private val Keys =
    Seq("api_key", "api_secret_key", "access_token", "access_token_secret")

  /** Parse auth.json content; every key must be present (the
    * reference would KeyError on first use — we fail at load with
    * the missing names).
    */
  def parse(json: String): Credentials = {
    val node = new ObjectMapper().readTree(json)
    val missing = Keys.filterNot(node.has)
    require(missing.isEmpty,
      s"auth file is missing key(s): ${missing.mkString(", ")}")
    Credentials(
      node.get("api_key").asText(),
      node.get("api_secret_key").asText(),
      node.get("access_token").asText(),
      node.get("access_token_secret").asText())
  }

  def load(path: String): Credentials =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), UTF_8))

  /** Render credentials exactly as the reference writes them
    * (cli.py:69-83: json.dumps(indent=4) + "\n", insertion order).
    */
  def render(c: Credentials): String =
    s"""{
       |    "api_key": ${Json.quote(c.apiKey)},
       |    "api_secret_key": ${Json.quote(c.apiSecretKey)},
       |    "access_token": ${Json.quote(c.accessToken)},
       |    "access_token_secret": ${Json.quote(c.accessTokenSecret)}
       |}
       |""".stripMargin
}

/** RFC 5849 (OAuth 1.0a) HMAC-SHA1 signing — what OAuth1Session adds
  * to every reference request. Deterministic given (nonce, timestamp),
  * which the caller injects so specs can pin exact signatures.
  */
object OAuth1 {

  /** RFC 3986 §2.3 percent-encoding: unreserved chars pass, all other
    * UTF-8 bytes become uppercase %XX (the OAuth-specific strictness:
    * '+' and '*' are NOT passthrough, space is %20 not '+').
    */
  def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = b.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private def hmacSha1(key: String, base: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes(UTF_8), "HmacSHA1"))
    java.util.Base64.getEncoder.encodeToString(mac.doFinal(base.getBytes(UTF_8)))
  }

  /** The signature base string (RFC 5849 §3.4.1): METHOD & enc(base
    * url) & enc(params joined sorted BY ENCODED key then value).
    */
  def signatureBase(
      method: String, baseUrl: String, params: Seq[(String, String)]): String = {
    val normalized = params
      .map { case (k, v) => (percentEncode(k), percentEncode(v)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    s"${method.toUpperCase}&${percentEncode(baseUrl)}&${percentEncode(normalized)}"
  }

  /** Sign and render the Authorization header for one request.
    * `params` carries query/body parameters; oauth_* protocol params
    * are added here. Returns the full `OAuth k="v", …` header value.
    */
  def authorizationHeader(
      method: String, baseUrl: String, params: Seq[(String, String)],
      creds: AuthFile.Credentials, nonce: String, timestamp: Long): String = {
    val oauth = Seq(
      "oauth_consumer_key" -> creds.apiKey,
      "oauth_nonce" -> nonce,
      "oauth_signature_method" -> "HMAC-SHA1",
      "oauth_timestamp" -> timestamp.toString,
      "oauth_token" -> creds.accessToken,
      "oauth_version" -> "1.0")
    val base = signatureBase(method, baseUrl, params ++ oauth)
    val signingKey =
      s"${percentEncode(creds.apiSecretKey)}&${percentEncode(creds.accessTokenSecret)}"
    val sig = hmacSha1(signingKey, base)
    (oauth :+ ("oauth_signature" -> sig))
      .sortBy(_._1)
      .map { case (k, v) => s"""${percentEncode(k)}="${percentEncode(v)}"""" }
      .mkString("OAuth ", ", ", "")
  }

  /** Split a URL into (base url, query params) the way signing wants:
    * scheme://host/path without query, params decoded from the query
    * string.
    */
  def splitUrl(url: String): (String, Seq[(String, String)]) = {
    val u = java.net.URI.create(url)
    val base = new java.net.URI(
      u.getScheme, u.getAuthority, u.getPath, null, null).toString
    val params = Option(u.getRawQuery).toSeq.flatMap(_.split("&").toSeq)
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (urlDecode(kv), "")
        else (urlDecode(kv.take(i)), urlDecode(kv.drop(i + 1)))
      }
    (base, params)
  }

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)
}

/** Minimal JSON rendering helpers shared by fetch/auth: python
  * json.dumps(indent=4) shape — 4-space indent, `": "` after keys,
  * no trailing spaces, field order preserved.
  */
object Json {

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    // python json.dumps defaults: ensure_ascii=True — every char past
    // 0x7E escapes as \uXXXX (astral chars as surrogate PAIRS, which
    // UTF-16 code units give for free), \b and \f use their short
    // forms
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Pretty-print a parsed tree like python's json.dumps(indent=4). */
  def pretty(node: JsonNode, indent: Int = 0): String = {
    val pad = " " * indent
    val padIn = " " * (indent + 4)
    import scala.jdk.CollectionConverters._
    if (node.isObject) {
      val fields = node.fields().asScala.toSeq
      if (fields.isEmpty) "{}"
      else fields.map { e =>
        s"$padIn${quote(e.getKey)}: ${pretty(e.getValue, indent + 4)}"
      }.mkString("{\n", ",\n", s"\n$pad}")
    } else if (node.isArray) {
      val els = node.elements().asScala.toSeq
      if (els.isEmpty) "[]"
      else els.map(e => s"$padIn${pretty(e, indent + 4)}")
        .mkString("[\n", ",\n", s"\n$pad]")
    } else if (node.isTextual) quote(node.asText())
    else if (node.isNull) "null"
    else node.toString // numbers, booleans: Jackson renders canonically
  }

  def parse(s: String): JsonNode = new ObjectMapper().readTree(s)
}

/** S16 `fetch` (cli.py:39-52): authenticated GET of any API URL,
  * response echoed as indent-4 JSON. Transport injected (the
  * package-wide seam); nonce/timestamp injectable for deterministic
  * specs, defaulting to real entropy/clock in production.
  */
object Fetch {

  def run(
      url: String,
      creds: AuthFile.Credentials,
      http: (String, Map[String, String]) => String,
      out: String => Unit,
      nonce: () => String = () =>
        java.util.UUID.randomUUID().toString.replace("-", ""),
      now: () => Long = () => System.currentTimeMillis() / 1000L): Unit = {
    val (base, params) = OAuth1.splitUrl(url)
    val header = OAuth1.authorizationHeader(
      "GET", base, params, creds, nonce(), now())
    val body = http(url, Map("Authorization" -> header))
    out(Json.pretty(Json.parse(body)))
  }

  /** The production transport (plain JDK GET): returns the response
    * body whatever the status — the reference prints the API's JSON
    * error payload on 401/429 (cli.py:52 json.dumps(r.json())), and a
    * debug fetch exists precisely to SHOW those. Tested against an
    * in-JDK loopback HTTP server (AuthSpec), so the whole command is
    * exercised offline.
    */
  def jdkHttp(url: String, headers: Map[String, String]): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    // a hung endpoint must not hang the CLI forever
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(30000)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    val in =
      if (conn.getResponseCode >= 400 && conn.getErrorStream != null)
        conn.getErrorStream
      else conn.getInputStream
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}

/** S17 `auth` (cli.py:55-83): prompt the four credentials, write
  * auth.json in the reference's exact shape. I/O injected for specs;
  * the CLI passes console stdin/stdout.
  */
object AuthPrompt {

  val Prompts: Seq[String] =
    Seq("API key", "API secret key", "Access token", "Access token secret")

  def run(
      prompt: String => String,
      echo: String => Unit,
      write: String => Unit): Unit = {
    echo("Create an app here: https://developer.twitter.com/en/apps")
    echo("Then navigate to 'Keys and tokens' and paste in the following:")
    echo("")
    val answers = Prompts.map(p => prompt(s"$p: "))
    write(AuthFile.render(AuthFile.Credentials(
      answers(0), answers(1), answers(2), answers(3))))
  }
}
