package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact sqlite-utils hash_id parity (SURVEY.md §2.4 H1).
  * Golden vectors straight from the reference tests:
  *  - sources row {name, url} → 95f3aaad… (test_save_tweets.py:321-324)
  *  - archive account record → c4e32e91… (test_import.py:99-107)
  */
class HashIdSpec extends AnyFunSuite {

  test("golden: sources hash (Twitter for iPhone)") {
    assert(HashId.hashRecord(Map(
      "name" -> "Twitter for iPhone",
      "url" -> "http://twitter.com/download/iphone"))
      === "95f3aaaddaa45937ac94765e0ddb68ba2be92d20")
  }

  test("golden: other sources hashes from test_save_tweets.py:317-340") {
    assert(HashId.hashRecord(Map(
      "name" -> "Vox Media", "url" -> "http://www.voxmedia.com"))
      === "942cfc2bf9f290ddbe3d78f1907dc084a00ed23f")
    assert(HashId.hashRecord(Map(
      "name" -> "Twitter Web App", "url" -> "https://mobile.twitter.com"))
      === "1f89d6a41b1505a3071169f8d0d028ba9ad6f952")
    assert(HashId.hashRecord(Map(
      "name" -> "Twitter for Mac",
      "url" -> "http://itunes.apple.com/us/app/twitter/id409789998?mt=12"))
      === "e6528b505bcfd811fdd40ff2d46665dbccba2024")
  }

  test("golden: archive_account hash_id pk (test_import.py:99)") {
    assert(HashId.hashRecord(Map(
      "phoneNumber" -> "+15555555555",
      "email" -> "swillison@example.com",
      "createdVia" -> "web",
      "username" -> "simonw",
      "accountId" -> "12497",
      "createdAt" -> "2006-11-15T13:18:50.000Z",
      "accountDisplayName" -> "Simon Willison"))
      === "c4e32e91742df2331ef3ad1e481d1a64d781183a")
  }

  test("canonical json: sorted keys, compact separators, ensure_ascii") {
    assert(HashId.canonicalJson(Map("b" -> 1L, "a" -> "x")) === """{"a":"x","b":1}""")
    // ensure_ascii: non-ASCII escapes to \uXXXX exactly like Python
    assert(HashId.canonicalJson(Map("k" -> "café")) === "{\"k\":\"caf\\u00e9\"}")
    assert(HashId.canonicalJson(Map("k" -> "a\"b\\c\nd")) === """{"k":"a\"b\\c\nd"}""")
    assert(HashId.canonicalJson(Seq(0L, 239L)) === "[0,239]")
    assert(HashId.canonicalJson(null) === "null")
    assert(HashId.canonicalJson(true) === "true")
    assert(HashId.canonicalJson(1.0d) === "1.0")
    assert(HashId.canonicalJson(0.25d) === "0.25")
  }

  test("doubles render exactly like CPython repr (goldens from python3)") {
    // each pair generated with python3 `repr(v)`
    val goldens = Seq[(Double, String)](
      0.0 -> "0.0", -0.0 -> "-0.0", 1.0 -> "1.0", -1.5 -> "-1.5",
      123.456 -> "123.456", 0.0001 -> "0.0001", 0.00001 -> "1e-05",
      1.23e-5 -> "1.23e-05", 1e15 -> "1000000000000000.0",
      1e16 -> "1e+16", 1.5e16 -> "1.5e+16", 1e20 -> "1e+20",
      1.5e20 -> "1.5e+20", 2.5e-10 -> "2.5e-10", 3.14159 -> "3.14159",
      123456789.5 -> "123456789.5", 9.87e100 -> "9.87e+100",
      -4.2e-7 -> "-4.2e-07", 0.1 -> "0.1",
      1.0 / 3.0 -> "0.3333333333333333",
      9007199254740993.0 -> "9007199254740992.0",
      6.02e23 -> "6.02e+23")
    goldens.foreach { case (v, expected) =>
      assert(HashId.pyReprDouble(v) === expected, s"for $v")
    }
    // json.dumps writes bare NaN / Infinity tokens
    assert(HashId.pyReprDouble(Double.NaN) === "NaN")
    assert(HashId.pyReprDouble(Double.PositiveInfinity) === "Infinity")
    assert(HashId.pyReprDouble(Double.NegativeInfinity) === "-Infinity")
  }

  test("property: serialization total, deterministic, key-order-insensitive") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val rec: Map[String, Any] = (0 until rnd.nextInt(8)).map { i =>
        val key = rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString
        val value: Any = rnd.nextInt(5) match {
          case 0 => rnd.nextLong()
          case 1 => rnd.nextBoolean()
          case 2 => null
          case 3 => (0 until rnd.nextInt(4)).map(_ => rnd.nextPrintableChar().toString)
          case _ => rnd.nextPrintableChar().toString * rnd.nextInt(20)
        }
        key -> value
      }.toMap
      val shuffled = scala.util.Random.shuffle(rec.toSeq).toMap
      assert(HashId.hashRecord(rec) === HashId.hashRecord(shuffled))
      assert(HashId.hashRecord(rec).length === 40)
    }
  }
}
