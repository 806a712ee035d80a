package graft.store

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Content-hash surrogate keys (SURVEY.md §2.4 H1): sqlite-utils
  * `hash_id` semantics, verified byte-exact against the reference
  * goldens (`/root/reference/tests/test_save_tweets.py:321` id
  * `95f3aaad…` for sources; `tests/test_import.py:99` `c4e32e91…` for
  * archive_account):
  *
  *   sha1(json.dumps(record, separators=(",",":"), sort_keys=True,
  *        default=repr).encode("utf8"))
  *
  * i.e. compact separators, keys sorted, ensure_ascii escaping of
  * non-ASCII, over every column EXCEPT the hash column itself. This is
  * a driver-side-deterministic serializer used for small dimension
  * tables — correctness beats codegen here (SURVEY §4.3.1).
  */
object HashId {

  /** Python-json string literal: ensure_ascii=True escaping. */
  def pyJsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** Python `repr(float)` / json.dumps float rendering: fixed notation
    * while the leading digit's decimal exponent X satisfies
    * -4 ≤ X < 16, else `d.ddde±XX` scientific (sign always, exponent
    * ≥ 2 digits, no trailing `.0` on a bare mantissa digit). Digits
    * come from Java's shortest round-trip rendering; pre-JDK-19 Java
    * may very rarely emit one digit more than CPython's shortest —
    * still round-trip-exact, and none of the reference's hashed
    * fixtures hit such a value.
    */
  def pyReprDouble(d: Double): String = {
    if (d.isNaN) "NaN" // json.dumps writes bare NaN/Infinity
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0) { if (1 / d < 0) "-0.0" else "0.0" }
    else {
      val neg = d < 0
      // shortest digits D and exponent e with |d| = 0.D × 10^e
      val bd = new java.math.BigDecimal(java.lang.Double.toString(Math.abs(d)))
      val unscaled = bd.unscaledValue.toString
      val stripped = unscaled.reverse.dropWhile(_ == '0').reverse
      val digits = if (stripped.isEmpty) "0" else stripped
      val e = digits.length + (unscaled.length - stripped.length) - bd.scale
      val x = e - 1 // decimal exponent of the leading digit
      val body =
        if (x >= -4 && x < 16) {
          if (e <= 0) "0." + ("0" * -e) + digits
          else if (e >= digits.length) digits + ("0" * (e - digits.length)) + ".0"
          else digits.substring(0, e) + "." + digits.substring(e)
        } else {
          val mantissa =
            if (digits.length == 1) digits
            else digits.substring(0, 1) + "." + digits.substring(1)
          f"${mantissa}e$x%+03d"
        }
      if (neg) "-" + body else body
    }
  }

  /** Canonical compact JSON of a runtime value, matching Python
    * json.dumps(..., separators=(",",":"), sort_keys=True). Doubles
    * render through pyReprDouble so every float shape — including
    * scientific notation — serializes exactly as CPython would.
    */
  def canonicalJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case s: String => pyJsonString(s)
    case i: Int => i.toString
    case l: Long => l.toString
    case s: Short => s.toString
    case b: Byte => b.toString
    case d: Double => pyReprDouble(d)
    case f: Float => canonicalJson(f.toDouble)
    case seq: Seq[_] => seq.map(canonicalJson).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${pyJsonString(k)}:${canonicalJson(x)}" }
        .mkString("{", ",", "}")
    case r: Row =>
      val schema = r.schema
      require(schema != null, "hash_id row needs a schema")
      schema.fieldNames.sorted.map { name =>
        s"${pyJsonString(name)}:${canonicalJson(r.getAs[Any](name))}"
      }.mkString("{", ",", "}")
    case other =>
      // Python's default=repr fallback is only hit for exotic types the
      // reference never actually hashes; string-ify defensively.
      pyJsonString(other.toString)
  }

  def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** hash_id of a record given as (column name → value). */
  def hashRecord(record: Map[String, Any]): String =
    sha1Hex(canonicalJson(record))

  /** Column form: hash over named columns (sorted by name inside). The
    * UDF receives a struct Row that carries its schema (Java UDF1 form
    * — the typed Scala `udf` can't encode Row inputs).
    */
  private val rowHashUdf: UserDefinedFunction = udf(
    new org.apache.spark.sql.api.java.UDF1[Row, String] {
      override def call(r: Row): String =
        if (r == null) null else sha1Hex(canonicalJson(r))
    }, StringType)

  def hashId(fields: (String, Column)*): Column = {
    val st = struct(fields.map { case (n, c) => c.as(n) }: _*)
    rowHashUdf(st)
  }

  /** Like canonicalJson over a Row but SKIPPING null fields: in the
    * reference's dict world a key a record doesn't carry simply isn't
    * in the dict and is not hashed; Spark's union schema null-fills
    * absent keys, so nulls here stand for "absent". (A record with an
    * explicit JSON null is indistinguishable — documented divergence.)
    */
  private def canonicalJsonSkippingNulls(r: Row): String = {
    val schema = r.schema
    schema.fieldNames.sorted.flatMap { name =>
      r.getAs[Any](name) match {
        case null => None
        case v => Some(s"${pyJsonString(name)}:${canonicalJson(v)}")
      }
    }.mkString("{", ",", "}")
  }

  private val rowHashSkipNullsUdf: UserDefinedFunction = udf(
    new org.apache.spark.sql.api.java.UDF1[Row, String] {
      override def call(r: Row): String =
        if (r == null) null else sha1Hex(canonicalJsonSkippingNulls(r))
    }, StringType)

  /** hash_id over every column of a row except `except` — the
    * archive-table form (`/root/reference/archive.py:248` pk="pk").
    * Null (= absent) fields are excluded from the hash, matching
    * sqlite-utils hashing only the keys present in each record.
    */
  def hashIdOfAllColumns(schema: StructType, except: Set[String] = Set.empty): Column = {
    val fields = schema.fieldNames.filterNot(except)
      .map(n => col(n).as(n)).toSeq
    rowHashSkipNullsUdf(struct(fields: _*))
  }
}
