package graft.store

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SQLite-compat rendering boundary (SURVEY.md §1.3): the
  * reference serializes values SQLite can't hold — lists, dicts,
  * nested GeoJSON — as Python `json.dumps` text with DEFAULT
  * separators (", ", ": ") and original key order (goldens:
  * `test_save_tweets.py:199` "[0, 239]", `:355` bounding_box, `:375`
  * sizes). Spark keeps native ArrayType/StructType/MapType through the
  * pipeline; this renderer is applied only when emitting rows that
  * must byte-match the reference's stored TEXT form.
  */
object SqliteCompat {

  /** Python json.dumps with default separators; key order = struct
    * field order / map insertion order (NOT sorted — sorting is only
    * for hash ids).
    */
  private[store] def pyJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case s: String => HashId.pyJsonString(s)
    case i: Int => i.toString
    case l: Long => l.toString
    case s: Short => s.toString
    case b: Byte => b.toString
    case d: Double =>
      if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e16)
        s"${d.toLong}.0"
      else d.toString
    case f: Float => pyJson(f.toDouble)
    case seq: Seq[_] => seq.map(pyJson).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${HashId.pyJsonString(k.toString)}: ${pyJson(x)}" }
        .mkString("{", ", ", "}")
    case r: Row =>
      val schema = r.schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        s"${HashId.pyJsonString(f.name)}: ${pyJson(r.get(i))}"
      }.mkString("{", ", ", "}")
    case other => HashId.pyJsonString(other.toString)
  }

  import org.apache.spark.sql.api.java.UDF1

  private val pyJsonUdf = udf(new UDF1[Row, String] {
    override def call(r: Row): String = if (r == null) null else pyJson(r)
  }, StringType)
  private val pyJsonArrUdf = udf(new UDF1[Seq[Any], String] {
    override def call(s: Seq[Any]): String = if (s == null) null else pyJson(s)
  }, StringType)
  private val pyJsonMapUdf = udf(new UDF1[scala.collection.Map[String, Any], String] {
    override def call(m: scala.collection.Map[String, Any]): String =
      if (m == null) null else pyJson(m)
  }, StringType)

  def renderColumn(c: Column, dt: DataType): Column = dt match {
    case _: StructType => pyJsonUdf(c)
    case _: ArrayType => pyJsonArrUdf(c)
    case _: MapType => pyJsonMapUdf(c)
    case BooleanType => c.cast(IntegerType) // sqlite stores 0/1
    case _ => c
  }

  /** Render every non-scalar column of `df` to its SQLite TEXT form
    * and booleans to 0/1 — the shape the reference's golden rows have.
    */
  def render(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(f =>
      renderColumn(col(f.name), f.dataType).as(f.name)): _*)
}
