package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native per-subspace L2 loop must be a DROP-IN replacement for
  * the declarative aggregate(zip_with(slice…)) chain it displaced —
  * same structs, same order, bit-identical doubles — because the PQ
  * oracle queries' every distance flows through it.
  */
class SliceDistsSpec extends SparkSpec {
  import spark.implicits._

  private val slices = 8
  private val subDim = 8

  private def hofChain(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    array((0 until slices).map { s =>
      struct(lit(s).as("s"),
        aggregate(
          zip_with(slice(a, s * subDim + 1, subDim),
            slice(b, s * subDim + 1, subDim),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"))
    }: _*)

  test("native slice distances equal the HOF chain bit-for-bit") {
    // deterministic pseudo-random doubles incl. negatives/irrationals
    val rows = (0 until 50).map { i =>
      (i.toLong,
        (0 until 64).map(d => math.sin(i * 64 + d) * 10.0),
        (0 until 64).map(d => math.cos(i * 64 + d) * 10.0))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        SliceDists.sliceL2(spark, col("a"), col("b"), slices, subDim).as("sd"))
      .select(col("id"), explode(col("sd")).as("x"))
      .select(col("id"), col("x.s"), col("x.d"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = df.select(col("id"), explode(hofChain(col("a"), col("b"))).as("x"))
      .select(col("id"), col("x.s"), col("x.d"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === 50 * slices)
    // exact double equality — the fold order must match, not just the sum
    got.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, want(k)) === 0, s"$k: $v != ${want(k)}")
    }
  }

  test("null elements poison exactly their slice, as the HOF chain did") {
    val df = Seq((
      Seq[java.lang.Double](1.0, null, 2.0, 2.0),
      Seq[java.lang.Double](0.0, 0.0, 0.0, 0.0)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    def chain2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      array((0 until 2).map { s =>
        struct(lit(s).as("s"),
          aggregate(zip_with(slice(a, s * 2 + 1, 2), slice(b, s * 2 + 1, 2),
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x).as("d"))
      }: _*)
    val got = df.select(explode(
        SliceDists.sliceL2(spark, col("a"), col("b"), 2, 2)).as("x"))
      .select(col("x.s"), col("x.d")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val want = df.select(explode(chain2(col("a"), col("b"))).as("x"))
      .select(col("x.s"), col("x.d")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === want)
    assert(got(0) === None)       // slice with the null element
    assert(got(1) === Some(8.0))  // clean slice unaffected
  }

  test("native l2 fold equals the HOF chain (store-side subvector path)") {
    val rows = (0 until 30).map { i =>
      ((0 until 8).map(d => math.sin(i * 8 + d) * 5.0),
        (0 until 8).map(d => math.cos(i * 8 + d) * 5.0))
    }
    val df = rows.toDF("a", "b")
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    df.select(SliceDists.l2Fold(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .collect().foreach { r =>
        assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) === 0)
      }
  }

  test("native dot fold equals the HOF chain bit-for-bit, nulls included") {
    val rows = (0 until 50).map { i =>
      (i.toLong,
        (0 until 64).map(d => math.sin(i * 64 + d) * 10.0),
        (0 until 64).map(d => math.cos(i * 64 + d) * 10.0))
    }
    val df = rows.toDF("id", "a", "b")
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val both = df.select(col("id"),
        SliceDists.dotFold(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) === 0,
        s"id ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    // zip_with pads mismatched lengths with null → null sum; the
    // native fold must agree
    val mism = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(SliceDists.dotFold(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .head
    assert(mism.isNullAt(0) && mism.isNullAt(1))
  }

  test("native vector subtraction equals zip_with bit-for-bit, padding included") {
    val rows = (0 until 50).map { i =>
      (i.toLong,
        (0 until 64).map(d => math.sin(i * 64 + d) * 10.0),
        (0 until 64).map(d => math.cos(i * 64 + d) * 10.0))
    }
    val df = rows.toDF("id", "a", "b")
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      zip_with(a, b, (x, y) => x - y)
    df.select(col("id"),
        SliceDists.subVec(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .collect().foreach { r =>
        val got = r.getSeq[Double](1)
        val want = r.getSeq[Double](2)
        assert(got.length === want.length, s"id ${r.getLong(0)}: length")
        got.zip(want).foreach { case (g, w) =>
          assert(java.lang.Double.compare(g, w) === 0,
            s"id ${r.getLong(0)}: $g != $w")
        }
      }
    // zip_with pads the shorter array with nulls → null elements at
    // the tail, output length = max; the native form must agree
    val mism = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0)))
      .toDF("a", "b")
      .select(SliceDists.subVec(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .head
    val g = mism.getSeq[java.lang.Double](0)
    val w = mism.getSeq[java.lang.Double](1)
    assert(g === w)
    assert(g === Seq[java.lang.Double](-9.0, null, null))
    // null elements propagate positionally
    val nulls = Seq((
      Seq[java.lang.Double](1.0, null, 3.0),
      Seq[java.lang.Double](1.0, 1.0, null)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
      .select(SliceDists.subVec(spark, col("a"), col("b")).as("got"),
        hof(col("a"), col("b")).as("want"))
      .head
    assert(nulls.getSeq[java.lang.Double](0) === nulls.getSeq[java.lang.Double](1))
    assert(nulls.getSeq[java.lang.Double](0) ===
      Seq[java.lang.Double](0.0, null, null))
  }

  test("code_dot_q equals the floor-sum aggregate on both code layouts") {
    // the SQ8 scoring kernel: Σ floor(w_d·code_d·1e6) as long — the
    // array<int> form (inline oracle queries) and the packed binary
    // form (persisted index tables) must agree with each other and
    // with the per-dim aggregate they displaced
    val codes = Seq(0, 128, 255, 7)
    val ws = Seq(0.25, -1.5, 1.0 / 3.0, 2.0)
    val want = codes.zip(ws)
      .map { case (c, w) => math.floor(w * c * 1e6).toLong }.sum
    val row = Seq((codes, ws)).toDF("codes", "ws")
      .select(
        SliceDists.codeDotQ(spark, col("codes"), col("ws")).as("arr"),
        SliceDists.codeDotQ(spark,
          SliceDists.packCodes(spark, col("codes")), col("ws")).as("bin"))
      .head
    assert(row.getLong(0) === want)
    assert(row.getLong(1) === want)

    // pack round-trip: bytes are the unsigned code values in order
    val blob = Seq(Tuple1(codes)).toDF("codes")
      .select(SliceDists.packCodes(spark, col("codes")))
      .head.getAs[Array[Byte]](0)
    assert(blob.toSeq.map(_ & 0xff) === codes)

    // SUM-over-empty parity: zero contributing terms → NULL, and the
    // shorter side bounds the fold (the pos equi-join semantics)
    val edge = Seq((Seq.empty[Int], Seq(1.0), Seq(1, 2), Seq(0.5)))
      .toDF("c0", "w0", "c2", "w1")
      .select(
        SliceDists.codeDotQ(spark, col("c0"), col("w0")).as("empty"),
        SliceDists.codeDotQ(spark, col("c2"), col("w1")).as("short"))
      .head
    assert(edge.isNullAt(0))
    assert(edge.getLong(1) === math.floor(0.5 * 1 * 1e6).toLong)
  }

  test("adc_dist equals the LUT-join aggregate; corrupt codes fail loudly") {
    // codes (s=0..3) against a 4×4 row-major LUT: the fold must pick
    // exactly lut[s*k + code_s], matching the (s, code) equi-join sum
    val codes = Seq(2, 0, 3, 1)
    val lutFlat = (0L until 16L).map(i => i * i - 7L)
    val want = codes.zipWithIndex
      .map { case (c, s) => lutFlat(s * 4 + c) }.sum
    val got = Seq((codes, lutFlat)).toDF("codes", "lut")
      .select(SliceDists.adcDist(spark,
        SliceDists.packCodes(spark, col("codes")), col("lut")))
      .head.getLong(0)
    assert(got === want)

    // a code beyond the book (Doctor's books-and-codes-disagree
    // corruption) must fail loudly, not score silently wrong
    val ex = intercept[Exception] {
      Seq((Seq(5), (0L until 4L).toSeq)).toDF("codes", "lut")
        .select(SliceDists.adcDist(spark,
          SliceDists.packCodes(spark, col("codes")), col("lut")))
        .collect()
    }
    assert(ex.getMessage.contains("exceeds"))
  }

  test("SQL registry + undersized vectors fail loudly") {
    SliceDists.register(spark)
    val r = spark.sql(
      "SELECT slice_l2_dists(array(1.0d, 2.0d), array(3.0d, 5.0d), 2, 1) AS sd")
      .select(explode(col("sd")).as("x")).select(col("x.d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(r === Seq(4.0, 9.0))
    val ex = intercept[Exception] {
      Seq((Seq(1.0), Seq(1.0))).toDF("a", "b")
        .select(SliceDists.sliceL2(spark, col("a"), col("b"), 2, 4))
        .collect()
    }
    assert(ex.getMessage.contains("at least"))
  }

  test("sign_pack: LSB-first layout, strict x > 0, pad bits zero, null poisons") {
    // 10 dims → 2 bytes; dims 0,2,9 positive → byte0 = 0b00000101,
    // byte1 = 0b00000010; a 0.0 dim is NOT set (strict >)
    val v = Seq(1.0, -3.0, 2.5, 0.0, -0.1, -9.0, 0.0, -1.0, -2.0, 7.0)
    val got = Seq(Tuple1(v)).toDF("e")
      .select(SliceDists.signPack(spark, col("e")).as("b"))
      .head.getAs[Array[Byte]](0)
    assert(got.toSeq === Seq(0x05.toByte, 0x02.toByte))
    // multi-byte parity vs a bit-by-bit reference on pseudo-random data
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until 67).map(d => math.sin(i * 67 + d) * 3.0))
    }
    val packed = rows.toDF("id", "e")
      .select(col("id"), SliceDists.signPack(spark, col("e")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.foreach { case (id, e) =>
      val want = new Array[Byte]((e.length + 7) / 8)
      e.zipWithIndex.foreach { case (x, d) =>
        if (x > 0.0) want(d >> 3) = (want(d >> 3) | (1 << (d & 7))).toByte
      }
      assert(packed(id).toSeq === want.toSeq, s"id $id")
    }
    // null element → whole blob NULL (the PackCodes poison rule)
    val n = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 2.0)))
      .toDF("e")
      .select(SliceDists.signPack(spark, col("e").cast("array<double>")))
      .head
    assert(n.isNullAt(0))
  }

  test("hamming_fold equals the unpacked sign-disagreement count; width mismatch is loud") {
    val rows = (0 until 30).map { i =>
      (i.toLong,
        (0 until 67).map(d => math.sin(i * 67 + d) * 3.0),
        (0 until 67).map(d => math.cos(i * 67 + d) * 3.0))
    }
    val got = rows.toDF("id", "a", "b")
      .select(col("id"),
        SliceDists.hammingFold(spark,
          SliceDists.signPack(spark, col("a")),
          SliceDists.signPack(spark, col("b"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, a, b) =>
      val want = a.zip(b).count { case (x, y) => (x > 0.0) != (y > 0.0) }
      assert(got(id) === want, s"id $id")
    }
    // identical vectors → distance 0 (the exact-twin anchor)
    val self = rows.toDF("id", "a", "b")
      .select(SliceDists.hammingFold(spark,
        SliceDists.signPack(spark, col("a")),
        SliceDists.signPack(spark, col("a"))).as("h"))
      .collect().map(_.getInt(0))
    assert(self.forall(_ === 0))
    // different-dim blobs mean a corrupt index, not a distance
    val ex = intercept[Exception] {
      Seq((Seq(1.0, -1.0, 1.0), Seq(1.0, -1.0, 1.0, 1.0, 1.0, 1.0,
        1.0, 1.0, 1.0))).toDF("a", "b")
        .select(SliceDists.hammingFold(spark,
          SliceDists.signPack(spark, col("a")),
          SliceDists.signPack(spark, col("b"))))
        .collect()
    }
    assert(ex.getMessage.contains("widths differ"))
  }

  test("every kernel runs COMPILED: codegen-only, fallback disabled, parity held") {
    // the doGenCode paths must actually compile and agree with the
    // interpreted evals the other tests pin — with fallback disabled a
    // janino error becomes a test failure instead of a silent
    // interpreted-mode regression of every scan these kernels sit in
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    // a LocalRelation fixture is pre-evaluated INTERPRETED by
    // ConvertToLocalRelation — exclude it or this test is vacuous
    // (KernelCodegenSpec documents the shipped failure)
    conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val rows = (0 until 20).map { i =>
        (i.toLong,
          (0 until 16).map(d => math.sin(i * 16 + d) * 3.0),
          (0 until 16).map(d => math.cos(i * 16 + d) * 3.0))
      }
      val df = rows.toDF("id", "a", "b")
      val got = df.select(col("id"),
          SliceDists.dotFold(spark, col("a"), col("b")).as("dot"),
          SliceDists.l2Fold(spark, col("a"), col("b")).as("l2"),
          SliceDists.subVec(spark, col("a"), col("b")).as("sub"),
          SliceDists.hammingFold(spark,
            SliceDists.signPack(spark, col("a")),
            SliceDists.signPack(spark, col("b"))).as("ham"),
          SliceDists.codeDotQ(spark,
            transform(col("a"), x => abs((x * 10).cast("int")) % 256),
            col("b")).as("cdq"),
          SliceDists.sliceL2(spark, col("a"), col("b"), 4, 4).as("sl"))
        .collect()
      rows.zip(got.sortBy(_.getLong(0))).foreach { case ((_, a, b), r) =>
        val dot = a.zip(b).map { case (x, y) => x * y }
          .foldLeft(0.0)(_ + _)
        assert(java.lang.Double.compare(r.getDouble(1), dot) === 0)
        val l2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }
          .foldLeft(0.0)(_ + _)
        assert(java.lang.Double.compare(r.getDouble(2), l2) === 0)
        assert(r.getSeq[Double](3) === a.zip(b).map { case (x, y) => x - y })
        val ham = a.zip(b).count { case (x, y) => (x > 0.0) != (y > 0.0) }
        assert(r.getInt(4) === ham)
        val cdq = a.zip(b).map { case (x, y) =>
          math.floor(y * (math.abs((x * 10).toInt) % 256) * 1e6).toLong }.sum
        assert(r.getLong(5) === cdq)
        val sl = r.getSeq[org.apache.spark.sql.Row](6)
          .map(x => x.getInt(0) -> x.getDouble(1)).toMap
        (0 until 4).foreach { s =>
          val want = (0 until 4).map { d =>
            val diff = a(s * 4 + d) - b(s * 4 + d); diff * diff
          }.foldLeft(0.0)(_ + _)
          assert(java.lang.Double.compare(sl(s), want) === 0)
        }
      }
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", oldMode)
      restore("spark.sql.codegen.fallback", oldFb)
      restore("spark.sql.optimizer.excludedRules", oldEx)
    }
  }
}
