package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage._

/** Extract / garble / block / resolve / profile stage semantics. */
class StagesSpec extends AnyFunSuite with SparkFixture {

  test("extract: mapping, defaults, value maps, cleaning, seeded shuffle") {
    import spark.implicits._
    val src = Seq(
      ("p1", "José", "Mañana", "01/15/1980", "Male", "(555) 123-4567",
        "123 Main St", " 02139 "),
      ("p2", "", "  smith ", "bad-date", "F", "555.999.0000",
        "9 Elm Ave", "02140"))
      .toDF("PatID", "First", "LAST", "Birth", "Gender", "Phone",
        "Addr", "Zip")
    val conf = Extract.TranslationConfig(Map(
      "record_id" -> Extract.FieldSpec(Seq("patid")),
      "given_name" -> Extract.FieldSpec(Seq("first")),
      "family_name" -> Extract.FieldSpec(Seq("last")),
      "DOB" -> Extract.FieldSpec(Seq("birth"),
        dateFormat = Some("MM/dd/yyyy")),
      "sex" -> Extract.FieldSpec(Seq("gender"),
        valueMap = Map("Male" -> "M", "Female" -> "F"), default = Some("U")),
      "phone_number" -> Extract.FieldSpec(Seq("phone")),
      "household_street_address" -> Extract.FieldSpec(Seq("addr")),
      "household_zip" -> Extract.FieldSpec(Seq("zip"))))
    val out = Extract.extract(src, conf)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    val p1 = rows("p1"); val p2 = rows("p2")
    assert(p1.getString(1) == "JOSE") // NFKD fold
    assert(p1.getString(2) == "MANANA")
    assert(p1.getString(3) == "1980-01-15") // date reformat
    assert(p1.getString(4) == "M") // value map
    assert(p1.getString(5) == "5551234567") // digits only
    assert(p1.getString(7) == "02139") // zip trim
    assert(p2.getString(3) == "") // unparseable date → ""
    assert(p2.getString(2) == "SMITH")
    // seeded shuffle is deterministic
    val again = Extract.extract(src, conf).collect().map(_.getString(0))
    assert(out.collect().map(_.getString(0)).toSeq ==
      again.toSeq)
    // metadata: content-hash run id is stable
    assert(Extract.metadata(out) == Extract.metadata(Extract.extract(src, conf)))
  }

  test("value mapping is a single dict lookup, not a rewrite cascade") {
    import spark.implicits._
    // overlapping rules A→B, B→C: the reference applies ONE lookup per
    // value, so A maps to B (never cascades to C) and B maps to C —
    // regardless of Map iteration order
    val src = Seq(("r1", "A"), ("r2", "B"), ("r3", "X"))
      .toDF("PatID", "Gender")
    val conf = Extract.TranslationConfig(Map(
      "record_id" -> Extract.FieldSpec(Seq("patid")),
      "sex" -> Extract.FieldSpec(Seq("gender"),
        valueMap = Map("A" -> "B", "B" -> "C"))))
    val out = Extract.extract(src, conf).select("record_id", "sex")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("r1" -> "B", "r2" -> "C", "r3" -> "X"))
  }

  test("garble: secret validation, subkey derivation, clk determinism") {
    intercept[IllegalArgumentException](Garble.validateSecret("xyz"))
    intercept[IllegalArgumentException](Garble.validateSecret("abc123"))
    val secret = "0123456789abcdef0123456789abcdef"
    assert(Garble.validateSecret(secret) == secret)
    val k1 = Garble.deriveSubkey(secret, "individuals")
    val k2 = Garble.deriveSubkey(secret, "households")
    assert(k1 != k2 && k1.length == 64)
    intercept[IllegalArgumentException](
      Garble.validateSchema(Garble.ClkSchema(Seq("x"), "doubleHash")))

    import spark.implicits._
    val recs = Seq(("c1", "SMITH", "BROWSER", "HELLO WORLD", "2025-01-01"),
      ("c2", "SMYTH", "BROWSER", "HELLO WORLD", "2025-01-01"))
      .toDF("conv_id", "family_name", "phone_number",
        "household_street_address", "household_zip")
    val schema = Garble.ClkSchema(Seq("family_name", "phone_number",
      "household_street_address", "household_zip"))
    val c1 = Garble.clks(recs, schema, secret).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val c2 = Garble.clks(recs, schema, secret).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(c1("c1"), c2("c1"))) // deterministic
    assert(!java.util.Arrays.equals(c1("c1"), c1("c2"))) // distinct
    // different secret → different clks
    val other = Garble.clks(recs, schema,
      "ffffffffffffffffffffffffffffffff").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(!java.util.Arrays.equals(c1("c1"), other("c1")))
  }

  test("lambda blocks put near-identical records in a shared block") {
    import spark.implicits._
    val recs = Seq(("a", "JOHN SMITH 42 OAK STREET"),
      ("b", "JON SMITH 42 OAK STREET"),
      ("c", "COMPLETELY DIFFERENT TEXT HERE"))
      .toDF("conv_id", "household_street_address")
    val clks = recs.select(col("conv_id"),
      graft.linkage.expr.functions.clk_encode(7,
        col("household_street_address")).as("clk"))
    val blocks = Garble.lambdaBlocks(clks).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byId = blocks.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byId("a").intersect(byId("b")).nonEmpty, "a/b share a block")
    assert(byId("a").size == 3)
  }

  test("psig blocks: signatures + ratio filter drops oversized blocks") {
    import spark.implicits._
    // 40 records share family initial 'S' + phone initial 'B' → that
    // c0 block exceeds the 2%… use maxRatio 0.5 on 44 records: the
    // 40-strong block (91%) is dropped, small ones survive
    val many = (0 until 40).map(i => (s"x$i", s"SMITH$i", "BROWSER"))
    val few = Seq(("y1", "ADAMS", "CALC"), ("y2", "ADLER", "CALC"),
      ("z1", "KOCH", "MAIL"), ("z2", "KAHN", "WEB"))
    val recs = (many ++ few).toDF("conv_id", "family_name", "phone_number")
    val blocks = Garble.psigBlocks(recs, "family_name", "phone_number",
      maxRatio = 0.5)
    val keys = blocks.select("block_key").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!keys.contains("c0:SB"), "oversized c0 block must be dropped")
    assert(keys.contains("c0:AC"), "small blocks survive")
    // metaphone sigs exist
    assert(keys.exists(_.startsWith("mp:")))
  }

  test("resolve: metadata gate + positional link translation") {
    import spark.implicits._
    val ids = Seq("r1", "r2", "r3").toDF("conv_id")
    val links = Seq((101L, 0), (102L, 2)).toDF("LINK_ID", "position")
    val out = Output.resolveLinks(links, ids).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(101L -> "r1", 102L -> "r3"))

    val meta = Map("number_of_records" -> "3", "run_id" -> "aa")
    assert(Resolve.metadataDiff(meta, meta).isEmpty)
    val bad = meta.updated("number_of_records", "4")
    assert(Resolve.metadataDiff(meta, bad).nonEmpty)
    intercept[IllegalArgumentException](Resolve.gate(meta, bad))
    Resolve.gate(meta, bad, force = true) // forced passes
    val translated = Resolve.translate(links, ids, meta, meta)
    assert(translated.count() == 2)
  }

  test("household links fan out record_ids (J5)") {
    import spark.implicits._
    val hh = Seq((0, "a,b,c"), (1, "d"))
      .toDF("HOUSEHOLD_POSITION", "record_ids")
    val links = Seq((7L, 0), (9L, 1))
      .toDF("HOUSEHOLD_ID", "HOUSEHOLD_POSITION")
    val out = Output.resolveHouseholdLinks(links, hh).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((7L, "a"), (7L, "b"), (7L, "c"), (9L, "d")))
  }

  test("profile reports") {
    import spark.implicits._
    val df = Seq(("a", "X1"), ("b", "X2"), ("c", "X2"), ("c", ""),
      ("d", "Y33")).toDF("id", "v")
    val vc = Profile.valueCounts(df, "v", topN = 5, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vc == Map("X2" -> 2L))
    val dups = Profile.duplicateIds(df, "id").collect()
    assert(dups.length == 1 && dups.head.getString(0) == "c")
    val mask = Profile.formatMask(df, "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mask("X#") == 3 && mask("X##") == 1 && mask("") == 1)
    val missing = Profile.missingReport(df, Seq("v")).head()
    assert(missing.getLong(0) == 1)
    val mm = Profile.minMaxMissing(df, "v").head()
    assert(mm.getString(0) == "" && mm.getString(1) == "Y33")
  }

  test("zip roundtrip: clk json sink → zip → zip-member csv scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zip").toString
    // write a small csv shard then zip it and read back through Resolve
    Seq((1, "a"), (2, "b")).toDF("LINK_ID", "position")
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/links")
    Garble.zipDirectory(spark, s"$dir/links", s"$dir/links.zip")
    val back = Resolve.readZipMemberCsv(spark, s"$dir/links.zip")
    assert(back.count() == 2 &&
      back.columns.toSeq == Seq("LINK_ID", "position"))
  }
}
